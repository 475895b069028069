"""Multimodal-path queries: the Arrow-batched mapInPandas decode plumbing
under a FULL value oracle. The testdata has no real media, so document text
bytes stand in as the binary payload — the deterministic content-hash fake
in ``extract_image_features`` (production swaps in the codec at the same
call site) is exactly replayable in SQL, which is the point: the Spark-side
schema/batching/UDF plumbing is what's under test, end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrecount_spark.multimodal.binary import extract_image_features
from pyrecount_spark.plans import register

_NIB = "strpos('0123456789abcdef', substr(hex, {i}, 1)) - 1"


def _byte(i: int) -> str:
    hi = _NIB.format(i=2 * i + 1)
    lo = _NIB.format(i=2 * i + 2)
    return f"(({hi}) * 16 + ({lo}))"


@register(
    "multimodal_fake_decode",
    f"""
    WITH h AS (
      SELECT CAST(doc_id AS VARCHAR) AS path,
             sha256(text) AS hex,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT path,
           CAST(64 + ({_byte(0)} % 192) AS BIGINT) AS width,
           CAST(64 + ({_byte(1)} % 192) AS BIGINT) AS height,
           CAST(nb AS BIGINT) AS n_bytes,
           hex AS content_sha
    FROM h
    """,
)
def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = extract_image_features(d)
    return feats.select(
        "path",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
        "content_sha",
    )


# ---------------------------------------------------------------------------
# REAL decode under a full value oracle: synthesize a VALID binary-PPM
# payload per document (header + the doc's first w·h·3 ASCII bytes as
# pixels — dims derived from the byte length, so they vary per row), run
# it through the actual mapInPandas decode chain, and have DuckDB rebuild
# the identical payload in SQL to predict dims, size, and sha. This pins
# the pure-stdlib codec branch (multimodal/codecs.py::decode_ppm) with an
# independent engine — the fake-path twin above pins the plumbing, this
# one pins a genuine decoder. ASCII-only corpus ⇒ char ops == byte ops in
# both engines (asserted by the tests' non-ASCII check in TESTDATA).
# ---------------------------------------------------------------------------
@register(
    "multimodal_real_decode_ppm",
    """
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS path, text,
             octet_length(encode(text)) AS nb
      FROM documents
    ), p AS (
      SELECT path, 1 + nb % 4 AS w, 1 + nb % 3 AS h,
             'P6' || chr(10) || (1 + nb % 4) || ' ' || (1 + nb % 3)
                  || chr(10) || '255' || chr(10)
                  || substring(text, 1, (1 + nb % 4) * (1 + nb % 3) * 3)
               AS payload
      FROM d
    )
    SELECT path,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
           sha256(payload) AS content_sha
    FROM p
    """,
)
def multimodal_real_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text"),
        F.length("text").alias("nb"),  # ASCII corpus: chars == bytes
    )
    w = (F.lit(1) + F.col("nb") % 4).cast("int")
    h = (F.lit(1) + F.col("nb") % 3).cast("int")
    payload = F.concat(
        F.lit("P6\n"),
        w.cast("string"),
        F.lit(" "),
        h.cast("string"),
        F.lit("\n255\n"),
        F.expr("substring(text, 1, (1 + nb % 4) * (1 + nb % 3) * 3)"),
    )
    src = d.select(
        "path", payload.cast("binary").alias("content")
    )
    feats = extract_image_features(src)
    return feats.select(
        "path",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
        "content_sha",
    )
