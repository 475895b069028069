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
