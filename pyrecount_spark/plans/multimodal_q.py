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
# one pins a genuine decoder. The payload construction treats characters
# as pixel BYTES, which is only coherent for ASCII text, so the ASCII
# contract is enforced IN-PLAN on both sides (octet_length == length)
# rather than assumed of the corpus: the round-8 adversarial corpus
# (deliberately multiscript) caught the previous corpus-level assumption
# as a 7-row divergence — Spark's char-count "nb" disagreed with the
# oracle's byte count near the length cutoff.
# Both engines also filter to nb >= 36 (= max w·h·3 under the dim
# formula): a shorter document would truncate the pixel payload,
# decode_ppm would reject it, and the Spark side would fall to the hash
# fake while the oracle still predicted header dims.
# ---------------------------------------------------------------------------
@register(
    "multimodal_real_decode_ppm",
    """
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS path, text,
             octet_length(encode(text)) AS nb
      FROM documents
      WHERE octet_length(encode(text)) >= 36
        AND octet_length(encode(text)) = length(text)
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
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").cast("string").alias("path"),
            F.col("text"),
            F.length("text").alias("nb"),
        )
        .filter(F.col("nb") >= 36)  # guarantees nb >= w*h*3 (max 4*3*3)
        # ASCII docs only (chars == bytes): enforced, not assumed — see
        # the register comment
        .filter(F.octet_length("text") == F.length("text"))
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


# ---------------------------------------------------------------------------
# Frame-sampling offsets under a full oracle: the video-payload slicing
# plumbing (explode over byte-offset markers) is pure relational algebra,
# so DuckDB replays it with generate_series. Payload = document text bytes
# (ASCII corpus: octet_length == length).
# ---------------------------------------------------------------------------
@register(
    "multimodal_frame_offsets",
    """
    SELECT CAST(doc_id AS VARCHAR) AS path,
           CAST(f.i AS INT) AS frame_idx,
           CAST(f.i * 64 AS BIGINT) AS byte_offset
    FROM documents,
         LATERAL (
           SELECT unnest(generate_series(
             0, least(octet_length(encode(text)) // 64, 7))) AS i
         ) f
    ORDER BY path, frame_idx
    """,
)
def multimodal_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrecount_spark.multimodal.binary import sample_frames

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    return sample_frames(d, every_n_bytes=64, max_frames=8).select(
        "path", F.col("frame_idx").cast("int").alias("frame_idx"), "byte_offset"
    ).orderBy("path", "frame_idx")


# ---------------------------------------------------------------------------
# Audio stub features under a full oracle: for non-WAV payloads the audio
# operator's deterministic hash stub is SQL-replayable exactly like the
# image fake — channels from sha byte 2, q15 RMS from bytes 3-4, PCM16
# duration accounting at the assumed rate. (The REAL wav branch is pinned
# by tests with stdlib-written WAV files; RIFF headers contain NUL bytes,
# which VARCHAR SQL cannot synthesize, so its oracle stays test-side.)
# ---------------------------------------------------------------------------
@register(
    "multimodal_audio_stub_features",
    f"""
    WITH h AS (
      SELECT CAST(doc_id AS VARCHAR) AS path,
             sha256(text) AS hex,
             octet_length(encode(text)) AS nb
      FROM documents
    ), c AS (
      SELECT path, hex, nb, 1 + ({_byte(2)} % 2) AS channels FROM h
    )
    SELECT path,
           CAST(16000 AS INT) AS sample_rate,
           CAST(channels AS INT) AS n_channels,
           CAST((nb // (2 * channels)) * 1000 // 16000 AS BIGINT) AS duration_ms,
           CAST(({_byte(3)} * 256 + {_byte(4)}) % 32768 AS INT) AS rms_q15,
           CAST(nb AS BIGINT) AS n_bytes
    FROM c
    """,
)
def multimodal_audio_stub_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrecount_spark.multimodal.binary import extract_audio_features

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    return extract_audio_features(d)


# ---------------------------------------------------------------------------
# Video-container metadata under a full oracle: document text bytes are
# never valid ISO-BMFF (the first box must be a binary ftyp header), so
# the deterministic stub branch is what executes — and it is exactly
# SQL-replayable: container "fake", 1 kHz timescale, track count from sha
# byte 2, duration from byte length at the assumed 1 Mbit/s. (The REAL
# mp4 branch is pinned by tests with hand-built box structures; box
# headers contain NUL bytes VARCHAR SQL cannot synthesize, so its oracle
# stays test-side — same split as the WAV branch above.)
# ---------------------------------------------------------------------------
@register(
    "multimodal_video_stub_metadata",
    f"""
    WITH h AS (
      SELECT CAST(doc_id AS VARCHAR) AS path,
             sha256(text) AS hex,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT path,
           'fake' AS container,
           CAST(nb * 8 * 1000 // 1000000 AS BIGINT) AS duration_ms,
           CAST(1000 AS INT) AS timescale,
           CAST(1 + ({_byte(2)} % 3) AS INT) AS n_tracks,
           CAST(nb AS BIGINT) AS n_bytes
    FROM h
    """,
)
def multimodal_video_stub_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyrecount_spark.multimodal.binary import extract_video_metadata

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    return extract_video_metadata(d)
