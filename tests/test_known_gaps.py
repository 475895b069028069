"""Known-gap corpus (mirrors the reference's tests/test_known_failures.py,
47 LoC of xfails documenting intended-but-unbuilt surface): every deliberate
stub or engine-divergence in this repo, executable and visible — so a gap
closing shows up as an XPASS, not silence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.xfail(
    reason="PERMANENT BY DECISION (round-14, VERDICT r13 #7): "
    "compressed-audio PCM decode stays library-gated. The decode chain "
    "REALLY decodes PNG/baseline+progressive-JPEG/PPM/BMP pixels and WAV "
    "PCM via the pure-stdlib codecs in multimodal/codecs.py, plus "
    "no-decode mp3/FLAC metadata (executing tests in "
    "test_multimodal_streaming + test_jpeg_codec); a pure-stdlib mp3/FLAC "
    "PCM decoder is disproportionate engineering for a surface no driver "
    "testdata exercises (documents/embeddings carry no audio payloads), "
    "so this xfail is the permanent record: if a DSP library (PIL/pydub/"
    "librosa) ever lands in the container, it XPASSes and the decision "
    "gets revisited",
    strict=True,
    raises=ImportError,
)
def test_real_image_decode_available():
    import PIL  # noqa: F401


@pytest.mark.xfail(
    reason="approx_count_distinct is HLL-sketch-based: estimates are "
    "engine-specific by design; only the exact twin (count_distinct_agg) "
    "is oracle-checked",
    strict=True,
)
def test_approx_distinct_matches_exact(spark):
    df = spark.range(0, 10_000).select((F.col("id") % 2377).alias("k"))
    approx = df.agg(F.approx_count_distinct("k").alias("n")).collect()[0].n
    assert approx == 2377


@pytest.mark.xfail(
    reason="Spark CAST(double AS INT) truncates while DuckDB rounds — "
    "engine divergence the oracle conventions forbid relying on "
    "(use FLOOR/ROUND explicitly; see memory of round-1 debugging)",
    strict=True,
)
def test_double_to_int_cast_portability(spark):
    import duckdb

    spark_val = spark.sql("SELECT CAST(2.7 AS INT) AS v").collect()[0].v
    duck_val = duckdb.connect().sql("SELECT CAST(2.7 AS INT) AS v").fetchone()[0]
    assert spark_val == duck_val
