"""Checkpoint-restart resilience for the timeout sessionizer: per-user
state written by run 1 must be restored by run 2 (same checkpoint), so a
session spanning both runs merges, a gap break emits it, and the watermark
pushed by late traffic times out the remainder. This is the property that
makes the operator production-viable — a restarted job must not re-open or
double-emit sessions.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from pyrecount_spark.streaming.pipeline import streaming_timeout_sessions

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _mins(m: float) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=m)


SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("ts", TimestampType())]
)


def _run(spark, src: str, ckpt: str, out: str) -> None:
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        streaming_timeout_sessions(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_session_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # run 1: user 1 has an OPEN session (two events 10 min apart)
    spark.createDataFrame(
        [(1, _mins(0)), (1, _mins(10))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    assert spark.read.schema(
        streaming_timeout_sessions(
            spark.readStream.schema(SCHEMA).parquet(src).withWatermark("ts", "0 seconds")
        ).schema
    ).parquet(out).count() == 0  # nothing closed yet

    # run 2: +15 min continues the session (state restored!), +60 breaks it,
    # and a far-future event pushes the watermark past the remainder's gap
    spark.createDataFrame(
        [(1, _mins(15)), (1, _mins(60)), (2, _mins(600))], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # the cross-restart session merged to 3 events and closed on the gap
    # break; the 1-event remainder closed on watermark timeout; user 2's
    # session is still open (no emission)
    assert rows == {
        (1, _mins(0), _mins(15), 3),
        (1, _mins(60), _mins(60), 1),
    }, rows
