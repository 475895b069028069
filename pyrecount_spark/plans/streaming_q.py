"""Streaming query for the harness: batch/stream parity on the events table.

Registered without an oracle (the driver records the weaker rows-only
check): the *values* are already oracle-verified through the identical
batch expression (``window_tumbling_hourly``); this entry proves the same
plan executes as a Structured Streaming job (file source → watermarked
window aggregate → memory sink, availableNow trigger).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyrecount_spark.plans import register

# events.parquet carries TIMESTAMP(NANOS) → read as raw long nanos
_EVENTS_NANOS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@register("streaming_tumbling_events")
def streaming_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-source streams need a directory: stream the sf dir, glob-filtered
    # to the events file
    stream = (
        spark.readStream.schema(_EVENTS_NANOS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    name = f"stream_q_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)
