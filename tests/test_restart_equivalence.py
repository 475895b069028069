"""Bench-scale checkpoint-recovery equivalence (round-8 verdict item #5).

tests/test_stateful_restart.py proves restart LOGIC on crafted rows; these
tests prove restart EQUIVALENCE at sf0.1 (~100k events, 1500 users): a
drain that stops mid-corpus and RESUMES from its checkpoint must produce
byte-identical final output to a single uninterrupted drain. RocksDB
state-store recovery is the 100 TB operational risk — a streaming job
WILL be killed and resumed in production, and any divergence here is
silent data corruption.

Protocol: the corpus is split at its time-order midpoint into two parquet
files. Run 1 sees only file 1 (drains, checkpoints, stops = the "kill");
file 2 then appears and run 2 resumes from the same checkpoint. The
time-ordered split mirrors reality (a resumed job sees LATER data) and
keeps run-2 events ahead of the persisted watermark. Output goes through
the exactly-once foreachBatch parquet recipe (per-batch dynamic partition
overwrite) so each batch's emission is separately inspectable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _split_events(spark, tmp_path):
    """events.parquet split at the time-order midpoint into two files.

    Sliced with pyarrow (not pandas round-trip) so the ts column keeps its
    exact parquet logical type — _EVENTS_SCHEMA reads it as timestamp_ntz
    and a pandas re-write would change the physical annotation."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    mid = len(tbl) // 2
    head, tail = tbl.slice(0, mid), tbl.slice(mid)
    d_resume = tmp_path / "resume_src"
    d_single = tmp_path / "single_src"
    d_resume.mkdir()
    d_single.mkdir()
    pq.write_table(head, d_resume / "part1.parquet")
    pq.write_table(head, d_single / "part1.parquet")
    pq.write_table(tail, d_single / "part2.parquet")
    return d_resume, d_single, tail


def _drain(result_df, out: str, ckpt: str, mode: str, timeout_s: int = 300):
    def write_batch(df, bid: int) -> None:
        (
            df.withColumn("_batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out)
        )

    q = (
        result_df.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError("drain did not finish")


def _tws_available() -> bool:
    from pyrecount_spark.streaming.proto_compat import protobuf_available

    return protobuf_available()


@pytest.mark.skipif(not _tws_available(), reason="protobuf unavailable for TWS")
def test_tws_resume_equals_single_drain_sf01(spark, tmp_path):
    from pyrecount_spark.plans.streaming_q import (
        _EVENTS_SCHEMA,
        _rocksdb_state_store,
    )
    from pyrecount_spark.streaming.pipeline import streaming_user_stats_tws
    from pyrecount_spark.streaming.proto_compat import ensure_protobuf

    assert ensure_protobuf(spark)
    d_resume, d_single, tail = _split_events(spark, tmp_path)

    def run(src: str, out: str, ckpt: str) -> None:
        with _rocksdb_state_store(spark):
            stream = spark.readStream.schema(_EVENTS_SCHEMA).parquet(src)
            _drain(streaming_user_stats_tws(stream), out, ckpt, "update")

    # interrupted: drain half 1, "kill", reveal half 2, resume same ckpt
    out_r, ckpt_r = str(tmp_path / "out_r"), str(tmp_path / "ckpt_r")
    run(str(d_resume), out_r, ckpt_r)
    import pyarrow.parquet as pq

    pq.write_table(tail, d_resume / "part2.parquet")
    run(str(d_resume), out_r, ckpt_r)
    # uninterrupted single drain over the identical corpus
    out_s, ckpt_s = str(tmp_path / "out_s"), str(tmp_path / "ckpt_s")
    run(str(d_single), out_s, ckpt_s)

    def final(path: str) -> dict:
        # update mode: a user's final totals = their row in the LAST batch
        # that updated them
        pdf = spark.read.parquet(path).toPandas()
        pdf = pdf.sort_values("_batch_id").groupby("user_id").tail(1)
        return {
            int(r.user_id): (
                int(r.n_events), int(r.n_event_types),
                int(r.n_purchases), int(r.value_cents),
            )
            for r in pdf.itertuples()
        }

    got_resumed, got_single = final(out_r), final(out_s)
    assert got_resumed == got_single
    # and both equal the batch aggregate (end-to-end correctness, not just
    # self-consistency)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exp = {
        r.user_id: (r.n_events, r.n_event_types, r.n_purchases, r.value_cents)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchases"
            ),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .collect()
    }
    assert got_single == exp


def test_session_window_resume_equals_single_drain_sf01(spark, tmp_path):
    import pyarrow.parquet as pq2

    from pyrecount_spark.plans.streaming_q import (
        _EVENTS_SCHEMA,
        _rocksdb_state_store,
        _utc_session,
    )

    d_resume, d_single, tail = _split_events(spark, tmp_path)

    def build(src: str):
        stream = (
            spark.readStream.schema(_EVENTS_SCHEMA)
            .parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        return (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("s"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("e"),
                "n_events",
            )
        )

    def run(src: str, out: str, ckpt: str) -> None:
        with _rocksdb_state_store(spark), _utc_session(spark):
            _drain(build(src), out, ckpt, "complete")

    out_r, ckpt_r = str(tmp_path / "sw_out_r"), str(tmp_path / "sw_ckpt_r")
    run(str(d_resume), out_r, ckpt_r)
    pq2.write_table(tail, d_resume / "part2.parquet")
    run(str(d_resume), out_r, ckpt_r)
    out_s, ckpt_s = str(tmp_path / "sw_out_s"), str(tmp_path / "sw_ckpt_s")
    run(str(d_single), out_s, ckpt_s)

    def final(path: str) -> set:
        # complete mode: the last batch IS the full result
        pdf = spark.read.parquet(path).toPandas()
        last = pdf[pdf["_batch_id"] == pdf["_batch_id"].max()]
        return {
            (int(r.user_id), r.s, r.e, int(r.n_events)) for r in last.itertuples()
        }

    got_resumed, got_single = final(out_r), final(out_s)
    assert got_resumed == got_single
    assert len(got_single) > 1000  # sf0.1-scale session count sanity


def test_stream_stream_join_resume_equals_single_drain_sf01(spark, tmp_path):
    """Stream-stream LEFT OUTER join state across a kill-and-resume: the
    buffered-row state store (the third stateful-operator class after
    aggregation and TWS) must restore such that the resumed run's appended
    output EQUALS the single drain's.

    Why the whole output is comparable (no proven-final cutoff needed
    here): with the TIME-ORDERED split, a click evicted as unmatched in
    run 1 has c_ts + 1h < watermark_half <= max(half1) - 2h, while every
    half-2 purchase has p_ts > max(half1) — strictly outside that click's
    match window — so early eviction can never suppress a cross-half
    match, and clicks still inside their window are retained in state and
    matched after the restart."""
    import pyarrow.parquet as pq

    from pyrecount_spark.plans.streaming_q import (
        _EVENTS_SCHEMA,
        _rocksdb_state_store,
        _utc_session,
    )

    d_resume, d_single, tail = _split_events(spark, tmp_path)

    def build(src: str):
        def _stream():
            return (
                spark.readStream.schema(_EVENTS_SCHEMA)
                .parquet(src)
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )

        clicks = (
            _stream()
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "2 hours")
        )
        purchases = (
            _stream()
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "2 hours")
        )
        return clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND p_ts BETWEEN c_ts AND c_ts + INTERVAL 1 HOUR"
            ),
            "leftOuter",
        ).select(
            "click_id",
            F.col("c_user").alias("user_id"),
            "purchase_id",
            F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )

    def run(src: str, out: str, ckpt: str) -> None:
        with _rocksdb_state_store(spark), _utc_session(spark):
            _drain(build(src), out, ckpt, "append")

    out_r, ckpt_r = str(tmp_path / "jo_out_r"), str(tmp_path / "jo_ckpt_r")
    run(str(d_resume), out_r, ckpt_r)
    pq.write_table(tail, d_resume / "part2.parquet")
    run(str(d_resume), out_r, ckpt_r)
    out_s, ckpt_s = str(tmp_path / "jo_out_s"), str(tmp_path / "jo_ckpt_s")
    run(str(d_single), out_s, ckpt_s)

    def rows(path: str) -> set:
        pdf = spark.read.parquet(path).toPandas()
        return {
            (int(r.click_id), int(r.user_id),
             None if pd_isna(r.purchase_id) else int(r.purchase_id),
             r.click_ts, None if r.purchase_ts is None else r.purchase_ts)
            for r in pdf.itertuples()
        }

    def pd_isna(v) -> bool:
        return v is None or v != v

    got_resumed, got_single = rows(out_r), rows(out_s)
    assert got_resumed == got_single
    assert len(got_single) > 3000  # sf0.1-scale join output sanity
    # and some matched AND some outer rows exist (both state paths hit)
    matched = [r for r in got_single if r[2] is not None]
    outer = [r for r in got_single if r[2] is None]
    assert matched and outer
