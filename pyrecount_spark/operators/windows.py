"""Event-time windowing & sessionization (SURVEY.md §2.10 extension ops).

Batch implementations here; the Structured Streaming variants (watermarked)
live in ``pyrecount_spark.streaming``. Window starts are emitted as
formatted strings so results are timezone- and engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def fmt_ts(col: Column) -> Column:
    return F.date_format(col, TS_FMT)


def tumbling_agg(
    df: DataFrame, ts_col: str, keys: list[str], unit: str = "hour"
) -> DataFrame:
    """Tumbling window via date_trunc — a plain hash aggregate (partial +
    final); at scale this is the cheapest possible windowing (no state)."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("_w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(fmt_ts(F.col("_w")).alias("window_start"), *keys, "n_events", "sum_cents")
    )


def sliding_agg(
    df: DataFrame, ts_col: str, window: str = "30 minutes", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding window via native ``F.window`` (each row lands in
    window/slide buckets — narrow expansion, then one aggregate)."""
    w = F.window(F.col(ts_col), window, slide)
    return (
        df.groupBy(w.alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(fmt_ts(F.col("_w.start")).alias("window_start"), "n_events", "sum_cents")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    previous event of the same user exceeds the gap; session id = running
    count of session starts (classic lag + cumulative-sum assignment).

    Scale: one shuffle on ``user_col``; within-partition sort feeds both
    window functions in a single exchange (same partitioning + ordering).
    """
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w_user)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    with_session = df.withColumn(
        "session_id",
        F.sum(is_new).over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_session.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        fmt_ts(F.min(ts_col)).alias("session_start"),
        fmt_ts(F.max(ts_col)).alias("session_end"),
    )


def assign_sessions(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Row-level session assignment: ``sessionize``'s lag + cumulative-sum
    step without the per-session aggregation — for composites that need the
    original columns alongside the session id (conversion rates, per-session
    funnels). Same single user-key shuffle."""
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col(ts_col)).over(w_user)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
