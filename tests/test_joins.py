"""Binned range join and as-of join golden semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyrecount_spark.operators.joins import asof_join, range_join_binned


def test_range_join_binned_matches_theta(spark):
    left = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 25.0)], ["id", "v"]
    )
    # overlapping intervals, one interval spanning multiple bins
    right = spark.createDataFrame(
        [(100, 0.0, 12.0), (200, 8.0, 30.0), (300, 26.0, 28.0)], ["rid", "lo", "hi"]
    )
    got = {
        (r.id, r.rid)
        for r in range_join_binned(left, right, "v", "lo", "hi", bin_width=4.0).collect()
    }
    expect = {
        (i, rid)
        for i, v in [(1, 5.0), (2, 10.0), (3, 15.0), (4, 25.0)]
        for rid, lo, hi in [(100, 0.0, 12.0), (200, 8.0, 30.0), (300, 26.0, 28.0)]
        if lo <= v < hi
    }
    assert got == expect and (2, 100) in got and (2, 200) in got


def test_asof_join_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 10, 0), "t1"),
         ("k", datetime(2024, 1, 1, 11, 0), "t2"),
         ("k", datetime(2024, 1, 1, 9, 0), "t0")],
        ["key", "ts", "trade"],
    )
    quotes = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 9, 30), 100),
         ("k", datetime(2024, 1, 1, 10, 0), 101),   # equal time: at-or-before
         ("k", datetime(2024, 1, 1, 10, 0), 102),   # tie: highest id wins
         ("k", datetime(2024, 1, 1, 10, 30), 103)],
        ["key", "qts", "qid"],
    )
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="qts",
        right_cols=["qid"], tiebreak="qid",
    )
    got = {r.trade: r.asof_qid for r in out.collect()}
    assert got == {"t0": None, "t1": 102, "t2": 103}


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    from pyrecount_spark.operators.joins import (
        bloom_filter_build,
        bloom_might_contain,
        bloom_prefilter_join,
    )
    from pyspark.sql import functions as F

    dim = spark.createDataFrame([(i,) for i in range(50)], ["dk"])
    fact = spark.createDataFrame([(i % 1000, i) for i in range(4000)], ["k", "v"])
    m = 1 << 12
    filt = bloom_filter_build(dim, "dk", m)

    probed = fact.withColumn("hit", bloom_might_contain(filt, F.col("k"), m))
    hits = probed.filter("hit").select("k").distinct().collect()
    hit_keys = {r.k for r in hits}
    # every member passes (no false negatives) ...
    assert set(range(50)) <= hit_keys
    # ... and the filter actually prunes: 950 non-members, few survive
    assert len(hit_keys) < 120

    # the round-14 single-F.expr string path (column NAME) is row-for-row
    # identical to the Column-expression path it optimizes
    probed_sql = fact.withColumn("hit", bloom_might_contain(filt, "k", m))
    sql_keys = {r.k for r in probed_sql.filter("hit").select("k").distinct().collect()}
    assert sql_keys == hit_keys

    # the prefiltered join equals the plain join exactly
    a = bloom_prefilter_join(fact, dim, "k", "dk").select("k", "v")
    b = fact.join(dim, fact.k == dim.dk).select("k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
