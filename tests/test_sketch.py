"""Count-min sketch operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyrecount_spark.operators.sketch import cms_estimate, cms_sketch


def test_cms_overestimates_and_tight_when_wide(spark):
    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
    occ = spark.createDataFrame(rows, ["item"])
    keys = occ.distinct()
    exact = {r.item: c for r, c in [(r, r.cnt) for r in occ.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()]}

    # wide sketch: 4 items into 4x4096 buckets -> collision-free, estimates exact
    sk = cms_sketch(occ, "item", d=4, w=4096)
    est = {r.item: r.cms_est for r in cms_estimate(sk, keys, "item", d=4, w=4096).collect()}
    assert est == exact

    # pathologically narrow sketch: still never underestimates
    sk2 = cms_sketch(occ, "item", d=2, w=2)
    est2 = {r.item: r.cms_est for r in cms_estimate(sk2, keys, "item", d=2, w=2).collect()}
    assert all(est2[k] >= exact[k] for k in exact)
    # total mass per hash row is conserved
    per_row = {
        r.r: r.s
        for r in sk2.groupBy("r").agg(F.sum("counter").alias("s")).collect()
    }
    assert set(per_row.values()) == {len(rows)}


def test_cms_sketch_bounded_size(spark):
    occ = spark.createDataFrame([(str(i % 97),) for i in range(5000)], ["item"])
    sk = cms_sketch(occ, "item", d=4, w=64)
    assert sk.count() <= 4 * 64
