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


def test_cms_inner_product_join_estimate(spark):
    """Inner-product estimate must be >= the exact equi-join size and exact
    when there are no hash collisions (tiny key space, wide sketch)."""
    from pyspark.sql import functions as F

    from pyrecount_spark.operators.sketch import cms_inner_product, cms_sketch

    a = spark.createDataFrame([(k,) for k in ["a", "a", "b", "c"]], "k string")
    b = spark.createDataFrame([(k,) for k in ["a", "b", "b", "d"]], "k string")
    # exact join size on k: a:2*1 + b:1*2 = 4
    est = cms_inner_product(
        cms_sketch(a, "k", d=4, w=1024), cms_sketch(b, "k", d=4, w=1024)
    ).collect()[0]
    exact = a.join(b, "k").count()
    assert exact == 4
    assert est.est_join_rows >= exact
    # 4 distinct keys in a 1024-bucket sketch: collisions are possible but
    # the min-over-rows makes the estimate exact unless ALL 4 rows collide
    assert est.est_join_rows == 4


def test_cms_inner_product_disjoint_keys_is_zero(spark):
    """Sketches over disjoint key sets share no buckets (wide sketch, no
    collisions): the estimate must be 0, not NULL and not an overestimate
    from dropping zero-overlap hash rows out of the min."""
    from pyrecount_spark.operators.sketch import cms_inner_product, cms_sketch

    a = spark.createDataFrame([(k,) for k in ["a", "b"]], "k string")
    b = spark.createDataFrame([(k,) for k in ["x", "y"]], "k string")
    est = cms_inner_product(
        cms_sketch(a, "k", d=4, w=4096), cms_sketch(b, "k", d=4, w=4096)
    ).collect()[0]
    assert est.est_join_rows == 0
