"""K-means Lloyd semantics on a tiny 2-D golden frame."""

from __future__ import annotations

import pytest

from pyrecount_spark.operators.clustering import kmeans_lloyd, nearest_centroid


@pytest.fixture(scope="module")
def vecs(spark):
    # two obvious blobs around (0,0) and (10,10); ids 0/1 are the seeds
    return spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [1.0, 0.0]),
            (3, [0.0, 1.0]),
            (4, [11.0, 10.0]),
            (5, [10.0, 11.0]),
        ],
        ["vec_id", "embedding"],
    )


def test_kmeans_converges_to_blobs(spark, vecs):
    out = {r.vec_id: r for r in kmeans_lloyd(vecs, k=2, iters=2, dim=2).collect()}
    assert {out[i].cluster for i in (0, 2, 3)} == {0}
    assert {out[i].cluster for i in (1, 4, 5)} == {1}
    # after update, centroid 0 = mean of blob = (1/3, 1/3) rounded to 6
    # dist((0,0), c0) = 2 * (1/3)^2 with the rounded component 0.333333
    assert out[0].dist == pytest.approx(round(2 * 0.333333**2, 6), abs=1e-12)


def test_assignment_is_narrow_map(spark, vecs):
    # the per-iteration assignment must be a pure projection (no shuffle)
    assigned = vecs.withColumn(
        "_cluster",
        nearest_centroid([(0, [0.0, 0.0]), (1, [10.0, 10.0])], "embedding")
        .getField("cluster"),
    )
    plan = assigned._sc._jvm.PythonSQLUtils.explainString(
        assigned._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_empty_cluster_keeps_previous_centroid(spark):
    # identical seeds: the id tiebreak sends everything to cluster 0 in
    # iteration 1, so cluster 1 goes empty. Its centroid must stay the seed
    # (not NaN/null) — and, still parked at the origin, it legitimately
    # recaptures the origin points in iteration 2 after cluster 0's
    # centroid drifted toward the mean.
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [4.0, 4.0])],
        ["vec_id", "embedding"],
    )
    out = {r.vec_id: r for r in kmeans_lloyd(df, k=2, iters=2, dim=2).collect()}
    assert out[0].cluster == 1 and out[1].cluster == 1  # stale seed at origin
    assert out[2].cluster == 0
    assert all(r.dist == r.dist for r in out.values())  # no NaN anywhere


def test_semantic_dedup_drops_near_duplicates(spark):
    """Two near-identical vectors in the same cluster: the higher id is
    dropped; a far-away vector stays kept with zero dup neighbors."""
    from pyrecount_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [-1.0, 0.0, 0.0, 0.0]),     # far from everything
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal to 0/1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            emb, k=2, iters=1, dim=4, threshold=0.9
        ).collect()
    }
    assert len(out) == 4
    assert out[0].keep and out[0].n_sem_dups == 1
    assert not out[1].keep and out[1].n_sem_dups == 1
    assert out[2].keep and out[2].n_sem_dups == 0
    assert out[3].keep and out[3].n_sem_dups == 0
