"""Plan lint over the whole query registry: no row-at-a-time Python UDFs,
no cartesian products, and nested-loop joins only where they are the
intended shape (1-row broadcast scalar/query sides, or the documented
all-pairs correctness baseline). Catches a plan regression in ANY
registered query at analysis time — no execution needed.
"""

from __future__ import annotations

from pyrecount_spark import plans

plans.load_all()

# streaming (plans materialize only on run) and iterative driver-loop ops
SKIP = {
    "streaming_tumbling_events",
    "streaming_dim_join_agg",
    "streaming_stateful_totals",
    "dedup_components_canonical",
    "pagerank_dup_graph",
}

# BroadcastNestedLoopJoin is acceptable ONLY here:
BNLJ_OK = {
    "above_average_customers",  # 1-row global-aggregate side
    "knn_brute_force_cosine",  # 1-row query-vector side
    "tfidf_top_terms",  # 1-row corpus-count side
    "embedding_cosine_pairs",  # documented all-pairs baseline (LSH = scale path)
    "dss_important_parts_scalar",  # 1-row global-total side (Q11 scalar)
    "dss_global_sales_opportunity",  # 1-row positive-balance-average side (Q22)
    "contrastive_negative_pairs",  # 1-row corpus-count side (hash ring modulus)
    "lang_source_chisq",  # 1-row grand-total / dof sides of the contingency table
    "lsh_recall_eval",  # evaluation twin: exact all-pairs side measures LSH recall
    "unigram_logprob_scores",  # 1-row corpus-token-total side of the LM table
    "length_weighted_sample",  # 1-row global-max side of the sampling threshold
    "bigram_pmi_collocations",  # 1-row corpus-token-total side of the PMI formula
    "cms_join_size_estimate",  # 1-row estimate × 1-row exact-count cross join
    "truncated_embedding_recall",  # 1-row query side of both brute top-k evals
    "rrf_hybrid_retrieval",  # 1-row query-vector side of the dense retriever
    "winsorized_mean_lineitem_price",  # 1-row percentile-bounds side
    "pareto_price_recency_orders",  # 1-row min/max bucket-bounds side
    "ab_cuped_adjusted_metric",  # 1-row theta/xbar sufficient-stats side
    "customer_set_ops",  # 1-row × 1-row count cross join
    "bm25_retrieval_topk",  # 1-row avg-length and corpus-count sides
}

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


def test_no_forbidden_plan_nodes(spark):
    sf = "/root/testdata/sf0.001"
    problems = []
    for name, fn in plans.QUERIES.items():
        if name in SKIP:
            continue
        df = fn(spark, sf)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        for node in FORBIDDEN:
            if node in p:
                problems.append(f"{name}: {node}")
        if "BroadcastNestedLoopJoin" in p and name not in BNLJ_OK:
            problems.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        # Non-equi self-joins over the embeddings table are the O(N²)
        # candidate-generation anti-pattern. Only the documented shapes may
        # scan embeddings through a nested-loop join: the 1-row broadcast
        # query side (knn) and the all-pairs oracle-baseline twin
        # (embedding_cosine_pairs) — both enumerated in BNLJ_OK.
        if (
            "embeddings.parquet" in p
            and "BroadcastNestedLoopJoin" in p
            and name not in BNLJ_OK
        ):
            problems.append(f"{name}: non-equi join over embeddings")
    assert not problems, problems


def test_iterative_edge_feeders_are_bucketed(spark):
    """The components/PageRank queries are driver-loop iterative (SKIPped
    above), but their candidate-edge FEEDER is a static plan we can lint:
    it must be the bucketed MinHash-band + exact-verify pipeline — equi
    joins only, no nested-loop candidate generation (the round-1 version
    fed both from an all-pairs cosine self-join over embeddings)."""
    from pyrecount_spark.plans.dedup import _verified_edges

    _, edges = _verified_edges(spark, "/root/testdata/sf0.001")
    p = edges._sc._jvm.PythonSQLUtils.explainString(
        edges._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "embeddings.parquet" not in p  # graph is over documents now
