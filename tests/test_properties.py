"""Property-based tests (hypothesis): algebraic invariants that must hold
for ANY input, not just the golden fixtures — mirroring the reference's
randomized-input test style (SURVEY.md §5) without its fixed seeds.

Spark round-trips are expensive, so examples are few but adversarial:
hypothesis shrinks failures to minimal cases.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pyrecount_spark.operators.dedup import connected_components
from pyrecount_spark.operators.relational import merge_upsert
from pyrecount_spark.operators.skew import salted_join

_settings = settings(max_examples=8, deadline=None)

keys = st.integers(min_value=0, max_value=9)


@_settings
@given(
    left=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=30),
    right=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=10),
    salt=st.sampled_from([1, 2, 5]),
)
def test_salted_join_equals_plain_join(spark, left, right, salt):
    l_df = spark.createDataFrame(left or [(None, None)], "k int, lv int").filter(
        F.col("k").isNotNull()
    )
    r_df = spark.createDataFrame(right or [(None, None)], "k int, rv int").filter(
        F.col("k").isNotNull()
    )
    plain = sorted(map(tuple, l_df.join(r_df, on=["k"]).collect()))
    salted = sorted(map(tuple, salted_join(l_df, r_df, on=["k"], salt=salt).collect()))
    assert salted == plain


@_settings
@given(
    target=st.dictionaries(keys, st.integers(0, 100), max_size=10),
    updates=st.dictionaries(keys, st.integers(200, 300), max_size=10),
)
def test_merge_upsert_invariants(spark, target, updates):
    t_df = spark.createDataFrame(
        list(target.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    u_df = spark.createDataFrame(
        list(updates.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    merged = {r.k: r.v for r in merge_upsert(t_df, u_df, ["k"]).collect()}
    expected = {**target, **updates}  # updates win; survivors pass; inserts land
    assert merged == expected


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    comp = {}
    for n in nodes:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


@_settings
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    nodes = sorted(set(range(16)))
    n_df = spark.createDataFrame([(n,) for n in nodes], "id int")
    e_df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(None, None)], "id_a int, id_b int"
    ).filter(F.col("id_a").isNotNull())
    got = {
        r.node: r.label
        for r in connected_components(e_df, n_df, id_col="id").collect()
    }
    assert got == _uf_components(nodes, [(a, b) for a, b in edges])
