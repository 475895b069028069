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


@_settings
@given(
    token_counts=st.lists(st.integers(1, 40), min_size=1, max_size=25),
    window=st.sampled_from([7, 16, 512]),
)
def test_pack_sequences_invariants(spark, token_counts, window):
    """Packing is a partition of the concatenated token stream: placements
    are contiguous, within-window, and reconstruct the running sum."""
    from pyrecount_spark.operators.corpus import pack_sequences

    rows = [("s", i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
    out = sorted(
        pack_sequences(df, "n_tokens", "doc_id", "source", window=window).collect(),
        key=lambda r: r.doc_id,
    )
    cum = 0
    for r in out:
        assert 0 <= r.start_offset < window
        assert r.start_window * window + r.start_offset == cum  # contiguous
        cum += r.n_tokens
        assert r.end_window == (cum - 1) // window
        assert r.n_windows == r.end_window - r.start_window + 1
    assert cum == sum(token_counts)


@_settings
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    whole=st.sampled_from([0, 1, 2]),
    frac_pct=st.sampled_from([0, 25, 50, 100]),
)
def test_weighted_mix_copy_bounds(spark, ids, whole, frac_pct):
    """Every surviving doc gets floor(w) or floor(w)+1 copies; integral
    weights are exact; copy_ids enumerate 1..copies."""
    from pyspark.sql import functions as F
    from pyrecount_spark.operators.corpus import weighted_mix

    w = whole + frac_pct / 100.0
    df = spark.createDataFrame([(i, "s") for i in ids], ["doc_id", "source"])
    out = weighted_mix(df, "doc_id", "source", F.lit(w)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy_id)
    for copies in by_doc.values():
        assert sorted(copies) == list(range(1, len(copies) + 1))
    if frac_pct == 0:
        # integral weight: exact copy count, all docs present iff w >= 1
        assert all(len(c) == whole for c in by_doc.values())
        assert len(by_doc) == (len(ids) if whole >= 1 else 0)
    elif frac_pct == 100:
        assert all(len(c) == whole + 1 for c in by_doc.values())
        assert len(by_doc) == len(ids)
    else:
        assert all(len(c) in (whole, whole + 1) for c in by_doc.values())


@_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["a", "b"]), st.text(max_size=5)),
        min_size=0, max_size=30, unique_by=lambda t: t[0],
    ),
)
def test_table_fingerprint_permutation_invariant(spark, rows):
    """Fingerprint is invariant under row order and partitioning, and both
    channels (count, xor) agree between any two equal multisets."""
    from pyspark.sql import functions as F
    from pyrecount_spark.operators.relational import table_fingerprint

    if not rows:
        return
    df = spark.createDataFrame(rows, ["id", "g", "s"])
    canon = [F.col("id").cast("string"), F.col("g"),
             F.coalesce(F.col("s"), F.lit("<NULL>"))]
    one = sorted(map(tuple, table_fingerprint(df, canon, group_col="g").collect()))
    other = sorted(map(tuple, table_fingerprint(
        df.orderBy(F.desc("id")).repartition(7), canon, group_col="g"
    ).collect()))
    assert one == other


# Pure-Python codec round-trips: no Spark in the loop, so examples can be
# generous. The encoder lives in test_multimodal_streaming (hand-built PNG
# writer); decode must invert it for ANY pixels, dims, and filter mix.
@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
)
def test_png_codec_roundtrip_property(w, h, data):
    from tests.test_multimodal_streaming import _bmp_bytes, _png_bytes

    from pyrecount_spark.multimodal.codecs import decode_bmp, decode_png, decode_ppm

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=h)
    )
    assert decode_png(_png_bytes(w, h, rgb, filters)) == (w, h, rgb)
    assert decode_ppm(b"P6\n%d %d\n255\n" % (w, h) + rgb) == (w, h, rgb)
    assert decode_bmp(_bmp_bytes(w, h, rgb)) == (w, h, rgb)


@_settings
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-10, 10, allow_nan=False, width=32), min_size=6, max_size=6
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_dot_unrolled_bit_identical_to_fold(spark, vecs):
    """dot_unrolled must reproduce the higher-order fold EXACTLY (same
    left-to-right double accumulation) — it replaces the fold on quadratic
    hot paths, so bit-identity is the contract the oracles rely on."""
    from pyrecount_spark.operators.similarity import dot, dot_unrolled

    rows = [(i, v, vecs[(i + 1) % len(vecs)]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id int, a array<float>, b array<float>")
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("fold"),
        dot_unrolled(F.col("a"), F.col("b"), 6).alias("unrolled"),
    ).collect()
    for r in out:
        assert r.fold == r.unrolled  # exact, not approx


@_settings
@given(
    n=st.integers(4, 24),
    k=st.sampled_from([1, 2, 3]),
)
def test_semantic_dedup_block_pairs_complete(spark, n, k):
    """The hash block-pair decomposition must enumerate every unordered
    in-cluster pair EXACTLY once: with threshold=-1 (cosine is always
    ≥ -1), the edge degree sum equals 2× the number of in-cluster pairs,
    and every doc's dup count equals (its cluster size - 1)."""
    from pyrecount_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5) + 1.0 for d in range(4)]) for i in range(n)],
        ["vec_id", "embedding"],
    )
    out = semantic_dedup(emb, k=k, iters=1, dim=4, threshold=-1.0).collect()
    by_cluster: dict[int, int] = {}
    for r in out:
        by_cluster[r.cluster] = by_cluster.get(r.cluster, 0) + 1
    for r in out:
        assert r.n_sem_dups == by_cluster[r.cluster] - 1, (
            f"vec {r.vec_id} in cluster {r.cluster} (size "
            f"{by_cluster[r.cluster]}) has degree {r.n_sem_dups} — a pair "
            "was missed or double-counted by the block decomposition"
        )
        # exactly one keeper per... no: keep=False iff a LOWER id exists in
        # the same cluster, so exactly one keep per cluster
    keeps = {}
    for r in out:
        keeps[r.cluster] = keeps.get(r.cluster, 0) + (1 if r.keep else 0)
    assert all(v == 1 for v in keeps.values()), keeps


@_settings
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("red blue fox dog run hop sky sea oak elm".split()),
            min_size=2,
            max_size=9,
        ).map(" ".join),
        min_size=3,
        max_size=8,
    ),
    thr=st.sampled_from([0.15, 0.3, 0.4, 4 / 7, 0.6, 0.75, 0.9]),
)
def test_prefix_filtered_jaccard_no_false_negatives(spark, texts, thr):
    """Asymmetric PPJoin prefixes (index 2t/(1+t) x probe t) must lose no
    pairs on ANY corpus/threshold — tiny docs and thresholds whose
    coefficient*size lands on exact integer boundaries are exactly where
    un-epsiloned ceils would silently shorten a prefix."""
    from pyrecount_spark.operators.dedup import jaccard_pairs, prefix_filtered_jaccard

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, "text", "doc_id", n=2, threshold=thr, max_shingle_df=None
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filtered_jaccard(
            docs, "text", "doc_id", n=2, threshold=thr
        ).collect()
    }
    assert pref == full, (thr, texts)
