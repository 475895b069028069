"""Probe-restricted LSH candidate generation (round-9, VERDICT r8 #1).

``lsh_verified_pairs(probe_predicate=...)`` pushes a "near-dups OF this
subset" restriction below the band-bucket pair explode — the
decontamination shape (probe = eval split). Contract under test:

- without collapse: output == {unrestricted pairs with >= 1 probe member},
  exactly;
- with collapse_exact_dups: output ⊇ that set and ⊆ the unrestricted
  output (restriction applies at duplicate-group granularity), so a
  caller keeping only probe-touching pairs — as decontaminate does — gets
  results identical to filtering the unrestricted graph;
- the vector collapse algebra itself (now with the salted intra-group
  expansion) stays a pure optimization: byte-equal to collapse=False.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyrecount_spark.operators.similarity import lsh_verified_pairs

KW = dict(num_planes=16, band_size=2, dim=8)


@pytest.fixture(scope="module")
def dup_heavy(spark):
    """~60 vectors, dim 8: exact-duplicate groups of sizes 12/7/4/2 plus
    singletons; plenty of cross-group near-dup mass at threshold 0.4."""
    base = [
        [1.0, 0.2, 0.0, 0.1, 0.0, 0.3, 0.0, 0.0],
        [0.9, 0.3, 0.1, 0.0, 0.1, 0.2, 0.0, 0.1],
        [0.0, 1.0, 0.2, 0.0, 0.3, 0.0, 0.1, 0.0],
        [0.1, 0.9, 0.3, 0.1, 0.2, 0.1, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.4, 0.0, 0.0, 0.2, 0.1],
        [-0.5, 0.1, 0.0, 0.9, 0.2, 0.0, 0.0, 0.3],
    ]
    sizes = [12, 7, 4, 2, 1, 1]
    rows, vid = [], 0
    for pattern, size in zip(base, sizes):
        for _ in range(size):
            rows.append((vid, pattern))
            vid += 1
    # a few more singletons angled between the clusters
    for i, mix in enumerate([(0, 1), (1, 2), (0, 3)]):
        a, b = base[mix[0]], base[mix[1]]
        rows.append((vid + i, [round((x + y) / 2, 3) for x, y in zip(a, b)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _pairs(df) -> dict[tuple[int, int], float]:
    return {(r.id_a, r.id_b): r.cos_sim for r in df.collect()}


def test_probe_restriction_exact_without_collapse(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    probe = F.col("vec_id") % 10 == 0
    full = _pairs(lsh_verified_pairs(emb, 0.4))
    got = _pairs(lsh_verified_pairs(emb, 0.4, probe_predicate=probe))
    want = {p: s for p, s in full.items() if p[0] % 10 == 0 or p[1] % 10 == 0}
    assert got == want
    assert want, "degenerate fixture: no probe-touching pairs at all"


def test_probe_restriction_contract_with_collapse(spark, dup_heavy):
    probe = F.col("vec_id") % 10 == 0
    full = _pairs(lsh_verified_pairs(dup_heavy, 0.4, **KW, collapse_exact_dups=True))
    got = _pairs(
        lsh_verified_pairs(
            dup_heavy, 0.4, **KW, collapse_exact_dups=True, probe_predicate=probe
        )
    )
    touching = {p: s for p, s in full.items() if p[0] % 10 == 0 or p[1] % 10 == 0}
    assert set(touching) <= set(got) <= set(full)
    for p, s in got.items():
        assert s == full[p]
    # the decontamination consumer: exactly-one-probe pairs are identical
    # whether computed from the restricted or the unrestricted graph
    decon = {p: s for p, s in got.items() if (p[0] % 10 == 0) != (p[1] % 10 == 0)}
    want = {p: s for p, s in full.items() if (p[0] % 10 == 0) != (p[1] % 10 == 0)}
    assert decon == want
    assert want, "degenerate fixture: no cross-split pairs"


def test_vector_collapse_equals_uncollapsed(spark, dup_heavy):
    """collapse_exact_dups (incl. the salted intra-group expansion) is a
    pure optimization: byte-equal pair set to the un-collapsed pipeline."""
    plain = _pairs(lsh_verified_pairs(dup_heavy, 0.4, **KW))
    collapsed = _pairs(
        lsh_verified_pairs(dup_heavy, 0.4, **KW, collapse_exact_dups=True)
    )
    assert plain == collapsed
    assert len(plain) > 100, "fixture should produce a dense edge set"


def test_probe_degenerate_envelopes(spark, dup_heavy):
    """probe=False everywhere -> empty; probe=True everywhere -> the full
    unrestricted graph (both with and without collapse)."""
    full = _pairs(lsh_verified_pairs(dup_heavy, 0.4, **KW))
    for collapse in (False, True):
        none = lsh_verified_pairs(
            dup_heavy, 0.4, **KW, collapse_exact_dups=collapse,
            probe_predicate=F.lit(False),
        )
        assert none.count() == 0
        all_p = _pairs(
            lsh_verified_pairs(
                dup_heavy, 0.4, **KW, collapse_exact_dups=collapse,
                probe_predicate=F.lit(True),
            )
        )
        assert all_p == full


def test_text_probe_restriction_contract(spark):
    """Text twin (verified_jaccard_edges probe_predicate): exact
    probe-touching subset without collapse; bracketed + touching-filter
    identical under collapse."""
    from pyrecount_spark.operators.dedup import verified_jaccard_edges

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    kw = dict(n=3, num_perm=16, band_size=2, threshold=0.2)
    probe = F.col("doc_id") % 10 == 0

    def pairs(df):
        return {(r.id_a, r.id_b): r.jaccard for r in df.collect()}

    full = pairs(verified_jaccard_edges(docs, "text", "doc_id", **kw))
    got = pairs(
        verified_jaccard_edges(docs, "text", "doc_id", **kw, probe_predicate=probe)
    )
    touching = {p: j for p, j in full.items() if p[0] % 10 == 0 or p[1] % 10 == 0}
    assert got == touching
    got_c = pairs(
        verified_jaccard_edges(
            docs, "text", "doc_id", **kw,
            collapse_exact_dups=True, probe_predicate=probe,
        )
    )
    assert set(touching) <= set(got_c) <= set(full)
    assert {p: j for p, j in got_c.items()
            if p[0] % 10 == 0 or p[1] % 10 == 0} == touching


def test_probe_guard_bounds_actual_explode_size(spark):
    """The probe guard bounds the ACTUAL explode (|probes| × (|ids|−1))
    against the pair budget the unrestricted guard permits
    (max_bucket_docs choose 2), not bucket cardinality (round-10, ADVICE
    r9 #4). Three pins: (a) a mega bucket with NO probe member enumerates
    zero pairs and is exempt INTRINSICALLY — no filter-order-dependent
    short-circuit for CombineFilters to rewrite away; (b) a SPARSELY
    probed mega bucket (1 probe × 19 docs = 19 pairs ≤ budget 28) now
    completes — the incremental-dedup shape a cardinality guard wrongly
    aborted; (c) a probe-DENSE bucket whose enumeration exceeds the
    budget (2 × 19 = 38 > 28) still trips the loud error."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from pyrecount_spark.operators.dedup import probe_restricted_candidate_pairs

    rows = [(i, 0, "mega", False) for i in range(20)]
    rows += [(100, 1, "ok", True), (101, 1, "ok", False)]
    buckets = spark.createDataFrame(rows, ["doc_id", "band", "bucket", "_probe"])
    got = {
        (r.id_a, r.id_b)
        for r in probe_restricted_candidate_pairs(
            buckets, "doc_id", max_bucket_docs=8
        ).collect()
    }
    assert got == {(100, 101)}

    sparse_probed_mega = buckets.withColumn(
        "_probe", F.col("_probe") | (F.col("doc_id") == 0)
    )
    got = {
        (r.id_a, r.id_b)
        for r in probe_restricted_candidate_pairs(
            sparse_probed_mega, "doc_id", max_bucket_docs=8
        ).collect()
    }
    assert got == {(0, i) for i in range(1, 20)} | {(100, 101)}

    dense_probed_mega = buckets.withColumn(
        "_probe", F.col("_probe") | (F.col("doc_id") <= 1)
    )
    with pytest.raises(SparkRuntimeException, match="pair budget"):
        probe_restricted_candidate_pairs(
            dense_probed_mega, "doc_id", max_bucket_docs=8
        ).collect()


def test_auto_lsh_banding_derivation(spark):
    """Corpus-scaled banding pins (round-10, VERDICT r9 #1): the committed
    corpora all resolve to the historical (32, 4, 4096); the 300k probe
    corpus resolves to (64, 8, 4688) — completing where pinned 32/4
    guard-tripped; boundaries are integer-exact (no float log2); and the
    DuckDB oracle's derivation expression resolves identically at every
    one of those sizes (engine/oracle lockstep)."""
    import duckdb

    from pyrecount_spark.operators.similarity import auto_lsh_banding

    pins = {
        500: (32, 4, 4096),      # sf0.001 / sf0.01
        2000: (32, 4, 4096),     # sf0.1
        3000: (32, 4, 4096),     # advsf0.1
        30000: (32, 4, 7500),    # advsf1 (guard 4*ceil(30000/16))
        32768: (32, 4, 8192),    # exact boundary: still band 4
        32769: (40, 5, 4100),    # one past: band 5 (guard 4*ceil(32769/32))
        300000: (64, 8, 4688),   # the probe corpus = the r9-measured 64/8
        1 << 27: (128, 16, 8192),   # the documented oracle literal cap
    }
    for n, want in pins.items():
        assert auto_lsh_banding(n) == want, (n, auto_lsh_banding(n), want)
        (duck_bs,) = duckdb.sql(
            f"SELECT GREATEST(4, LEAST(16, LENGTH(BIN({n}::BIGINT - 1)) - 11))"
        ).fetchone()
        assert duck_bs == want[1], (n, duck_bs, want[1])


def test_auto_banding_equals_explicit_at_driver_sf(spark):
    """num_planes=None (corpus-derived) must be byte-identical to the
    explicit historical 32/4/4096 at a committed corpus — the 'driver-SF
    results unchanged' half of the derivation contract."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    explicit = _pairs(
        lsh_verified_pairs(emb, 0.4, num_planes=32, band_size=4, dim=64)
    )
    auto = _pairs(
        lsh_verified_pairs(
            emb, 0.4, num_planes=None, band_size=None, dim=64, max_bucket_docs=None
        )
    )
    assert explicit == auto and explicit
