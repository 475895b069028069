"""Adversarial-corpus rehearsal (round-8 verdict item #1).

Every green number through round 7 ran on the driver's benign uniform
corpus. These tests run the dedup/text machinery against the deterministic
adversarial generator (scripts/gen_corpus.py): heavy exact-duplicate mass,
Zipf-skewed tokens/keys, and mixed-script Unicode.

Three layers:
1. Generator-contract tests (no Spark): the corpus really has the claimed
   adversarial shape — otherwise the downstream "passes on adversarial
   data" evidence is hollow.
2. Guard-trip + recovery at integration scale: the LSH mega-bucket guard
   RAISES on a >4096 exact-duplicate group, and the collapse_exact_dups
   pipeline completes on the same corpus with the exact expected intra-
   group edge mass (full cell-exact oracle evidence for the generated
   corpora lives in ADVERSARIAL_r8.json, produced by scripts/check_oracle
   on testdata_gen/adv — same harness as the driver gate).
3. Unicode engine agreement on corpus-shaped data: Spark and DuckDB agree
   on tokenization/shingling/sha256 over the generator's mixed-script
   slice (the hypothesis property tests proved the envelope on synthetic
   strings; this proves it holds on corpus-shaped documents).
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from gen_corpus import (  # noqa: E402
    gen_documents_adversarial,
    gen_documents_guard,
    gen_events,
)


@pytest.fixture(scope="module")
def adv_docs():
    return gen_documents_adversarial(3000, seed=8)


# ---------------------------------------------------------------------------
# 1. Generator contract
# ---------------------------------------------------------------------------
def test_adversarial_corpus_shape(adv_docs):
    texts = adv_docs.column("text").to_pylist()
    n = len(texts)
    dup_rows = n - len(set(texts))
    assert 0.25 <= dup_rows / n <= 0.45, f"dup mass {dup_rows}/{n}"
    # Zipf-skewed sources: the hot source carries a dominant share
    sources = adv_docs.column("source").to_pylist()
    top = max(sources.count(s) for s in set(sources))
    assert top / n > 0.35, "source skew missing"
    # mixed scripts present, including non-BMP and ZWJ sequences
    blob = " ".join(texts)
    assert any("Ͱ" <= c <= "Ͽ" for c in blob), "no Greek"
    assert any("Ѐ" <= c <= "ӿ" for c in blob), "no Cyrillic"
    assert any("一" <= c <= "鿿" for c in blob), "no CJK"
    assert any("가" <= c <= "힣" for c in blob), "no Hangul"
    assert any("؀" <= c <= "ۿ" for c in blob), "no Arabic (RTL)"
    assert any(ord(c) > 0xFFFF for c in blob), "no astral codepoints"
    assert "‍" in blob, "no ZWJ sequences"
    # NFC/NFD twin tokens: byte-distinct, visually identical
    toks = set(blob.split())
    nfd_twins = [
        t for t in toks
        if unicodedata.normalize("NFC", t) != t
    ]
    assert nfd_twins, "no NFD spellings"
    assert any(unicodedata.normalize("NFC", t) in toks for t in nfd_twins), (
        "NFC twin of an NFD token missing"
    )
    # pinned engine divergences must NOT appear (they would invalidate
    # oracle comparisons by design, not by bug)
    for bad in ("İ", "\x0b", "\xa0", "　"):
        assert bad not in blob
    # duplicate groups are scattered across the id space, not clustered
    first = texts.index(next(t for t in texts if texts.count(t) > 50))
    same = [i for i, t in enumerate(texts) if t == texts[first]]
    assert max(same) - min(same) > n // 2, "dup group id-clustered"


def test_adversarial_events_skew():
    ev = gen_events(20000, 500, seed=8, adversarial=True)
    users = ev.column("user_id").to_pylist()
    top = max(users.count(u) for u in set(users))
    assert top / len(users) > 0.06, "user skew missing"
    types = set(ev.column("event_type").to_pylist())
    assert {"click", "purchase"} <= types  # stream-stream join queries need both


def test_generator_deterministic(adv_docs):
    again = gen_documents_adversarial(3000, seed=8)
    assert adv_docs.equals(again)
    other = gen_documents_adversarial(3000, seed=9)
    assert not adv_docs.equals(other)


# ---------------------------------------------------------------------------
# 2. Mega-bucket guard trips; collapse recovery completes (integration scale)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def guard_docs_df(spark):
    # 1200-doc corpus with a 700-doc exact-dup mega group: big enough that
    # the un-collapsed k²/2 explode is a real (245k-pair) single-task blob,
    # small enough for CI; the guard threshold is lowered to a value the
    # group exceeds, mirroring 4200 > 4096 at artifact scale
    tbl = gen_documents_guard(1200, mega=700, seed=8)
    return spark.createDataFrame(tbl.to_pandas())


def test_guard_trips_on_mega_group(spark, guard_docs_df):
    from pyrecount_spark.operators.dedup import verified_jaccard_edges

    edges = verified_jaccard_edges(
        guard_docs_df, "text", "doc_id", n=3, num_perm=16, band_size=2,
        threshold=0.2, max_bucket_docs=512,
    )
    with pytest.raises(Exception, match="max_bucket_docs"):
        edges.count()


def test_collapse_recovery_completes_and_counts(spark, guard_docs_df):
    from pyspark.sql import functions as F

    from pyrecount_spark.operators.dedup import verified_jaccard_edges

    edges = verified_jaccard_edges(
        guard_docs_df, "text", "doc_id", n=3, num_perm=16, band_size=2,
        threshold=0.2, max_bucket_docs=512, collapse_exact_dups=True,
    )
    mega = 700
    intra = mega * (mega - 1) // 2
    stats = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("jaccard") == 1.0).cast("long")).alias("n_exact"),
    ).collect()[0]
    # every intra-mega pair present at jaccard 1.0; cross edges non-negative
    assert stats["n_exact"] >= intra
    assert stats["n"] >= intra
    # and the pair set is sane: no self-pairs, ids ordered
    bad = edges.filter(F.col("id_a") >= F.col("id_b")).count()
    assert bad == 0


def test_collapse_equals_uncollapsed_when_guard_not_tripped(spark):
    """On a corpus where the guard does NOT trip, collapse must be a pure
    no-op algebra: byte-identical edges (the adversarial corpus' dup groups
    are below the cap, so this is the equivalence the ADVERSARIAL_r8
    artifact relies on)."""
    from pyrecount_spark.operators.dedup import verified_jaccard_edges

    tbl = gen_documents_adversarial(800, seed=8)
    df = spark.createDataFrame(tbl.to_pandas())
    kw = dict(n=3, num_perm=16, band_size=2, threshold=0.2)
    plain = {
        (r.id_a, r.id_b): r.jaccard
        for r in verified_jaccard_edges(df, "text", "doc_id", **kw).collect()
    }
    collapsed = {
        (r.id_a, r.id_b): r.jaccard
        for r in verified_jaccard_edges(
            df, "text", "doc_id", collapse_exact_dups=True, **kw
        ).collect()
    }
    assert plain == collapsed


# ---------------------------------------------------------------------------
# 3. Unicode engine agreement on corpus-shaped documents
# ---------------------------------------------------------------------------
def test_unicode_slice_engine_agreement(spark, adv_docs):
    """Tokens, 3-shingles, and sha256 content hashes agree cell-exactly
    between Spark and DuckDB over the generator's mixed-script documents —
    the primitives every dedup/text oracle comparison stands on."""
    import duckdb
    from pyspark.sql import functions as F

    pdf = adv_docs.to_pandas()
    uni = pdf[pdf["lang"].isin(["el", "ru", "zh", "ko", "ar"])][
        ["doc_id", "text"]
    ].reset_index(drop=True)
    assert len(uni) >= 100
    df = spark.createDataFrame(uni)

    s_hash = {
        r.doc_id: r.h
        for r in df.select("doc_id", F.sha2("text", 256).alias("h")).collect()
    }
    s_sh = {
        (r.doc_id, r.shingle)
        for r in df.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(trim(text), '\\\\s+')) - 2),"
                    " i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i, 3)))"
                )
            ).alias("shingle"),
        ).distinct().collect()
    }

    con = duckdb.connect()
    con.register("docs", uni)
    d_hash = dict(con.sql("SELECT doc_id, sha256(text) FROM docs").fetchall())
    d_sh = set(
        con.sql(
            """
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM docs
            ), pos AS (
              SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS i FROM toks
            )
            SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] FROM pos
            """
        ).fetchall()
    )
    assert s_hash == d_hash
    assert s_sh == d_sh


# ---------------------------------------------------------------------------
# Late-data corpus contract (round-12): the streaming_late_* oracles rely on
# three generator invariants — if any drifts, "cell-exact incl. drops"
# evidence is hollow, so they are pinned here without Spark.
# ---------------------------------------------------------------------------
def test_late_events_corpus_contract(tmp_path):
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from gen_corpus import write_events_with_late

    ev = gen_events(5000, 300, seed=8, adversarial=True)
    late = write_events_with_late(str(tmp_path), ev, 500, 300, seed=8)

    # 1. Late rows are identifiable in SQL: ids exactly -n..-1, and
    #    events.parquet is the on-time/late union (batch queries and the
    #    DuckDB oracle see every row).
    union = pq.read_table(tmp_path / "events.parquet")
    ids = union.column("event_id").to_pylist()
    assert sorted(i for i in ids if i < 0) == list(range(-500, 0))
    assert union.num_rows == 5500

    # 2. The 4h margin: every late ts sits more than any registered
    #    watermark delay (<= 2h) plus the widest window/range (1h) below
    #    max(on-time ts) — no late row can straddle a watermark cut.
    on_max = pc.max(ev.column("ts")).value
    late_max = pc.max(late.column("ts")).value
    assert on_max - late_max >= 4 * 3600 * 1_000_000

    # 3. Arrival order: three files (bulk / last-60s tail / late) with
    #    strictly ascending mtimes, because the stateful late filter uses
    #    the watermark of batch N-1 — a 2-file split drops nothing.
    sdir = tmp_path / "events_stream"
    parts = sorted(os.listdir(sdir))
    assert parts == ["part-00000.parquet", "part-00001.parquet",
                     "part-00002.parquet"]
    mtimes = [os.path.getmtime(sdir / p) for p in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    bulk = pq.read_table(sdir / parts[0])
    tail = pq.read_table(sdir / parts[1])
    lt = pq.read_table(sdir / parts[2])
    assert bulk.num_rows + tail.num_rows == 5000 and lt.num_rows == 500
    # the tail holds exactly the on-time rows in the final 60 s, so
    # max(bulk ts) already pins the watermark within 60 s of the final cut
    assert pc.min(tail.column("ts")).value > on_max - 60 * 1_000_000
    assert pc.max(bulk.column("ts")).value <= on_max - 60 * 1_000_000
    assert pc.max(tail.column("ts")).value == on_max
