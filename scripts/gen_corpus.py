#!/usr/bin/env python3
"""Deterministic synthetic-corpus generator (adversarial + scale flavors).

Every green number through round 7 ran on the driver's BENIGN uniform
corpus: no duplicate mass, no Zipf skew, single-script ASCII text. This
generator produces the corpora that rehearse the failure modes the engine
claims to handle at 100 TB, with the SAME table schemas as
/root/testdata/sf*/ so every registered query (and its DuckDB oracle) runs
unchanged against the generated directory:

- ``adversarial``: 30-40 % exact-duplicate mass in Zipf-sized groups
  (largest group capped at 170 docs so the graph family's recursive-CTE
  oracles stay feasible — the closure join materializes ~|component|² ×
  degree intermediate rows, so a 400-doc cap already ground DuckDB past
  10 minutes; the >4096 mega-group case lives in the ``guard`` flavor),
  near-duplicate mutation clusters, Zipf-skewed token vocabulary, skewed
  source/lang/user keys (drives salting + AQE skew handling), and a
  mixed-script Unicode slice (Greek/Cyrillic/CJK/Hangul/Arabic/emoji-ZWJ/
  NFC-vs-NFD) built from caseless/lowercase code points inside the proven
  Spark-DuckDB agreement envelope (tests/test_properties.py — İ, U+000B,
  nbsp/U+3000 excluded as pinned divergences).
- ``guard``: a small corpus whose single exact-duplicate mega-group
  (default 4200 > max_bucket_docs=4096) TRIPS the LSH mega-bucket guard —
  the integration-scale rehearsal for ``collapse_exact_dups`` recovery.
  The template is 8 words so the un-collapsed DuckDB oracle's verify join
  stays bounded (~6 shingles x C(4200,2) pairs).
- ``uniform``: the driver corpus' own distributions (31-word vocabulary,
  10-100 words/doc, 20 uniform sources, driver lang mix, 30-day event
  window) at ``--scale`` x the driver sf0.1 sizes — extends the scaling
  curves one more decade (sf1-equivalent at --scale 10) for the heavy
  query family. TPC-H tables are symlinked from --link-base per the
  round-7 verdict (only documents/embeddings/events need the extra
  decade).

Determinism: every random stream is a numpy PCG64 seeded from
sha256(seed, section) — content-addressed, no global RNG state, identical
output for identical flags on any platform. Output parquet matches the
driver's physical types (embedding list<float32>, ts timestamp[us]).

Usage (flag/flavor pairing is STRICT — any flag the chosen flavor does
not consume is rejected, so the lines below are exhaustive per flavor):
  python scripts/gen_corpus.py OUT_DIR --flavor adversarial [--docs 15000]
      [--embeddings 3000] [--events 200000] [--users 3000] [--vocab 20000]
      [--late-events N] [--seed 8] [--link-base /root/testdata/sf0.1]
  python scripts/gen_corpus.py OUT_DIR --flavor guard [--mega 4200]
  python scripts/gen_corpus.py OUT_DIR --flavor uniform --scale 10
  python scripts/gen_corpus.py OUT_DIR --flavor tpch_replica --scale 10
  python scripts/gen_corpus.py OUT_DIR --flavor tpch_value --scale 10

``--late-events N`` (adversarial only) additionally emits an
``events_stream/`` directory with the three-file arrival split (bulk
on-time / last-60s tail / late rows with negative ids and ts at least
4 h behind the on-time max) that the streaming_late_* family drains;
the N late rows are also appended to events.parquet so batch oracles
see the full event mass.
"""

from __future__ import annotations

import hashlib
import os
import sys
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TPCH_TABLES = "region nation customer supplier part orders lineitem".split()
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _rng(seed: int, section: str) -> np.random.Generator:
    h = hashlib.sha256(f"{seed}:{section}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "big")))


def _zipf_p(v: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, v + 1) + 2.7, s)
    return p / p.sum()


# ---------------------------------------------------------------------------
# Vocabularies
# ---------------------------------------------------------------------------
def _latin_vocab(v: int) -> list[str]:
    """v synthetic lowercase words + the lang-id stopword inventory (so the
    language-ID family sees realistic class signals, not only noise)."""
    from pyrecount_spark.operators.text import LANG_STOPWORDS

    base: list[str] = []
    seen: set[str] = set()
    for lang_words in LANG_STOPWORDS.values():
        for w in lang_words:
            if w not in seen:
                seen.add(w)
                base.append(w)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    i = 0
    while len(base) < v:
        n, w = i, []
        for _ in range(3 + (i % 6)):
            w.append(alpha[n % 26])
            n //= 26
        tok = "".join(w)
        if tok not in seen:
            seen.add(tok)
            base.append(tok)
        i += 1
    return base[:v]


def _script_vocabs(seed: int) -> dict[str, list[str]]:
    """Per-script word lists from caseless/lowercase code points only (no
    uppercase -> no Java SpecialCasing divergence; pinned-divergent chars
    İ, \\x0B, nbsp, U+3000 never appear)."""
    rng = _rng(seed, "scripts")

    def words(alphabet: str, n_words: int, lo: int = 3, hi: int = 8) -> list[str]:
        chars = list(alphabet)
        out = []
        for _ in range(n_words):
            k = int(rng.integers(lo, hi + 1))
            out.append("".join(chars[int(i)] for i in rng.integers(0, len(chars), k)))
        return out

    greek = words("αβγδεζηθικλμνξοπρστυφχψω", 60)
    cyr = words("абвгдежзиклмнопрстуфхцчшщыэюя", 60)
    cjk = words("漢字水火木金土日月山川人大小中上下左右前後内外東西南北生活工作学習天地風雨雪雲電車道路橋市町村国家語言文字書読写聞話食飲行来帰入出立座歩走飛泳思考知識意味時間空間年月週曜朝昼夜春夏秋冬", 60, 1, 4)
    hangul = words("가나다라마바사아자차카타파하거너더러머버서어저처커터퍼허고노도로모보소오조초코토포호구누두루무부수우주추쿠투푸후그느드르므브스으즈츠크트프흐기니디리미비시이지치키티피히", 60, 1, 4)
    arabic = words("ابتثجحخدذرزسشصضطظعغفقكلمنهوي", 50)
    # NFC/NFD twin tokens: byte-distinct spellings of the same visual text —
    # near-dup-shaped for shingles, distinct for sha256 (exactly the trap a
    # real multilingual corpus springs on hash-based dedup)
    accents_nfc = ["café", "naïve", "résumé", "jalapeño", "señora", "über"]
    accents = [unicodedata.normalize("NFC", w) for w in accents_nfc]
    accents += [unicodedata.normalize("NFD", w) for w in accents_nfc]
    emoji = ["👩‍👧", "👨‍👩‍👧‍👦", "🙂", "🚀", "🧪",
             "🏳️‍🌈", "𝔘𝔫𝔦", "x̣́"]
    return {"el": greek, "ru": cyr, "zh": cjk, "ko": hangul, "ar": arabic,
            "mix": accents + emoji}


# ---------------------------------------------------------------------------
# Documents
# ---------------------------------------------------------------------------
def _dup_group_sizes(total: int, cap: int, rng: np.random.Generator) -> list[int]:
    """Zipf-ish duplicate-group sizes summing to ~total, each <= cap."""
    sizes = []
    left = total
    rank = 1
    while left > 1:
        s = min(cap, max(2, int(total / (2.2 * rank ** 1.2))), left)
        if s < 2:
            break
        sizes.append(s)
        left -= s
        rank += 1
    return sizes


def gen_documents_adversarial(n: int, seed: int, vocab_size: int = 20000) -> pa.Table:
    """``vocab_size`` defaults to a fixed 20k; scaling-curve corpora pass
    ~4x the doc count (Heaps-ish vocabulary growth) — with a FIXED
    vocabulary, shingle document frequencies grow linearly in corpus size
    and every shingle-join op becomes quadratic BY CORPUS CONSTRUCTION
    (the round-7 fuzzy_match lesson), which would measure the corpus, not
    the plans."""
    rng = _rng(seed, "docs")
    v = vocab_size
    vocab = np.array(_latin_vocab(v))
    zp = _zipf_p(v)
    scripts = _script_vocabs(seed)

    n_unicode = int(n * 0.06)
    n_neardup = int(n * 0.08)
    dup_mass = int(n * 0.35)
    n_unique = n - n_unicode - n_neardup - dup_mass

    def latin_text(n_words: int, r: np.random.Generator) -> str:
        return " ".join(vocab[r.choice(v, n_words, p=zp)])

    texts: list[str] = []
    langs: list[str] = []

    # unique latin docs, lognormal-ish lengths 10..300 words
    lens = np.clip(np.exp(rng.normal(3.7, 0.7, n_unique)), 10, 300).astype(int)
    idx_all = rng.choice(v, int(lens.sum()), p=zp)
    pos = 0
    lang_p = {"en": 0.46, "de": 0.18, "fr": 0.18, "es": 0.18}
    lang_draw = rng.choice(list(lang_p), n_unique, p=list(lang_p.values()))
    for i in range(n_unique):
        texts.append(" ".join(vocab[idx_all[pos : pos + lens[i]]]))
        langs.append(str(lang_draw[i]))
        pos += lens[i]

    # exact-duplicate groups (≤ cap=170 — see module docstring)
    sizes = _dup_group_sizes(dup_mass, 170, rng)
    for g, size in enumerate(sizes):
        r = _rng(seed, f"dupgroup:{g}")
        n_words = int(r.integers(6, 40)) if g % 3 else int(r.integers(4, 9))
        template = latin_text(n_words, r)
        lang = ["en", "de", "fr", "es"][g % 4]
        texts.extend([template] * size)
        langs.extend([lang] * size)

    # near-duplicate clusters: base + 1-4 mutated copies
    made = 0
    c = 0
    while made < n_neardup:
        r = _rng(seed, f"neardup:{c}")
        base_words = list(vocab[r.choice(v, int(r.integers(15, 80)), p=zp)])
        k = min(int(r.integers(2, 6)), n_neardup - made)
        texts.append(" ".join(base_words))
        langs.append("en")
        made += 1
        for m in range(k - 1):
            if made >= n_neardup:
                break
            w = list(base_words)
            for _ in range(int(r.integers(1, 4))):
                op = int(r.integers(0, 3))
                p2 = int(r.integers(0, len(w)))
                if op == 0 and len(w) > 4:
                    w.pop(p2)
                elif op == 1:
                    w[p2] = str(vocab[int(r.integers(0, v))])
                else:
                    w.insert(p2, str(vocab[int(r.integers(0, v))]))
            texts.append(" ".join(w))
            langs.append("en")
            made += 1
        c += 1

    # mixed-script Unicode slice (incl. 3 small exact-dup unicode groups)
    keys = ["el", "ru", "zh", "ko", "ar"]
    r = _rng(seed, "unicode")
    uni_left = n_unicode
    for g in range(3):
        size = min(30, uni_left)
        sk = keys[g % len(keys)]
        wl = scripts[sk] + scripts["mix"]
        t = " ".join(wl[int(i)] for i in r.integers(0, len(wl), int(r.integers(8, 20))))
        texts.extend([t] * size)
        langs.extend([sk] * size)
        uni_left -= size
    for i in range(uni_left):
        sk = keys[int(r.integers(0, len(keys)))]
        wl = scripts[sk] + scripts["mix"] + list(vocab[:50])
        n_words = int(r.integers(8, 60))
        t = " ".join(wl[int(j)] for j in r.integers(0, len(wl), n_words))
        texts.append(t)
        langs.append(sk)

    return _finish_documents(texts, langs, seed)


def gen_documents_guard(n: int, mega: int, seed: int) -> pa.Table:
    """One exact-duplicate mega-group of ``mega`` docs (> the 4096 LSH
    bucket guard) + unique filler. Short 8-word template: the un-collapsed
    oracle must verify C(mega,2) pairs, so shingles-per-doc bounds its cost."""
    rng = _rng(seed, "guard")
    v = 5000
    vocab = np.array(_latin_vocab(v))
    zp = _zipf_p(v)
    template = " ".join(vocab[_rng(seed, "guard-template").choice(v, 8, p=zp)])
    texts = [template] * mega
    langs = ["en"] * mega
    for i in range(n - mega):
        r = _rng(seed, f"guard-doc:{i}")
        texts.append(" ".join(vocab[r.choice(v, int(r.integers(10, 60)), p=zp)]))
        langs.append(["en", "de", "fr", "es"][i % 4])
    return _finish_documents(texts, langs, seed)


def gen_documents_uniform(n: int, seed: int) -> pa.Table:
    """Driver-corpus process family: 31-word vocabulary, uniform 10-100
    words/doc, ~5 % docs get a trailing 'dup' marker, driver lang mix,
    20 uniform sources."""
    rng = _rng(seed, "udocs")
    vocab = np.array(
        "key agg row scan slow fast table value part hash batch window spark "
        "order data column join merge group filter query sort big small the "
        "customer vector line stream a".split()
    )
    lens = rng.integers(10, 101, n)
    idx = rng.integers(0, len(vocab), int(lens.sum()))
    texts = []
    pos = 0
    dup_mark = rng.random(n) < 0.051
    for i in range(n):
        t = " ".join(vocab[idx[pos : pos + lens[i]]])
        if dup_mark[i]:
            t += " dup"
        texts.append(t)
        pos += lens[i]
    langs = [str(x) for x in rng.choice(
        ["en", "zh", "es", "fr", "de"], n, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    )]
    return _finish_documents(texts, langs, seed, skew_source=False)


def _finish_documents(
    texts: list[str], langs: list[str], seed: int, skew_source: bool = True
) -> pa.Table:
    n = len(texts)
    # content-addressed shuffle: dup-group members scatter across the id
    # space (and thus across input partitions) instead of clustering
    order = sorted(
        range(n),
        key=lambda i: hashlib.sha256(f"{seed}:{i}:{texts[i][:64]}".encode()).digest(),
    )
    texts = [texts[i] for i in order]
    langs = [langs[i] for i in order]
    rng = _rng(seed, "sources")
    if skew_source:
        # Zipf-skewed source: src0 carries ~45 % of the corpus
        p = np.array([0.45, 0.14, 0.08] + [0.33 / 17] * 17)
        sources = [f"src{int(i)}" for i in rng.choice(20, n, p=p / p.sum())]
    else:
        sources = [f"src{int(i)}" for i in rng.integers(0, 20, n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------
def gen_embeddings(n: int, seed: int, dim: int = 64, adversarial: bool = True) -> pa.Table:
    rng = _rng(seed, "emb")
    if adversarial:
        k = 20
        centers = rng.normal(0, 1, (k, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        # Zipf cluster sizes; ~25 % of vectors are EXACT copies of their
        # cluster exemplar (semantic-duplicate mass for SemDeDup/ANN)
        cp = _zipf_p(k, 1.0)
        assign = rng.choice(k, n, p=cp)
        noise = rng.normal(0, 0.15, (n, dim))
        vecs = centers[assign] + noise
        dup_mask = rng.random(n) < 0.25
        exemplar = centers[assign] + 0.05 * rng.normal(0, 1, (k, dim))[assign]
        vecs[dup_mask] = exemplar[dup_mask]
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        labels = (assign % 10).astype(np.int32)
    else:
        vecs = rng.normal(0, 1, (n, dim))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n).astype(np.int32)
    emb = pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# Events
# ---------------------------------------------------------------------------
def gen_events(
    n: int,
    users: int,
    seed: int,
    adversarial: bool = True,
    section: str = "events",
    span_us: int | None = None,
    id_start: int = 0,
) -> pa.Table:
    rng = _rng(seed, section)
    start = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = np.int64(span_us if span_us is not None else 30 * 24 * 3600 * 1_000_000)
    if adversarial:
        # Zipf users: top user ~10 % of all events (the salting rehearsal)
        p = _zipf_p(users, 1.05)
        user = rng.choice(users, n, p=p).astype(np.int64)
        # 70 % uniform times, 30 % in per-user 10-minute bursts
        ts = start + (rng.random(n) * span).astype(np.int64)
        burst = rng.random(n) < 0.3
        nb = int(burst.sum())
        burst_anchor = start + (
            rng.random(nb) * (span - 600_000_000)
        ).astype(np.int64)
        ts[burst] = burst_anchor + (rng.random(nb) * 600_000_000).astype(np.int64)
        etype = rng.choice(EVENT_TYPES, n, p=[0.45, 0.3, 0.1, 0.05, 0.1])
    else:
        user = rng.integers(0, users, n).astype(np.int64)
        ts = start + (rng.random(n) * span).astype(np.int64)
        etype = rng.choice(EVENT_TYPES, n)
    value = np.round(np.minimum(rng.exponential(50.0, n), 560.21), 2)
    props_k = rng.integers(0, 100, n)
    order = np.argsort(ts, kind="stable")
    return pa.table(
        {
            "event_id": pa.array(range(id_start, id_start + n), pa.int64()),
            "ts": pa.array(ts[order], pa.timestamp("us")),
            "user_id": pa.array(user[order], pa.int64()),
            "event_type": pa.array([str(x) for x in etype[order]], pa.string()),
            "value": pa.array(value[order], pa.float64()),
            "props": pa.array(
                [f'{{"k": {int(k)}}}' for k in props_k[order]], pa.string()
            ),
        }
    )


def write_events_with_late(
    out: str, ev: pa.Table, n_late: int, users: int, seed: int
) -> pa.Table:
    """Late-data variant (round-12, VERDICT r11 #2): ``events.parquet``
    holds on-time + late rows (batch queries and the DuckDB oracle see the
    union), and ``events_stream/`` splits the same rows by ARRIVAL order —
    part-00000 = on-time, part-00001 = late — with ascending mtimes so a
    file-source stream with maxFilesPerTrigger=1 processes them as two
    micro-batches and the event-time watermark advances in between.

    Late rows are identifiable in SQL (event_id < 0, ids -n_late..-1) so
    oracle twins can model the drop semantics with a filter on the
    watermark cut that DEGENERATES to a no-op on corpora without late
    rows (every on-time id is >= 0). Their event times are bounded at
    max(on-time ts) - 4 h: more than any registered watermark delay
    (<= 2 h) plus the widest window/range (1 h) below the watermark the
    on-time batch establishes, so every late row is unambiguously
    droppable — no row straddles the cut.

    THREE arrival files, not two: since Spark 3.4 stateful operators
    carry separate late-event and eviction watermarks, and the LATE
    filter of micro-batch N uses the watermark in effect DURING batch
    N-1 (one batch of lag — observed as ``StateStoreSave ... Append, 0,
    <eviction_ms>`` when the late file arrives in batch 1: late filter
    still 0, nothing drops). The on-time tail (last 60 s) therefore
    arrives as its own middle batch, so by the time the late file lands
    in batch 2 its late-filter watermark is max(bulk ts) - delay — past
    every late row. The split is pure arrival plumbing: batch queries
    and oracles read events.parquet and never see it.
    """
    on_max = int(pa.compute.max(ev.column("ts")).value)
    start = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    late_span = on_max - start - 4 * 3600 * 1_000_000
    assert late_span > 0, "on-time window too short for a 4h late margin"
    late = gen_events(
        n_late, users, seed, adversarial=True,
        section="late_events", span_us=late_span, id_start=-n_late,
    )
    pq.write_table(pa.concat_tables([ev, late]), f"{out}/events.parquet")
    sdir = f"{out}/events_stream"
    os.makedirs(sdir, exist_ok=True)
    tail_cut = on_max - 60 * 1_000_000
    ts_us = ev.column("ts").cast(pa.int64())
    bulk = ev.filter(pa.compute.less_equal(ts_us, tail_cut))
    tail = ev.filter(pa.compute.greater(ts_us, tail_cut))
    assert tail.num_rows >= 1 and bulk.num_rows >= 1
    parts = [bulk, tail, late]
    for i, t in enumerate(parts):
        f = f"{sdir}/part-{i:05d}.parquet"
        pq.write_table(t, f)
        # deterministic, strictly ascending mtimes: the file stream source
        # processes oldest-first, so arrival order is pinned across regens
        os.utime(f, (1_700_000_000 + 600 * i,) * 2)
    return late


# ---------------------------------------------------------------------------
def gen_tpch_value(out: str, scale: float, seed: int, link_base: str) -> None:
    """Value-distribution-scaled TPC-H corpus (round-10, VERDICT r9 #7).

    ``tpch_replica`` preserves referential integrity and join fan-outs but
    REPEATS every non-key value per replica, so decade curves are blind to
    group-cardinality growth in value domains (distinct prices, dates,
    balances saturate at the base corpus's values). This flavor draws
    FRESH seeded values for every row at ``--scale`` × the driver sf0.1
    row counts, with the driver's own marginals (status/priority/segment/
    brand/type/tax/discount domains, date span, price ranges, ~4.1
    lineitems/order) — continuous domains (prices, balances) now grow
    ~rows and date-grouped cardinalities grow until the calendar
    saturates, exactly the axis the replica decade cannot exercise.
    region/nation are copied from the base (fixed at any real SF);
    documents/embeddings/events are symlinked (only the relational family
    needs this corpus). Deterministic: every stream is PCG64 seeded from
    sha256(seed, section) like every other flavor.
    """
    n_cust = int(15000 * scale)
    n_supp = int(1000 * scale)
    n_part = int(20000 * scale)
    n_ord = int(150000 * scale)

    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{link_base}/{t}.parquet"), f"{out}/{t}.parquet")

    r = _rng(seed, "tpchv_customer")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(r.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(r.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[r.integers(0, 5, n_cust)]),
    }), f"{out}/customer.parquet")

    r = _rng(seed, "tpchv_supplier")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(r.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(r.uniform(-999.99, 9999.99, n_supp), 2),
    }), f"{out}/supplier.parquet")

    r = _rng(seed, "tpchv_part")
    adjs = np.array("blue hot large small shiny dim plain round".split())
    nouns = np.array("anvil bolt gear gizmo plate ring rod widget".split())
    types = np.array("ECONOMY LARGE MEDIUM PROMO SMALL STANDARD".split())
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(
            adjs[r.integers(0, 8, n_part)], " "), nouns[r.integers(0, 8, n_part)])),
        "p_brand": pa.array(np.char.add("Brand#", r.integers(0, 25, n_part).astype(str))),
        "p_type": pa.array(types[r.integers(0, 6, n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(r.uniform(900.0, 1000.0, n_part), 2),
    }), f"{out}/part.parquet")

    # Orders + lineitem stream through ParquetWriter in chunks of at most
    # 15M orders (round-12, for tpchv_sf100's 150M orders / ~600M
    # lineitems: the single-shot path materializes ~50 GB of numpy per
    # table plus arrow copies). Corpora at or below 15M orders take ONE
    # chunk through the ORIGINAL RNG section names, so every previously
    # committed tpchv corpus regenerates byte-identically; larger scales
    # use per-chunk sections ("tpchv_orders:1", ...) — fresh seeded
    # values either way.
    chunk_orders = 15_000_000
    n_chunks = -(-n_ord // chunk_orders)
    base = np.datetime64("1995-01-01", "us")
    day = np.timedelta64(86_400_000_000, "us")
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    total = 0
    ow = lw = None
    try:
        for ci in range(n_chunks):
            o0 = ci * chunk_orders
            n_c = min(chunk_orders, n_ord - o0)
            sfx = "" if n_chunks == 1 else f":{ci}"
            r = _rng(seed, f"tpchv_orders{sfx}")
            odate_days = r.integers(0, 2405, n_c)
            orders_t = pa.table({
                "o_orderkey": pa.array(np.arange(o0, o0 + n_c), pa.int64()),
                "o_custkey": pa.array(r.integers(0, n_cust, n_c)),
                "o_orderstatus": pa.array(
                    np.array(["F", "O", "P"])[r.integers(0, 3, n_c)]
                ),
                "o_totalprice": np.round(r.uniform(1000.0, 500000.0, n_c), 2),
                "o_orderdate": pa.array(base + odate_days * day, pa.timestamp("us")),
                "o_orderpriority": pa.array(prios[r.integers(0, 5, n_c)]),
            })
            if ow is None:
                ow = pq.ParquetWriter(f"{out}/orders.parquet", orders_t.schema)
            ow.write_table(orders_t)
            del orders_t

            r = _rng(seed, f"tpchv_lineitem{sfx}")
            per_order = r.integers(1, 8, n_c)  # avg 4, like the driver's 4.07
            t_c = int(per_order.sum())
            total += t_c
            okeys = np.repeat(np.arange(o0, o0 + n_c), per_order)
            # per-order 1..k line numbers, vectorized
            starts = np.repeat(np.cumsum(per_order) - per_order, per_order)
            linenum = (np.arange(t_c) - starts + 1).astype(np.int32)
            ship = (
                np.repeat(odate_days, per_order) + r.integers(-30, 121, t_c)
            ) * day + base
            line_t = pa.table({
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(r.integers(0, n_part, t_c)),
                "l_suppkey": pa.array(r.integers(0, n_supp, t_c)),
                "l_linenumber": pa.array(linenum),
                "l_quantity": r.integers(1, 51, t_c).astype(np.float64),
                "l_extendedprice": np.round(r.uniform(900.0, 100000.0, t_c), 2),
                "l_discount": np.round(r.integers(0, 11, t_c) * 0.01, 2),
                "l_tax": np.round(r.integers(0, 9, t_c) * 0.01, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[r.integers(0, 3, t_c)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[r.integers(0, 2, t_c)]
                ),
                "l_shipdate": pa.array(ship, pa.timestamp("us")),
            })
            if lw is None:
                lw = pq.ParquetWriter(f"{out}/lineitem.parquet", line_t.schema)
            lw.write_table(line_t)
            del line_t
    finally:
        if ow is not None:
            ow.close()
        if lw is not None:
            lw.close()

    for t in ("documents", "embeddings", "events"):
        _point_symlink(f"{out}/{t}.parquet", f"{link_base}/{t}.parquet")
    print(f"{out}: flavor=tpch_value scale={scale:g} orders={n_ord} lineitem={total}")


def _point_symlink(dst: str, src: str) -> None:
    """Create/repoint ``dst`` as a symlink to ``src``.

    Regeneration hygiene: ``os.path.exists`` is False for BROKEN symlinks
    (the base dir moved → the old guard crashed on os.symlink) and True
    for symlinks into a DIFFERENT old base (→ the old guard silently kept
    a stale, inconsistent corpus). ``lexists`` + repoint handles both; a
    real file at ``dst`` is left alone (never clobber generated data with
    a link)."""
    if os.path.lexists(dst):
        if not os.path.islink(dst):
            return
        if os.readlink(dst) == src:
            return
        os.unlink(dst)
    os.symlink(src, dst)


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = list(sys.argv[1:])

    explicit: set[str] = set()

    def _opt(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            if i + 1 >= len(args):
                print(f"usage: gen_corpus.py OUT_DIR [{name} VALUE] ...")
                raise SystemExit(2)
            val = args[i + 1]
            del args[i : i + 2]
            explicit.add(name)
            return val
        return default

    flavor = _opt("--flavor", "adversarial")
    seed = int(_opt("--seed", "8"))
    scale = float(_opt("--scale", "1"))
    link_base = _opt("--link-base", "/root/testdata/sf0.1")
    mega = int(_opt("--mega", "4200"))
    # Round-13 (docstring-strictness follow-through on ADVICE r11 #5):
    # these four are consumed BEFORE the flavor branch for parsing
    # convenience, so _reject_leftovers alone cannot catch e.g. --mega
    # with --flavor tpch_value — the same silent-misparse class. Validate
    # explicitly-passed globals against the flavors that actually read
    # them (--seed and --link-base: every flavor).
    _GLOBAL_FLAGS_BY_FLAVOR = {
        "adversarial": set(),
        "guard": {"--mega"},
        "uniform": {"--scale"},
        "tpch_value": {"--scale"},
        "tpch_replica": {"--scale"},
    }
    stray = explicit - {"--flavor", "--seed", "--link-base"} - (
        _GLOBAL_FLAGS_BY_FLAVOR.get(flavor, set())
    )
    if stray:
        print(
            f"option(s) {sorted(stray)} not consumed by flavor {flavor!r} "
            "— see the module docstring for the per-flavor usage lines"
        )
        raise SystemExit(2)
    if not args:
        print(__doc__)
        return 2
    if args[0].startswith("--"):
        print(
            f"misplaced option {args[:1]}; OUT_DIR comes first — see the "
            "module docstring for usage"
        )
        raise SystemExit(2)
    out = args[0]

    def _reject_leftovers() -> None:
        """ADVICE r11 #5: after a flavor branch has consumed its flags,
        anything still carrying '--' is either unknown or belongs to a
        DIFFERENT flavor — both are the silent-misparse class (e.g.
        --vocab with --flavor tpch_value would be ignored), so error
        loudly instead. Everything past OUT_DIR must be empty by now."""
        left = args[1:]
        if left:
            print(
                f"option(s)/operand(s) {left} not recognized by flavor "
                f"{flavor!r} — see the module docstring for usage"
            )
            raise SystemExit(2)

    os.makedirs(out, exist_ok=True)

    n_late = 0
    n_users = 0
    if flavor == "adversarial":
        n_docs = int(_opt("--docs", "15000"))
        n_emb = int(_opt("--embeddings", "3000"))
        n_ev = int(_opt("--events", "200000"))
        n_users = int(_opt("--users", "3000"))
        vocab_size = int(_opt("--vocab", "20000"))
        n_late = int(_opt("--late-events", "0"))
        _reject_leftovers()
        docs = gen_documents_adversarial(n_docs, seed, vocab_size=vocab_size)
        emb = gen_embeddings(n_emb, seed, adversarial=True)
        ev = gen_events(n_ev, n_users, seed, adversarial=True)
    elif flavor == "guard":
        n_docs = int(_opt("--docs", "6000"))
        n_emb = int(_opt("--embeddings", "500"))
        n_ev = int(_opt("--events", "10000"))
        _reject_leftovers()
        docs = gen_documents_guard(n_docs, mega, seed)
        emb = gen_embeddings(n_emb, seed, adversarial=True)
        ev = gen_events(n_ev, 500, seed, adversarial=True)
    elif flavor == "uniform":
        n_docs = int(_opt("--docs", str(int(5000 * scale))))
        n_emb = int(_opt("--embeddings", str(int(2000 * scale))))
        n_ev = int(_opt("--events", str(int(100000 * scale))))
        _reject_leftovers()
        docs = gen_documents_uniform(n_docs, seed)
        emb = gen_embeddings(n_emb, seed, adversarial=False)
        ev = gen_events(n_ev, int(1500 * scale), seed, adversarial=False)
    elif flavor == "tpch_value":
        _reject_leftovers()
        gen_tpch_value(out, scale, seed, link_base)
        return 0
    elif flavor == "tpch_replica":
        # Replica-scaled TPC-H decade (round-9, VERDICT r8 #7): stamp the
        # base tables --scale times with keys offset per replica, so
        # referential integrity and per-key join fan-outs are PRESERVED
        # (every order keeps its lineitems, every customer its orders)
        # while row counts and key cardinality grow xN — a legitimate
        # decade for scan/join/shuffle/aggregate volume. NOT a decade for
        # key-cardinality-sensitive value distributions (non-key columns,
        # incl. names, repeat per replica; name-grouped queries see the
        # same group count with xN rows). Dimension tables region/nation
        # stay fixed, as at any real scale factor. documents/embeddings/
        # events are symlinked from the base (only the relational family
        # needs this decade).
        _reject_leftovers()
        n = max(1, int(scale))
        for t in ("region", "nation"):
            tbl = pq.read_table(f"{link_base}/{t}.parquet")
            pq.write_table(tbl, f"{out}/{t}.parquet")
        offsets: dict[str, int] = {}
        for t, key in (
            ("customer", "c_custkey"),
            ("supplier", "s_suppkey"),
            ("part", "p_partkey"),
            ("orders", "o_orderkey"),
        ):
            # single-column read: the offsets pass needs only the key max,
            # not a second full scan of the table
            tbl = pq.read_table(f"{link_base}/{t}.parquet", columns=[key])
            offsets[key] = int(pa.compute.max(tbl.column(key)).as_py()) + 1
        remap = {
            "customer": ["c_custkey"],
            "supplier": ["s_suppkey"],
            "part": ["p_partkey"],
            "orders": ["o_orderkey", ("o_custkey", "c_custkey")],
            "lineitem": [
                ("l_orderkey", "o_orderkey"),
                ("l_partkey", "p_partkey"),
                ("l_suppkey", "s_suppkey"),
            ],
        }
        for t, cols in remap.items():
            tbl = pq.read_table(f"{link_base}/{t}.parquet")
            # stream replica-by-replica through ParquetWriter: RSS stays
            # O(|table|) instead of O(n·|table|) — a concat-then-write
            # would OOM the generator at larger n or bigger bases
            # (lineitem dominates), for zero benefit since each replica
            # is independent
            with pq.ParquetWriter(f"{out}/{t}.parquet", tbl.schema) as writer:
                for i in range(n):
                    cp = tbl
                    for c in cols:
                        col, keyspace = (c, c) if isinstance(c, str) else c
                        idx = cp.schema.get_field_index(col)
                        shifted = pa.compute.add(
                            cp.column(col), i * offsets[keyspace]
                        ).cast(cp.schema.field(col).type)
                        cp = cp.set_column(idx, cp.schema.field(col), shifted)
                    writer.write_table(cp)
        for t in ("documents", "embeddings", "events"):
            _point_symlink(f"{out}/{t}.parquet", f"{link_base}/{t}.parquet")
        print(f"{out}: flavor=tpch_replica scale={n} base={link_base}")
        return 0
    else:
        print(f"unknown flavor {flavor!r}")
        return 2

    pq.write_table(docs, f"{out}/documents.parquet")
    pq.write_table(emb, f"{out}/embeddings.parquet")
    if n_late:
        write_events_with_late(out, ev, n_late, n_users, seed)
    else:
        pq.write_table(ev, f"{out}/events.parquet")
    for t in TPCH_TABLES:
        src = f"{link_base}/{t}.parquet"
        if os.path.exists(src):
            _point_symlink(f"{out}/{t}.parquet", src)
    n_dup = len(docs) - len(set(docs.column("text").to_pylist()))
    print(
        f"{out}: flavor={flavor} docs={len(docs)} (dup rows={n_dup}) "
        f"embeddings={len(emb)} events={len(ev)}"
        + (f" (+{n_late} late)" if n_late else "")
        + f" seed={seed}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
