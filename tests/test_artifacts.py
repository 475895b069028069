"""Committed-artifact consistency: the evidence files the round ships must
describe the CURRENT tree — a stale or partially-red artifact is worse
than none, because downstream audits (and the judge) read them as claims.

Covers the latest-round SWEEP_r*.json (all records green, time-axis
scaling audit clean in strict mode), PLANS_r*.json (scheme-tagged,
covering exactly the registered queries), ADVERSARIAL_r*.json (every
record oracle-verified — the skewed/duplicate-heavy corpus results are
load-bearing claims), and SCALING_r*.json (no errors; strict decade
audit at its own lo/hi pair — round 8 shipped a SCALING artifact whose
own audit failed while the prose said "zero suspects", with no test in
between; this is that test).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _latest(pattern: str) -> Path:
    files = sorted(
        REPO.glob(pattern),
        key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
    )
    assert files, f"no {pattern} artifact committed"
    return files[-1]


def test_sweep_artifact_is_green():
    """Every sweep record must be POSITIVELY oracle-verified: requiring
    hash_match is True (not merely not-False) keeps --no-oracle records —
    which carry oracle_skipped and omit hash_match — from reading as
    correctness evidence (they belong in SCALING_r*.json, never here)."""
    sweep = _latest("SWEEP_r*.json")
    data = json.loads(sweep.read_text())
    assert data, f"{sweep.name} empty"
    for sf, recs in data.items():
        bad = {
            k: v.get("err") or "not oracle-verified"
            for k, v in recs.items()
            if v.get("err")
            or v.get("oracle_skipped")
            or v.get("hash_match") is not True
            or v.get("rows_match") is not True
        }
        assert not bad, f"{sweep.name}[{sf}]: {bad}"


def test_adversarial_artifact_is_green():
    """Same positive-verification bar for the adversarial-corpus matrix."""
    adv = _latest("ADVERSARIAL_r*.json")
    data = json.loads(adv.read_text())
    assert data, f"{adv.name} empty"
    for sf, recs in data.items():
        assert recs, f"{adv.name}[{sf}] empty"
        bad = {
            k: v.get("err") or "not oracle-verified"
            for k, v in recs.items()
            if v.get("err")
            or v.get("oracle_skipped")
            or v.get("hash_match") is not True
        }
        assert not bad, f"{adv.name}[{sf}]: {bad}"


def test_scaling_artifact_audit_clean():
    """SCALING records are --no-oracle by design (timing evidence), so the
    bar is: no errors, and the strict decade audit over the artifact's own
    lo/hi pair passes — a committed scaling curve that fails the repo's own
    audit is a stale artifact or an unshipped regression, and round 8
    proved prose alone does not catch it. Intermediate-bound (explained)
    entries print but do not fail; hard suspects do. Covers both the
    adversarial-corpus decade and the TPC-H replica decade artifacts."""
    # coverage floors per the no-silent-caps rule stated in BASELINE.md
    # (round 9): the adversarial decade covers the top-50 non-eval
    # queries, the TPC-H decade the full dss family — a future regen
    # that quietly shrinks coverage must fail here, not read as "covered"
    floors = {
        "SCALING_r*.json": 50,
        "SCALING_TPCH_r*.json": 21,
        # round-10: the value-distribution decade (gen_corpus tpch_value —
        # fresh seeded values per row, so distinct prices/balances/groups
        # grow with SF where the replica decade repeats them); its rows
        # are additionally ORACLE-VERIFIED, which this test's no-errs bar
        # accepts and test's audit clause still strict-checks
        "SCALING_TPCHV_r*.json": 21,
    }
    for pattern, floor in floors.items():
        scaling = _latest(pattern)
        data = json.loads(scaling.read_text())
        assert data, f"{scaling.name} empty"
        for sf, recs in data.items():
            assert len(recs) >= floor, (
                f"{scaling.name}[{sf}]: {len(recs)} queries < coverage floor {floor}"
            )
            # expected_err rows (round-12, same row type as PROBE's guard
            # trips): a DOCUMENTED frontier failure — err must match the
            # declared pattern AND carry the note explaining it (e.g.
            # dss_product_profit at tpchv_sf100: the 24g shared local heap
            # cannot hold 32 concurrent SHJ build maps; the row embeds a
            # 48g diagnostic proving the plan is correct and cell-exact).
            # An expected_err row whose err is None means the frontier
            # silently moved: fail, the row is stale.
            for k, v in recs.items():
                if v.get("expected_err"):
                    assert v.get("err") and re.search(v["expected_err"], v["err"]), (
                        f"{scaling.name}[{sf}][{k}]: expected_err declared but "
                        f"err={v.get('err')!r}"
                    )
                    assert v.get("note"), f"{scaling.name}[{sf}][{k}]: no note"
            errs = {
                k: v["err"]
                for k, v in recs.items()
                if v.get("err") and not v.get("expected_err")
            }
            assert not errs, f"{scaling.name}[{sf}]: {errs}"
        sfs = sorted(data, key=lambda k: float(re.search(r"sf([0-9.]+)", k).group(1)))
        assert len(sfs) >= 2, f"{scaling.name}: need >= 2 SFs for a curve, got {sfs}"
        # audit EVERY consecutive decade pair, not just the top one — a
        # regression visible only in the lower decade must fail too
        for lo, hi in zip(sfs, sfs[1:]):
            proc = subprocess.run(
                [
                    sys.executable, str(REPO / "scripts" / "scaling_audit.py"),
                    str(scaling), "--strict", "--lo", lo, "--hi", hi,
                ],
                capture_output=True, text=True, cwd=REPO,
            )
            assert proc.returncode == 0, (
                f"{scaling.name} [{lo}->{hi}]: " + proc.stdout + proc.stderr
            )


def test_sweep_time_axis_audit_clean():
    """scripts/scaling_audit.py --strict over the committed sweep: a
    time-ratio suspect in the shipped artifact means either a real
    regression or a stale artifact — both must fail CI. (The byte axis is
    advisory: broadcast-crossover discontinuities are documented corpus
    artifacts, so strictness here is time-axis only via --min-mb inf.)"""
    sweep = _latest("SWEEP_r*.json")
    proc = subprocess.run(
        [
            sys.executable, str(REPO / "scripts" / "scaling_audit.py"),
            str(sweep), "--strict", "--min-mb", "1e18",
        ],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_bench_fingerprint_matches_plans_artifact():
    """BENCH_rN.json inlines the combined headline-tier plan fingerprint
    (bench.py); it must be derivable from the committed PLANS artifact of
    the same round — otherwise the bench number and the plan evidence
    describe different trees. Skips when the latest BENCH predates the
    field or is older than the PLANS round (mid-round state)."""
    import pytest

    bench = _latest("BENCH_r*.json")
    plans = _latest("PLANS_r*.json")
    bdata = json.loads(bench.read_text())
    # The driver wraps bench's compact stdout line as {"parsed": {...}};
    # a locally-committed record is the compact dict itself. Unwrap so
    # the fingerprint check actually fires on driver artifacts (it was
    # silently skipping on every BENCH_r*.json the driver wrote).
    if isinstance(bdata.get("parsed"), dict):
        bdata = bdata["parsed"]
    fp = bdata.get("plans_fingerprint")
    rnd = lambda p: int(re.search(r"_r(\d+)", p.name).group(1))  # noqa: E731
    if fp is None or rnd(bench) != rnd(plans):
        pytest.skip(f"{bench.name} has no fingerprint or is not {plans.name}'s round")
    assert not fp.startswith("err:"), f"{bench.name} fingerprint errored: {fp}"
    sys.path.insert(0, str(REPO / "scripts"))
    import bench as benchmod
    from plan_fingerprint import combined

    pdata = json.loads(plans.read_text())["queries"]
    assert fp == combined(pdata, benchmod.HEADLINE), (
        f"{bench.name} plans_fingerprint does not match {plans.name} — "
        "bench ran on a different tree than the fingerprint artifact"
    )


def test_slice_artifact_matches_declared_window_and_is_green():
    """SLICE_r*.json (round-10, VERDICT r9 #6): the per-round rotating
    oracle slice. Contract: the recorded query set EQUALS the declared
    sample window for the recorded round (anyone can recompute it), every
    row is oracle-verified green, and the _meta block carries the
    disjointness accounting vs the driver's stagnant 50-name sample."""
    import __spark_entry__ as em

    sys.path.insert(0, str(REPO / "scripts"))
    from check_oracle import sample_window

    sl = _latest("SLICE_r*.json")
    data = json.loads(sl.read_text())
    meta = data.pop("_meta")
    names = sorted(em.queries())
    # Round-13: a slice may carry DECLARED extra sections beyond the
    # rotating window — one-off closure passes over names the window walk
    # left uncovered (VERDICT r12 #3), run at whatever corpus makes their
    # check non-degenerate (e.g. the two streaming_late_* residuals at
    # latesf0.01). The declaration lives in _meta so the set is still
    # recomputable; every extra row is held to the same green bar.
    extra = {
        sf: set(names_)
        for sf, names_ in (meta.get("extra_sections") or {}).items()
    }
    # ADVICE r13: an extra-section declaration REPLACES the rotating-window
    # equality check for its key, so without these two guards an artifact
    # could move every section to extras (or shadow a sweep corpus) and
    # pass with a self-attested query subset. Extras may only AUGMENT:
    # they must live on non-window corpora, and at least one section must
    # still validate against the recomputable sample window.
    _window_sfs = {"sf0.001", "sf0.01", "sf0.1"}
    assert not (set(extra) & _window_sfs), (
        f"{sl.name}: extra_sections {sorted(set(extra) & _window_sfs)} "
        "shadow window corpora — extras must be disjoint from the sweep SF set"
    )
    assert set(data) - set(extra), (
        f"{sl.name}: every section is a declared extra — no section is "
        "held to the recomputable rotating-window contract"
    )
    for sf, recs in data.items():
        if sf in extra:
            assert set(recs) == extra[sf], (
                f"{sl.name}[{sf}] != declared extra section"
            )
        else:
            want = set(sample_window(names, meta["round"], meta["k"]))
            assert set(recs) == want, f"{sl.name}[{sf}] != declared window"
        bad = {
            k: v.get("err") or "not verified"
            for k, v in recs.items()
            if v.get("err") or v.get("hash_match") is not True
        }
        assert not bad, f"{sl.name}[{sf}]: {bad}"


def test_streaming_decade_artifact():
    """STREAMING_SCALING_r*.json (round-10, VERDICT r9 #5): the streaming
    tier's scale story, which previously ended at sf0.1. Contract: the
    FULL registered streaming family (12 queries), ORACLE-VERIFIED (these
    rows are availableNow drains whose final tables DuckDB can replay —
    stronger than the --no-oracle batch SCALING rows), at >= 2 event-corpus
    decades, and the strict scaling audit passes over every consecutive
    pair (drain wall time vs max(data, output); the stream-stream joins
    are output-bound and must stay so)."""
    scaling = _latest("STREAMING_SCALING_r*.json")
    data = json.loads(scaling.read_text())
    sfs = sorted(data, key=lambda k: float(re.search(r"sf([0-9.]+)", k).group(1)))
    assert len(sfs) >= 2, f"{scaling.name}: need >= 2 decades, got {sfs}"
    for sf, recs in data.items():
        assert len(recs) >= 12, f"{scaling.name}[{sf}]: {len(recs)} < 12"
        bad = {
            k: v.get("err") or "not oracle-verified"
            for k, v in recs.items()
            if v.get("err") or v.get("hash_match") is not True
        }
        assert not bad, f"{scaling.name}[{sf}]: {bad}"
    for lo, hi in zip(sfs, sfs[1:]):
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "scripts" / "scaling_audit.py"),
                str(scaling), "--strict", "--lo", lo, "--hi", hi,
            ],
            capture_output=True, text=True, cwd=REPO,
        )
        assert proc.returncode == 0, (
            f"{scaling.name} [{lo}->{hi}]: " + proc.stdout + proc.stderr
        )


def test_streaming_state_growth_tracks_semantics():
    """Round-11 (VERDICT r10 #3): drain time is the wrong scale proxy for
    state-bounded operators — a watermark bug shows up as STATE GROWTH
    long before wall time moves. Every drain now records its end-of-drain
    ``stateOperators`` (state_rows, memory_used_mb, dropped-by-watermark),
    and this audits the growth per operator class across the decade pair:

    - aggregations / dedup / session windows (stateStoreSave, dedupe,
      sessionWindow*, applyInPandasWithState, transformWithState*): state
      is the KEY set, which the final emitted table enumerates — state
      ratio must track max(output, data) within slack (output for the
      key-bounded ops; the data bound covers complete-mode queries whose
      output is itself the key set).
    - stream-stream joins (symmetricHashJoin): end-of-drain state is the
      un-evicted watermark window, bounded by the event corpus — state
      ratio must stay within slack x the data ratio.

    Skipped per query when either decade predates the metric; the latest
    artifact must carry state metrics for >= 6 stateful queries per decade
    (coverage floor, so a regen that silently drops the capture fails)."""
    scaling = _latest("STREAMING_SCALING_r*.json")
    data = json.loads(scaling.read_text())
    sfs = sorted(data, key=lambda k: float(re.search(r"sf([0-9.]+)", k).group(1)))
    if not any(
        "state_ops" in v for sf in sfs for v in data[sf].values()
    ):
        import pytest

        pytest.skip(f"{scaling.name} predates state-operator capture")
    slack = 1.5
    for sf in sfs:
        n_state = sum(1 for v in data[sf].values() if v.get("state_ops"))
        assert n_state >= 6, (
            f"{scaling.name}[{sf}]: only {n_state} queries carry state_ops "
            "— the capture silently dropped out"
        )
    data_ratio = float(re.search(r"sf([0-9.]+)", sfs[-1]).group(1)) / float(
        re.search(r"sf([0-9.]+)", sfs[0]).group(1)
    )
    for lo_k, hi_k in zip(sfs, sfs[1:]):
        lo, hi = data[lo_k], data[hi_k]
        for name in sorted(set(lo) & set(hi)):
            lo_ops, hi_ops = lo[name].get("state_ops"), hi[name].get("state_ops")
            if not lo_ops or not hi_ops:
                continue
            out_ratio = (hi[name].get("spark_rows") or 0) / max(
                lo[name].get("spark_rows") or 0, 1
            )
            srows = sum(op.get("state_rows") or 0 for op in lo_ops)
            hrows = sum(op.get("state_rows") or 0 for op in hi_ops)
            is_join = any(
                "symmetricHashJoin" in (op.get("operator") or "") for op in hi_ops
            )
            bound = data_ratio if is_join else max(out_ratio, data_ratio)
            # End-of-drain residual state below ~100 rows is final-batch
            # phase noise, not a growth signal: dedupeWithinWatermark's
            # state at drain end is the un-expired key set of the LAST
            # batch window (advsf0.1 measured 4 rows — a 1-row phase shift
            # moves the ratio 25%). Same denominator-floor discipline as
            # the audit's --min-mb / --min-spill-mb: ratios from a
            # meaningless base are not adjudicable — but the hi side is
            # still bounded ABSOLUTELY at floor x slack x bound (ADVICE
            # r11 #3: a fixed 1000-row hatch would let a 50 -> 900 leak
            # through with no later decade to catch it).
            if srows < 100:
                assert hrows <= 100 * slack * bound, (
                    f"{scaling.name}[{name}] {lo_k}->{hi_k}: lo state "
                    f"sub-floor ({srows}) but hi state {hrows} exceeds the "
                    f"absolute cap 100 x {slack} x {bound:.1f} — leak suspect"
                )
                continue
            s_ratio = hrows / srows
            assert s_ratio <= slack * bound, (
                f"{scaling.name}[{name}] {lo_k}->{hi_k}: state rows "
                f"x{s_ratio:.1f} vs bound x{bound:.1f} "
                f"({srows} -> {hrows}) — watermark/eviction suspect"
            )


def test_late_data_watermark_drops_fired():
    """Round-12 (VERDICT r11 #2): every rows_dropped_by_watermark counter
    in the round-11 artifact read zero — the corpora carried no late data
    and single-batch availableNow drains are structurally unable to drop
    (the watermark only advances between batches). The latesf corpora
    (gen_corpus --late-events: negative-id rows arriving as a third
    micro-batch, 4 h under the watermark cut) exist to light that path,
    and this asserts it STAYS lit: on every late-data decade the artifact
    must show >= 3 streaming_late_* queries with nonzero drops, each
    oracle-verified (the oracles predict the post-drop output, so a
    dropped-row miscount is a wrong answer, not just a metric)."""
    import pytest

    scaling = _latest("STREAMING_SCALING_r*.json")
    data = json.loads(scaling.read_text())
    late_sections = {k: v for k, v in data.items() if "latesf" in k}
    if not late_sections:
        pytest.skip(f"{scaling.name} predates the late-data corpora (round 12)")
    for sf, recs in late_sections.items():
        late_qs = [n for n in recs if n.startswith("streaming_late_")]
        assert len(late_qs) >= 3, (
            f"{scaling.name}[{sf}]: only {len(late_qs)} late-family queries"
        )
        fired = [
            n for n in late_qs
            if sum(
                op.get("rows_dropped_by_watermark") or 0
                for op in recs[n].get("state_ops") or []
            ) > 0
        ]
        assert len(fired) >= 3, (
            f"{scaling.name}[{sf}]: watermark drops fired on only {fired} "
            f"of {late_qs} — the eviction path went dark again"
        )


def test_probe_artifact_rows_green_or_expected_trips():
    """PROBE_r*.json (round-10, VERDICT r9 #4): the fourth-decade evidence
    as a CI-checked artifact instead of prose. Every row must be one of:
    - oracle-verified green (hash_match + rows_match true),
    - timing-only (oracle_skipped, no err), or
    - an EXPECTED guard trip: ``expected_err`` present AND the captured
      ``err`` matches it — a deliberate loud abort recorded as evidence
      that the guard does its job at scale (an expected_err row whose err
      is None means the guard silently stopped firing: fail).
    The artifact must contain both halves of the banding story: the
    pinned-constant trip row and the derived-constant oracle-verified
    completion row."""
    probe = _latest("PROBE_r*.json")
    data = json.loads(probe.read_text())
    assert data, f"{probe.name} empty"
    names = set()
    for sf, recs in data.items():
        for name, v in recs.items():
            names.add(name)
            if v.get("expected_err"):
                assert v.get("err") and re.search(v["expected_err"], v["err"]), (
                    f"{probe.name}[{sf}][{name}]: expected guard "
                    f"{v['expected_err']!r} but err={v.get('err')!r}"
                )
            elif v.get("oracle_skipped"):
                assert not v.get("err"), f"{probe.name}[{sf}][{name}]: {v['err']}"
            else:
                assert (
                    v.get("hash_match") is True and v.get("rows_match") is True
                ), f"{probe.name}[{sf}][{name}]: not oracle-verified: {v}"
    assert "vector_lsh_pinned_32_4_guard_trip" in names, "trip row missing"
    assert "decontaminate_embedding_eval" in names, "completion row missing"


def test_probe_decade_pairs_strict_audit_incl_spill():
    """Round-11 (VERDICT r10 #1): the probe corpora pairs run through
    scaling_audit --strict, which now audits DISK SPILL as a fourth axis —
    round 10's own mis-derivation died by disk overflow (and PROBE_r10's
    300k decontaminate row spilled 56.5 GB, the largest resource number in
    the evidence, with no tripwire). A committed probe artifact whose
    spill grows past slack x max(work, shuffled-rows) must fail CI.

    The 300k corpus is advsf30e since round 11 (10k-embedding unit, like
    advsf4e/advsf12e). Its round-10 name advsf10e ("10x advsf1") broke the
    unit scheme AND the audit's name-derived data ratio: sf-number parsing
    made 120k->300k read as x0.83 instead of x2.5, flagging flat ann
    curves as time suspects — a naming bug, so the corpus was renamed
    rather than the parser special-cased. advsf10e stays accepted here so
    the round-10 artifact keeps auditing under its historical key."""
    probe = _latest("PROBE_r*.json")
    data = json.loads(probe.read_text())
    if "advsf12e" not in data:
        import pytest

        pytest.skip(
            f"{probe.name} predates the round-11 probe set (no 120k corpus; "
            "its 300k row carries the 56.5 GB spill this axis was built on)"
        )
    order = [k for k in ("advsf4e", "advsf12e", "advsf30e", "advsf10e") if k in data]
    assert len(order) >= 2, f"{probe.name}: need >= 2 probe corpora, got {list(data)}"
    # ADVICE r11 #4: the 300k corpus has exactly one name per artifact era
    # (advsf10e pre-rename, advsf30e since) — both present would form a
    # nonsense x0.33 'pair' between two 300k corpora
    assert not ("advsf30e" in data and "advsf10e" in data), (
        f"{probe.name}: carries both 300k corpus keys (advsf30e AND advsf10e)"
    )
    for lo, hi in zip(order, order[1:]):
        proc = subprocess.run(
            [
                sys.executable, str(REPO / "scripts" / "scaling_audit.py"),
                str(probe), "--strict", "--lo", lo, "--hi", hi,
            ],
            capture_output=True, text=True, cwd=REPO,
        )
        assert proc.returncode == 0, (
            f"{probe.name} [{lo}->{hi}]: " + proc.stdout + proc.stderr
        )


def test_sample_window_walks_registry():
    """--sample ROUND windows (round-10, VERDICT r9 #6): deterministic,
    adjacent rounds disjoint (until the walk laps), and any
    ceil(N/K) consecutive rounds cover the whole registry — the property
    that fixes the driver's 5-round identical-sample stagnation."""
    import __spark_entry__ as em

    sys.path.insert(0, str(REPO / "scripts"))
    from check_oracle import sample_window

    names = sorted(em.queries())
    k = 60
    w10 = sample_window(names, 10, k)
    assert w10 == sample_window(names, 10, k), "not deterministic"
    assert len(w10) == k
    assert not set(w10) & set(sample_window(names, 11, k)), "adjacent overlap"
    union: set[str] = set()
    rounds = -(-len(names) // k)  # ceil
    for r in range(10, 10 + rounds):
        union |= set(sample_window(names, r, k))
    assert union == set(names), "walk does not cover the registry"


def test_fourth_decade_curve_sub_work():
    """The fourth-decade audit, mechanized across artifacts: the
    decontaminate completion row in PROBE_r*.json (300k vectors,
    registered corpus-derived defaults) against the same query's advsf1
    row in SCALING_r*.json (30k) must show drain time within
    slack × max(data, output) — the scaling_audit criterion applied to
    the decade the per-artifact audits cannot see because its two points
    live in different files. Round-10 measured: 9.12× time on 10.0×
    data/output (sub-work, zero manual knobs — vs round 9's 477 s with
    hand-set banding + guard)."""
    probe = json.loads(_latest("PROBE_r*.json").read_text())
    scaling = json.loads(_latest("SCALING_r*.json").read_text())
    # ADVICE r11 #4: name the missing key instead of a TypeError subscript
    keys300 = [k for k in ("advsf30e", "advsf10e") if k in probe]
    assert keys300, (
        "PROBE artifact carries neither 300k corpus key "
        "(advsf30e / legacy advsf10e) — fourth-decade evidence missing"
    )
    hi = probe[keys300[0]]["decontaminate_embedding_eval"]
    lo = scaling["advsf1"]["decontaminate_embedding_eval"]
    t_ratio = hi["spark_secs"] / lo["spark_secs"]
    work = max(10.0, hi["spark_rows"] / lo["spark_rows"])
    assert t_ratio <= 1.5 * work, (
        f"fourth decade regressed: time x{t_ratio:.1f} vs work x{work:.1f} "
        f"({hi['spark_secs']}s at 300k)"
    )


def test_canonicalization_normalizes_rdd_call_sites():
    """Scheme-3 regression pin (round-9 finding): the RDD creation call
    site in `Scan ExistingRDD` details flips between the reflection frame
    and `<unknown>:0` depending on whether the JVM has JIT-compiled the
    reflection path — i.e. on session history — which made the two
    checkpoint-scanning queries' fingerprints irreproducible from a
    subset run. The canonical form must erase the frame (and the RDD id)
    while keeping the operation name."""
    sys.path.insert(0, str(REPO / "scripts"))
    from plan_fingerprint import canonical

    cold = (
        "Arguments: [shingle#7, doc_id#8L], MapPartitionsRDD[24] at "
        "localCheckpoint at NativeMethodAccessorImpl.java:0, ExistingRDD, "
        "UnknownPartitioning(0)"
    )
    jitted = (
        "Arguments: [shingle#991, doc_id#992L], MapPartitionsRDD[339] at "
        "localCheckpoint at <unknown>:0, ExistingRDD, UnknownPartitioning(0)"
    )
    assert canonical(cold) == canonical(jitted)
    # a DIFFERENT operation name must still distinguish
    other = jitted.replace("localCheckpoint", "reduceByKey")
    assert canonical(other) != canonical(jitted)


def test_plan_fingerprints_cover_registry():
    import __spark_entry__ as em

    plans = _latest("PLANS_r*.json")
    data = json.loads(plans.read_text())
    assert data.get("scheme", 1) >= 2, "pre-scheme-2 fingerprints are history-unstable"
    fps = data["queries"]
    registered = set(em.queries())
    assert set(fps) == registered, (
        set(fps) ^ registered,
        "fingerprint artifact out of sync with the registry",
    )
    errs = {k: v["err"] for k, v in fps.items() if "err" in v}
    assert not errs, errs


def test_final_plans_artifact_structure():
    """FINALPLANS_r*.json (round-11, VERDICT r10 #5): the AQE final plan
    observed at a decade corpus, per headline+heavy query. Compare-only by
    design (final plans legitimately vary with measured sizes — pinning
    fp_final would fight AQE doing its job), so CI checks STRUCTURE:
    every row executed without error, the runtime plan was actually
    finalized (isFinalPlan=true observed post-action), the join-strategy
    counts are present, and the flips field is exactly the static->final
    count deltas — so a reader can trust "flips: {}" to mean the static
    strategy survived runtime re-planning."""
    import pytest

    files = sorted(REPO.glob("FINALPLANS_r*.json"))
    if not files:
        pytest.skip("no FINALPLANS artifact yet (introduced round 11)")
    data = json.loads(_latest("FINALPLANS_r*.json").read_text())

    def _check_rows(recs, where):
        for name, rec in recs.items():
            assert not rec.get("err"), f"{where}[{name}]: {rec.get('err')}"
            assert rec["is_final"] is True, (
                f"{where}[{name}]: final plan never observed"
            )
            st, fi = rec["join_strategies_static"], rec["join_strategies_final"]
            expect_flips = {
                k: {"static": st.get(k, 0), "final": fi.get(k, 0)}
                for k in set(st) | set(fi)
                if st.get(k, 0) != fi.get(k, 0)
            }
            assert rec["flips"] == expect_flips, (
                f"{where}[{name}]: flips field inconsistent with strategy counts"
            )

    qs = data["queries"]
    assert len(qs) >= 20, f"coverage shrank: {len(qs)} < 20 (headline+heavy)"
    _check_rows(qs, "queries")
    # Round-12 probe sections (VERDICT r11 #3): the width-crossover
    # adjudication in scaling_audit.WIDTH_CROSSOVER_OK cites join-strategy
    # regimes at the probe corpora — with the sections committed, the
    # claim is CI-checked from plan rows instead of REST-metric prose.
    # Observed regime (FINALPLANS_r12): decontaminate's final plan at
    # 120k runs 8 BroadcastHashJoin + 5 ShuffledHashJoin; at 300k it
    # runs 7 + 6 — exactly ONE join (the embeddings-payload verify join)
    # left the broadcast era as the vector side outgrew runtime
    # broadcast, which is the width crossover: past that point the
    # id_b-keyed exchange carries the 512-byte vector rows (122 B/row vs
    # 17 B/row). The SMJ->SHJ conversion (the round-11 spill fix) is
    # present at BOTH corpora — without it the converted joins would be
    # external sorts.
    probes = data.get("probes") or {}
    for corpus, recs in probes.items():
        _check_rows(recs, f"probes[{corpus}]")
    if probes:
        hi = probes.get("advsf30e", {}).get("decontaminate_embedding_eval")
        lo = probes.get("advsf12e", {}).get("decontaminate_embedding_eval")
        assert hi and lo, "probe sections missing the decontaminate rows"
        hi_f, lo_f = hi["join_strategies_final"], lo["join_strategies_final"]
        assert hi_f.get("ShuffledHashJoin", 0) >= 1, (
            "advsf30e: no ShuffledHashJoin in the final plan — the "
            "SMJ->SHJ conversion claim is unbacked"
        )
        assert hi_f.get("BroadcastHashJoin", 0) < lo_f.get(
            "BroadcastHashJoin", 0
        ) and hi_f.get("ShuffledHashJoin", 0) > lo_f.get(
            "ShuffledHashJoin", 0
        ), (
            "width-crossover signature missing: expected the payload join "
            "to move broadcast->shuffled-hash between 120k and 300k, got "
            f"120k={lo_f} 300k={hi_f}"
        )
    # Round-14 streaming section (VERDICT r13 #2): the batch tiers census
    # AQE final plans, but a streaming drain finalizes per MICRO-BATCH —
    # before this section a strategy flip inside a drain surfaced only as
    # timing. Structure contract: present from round 14 on, >= 6 queries,
    # every row err-free with a fingerprint and both censuses, at least
    # one stateful row (state stores are the section's point) and at
    # least one stream-stream join row (the flip-prone shape).
    latest = _latest("FINALPLANS_r*.json")
    rnd = int(re.search(r"_r(\d+)", latest.name).group(1))
    if rnd >= 14:
        sect = data.get("streaming")
        assert sect and sect.get("queries"), (
            f"{latest.name}: no streaming section (required since r14)"
        )
        srecs = sect["queries"]
        assert len(srecs) >= 6, f"streaming section: {len(srecs)} < 6 queries"
        for name, rec in srecs.items():
            assert not rec.get("err"), f"streaming[{name}]: {rec.get('err')}"
            for key in ("fp_final", "join_strategies_final", "stateful_ops"):
                assert key in rec, f"streaming[{name}]: missing {key}"
        assert any(rec["stateful_ops"] for rec in srecs.values()), (
            "streaming section has no stateful operator anywhere — wrong "
            "plans were captured"
        )
        assert any(
            rec["stateful_ops"].get("StreamingSymmetricHashJoin")
            for rec in srecs.values()
        ), (
            "no StreamingSymmetricHashJoin row — the stream-stream join "
            "family (click->purchase, left-outer attribution) is missing "
            "from the census"
        )


def test_corpus_rows_inventory_matches_generated_corpora():
    """The linear-ceiling crossover adjudication (round-11) is anchored on
    scaling_audit.CORPUS_ROWS — a static inventory of stored rows per
    deterministic corpus. If a corpus recipe changes without the inventory
    (or vice versa), the ceiling silently adjudicates against the wrong
    denominator; this pins every inventory entry to the parquet metadata
    of whichever corpora exist on this machine (generated corpora are
    session-local, so absent directories are skipped, but a full regen
    session validates the whole table)."""
    import pytest

    sys.path.insert(0, str(REPO / "scripts"))
    from scaling_audit import CORPUS_ROWS

    import pyarrow.parquet as pq

    tables = ("region nation customer supplier part orders lineitem "
              "documents embeddings events").split()
    roots = {**{k: REPO / "testdata_gen" / k for k in CORPUS_ROWS},
             **{k: Path("/root/testdata") / k
                for k in ("sf0.001", "sf0.01", "sf0.1")}}
    checked = 0
    for key, expect in CORPUS_ROWS.items():
        d = roots[key]
        if not d.is_dir():
            continue
        counts = {
            t: pq.read_metadata(d / f"{t}.parquet").num_rows
            for t in tables if (d / f"{t}.parquet").exists()
        }
        got = (
            sum(counts.values()),
            max(counts.values()),
            counts.get("embeddings", 0),
        )
        assert got == expect, (
            f"CORPUS_ROWS[{key}] = {expect} but the generated corpus holds "
            f"(total, max_table, embeddings) = {got} — regenerate the corpus "
            "with the committed recipe or update the inventory WITH the "
            "ceiling re-reviewed"
        )
        checked += 1
    if checked == 0:
        pytest.skip("no generated corpora on this machine")
