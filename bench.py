#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON records (round-13; ADVICE r13 made the guard a hard error):
  1. the full adjudication record (raw passes, loadavg, canary) — also
     written to BENCH_SIDECAR.json next to this file;
  2. a compact FINAL line (<1500 B, enforced) with metric/value/queries/
     plans_fingerprint/heavy_total/streaming_total — sized so the
     driver's ~2 KB tail capture always parses it.

Execution is forced with the noop sink (full pipeline runs, zero
collect/driver-materialization overhead) — the honest number for engine
throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyrecount_spark import plans  # noqa: E402
from pyrecount_spark.session import get_spark  # noqa: E402

plans.load_all()

HEADLINE = [
    "flagship_group_sort_filter",
    "pricing_summary",
    "multi_join_composite_key",
    "scale_by_group_factor",
    "align_merge_full_outer",
    "window_tumbling_hourly",
    "sessionize_30m_gap",
    "text_fingerprint",
    "dedup_minhash_lsh",
    "knn_brute_force_cosine",
]

# Second recorded tier: the heaviest queries OUTSIDE the headline set, so
# regressions in the post-round-1 surface (iterative graph ops, ANN/PQ,
# prefix-filtered joins, packing, retrieval) are visible round-to-round.
# Reported under "heavy_queries" + "heavy_total"; the driver metric stays
# headline_total for baseline continuity.
HEAVY = [
    "semdedup_embedding_clusters",
    "ivfpq_topk",
    "hits_dup_graph",
    "pagerank_dup_graph",
    "label_propagation_communities",
    "pareto_price_recency_orders",
    "bm25_retrieval_topk",
    "sequence_pack_512",
    "prefix_filtered_jaccard_pairs",
    "dedup_components_canonical",
]

# Third recorded tier: representative Structured Streaming pipelines
# (availableNow drain end-to-end — source + state store + sink, not just
# the logical plan). streaming_tws_user_stats is included only where its
# protobuf gate registered it, so the tier degrades gracefully on
# containers without the vendored runtime.
STREAMING = [
    "streaming_tumbling_events",
    "streaming_session_window_native",
    "streaming_fingerprint_dedup",
    "streaming_stateful_totals",
    "streaming_tws_user_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on a tiny scale factor so timings measure the
    # engine, not first-call JIT + classloading. The heavy tier warms too:
    # its generated expression trees (PQ codebooks, graph iterations) pay
    # a first-compile cost an order of magnitude above steady state.
    warm_dir = "/root/testdata/sf0.001"
    streaming_names = [n for n in STREAMING if n in plans.QUERIES]
    for name in HEADLINE[:3] + HEAVY + streaming_names:
        plans.QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    # Noise self-adjudication (round-12): the artifact must be able to
    # prove "host noise vs regression" on its own. Three additions:
    #   raw_passes  — every per-pass time, not just the min, so a reader
    #                 can see whether a mover was one bad pass or all of
    #                 them (uniform inflation = host; one outlier = GC/
    #                 init noise; all passes up with canary flat = real).
    #   loadavg     — os.getloadavg() snapshots before/after each tier.
    #   canary      — a fixed corpus-free CPU-bound micro-query (~1 s on
    #                 an idle host) timed between tiers. Its plan never
    #                 changes round-to-round, so its timing is a pure
    #                 host-speed reference: mover + canary moved = host;
    #                 mover + canary flat = real regression, bisect.
    raw_passes: dict[str, dict[str, list[float]]] = {}
    loadavg: dict[str, list[float]] = {}
    canary: dict[str, float] = {}
    canary_alloc: dict[str, float] = {}
    idle_gate: dict[str, dict] = {}

    def run_canary(label: str) -> None:
        t0 = time.perf_counter()
        spark.range(700_000_000).selectExpr(
            "bit_xor(xxhash64(id)) as h", "count(1) as n"
        ).write.format("noop").mode("overwrite").save()
        canary[label] = round(time.perf_counter() - t0, 3)
        # Allocation canary (round-14): this sandbox shows intermittent
        # multi-minute windows where ALLOCATION-heavy stages run 5-20x slow
        # (hypervisor memory-fault stalls) while the pure-CPU canary above
        # stays flat — a gate keyed only on CPU lets those windows into the
        # record (observed: prefix_jaccard pass 449 s vs 15-25 s healthy,
        # canary 0.47-0.51 throughout). This mirrors the hottest allocation
        # shape in the suite (per-row array_intersect hash-set builds);
        # idle band measured 0.4-1.0 s warm on the round-14 host.
        t0 = time.perf_counter()
        spark.range(3_000_000).selectExpr(
            "sum(size(array_intersect("
            "array(id % 64, id % 97, id % 31, id % 7), "
            "array(id % 64, id % 53, id % 7)))) as n"
        ).write.format("noop").mode("overwrite").save()
        canary_alloc[label] = round(time.perf_counter() - t0, 3)

    def timed(names: list[str], tier: str, passes: int = 2) -> dict[str, float]:
        """Per-query best-of-``passes`` cold-cache runs.

        clearCache before every run: several operators .cache()
        intermediates they reuse within one query, and letting those pile
        up across 20 queries measures storage-memory pressure, not plans.
        The MIN across passes measures the engine rather than transient
        host/GC noise (observed ±2× on the largest queries run-to-run);
        the raw per-pass times are recorded alongside so the min is
        auditable rather than the only surviving evidence.
        """
        loadavg[f"{tier}_before"] = [round(v, 2) for v in os.getloadavg()]
        out: dict[str, float] = {}
        raw = raw_passes.setdefault(tier, {name: [] for name in names})
        for _ in range(passes):
            for name in names:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                plans.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                took = round(time.perf_counter() - t0, 3)
                raw[name].append(took)
                out[name] = min(out.get(name, took), took)
        loadavg[f"{tier}_after"] = [round(v, 2) for v in os.getloadavg()]
        run_canary(f"after_{tier}")
        return out

    # Idle gate (round-14, VERDICT r13 #3): the adjudication machinery can
    # PROVE a mover was host noise after the fact, but until now the
    # committed number still absorbed the load (BENCH_r13 recorded at
    # loadavg 5-15.8). Gate on the canary — a corpus-free fixed-plan
    # micro-query whose idle band across the r12/r13 records is
    # 0.375-0.55 s — because loadavg counts bench's own executors: when a
    # tier's canary lands above 2x the band top, the whole tier re-runs
    # once and the pass with the MORE IDLE canary becomes the record;
    # both passes stay in the sidecar (raw_passes under "<tier>" and
    # "<tier>_rerun") so nothing is discarded, only adjudicated. If even
    # the better canary is over budget the tier is explicitly marked
    # over_budget=true — a loud "this number was taken under load" flag
    # instead of a quietly inflated record.
    # CPU band top widened 0.55 -> 0.7 for the round-14 host (idle canary
    # measured 0.45-0.9 there; the r12/r13 host sat at 0.375-0.55).
    CANARY_IDLE_BAND_S = (0.3, 0.7)
    RERUN_CANARY_S = 2 * CANARY_IDLE_BAND_S[1]
    ALLOC_IDLE_BAND_S = (0.3, 1.0)
    RERUN_ALLOC_S = 2 * ALLOC_IDLE_BAND_S[1]

    def timed_gated(names: list[str], tier: str, passes: int = 2) -> dict[str, float]:
        out = timed(names, tier, passes)
        first_c = canary[f"after_{tier}"]
        first_a = canary_alloc[f"after_{tier}"]
        gate: dict = {"canary_first_s": first_c, "canary_alloc_first_s": first_a,
                      "record": "first", "over_budget": False}
        if first_c > RERUN_CANARY_S or first_a > RERUN_ALLOC_S:
            rerun = timed(names, f"{tier}_rerun", passes)
            rerun_c = canary[f"after_{tier}_rerun"]
            rerun_a = canary_alloc[f"after_{tier}_rerun"]
            gate["canary_rerun_s"] = rerun_c
            gate["canary_alloc_rerun_s"] = rerun_a
            # the rerun becomes the record when it is the more idle pass on
            # the axis that tripped the gate
            if (rerun_c + rerun_a) < (first_c + first_a):
                out, gate["record"] = rerun, "rerun"
            gate["over_budget"] = (
                min(first_c, rerun_c) > RERUN_CANARY_S
                or min(first_a, rerun_a) > RERUN_ALLOC_S
            )
        idle_gate[tier] = gate
        return out

    from pyrecount_spark.plans.dedup import _EDGE_MEMO, _verified_edges

    # memo keys that exist BEFORE the timed headline tier (the warm-up loop
    # above legitimately populates the memo for warm_dir — and for sf_dir
    # itself when bench is pointed at the warm-up SF)
    memo_before_headline = set(_EDGE_MEMO)
    # canary JIT warm-up: the first execution of either canary plan pays
    # codegen/C2 (measured 5.4 s CPU / 1.5 s alloc vs 0.5-0.7 warm), which
    # would make the before_headline reading look over-band on every run
    run_canary("warmup")
    run_canary("before_headline")
    timings = timed_gated(HEADLINE, "headline")

    # The four graph queries (hits/pagerank/label-prop/components) share one
    # memoized, eagerly-checkpointed verified-edge feeder (plans/dedup.py).
    # Build it EXPLICITLY here and report the cost as its own line: inside
    # the tier the first pass would pay it, the second wouldn't, and the
    # per-query min() would silently exclude it — this keeps the shared
    # compute visible instead of vanishing from the accounting.
    # Guard the accounting: if a future tier reshuffle routes a HEADLINE
    # query through the memoized feeder, a NEW sf_dir key would appear
    # during timed(HEADLINE) and this line would silently time ~0 instead
    # of the build. Comparing against the post-warm-up snapshot (not
    # emptiness) keeps the assert correct when sf_dir == warm_dir.
    assert not any(
        k[1] == sf_dir and k not in memo_before_headline for k in _EDGE_MEMO
    ), (
        "edge feeder memo newly warmed during timed(HEADLINE) — "
        "a HEADLINE query consumed it; move this build before timed(HEADLINE)"
    )
    # when sf_dir == warm_dir the warm-up loop already built the feeder, so
    # this timing is a memo hit, not a build — flag it in the JSON instead
    # of letting a ~0 number silently impersonate the build cost
    feeder_from_memo = any(k[1] == sf_dir for k in _EDGE_MEMO)
    t0 = time.perf_counter()
    _verified_edges(spark, sf_dir)
    feeder_s = round(time.perf_counter() - t0, 3)

    heavy = timed_gated(HEAVY, "heavy")
    # streaming drains carry state-store/python-worker init whose
    # run-to-run variance measured far above the batch tiers (a single
    # pass swung 5x on a loaded host); one extra pass keeps the reported
    # min an engine number rather than an init-noise number
    streaming = timed_gated(streaming_names, "streaming", passes=3)

    # Inline plan-identity evidence (VERDICT r8 #6): the combined headline
    # fingerprint, computed at the PLANS artifact's reference sf dir, makes
    # every BENCH_rN.json self-document whether its plans moved vs the
    # committed PLANS_rN.json — bench-delta adjudication ("host noise or
    # plan change?") no longer needs a separate artifact lookup. Computed
    # AFTER all timed tiers so the fingerprint builds can't perturb them.
    sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
    from plan_fingerprint import PLANS_REF_SF_DIR, combined, fingerprint

    try:
        fps = {
            name: fingerprint(spark, plans.QUERIES[name], PLANS_REF_SF_DIR)
            for name in HEADLINE
        }
        plans_fp = combined(fps, HEADLINE)
    except Exception as e:  # noqa: BLE001 — fingerprint failure must not kill bench
        plans_fp = f"err:{type(e).__name__}"

    total = round(sum(timings.values()), 3)
    # Two-record output (round-13, VERDICT r12 #1). The driver records only
    # a ~2 KB stdout TAIL and parses the last line; round-12's single line
    # grew past that with the adjudication block, so BENCH_r12 was
    # parsed:null — the number of record fell off its own artifact. Split:
    #   1. the FULL payload (per-query maps for every tier + the
    #      adjudication block) goes to a sidecar file next to bench.py AND
    #      an earlier stdout line, for local runs without the file;
    #   2. the LAST stdout line is the compact metric record (headline
    #      per-query mins + tier totals + plans_fingerprint), kept well
    #      under the tail capture so it always parses.
    # Adjudication rule (BASELINE.md): a tier mover is HOST NOISE when the
    # canary moved by a comparable factor (or raw passes are uniformly
    # inflated alongside a loadavg jump), and a REAL regression when the
    # canary is flat — then bisect with plans_fingerprint / FINALPLANS.
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "plans_fingerprint": plans_fp,
        "heavy_total": round(sum(heavy.values()), 3),
        "streaming_total": round(sum(streaming.values()), 3),
        "edge_feeder_build_s": feeder_s,
        "sf": sf,
    }
    sidecar = {
        "record": "bench_adjudication",
        **compact,
        "plans_fingerprint_sf_dir": PLANS_REF_SF_DIR,
        "heavy_queries": heavy,
        "streaming_queries": streaming,
        "edge_feeder_from_memo": feeder_from_memo,
        "raw_passes": raw_passes,
        "loadavg": loadavg,
        "canary_s": canary,
        "canary_alloc_s": canary_alloc,
        "canary_idle_band_s": list(CANARY_IDLE_BAND_S),
        "canary_alloc_idle_band_s": list(ALLOC_IDLE_BAND_S),
        "idle_gate": idle_gate,
    }
    sidecar_path = Path(__file__).resolve().parent / "BENCH_SIDECAR.json"
    try:
        sidecar_path.write_text(json.dumps(sidecar, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: the stdout line below still carries it
    print(json.dumps(sidecar))
    compact_line = json.dumps(compact)
    # Explicit raise, not `assert` (ADVICE r13: asserts vanish under
    # python -O, silently reintroducing the BENCH_r12 parsed:null tail
    # overflow) — and it fires BEFORE the final line is printed, so an
    # oversized record fails loudly instead of half-emitting.
    if len(compact_line) >= 1500:
        raise SystemExit(
            f"final bench line {len(compact_line)}B >= 1500B — it would "
            "overflow the driver's ~2KB tail capture; move fields to the "
            "sidecar"
        )
    print(compact_line)


if __name__ == "__main__":
    main()
