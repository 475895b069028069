#!/usr/bin/env python3
"""AQE FINAL-plan capture for the bench batch tiers (round-11, VERDICT
r10 #5): FINALPLANS_rN.json.

PLANS_rN.json deliberately hashes the STATIC plan (``isFinalPlan=false``)
because it is deterministic; but at decade corpora the runtime-replanned
final plan is where broadcast->shuffle flips actually happen — round 9's
five TPC-H crossovers were INFERRED from shuffle bytes, never observed
from a plan. This script executes each headline+heavy query at a decade
corpus (default testdata_gen/advsf1) and records, per query:

- ``fp_static`` / ``fp_final``: scheme-3 canonical fingerprints of the
  plan before and after execution (AQE mutates the same QueryExecution
  in place, so re-explaining after the action shows ``isFinalPlan=true``).
- ``join_strategies_static`` / ``join_strategies_final``: counts of each
  physical join operator — the strategy-flip enumeration the verdict
  asked for, mechanical instead of bytes-inferred.
- ``flips``: the per-strategy count deltas (empty = Catalyst's static
  choice survived runtime re-planning).

COMPARE-ONLY artifact: final plans legitimately vary with measured sizes
(that is their job), so no CI pins fp_final values; the artifact exists
so strategy flips at scale are enumerated facts with rows/bytes context
(SCALING_rN.json carries the same corpus's metrics) rather than
inferences. tests/test_artifacts.py checks structure: every row executed,
isFinalPlan observed true, and every flip enumerated in the row itself.

Usage: python scripts/final_plans.py [--json FINALPLANS_rN.json] [corpus_dir]
       [query ...]
       python scripts/final_plans.py --probe [--json FINALPLANS_rN.json]
       corpus_dir query [query ...]

``--probe`` (round-12, VERDICT r11 #3): record the run under
``probes[<corpus basename>]`` in the SAME artifact instead of replacing
``queries`` — the probe-corpora evidence (advsf12e vs advsf30e) that
makes the width-crossover adjudication artifact-backed: the verify-join
SMJ->ShuffledHashJoin conversions at 300k and the broadcast-era joins at
120k become enumerated plan rows, not REST-metric narration. Probe mode
requires explicit query names (the bench tiers are not the probe
subset); any registered query is accepted.

``--streaming`` (round-14, VERDICT r13 #2): drain every registered
streaming query (availableNow) at the given corpus and record the LAST
micro-batch's finalized physical plan — fingerprint, join-strategy
census, and STATEFUL-operator census (state stores, streaming dedup,
stream-stream joins, Arrow state UDF execs). Batch tiers census the AQE
final plan; a streaming drain finalizes per micro-batch instead, so
until this section existed a strategy flip inside a drain surfaced only
as timing. The plan is captured by
``streaming.pipeline.capture_state_metrics`` (LAST_FINAL_PLAN) at drain
completion — the plan that actually ran, not a re-analysis. Merges a
``streaming`` section into an existing artifact, like ``--probe``.
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import hashlib

from plan_fingerprint import canonical, ops_of, normalize  # noqa: E402

#: Physical join operators whose static->final deltas we enumerate.
JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
)


def _explain(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


#: Stateful streaming physical operators (census axis of the streaming
#: section). Prefix-matched like JOIN_OPS; SessionWindowStateStore* sorts
#: before StateStore* so the longest prefix wins.
STATEFUL_OPS = (
    "SessionWindowStateStoreSave",
    "SessionWindowStateStoreRestore",
    "StateStoreSave",
    "StateStoreRestore",
    "StreamingDeduplicateWithinWatermark",
    "StreamingDeduplicate",
    "StreamingSymmetricHashJoin",
    "FlatMapGroupsInPandasWithState",
    # Spark 4.1 prints the Python transformWithState exec as
    # ...InPySpark; older snapshots used ...InPandas — census both.
    "TransformWithStateInPandas",
    "TransformWithStateInPySpark",
    "StreamingGlobalLimit",
    "EventTimeWatermark",
)


def _prefix_counts(plan: str, prefixes: tuple[str, ...]) -> dict[str, int]:
    counts: Counter[str] = Counter()
    for op in ops_of(plan):
        for p in prefixes:
            if op.startswith(p):
                counts[p] += 1
                break
    return dict(counts)


def _join_counts(plan: str) -> dict[str, int]:
    return _prefix_counts(plan, JOIN_OPS)


def capture(spark, fn, corpus: str) -> dict:
    df = fn(spark, corpus)
    raw_static = _explain(df)
    # Execute THIS QueryExecution (AQE finalizes it in place) without
    # materializing rows to the driver: a JVM-side count over the plan's
    # own RDD runs every stage but transfers nothing (round-12 — the
    # probe captures include embedding_lsh_verified_pairs, whose output
    # at 120k vectors is ~100M pair rows; .collect() would OOM the
    # driver for a plan-capture artifact that never reads the rows).
    df._jdf.queryExecution().toRdd().count()
    raw_final = _explain(df)
    st, fi = _join_counts(raw_static), _join_counts(raw_final)
    flips = {
        k: {"static": st.get(k, 0), "final": fi.get(k, 0)}
        for k in JOIN_OPS
        if st.get(k, 0) != fi.get(k, 0)
    }
    return {
        "fp_static": hashlib.sha256(canonical(raw_static).encode()).hexdigest()[:16],
        "fp_final": hashlib.sha256(canonical(raw_final).encode()).hexdigest()[:16],
        # A plan with no AdaptiveSparkPlan root (e.g. the graph family's
        # localCheckpoint feeder returns an ExistingRDD scan with no join
        # to re-plan) is trivially final: AQE never wraps it, so
        # isFinalPlan never prints — that is "nothing to flip", not
        # "finalization unobserved".
        "is_final": "isFinalPlan=true" in raw_final
        or "AdaptiveSparkPlan" not in raw_final,
        "join_strategies_static": st,
        "join_strategies_final": fi,
        "flips": flips,
        "n_ops_final": len(ops_of(normalize(raw_final))),
    }


def capture_streaming(spark, fn, corpus: str) -> dict:
    """Run a registered streaming query (it drains availableNow internally)
    and census the finalized plan of its LAST micro-batch.

    Queries that drain more than one stream (multi-file triggers, feeder
    stages) publish the final drain's last batch — the plan of record for
    the emitted result."""
    from pyrecount_spark.streaming import pipeline

    del pipeline.LAST_FINAL_PLAN[:]
    fn(spark, corpus)
    if not pipeline.LAST_FINAL_PLAN:
        return {"err": "no final micro-batch plan captured by the drain"}
    raw = pipeline.LAST_FINAL_PLAN[0]
    return {
        "fp_final": hashlib.sha256(canonical(raw).encode()).hexdigest()[:16],
        "join_strategies_final": _join_counts(raw),
        "stateful_ops": _prefix_counts(raw, STATEFUL_OPS),
        "n_ops_final": len(ops_of(normalize(raw))),
    }


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    probe = "--probe" in args
    if probe:
        args.remove("--probe")
    streaming = "--streaming" in args
    if streaming:
        args.remove("--streaming")
    if probe and streaming:
        print("--probe and --streaming are mutually exclusive sections")
        raise SystemExit(2)
    bad = [a for a in args if a.startswith("--")]
    if bad:
        print(f"unknown option(s) {bad}; see the module docstring for usage")
        raise SystemExit(2)
    corpus = args[0] if args else "testdata_gen/advsf1"
    only = set(args[1:])
    if (probe or streaming) and json_out:
        import os

        # ADVICE r12: --probe only MERGES a probes section into an existing
        # artifact. Writing a fresh file would produce a probe-only skeleton
        # ({corpus: <probe dir>, queries: {}}) whose top-level corpus
        # misleadingly names the probe directory and whose empty queries
        # section fails the structure test. Checked BEFORE the Spark launch
        # so the mistake costs seconds, not a probe run.
        if not os.path.exists(json_out):
            mode = "--probe" if probe else "--streaming"
            print(
                f"{mode} requires an existing artifact at {json_out} "
                "(run the non-probe pass first to write the queries section)"
            )
            raise SystemExit(2)

    import __spark_entry__ as entrymod
    import bench
    from pyrecount_spark.session import get_spark

    qs = entrymod.queries()
    if probe:
        if not only:
            print("--probe requires explicit query names")
            raise SystemExit(2)
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query name(s) {sorted(unknown)}")
            raise SystemExit(2)
        names = sorted(only)
    elif streaming:
        names = sorted(
            n for n in qs
            if n.startswith("streaming_") and (not only or n in only)
        )
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query name(s) {sorted(unknown)}")
            raise SystemExit(2)
    else:
        names = [n for n in bench.HEADLINE + bench.HEAVY if not only or n in only]
    spark = get_spark("final-plans")
    records: dict[str, dict] = {}
    n_err = n_flip = 0
    for name in names:
        try:
            spark.catalog.clearCache()
            if streaming:
                rec = capture_streaming(spark, qs[name], corpus)
                records[name] = rec
                if "err" in rec:
                    raise RuntimeError(rec["err"])
                print(
                    f"{rec['fp_final']}  {name}  joins={rec['join_strategies_final']} "
                    f"state={rec['stateful_ops']}"
                )
                continue
            rec = capture(spark, qs[name], corpus)
            records[name] = rec
            tag = f" FLIPS {rec['flips']}" if rec["flips"] else ""
            print(f"{rec['fp_static']} -> {rec['fp_final']}  {name}{tag}")
            n_flip += bool(rec["flips"])
        except Exception as e:  # noqa: BLE001
            records[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_err += 1
    print(f"\n{len(records)} queries, {n_flip} with strategy flips, {n_err} errors")
    if json_out:
        import os

        out = {"corpus": corpus, "scheme": 3, "queries": {}}
        if os.path.exists(json_out):
            with open(json_out) as f:
                out = json.load(f)
        if probe:
            key = os.path.basename(corpus.rstrip("/"))
            out.setdefault("probes", {})[key] = records
        elif streaming:
            out["streaming"] = {"corpus": corpus, "queries": records}
        else:
            out.update({"corpus": corpus, "queries": records})
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {len(records)} records to {json_out}")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
