#!/usr/bin/env python3
"""Per-query profiling for the optimization rounds (guide §1: measure first).

For each named query (default: the bench tiers), runs the plan to the noop
sink and splits its wall time into cluster-side vs driver-side components
using the REST monitoring API:

  wall_s        — end-to-end noop-sink wall time (the bench's number)
  job_s         — sum of Spark job durations (submission→completion)
  driver_s      — wall_s - job_s: planning/analysis/codegen/collect gaps
                  (the part no executor config can touch)
  n_jobs        — job count: every collect()/count() in a query path is an
                  extra job whose scheduling overhead repeats per run
  task_s        — sum of task executorRunTime over new stages
  gc_s          — sum of JVM GC time over new stages
  shuffle/input — byte axes (same fields the sweep records)

Usage: python scripts/profile_queries.py [--sf-dir DIR] [--passes N]
           [--json OUT.json] [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyrecount_spark import plans  # noqa: E402
from pyrecount_spark.session import get_spark  # noqa: E402

plans.load_all()

BENCH_TIERS = [
    # headline
    "flagship_group_sort_filter", "pricing_summary", "multi_join_composite_key",
    "scale_by_group_factor", "align_merge_full_outer", "window_tumbling_hourly",
    "sessionize_30m_gap", "text_fingerprint", "dedup_minhash_lsh",
    "knn_brute_force_cosine",
    # heavy
    "semdedup_embedding_clusters", "ivfpq_topk", "hits_dup_graph",
    "pagerank_dup_graph", "label_propagation_communities",
    "pareto_price_recency_orders", "bm25_retrieval_topk", "sequence_pack_512",
    "prefix_filtered_jaccard_pairs", "dedup_components_canonical",
    # streaming
    "streaming_tumbling_events", "streaming_session_window_native",
    "streaming_fingerprint_dedup", "streaming_stateful_totals",
    "streaming_tws_user_stats",
]


class RestProfiler:
    _DONE = {"COMPLETE", "FAILED", "SKIPPED", "SUCCEEDED"}

    def __init__(self, spark) -> None:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        self._stages_url = f"{base}/api/v1/applications/{app}/stages"
        self._jobs_url = f"{base}/api/v1/applications/{app}/jobs"
        self._seen_stages: set[tuple[int, int]] = set()
        self._seen_jobs: set[int] = set()

    def _get(self, url):
        with urllib.request.urlopen(url, timeout=15) as r:
            return json.load(r)

    def delta(self) -> dict:
        out = {"task_s": 0.0, "gc_s": 0.0, "shuffle_write_mb": 0.0,
               "shuffle_read_mb": 0.0, "input_mb": 0.0, "spill_mb": 0.0,
               "job_s": 0.0, "n_jobs": 0, "n_stages": 0, "n_tasks": 0}
        mb = 1024.0 * 1024.0
        for s in self._get(self._stages_url):
            sid = (s["stageId"], s["attemptId"])
            if sid in self._seen_stages or s.get("status") not in self._DONE:
                continue
            self._seen_stages.add(sid)
            out["n_stages"] += 1
            out["n_tasks"] += s.get("numCompleteTasks") or 0
            out["task_s"] += (s.get("executorRunTime") or 0) / 1000.0
            out["gc_s"] += (s.get("jvmGcTime") or 0) / 1000.0
            out["shuffle_write_mb"] += (s.get("shuffleWriteBytes") or 0) / mb
            out["shuffle_read_mb"] += (s.get("shuffleReadBytes") or 0) / mb
            out["input_mb"] += (s.get("inputBytes") or 0) / mb
            out["spill_mb"] += (s.get("diskBytesSpilled") or 0) / mb
        for j in self._get(self._jobs_url):
            jid = j["jobId"]
            if jid in self._seen_jobs or j.get("status") not in self._DONE:
                continue
            self._seen_jobs.add(jid)
            out["n_jobs"] += 1
            try:
                t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ms0 = float(j["submissionTime"][20:23] or 0)
                ms1 = float(j["completionTime"][20:23] or 0)
                out["job_s"] += max(
                    0.0, time.mktime(t1) - time.mktime(t0) + (ms1 - ms0) / 1000.0
                )
            except (KeyError, ValueError):
                pass
        return {k: round(v, 3) if isinstance(v, float) else v
                for k, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries or [n for n in BENCH_TIERS if n in plans.QUERIES]
    spark = get_spark("profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "4000",
        "spark.ui.retainedJobs": "4000",
    })
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JIT/classloading, like bench.py
    for name in names:
        plans.QUERIES[name](spark, args.warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()

    prof = RestProfiler(spark)
    prof.delta()  # swallow warm-up stages
    results: dict[str, dict] = {}
    for _ in range(args.passes):
        for name in names:
            spark.catalog.clearCache()
            prof.delta()  # reset against stragglers from the previous query
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            plans.QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            time.sleep(0.2)
            d = prof.delta()
            d["wall_s"] = round(wall, 3)
            d["driver_s"] = round(wall - d["job_s"], 3)
            prev = results.get(name)
            if prev is None or wall < prev["wall_s"]:
                results[name] = d
    hdr = (f"{'query':42s} {'wall':>7s} {'job':>7s} {'driver':>7s} "
           f"{'task':>8s} {'gc':>6s} {'jobs':>5s} {'stg':>4s} {'tsk':>5s} "
           f"{'shW MB':>8s} {'in MB':>8s}")
    print(hdr)
    for name, d in results.items():
        print(f"{name:42s} {d['wall_s']:7.2f} {d['job_s']:7.2f} "
              f"{d['driver_s']:7.2f} {d['task_s']:8.2f} {d['gc_s']:6.2f} "
              f"{d['n_jobs']:5d} {d['n_stages']:4d} {d['n_tasks']:5d} "
              f"{d['shuffle_write_mb']:8.2f} {d['input_mb']:8.2f}")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
