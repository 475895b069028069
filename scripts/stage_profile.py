#!/usr/bin/env python3
"""Per-stage task-time attribution for one query (guide §1/§7.1 without a
live UI): run the named query to the noop sink, then dump every stage's
task count, executorRunTime, GC, shuffle read/write bytes and the head of
its name/details so task-seconds map back to operators.

Usage: python scripts/stage_profile.py [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyrecount_spark import plans  # noqa: E402
from pyrecount_spark.session import get_spark  # noqa: E402

plans.load_all()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true", help="run once before measuring")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("stage_profile", extra_conf={"spark.ui.enabled": "true"})
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete") as r:
            return json.load(r)

    for name in args.queries:
        fn = plans.QUERIES[name]
        if args.warm:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name} ===")
        print(f"{'stage':>6} {'tasks':>5} {'run_s':>8} {'gc_s':>6} {'shR MB':>8} {'shW MB':>8} {'in MB':>8} {'rows':>10}  name")
        for s in new:
            print(
                f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
                f"{s.get('executorRunTime', 0) / 1e3:>8.2f} "
                f"{s.get('jvmGcTime', 0) / 1e3:>6.2f} "
                f"{s.get('shuffleReadBytes', 0) / 1e6:>8.1f} "
                f"{s.get('shuffleWriteBytes', 0) / 1e6:>8.1f} "
                f"{s.get('inputBytes', 0) / 1e6:>8.1f} "
                f"{s.get('outputRecords', 0) or s.get('shuffleWriteRecords', 0):>10} "
                f" {s.get('name', '')[:70]}"
            )
            details = s.get("details", "")
            ops = [
                ln.strip()
                for ln in details.splitlines()
                if "pyrecount_spark" in ln
            ][:2]
            for o in ops:
                print(f"{'':>62}{o[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
