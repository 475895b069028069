#!/usr/bin/env python3
"""Dump explain('formatted') for named queries to <outdir>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py --outdir plans/r15 --suffix after \
           [--sf-dir DIR] query [query ...]

Run from the repo whose plans you want (a git worktree of the previous
round's tree produces the `_before` files).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyrecount_spark import plans  # noqa: E402
from pyrecount_spark.session import get_spark  # noqa: E402

plans.load_all()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans")
    jvm = spark._sc._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.queries:
        df = plans.QUERIES[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        (out / f"{name}_{args.suffix}.txt").write_text(txt)
        print(f"wrote {name}_{args.suffix}.txt ({len(txt)} B)")
    spark.stop()


if __name__ == "__main__":
    main()
