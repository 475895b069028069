#!/usr/bin/env python3
"""Expected-guard-trip probe rows (round-10, VERDICT r9 #4).

Round 9's strongest scale evidence — the 300k-vector fourth-decade probe —
lived only as BASELINE.md prose because a deliberate guard trip recorded as
an `err` row would read as a failure to the artifact CI. This script makes
the trip itself a first-class, CI-checkable artifact row: it runs the
PRE-round-10 pinned banding (explicit 32 planes / band 4, the constants the
registered plans carried through round 9) on the 300k corpus, expects the
mega-bucket guard to fire, and records the row with an ``expected_err``
regex that tests/test_artifacts.py verifies against the captured error.

The completion twin — the SAME registered query under round-10's
corpus-derived banding — is recorded by check_oracle.py into the same
artifact (oracle-verified, hash_match), so the artifact tells the whole
story: pinned constants trip loudly at 10× the registered corpus;
derived constants complete and match the oracle cell-exactly.

Usage: python scripts/probe_banding.py [--json PROBE_r10.json] [corpus_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EXPECTED = r"pair budget|max_bucket_docs"


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    bad = [a for a in args if a.startswith("--")]
    if bad:
        print(f"unknown option(s) {bad}; see the module docstring for usage")
        raise SystemExit(2)
    corpus = args[0] if args else "testdata_gen/advsf30e"

    from pyspark.sql import functions as F

    from pyrecount_spark.operators.similarity import lsh_verified_pairs
    from pyrecount_spark.session import get_spark

    spark = get_spark("probe-banding")
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet")
    n = emb.count()
    t0 = time.time()
    rec: dict = {
        "expected_err": EXPECTED,
        "err": None,
        "corpus_vectors": n,
        "note": (
            "pinned pre-round-10 banding (32 planes / band 4) at 10x the "
            "registered corpus: expected bucket occupancy N/16 crosses the "
            "guard, which must abort LOUDLY naming the fix — the registered "
            "queries now derive banding from N (auto_lsh_banding) and "
            "complete on this corpus (see the oracle-verified "
            "decontaminate_embedding_eval row in this artifact)"
        ),
    }
    try:
        # the exact shape decontaminate_embedding_eval ran with through
        # round 9, minus the derivation: explicit 32/4, default guard
        lsh_verified_pairs(
            emb, threshold=0.4, num_planes=32, band_size=4, dim=64,
            collapse_exact_dups=True,
            probe_predicate=F.col("vec_id") % 10 == 0,
        ).groupBy().count().collect()
        rec["err"] = None
        print("FAIL: pinned 32/4 banding COMPLETED — the guard did not fire; "
              "either the corpus shrank or the guard regressed")
        status = 1
    except Exception as e:  # noqa: BLE001
        msg = f"{type(e).__name__}: {str(e)[:400]}"
        rec["err"] = msg
        if re.search(EXPECTED, msg):
            print(f"PASS (expected guard trip): {msg[:160]}")
            status = 0
        else:
            print(f"FAIL: raised, but not the named guard: {msg[:300]}")
            status = 1
    rec["spark_secs"] = round(time.time() - t0, 2)

    if json_out:
        merged = {}
        if os.path.exists(json_out):
            with open(json_out) as f:
                merged = json.load(f)
        key = os.path.basename(corpus.rstrip("/"))
        merged.setdefault(key, {})["vector_lsh_pinned_32_4_guard_trip"] = rec
        with open(json_out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote guard-trip row to {json_out}")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
