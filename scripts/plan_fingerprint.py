#!/usr/bin/env python3
"""Per-query physical-plan fingerprints (PLANS_rN.json).

For every registered query, build (but do not execute) its DataFrame at the
given sf dir and record a sha256 of the NORMALIZED formatted physical plan
plus the ordered physical-operator list. Regenerating this artifact each
round makes bench-delta adjudication mechanical: a query whose wall time
moved but whose fingerprint is unchanged is host noise by construction; a
changed fingerprint names exactly which operators appeared/disappeared.

Normalization strips every run-variant token (expression ids ``#123``,
``plan_id=``s, checkpoint/RDD ids, file paths, object addresses, temp-view
suffixes) so fingerprints are stable across sessions and checkouts while
still changing whenever the plan SHAPE (operators, keys, join strategies,
exchange placement) changes.

Caveats, by design:
- Queries that execute work while BUILDING their DataFrame (streaming
  availableNow drains, driver-loop iterative algorithms) fingerprint the
  plan of the frame they return (often a sink read / localCheckpoint scan).
  That is still a stable regression sentinel for what the driver collects,
  just not a full lineage of the drained work.
- AQE plans are fingerprinted pre-execution (``isFinalPlan=false``), i.e.
  the static plan Catalyst chose — deterministic, unlike the runtime-
  replanned final plan which can legitimately vary with measured sizes.

Usage:
  python scripts/plan_fingerprint.py [--json PLANS_rN.json] [sf_dir] [query ...]
  python scripts/plan_fingerprint.py --compare OLD.json NEW.json
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (pattern, replacement) applied in order to the formatted plan text.
_NORMALIZERS = [
    (re.compile(r"#\d+"), "#N"),                      # expression ids
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"\[id=#?\d+\]"), "[id=N]"),
    (re.compile(r"@[0-9a-fA-F]{6,}"), "@ADDR"),       # object identities
    (re.compile(r"file:[^\s\],)]+"), "file:PATH"),
    (re.compile(r"/tmp/[^\s\],)]+"), "/tmp/PATH"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(X)"),
    # localCheckpoint / ExistingRDD scans embed an RDD id in the name
    (re.compile(r"ExistingRDD\[\d+\]"), "ExistingRDD[N]"),
    (re.compile(r"LogicalRDD \[\d+\]"), "LogicalRDD [N]"),
    # scheme 3: the RDD creation CALL SITE in `Scan ExistingRDD` details
    # ("MapPartitionsRDD[24] at localCheckpoint at
    # NativeMethodAccessorImpl.java:0") is session-history-dependent — once
    # the JVM JIT-compiles the reflection path the captured frame flips to
    # "<unknown>:0", so a solo regeneration hashed differently from the
    # full-registry run (round-9 finding: the two checkpoint-scanning
    # queries were not subset-reproducible). Keep the operation name
    # (localCheckpoint), drop the id and the frame.
    (re.compile(r"RDD\[\d+\] at (\w+) at \S+"), r"RDD[N] at \1 at SITE"),
    # temp views & shuffle files occasionally carry uuid/pid suffixes
    (re.compile(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"),
     "UUID"),
]

_OP_LINE = re.compile(r"^\((\d+)\) ([A-Za-z][\w .()]*?)\s*(?:\[codegen id : \d+\])?$")


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# PySpark names higher-order-function lambda variables with a SESSION-GLOBAL
# counter (x_33 / y_34 in a fresh session, x_211 after other plans built) —
# another identical-query-varies-with-history source, caught when the whole
# embeddings family's fingerprints drifted between full runs. Token shapes
# like `x_33` (short alpha prefix + counter) collapse to `x_N`; real columns
# with literal index suffixes (mh_0..mh_15) also collapse, which only drops
# WHICH-index information — the sorted multiset still keeps their count.
_CTR_SUFFIX = re.compile(r"^([A-Za-z]{1,4})_\d+$")


def canonical(plan: str) -> str:
    """Canonical text the fingerprint hashes: regex-normalized plan, each
    line reduced to its SORTED identifier tokens (integer literals dropped).

    Why so aggressive: several Catalyst rewrites iterate JVM sets keyed on
    absolute expression ids (RewriteDistinctAggregates' Expand projections,
    gid-literal assignment, hashpartitioning key order out of those sets),
    so attribute ORDER and small integer literals in the printed plan shift
    with how many expressions earlier plans in the same session allocated —
    pure session-history noise for an identical query. Per-line sorted
    identifier multisets are invariant to all of it, while still changing
    whenever an operator appears/disappears/moves (line structure), a join
    strategy or aggregate mode changes, an exchange is added, or different
    columns/functions are referenced. Literal-only changes (a predicate
    constant) are deliberately out of scope — the correctness sweep owns
    values; fingerprints own plan shape.
    """
    for pat, rep in _NORMALIZERS:
        plan = pat.sub(rep, plan)
    return "\n".join(
        " ".join(
            sorted(_CTR_SUFFIX.sub(r"\1_N", t) for t in _IDENT.findall(line))
        )
        for line in plan.splitlines()
    )


def normalize(plan: str) -> str:
    """Regex-normalized (but order-preserving) plan text, for human diffs."""
    for pat, rep in _NORMALIZERS:
        plan = pat.sub(rep, plan)
    return plan


def ops_of(plan: str) -> list[str]:
    """Ordered physical-operator names from the formatted detail section."""
    out = []
    for line in plan.splitlines():
        m = _OP_LINE.match(line.strip())
        if m:
            out.append(m.group(2).strip())
    return out


# The reference sf dir PLANS_rN.json artifacts are generated at; bench.py
# computes its inline tier fingerprint at the SAME dir so the combined
# hash is mechanically derivable from (and comparable to) the committed
# artifact — fingerprinting at bench's own sf could legitimately differ
# (size-dependent join strategies), which would break the cross-reference.
PLANS_REF_SF_DIR = "/root/testdata/sf0.01"


def combined(records: dict[str, dict], names: list[str]) -> str:
    """Order-insensitive combined fingerprint of a named subset — the
    value bench.py inlines so every BENCH_rN.json self-documents whether
    its tier's plans moved vs the committed PLANS_rN.json."""
    parts = [f"{n}:{records[n]['fp']}" for n in sorted(names)]
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def fingerprint(spark, fn, sf_dir: str) -> dict:
    df = fn(spark, sf_dir)
    raw = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    ops = ops_of(normalize(raw))
    return {
        "fp": hashlib.sha256(canonical(raw).encode()).hexdigest()[:16],
        "n_ops": len(ops),
        "ops": ops,
    }


def compare(old_path: str, new_path: str) -> int:
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    so, sn = old.get("scheme", 1), new.get("scheme", 1)
    if so != sn:
        note = (
            "only plans containing an RDD scan (localCheckpoint feeders) "
            "differ by construction; every other changed fingerprint is a "
            "real plan change"
            if {so, sn} == {2, 3}
            else "every fingerprint differs by construction; regenerate "
            "the older artifact before trusting this diff"
        )
        print(
            f"WARNING: artifacts use different canonicalization schemes "
            f"({so} vs {sn}) — {note}"
        )
    o, n = old.get("queries", old), new.get("queries", new)
    added = sorted(set(n) - set(o))
    removed = sorted(set(o) - set(n))
    changed = sorted(
        q for q in set(o) & set(n) if o[q]["fp"] != n[q]["fp"]
    )
    same = len(set(o) & set(n)) - len(changed)
    for q in added:
        print(f"ADDED   {q}")
    for q in removed:
        print(f"REMOVED {q}")
    for q in changed:
        oo, nn = o[q].get("ops", []), n[q].get("ops", [])
        gone = [x for x in oo if x not in nn]
        came = [x for x in nn if x not in oo]
        delta = ""
        if gone or came:
            delta = f"  ops -{gone} +{came}"
        print(f"CHANGED {q}: {o[q]['fp']} -> {n[q]['fp']}{delta}")
    print(f"\n{same} unchanged, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")
    return 0


def main() -> int:
    args = list(sys.argv[1:])
    if args and args[0] == "--compare":
        if len(args) != 3:
            print("usage: plan_fingerprint.py --compare OLD.json NEW.json")
            return 2
        return compare(args[1], args[2])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: plan_fingerprint.py [--json OUT.json] [sf_dir] [query ...]")
            return 2
        json_out = args[i + 1]
        del args[i : i + 2]
    bad = [a for a in args if a.startswith("--")]
    if bad:
        print(f"unknown option(s) {bad}; see the module docstring for usage")
        raise SystemExit(2)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from pyrecount_spark.session import get_spark

    spark = get_spark("plan-fingerprint")
    qs = entrymod.queries()
    records: dict[str, dict] = {}
    n_err = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            spark.catalog.clearCache()
            records[name] = fingerprint(spark, qs[name], sf_dir)
            print(f"{records[name]['fp']}  {name} ({records[name]['n_ops']} ops)")
        except Exception as e:  # noqa: BLE001
            records[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_err += 1
    combined = hashlib.sha256(
        json.dumps(
            {k: v.get("fp") for k, v in records.items()}, sort_keys=True
        ).encode()
    ).hexdigest()[:16]
    print(f"\n{len(records)} queries, {n_err} errors, combined={combined}")
    if json_out:
        # scheme version: bump whenever canonical() changes — fingerprints
        # are only comparable within one scheme (2 = counter-suffixed
        # lambda-variable normalization; 3 = RDD-call-site normalization —
        # only plans containing an RDD scan hash differently from scheme 2,
        # every other query's value carries over unchanged)
        merged = {"sf_dir": sf_dir, "scheme": 3, "combined": combined, "queries": {}}
        p = Path(json_out)
        if p.exists():
            with open(p) as f:
                prev = json.load(f)
            merged["queries"] = prev.get("queries", {})
        merged["queries"].update(records)
        merged["combined"] = hashlib.sha256(
            json.dumps(
                {k: v.get("fp") for k, v in merged["queries"].items()},
                sort_keys=True,
            ).encode()
        ).hexdigest()[:16]
        with open(p, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {len(merged['queries'])} fingerprints to {json_out}")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
