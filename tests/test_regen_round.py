"""Contract tests for scripts/regen_round.py (round-14, VERDICT r13 #4).

The regen script IS the evidence pipeline: if its step sequence, hermetic
rule, or corpus inventory coupling drifts, a future session silently
regenerates a different evidence surface than the committed one. These
tests pin the contract without launching Spark — everything runs through
``--dry-run`` / ``--list`` subprocesses plus direct imports.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "regen_round.py"

sys.path.insert(0, str(REPO / "scripts"))


def _run(*args: str) -> tuple[int, str]:
    proc = subprocess.run(
        [sys.executable, str(SCRIPT), *args],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    return proc.returncode, proc.stdout + proc.stderr


def _dry_commands(*extra: str) -> list[str]:
    rc, out = _run("--round", "99", "--dry-run", *extra)
    assert rc == 0, out
    return [ln[2:] for ln in out.splitlines() if ln.startswith("+ ")]


def test_list_names_every_step_in_order():
    rc, out = _run("--list")
    assert rc == 0
    names = [ln.split()[0] for ln in out.splitlines()
             if ln.strip() and not ln.startswith("WARNING")]
    assert names == [
        "corpora", "sweep", "adversarial", "scaling", "scaling_tpch",
        "scaling_tpchv", "streaming_scaling", "probe", "probe_frontier",
        "slice", "plans", "finalplans", "bench",
    ]


def test_flag_validation_fails_fast():
    rc, _ = _run("--round", "99", "--steps", "nonsense", "--dry-run")
    assert rc == 2
    rc, _ = _run("--dry-run")  # --round is required
    assert rc == 2
    rc, _ = _run("--round", "99", "--bogus-flag", "--dry-run")
    assert rc == 2


def test_default_dry_run_pins_the_pipeline_contract():
    cmds = _dry_commands()

    # Frontier excluded by default — the ~95 GB DuckDB leg must be opt-in.
    assert not any("advsf12e" in c and "check_oracle" in c for c in cmds)

    # Round number flows into the artifact names and the slice window.
    assert any("SWEEP_r99.json" in c for c in cmds)
    assert any("--sample 99:60" in c for c in cmds)

    # Hermetic rule: every tpchv decade command names exactly ONE query
    # (cross-query stage reuse makes shuffle-row attribution
    # order-dependent — round-11 finding, module docstring).
    tpchv = [c for c in cmds if "SCALING_TPCHV_r99" in c]
    assert tpchv, "no scaling_tpchv commands in the default run"
    for c in tpchv:
        tail = c.split("tpchv_sf", 1)[1].split()[1:]
        assert len(tail) == 1, f"hermetic rule violated: {c}"

    # The 600M-row decade runs timing-only; smaller decades carry the oracle.
    assert all("--no-oracle" in c for c in tpchv if "tpchv_sf100" in c)
    assert all("--no-oracle" not in c for c in tpchv if "tpchv_sf0.1" in c)

    # Probe: the 300k decontaminate is timing-only BY DESIGN (unrestricted
    # DuckDB twin fills the disk), the ann trio keeps its oracle.
    probe30 = [c for c in cmds if "PROBE_r99" in c and "advsf30e" in c]
    assert any("--no-oracle" in c and "decontaminate_embedding_eval" in c
               for c in probe30)
    assert not any("decontaminate_embedding_eval" in c
                   for c in probe30 if "--no-oracle" not in c)

    # Plans step compares against the latest committed prior round.
    compare = [c for c in cmds if "--compare" in c]
    assert len(compare) == 1 and "PLANS_r99.json" in compare[0]

    # Streaming finalplans section (round-14, VERDICT r13 #2) is part of
    # the default pipeline, at the late-data decade corpus.
    assert any("--streaming" in c and "latesf1" in c for c in cmds)


def test_frontier_flag_adds_the_120k_oracle_leg():
    cmds = _dry_commands("--include-frontier")
    frontier = [c for c in cmds if "advsf12e" in c and "check_oracle" in c]
    assert frontier, "--include-frontier added no advsf12e oracle commands"
    # The decontaminate frontier row keeps its oracle at 120k — that IS
    # the frontier (the ~95 GB unrestricted DuckDB twin).
    assert any("decontaminate_embedding_eval" in c and "--no-oracle" not in c
               for c in frontier)


def test_corpora_recipes_cover_the_pinned_inventory():
    """Every corpus in the CI-pinned row inventory must be rebuildable by
    the regen script, and vice-versa-safe: a recipe for a corpus the
    inventory does not know is fine (guard/probe helpers), but an
    inventory entry with no recipe means a wiped machine cannot
    reproduce the committed evidence."""
    import regen_round
    from scaling_audit import CORPUS_ROWS

    driver_provided = {"sf0.001", "sf0.01", "sf0.1"}  # /root/testdata, not ours
    missing = [k for k in CORPUS_ROWS
               if k not in driver_provided and k not in regen_round.CORPORA]
    assert missing == [], f"inventory corpora with no regen recipe: {missing}"
