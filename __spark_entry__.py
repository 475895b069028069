"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data extension operators (§2.10), registered by the plan
modules in ``pyrecount_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# the repo root is not necessarily on sys.path when the driver imports this
# file by path — make the package importable either way.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyrecount_spark import plans  # noqa: E402

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's canonical analysis (example.py:21-30): join, group-count,
    sort desc, filter to a key set.
    """
    return plans.QUERIES["flagship_group_sort_filter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins (omitted for non-SQL-expressible ops)."""
    return dict(plans.ORACLES)


def query_groups() -> dict[str, str]:
    """Registry group per query: "default" = pipeline-shaped scale-safe
    plans; "eval_only" = documented O(N^2) exact-recall yardsticks
    (correctness baselines only — never wire into a pipeline/bench path).
    """
    return dict(plans.GROUPS)
