"""Declarative data-quality expectations (deequ-style) in one scan.

A constraint suite over a table — completeness, uniqueness, bounds, set
membership, format — evaluates as a SINGLE aggregate node: every check
contributes one violation-count expression to the same agg row, which is
then exploded into one report row per constraint. Validating 100 TB costs
exactly one pass, no matter how many constraints (the deequ execution
model, re-expressed as a plain Catalyst aggregate).

Violation semantics: NULL inputs count as violations only for `not_null`;
the value checks (`min_ge`, `max_le`, `in_set`, `matches`) count only
non-null violators (CASE WHEN <violates> THEN 1 ELSE 0 — a NULL predicate
falls through to ELSE in both Spark and ANSI SQL, so oracles agree).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, str, str, Any]  # (constraint name, column, kind, param)


def _violations(col: Column, kind: str, param: Any) -> Column:
    if kind == "not_null":
        cond = col.isNull()
    elif kind == "min_ge":
        cond = col < param
    elif kind == "max_le":
        cond = col > param
    elif kind == "in_set":
        cond = ~col.isin(*param)
    elif kind == "matches":
        cond = ~col.rlike(param)
    else:
        raise ValueError(f"unknown expectation kind: {kind}")
    return F.sum(F.when(cond, 1).otherwise(0))


def expectation_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all ``checks`` in one aggregate pass. Returns one row per
    constraint: (constraint, column, violations, passed).

    ``unique`` is special-cased as count(col) − count(DISTINCT col) — the
    number of surplus duplicate occurrences (0 ⇔ unique).
    """
    aggs = []
    for name, column, kind, param in checks:
        col = F.col(column)
        if kind == "unique":
            metric = F.count(col) - F.count_distinct(col)
        else:
            metric = _violations(col, kind, param)
        aggs.append(metric.cast("long").alias(name))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.lit(column).alias("column"),
                F.col(name).alias("violations"),
                (F.col(name) == 0).alias("passed"),
            )
            for name, column, _, _ in checks
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.constraint", "r.column", "r.violations", "r.passed")
    )
