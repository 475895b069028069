"""Skew mitigation: salted joins (SURVEY §2 scale notes; AQE's skew-join
split handles sort-merge skew at runtime, but salting is the explicit tool
when one side must be replicated — e.g. a hot key joining a broadcastable-
but-not-tiny dimension)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: left rows scatter across ``salt``
    sub-partitions per key (deterministic row-hash salt — reproducible, no
    RNG state on executors); the right side replicates each row ``salt``
    times. Hot keys fan out over ``salt`` tasks instead of one straggler.

    Output is exactly the plain join's — salting only changes the
    partitioning, which is what makes it oracle-checkable against the
    unsalted SQL.
    """
    on = list(on)
    l_salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    salted_left = left.withColumn("_salt", l_salt)
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, on=on + ["_salt"], how=how).drop("_salt")
