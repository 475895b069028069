"""Engine-portable half-up ratio rounding (round-8 adversarial finding).

``ROUND(num/den, k)`` of a count ratio diverges across engines when the
exact ratio lands on a decimal half-boundary that the nearest double sits
just below: Java's BigDecimal.valueOf rounds the SHORTEST decimal rendering
half-up, DuckDB rounds the binary value down. The adversarial corpus hit it
three times in unigram_logprob_scores (quantized sums with s % n == n/2).
``round_ratio_half_up`` computes the identical value in exact integer space
— these tests prove it equals true decimal half-up rounding in BOTH engines
over an adversarial grid of ratios (every boundary-capable denominator
shape), and pin a concrete diverging example of the naive form.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyrecount_spark.functions.scalars import round_ratio_half_up

DIGITS = 4
SCALE = 10 ** DIGITS


def _pairs() -> pd.DataFrame:
    pairs = []
    # exhaustive small denominators (the jaccard/union regime), plus the
    # classic boundary families d = 2^a · 5^b · odd whose decimal expansion
    # terminates with an exact 5 at position DIGITS+1
    for d in list(range(1, 130)) + [160, 320, 480, 640, 800, 1600, 3200, 20000]:
        step = max(1, d // 64)
        pairs.extend((n, d) for n in range(0, d + 1, step))
    # the observed logprob shape: huge negative-ish magnitudes — emulate
    # with large numerators (|avg| up to ~2e7 micro-units)
    pairs.extend((147765663 + i, 18) for i in range(-2, 3))
    pairs.extend((160223490 + i, 20) for i in range(-2, 3))
    return pd.DataFrame(pairs, columns=["n", "d"]).astype("int64")


def _expected(n: int, d: int) -> float | None:
    if d == 0:
        return None
    return float(
        (Decimal(n) / Decimal(d)).quantize(
            Decimal(1).scaleb(-DIGITS), rounding=ROUND_HALF_UP
        )
    )


def test_round_ratio_half_up_both_engines(spark):
    pdf = _pairs()
    exp = [_expected(n, d) for n, d in zip(pdf["n"], pdf["d"])]

    sdf = spark.createDataFrame(pdf)
    got_spark = [
        r.v
        for r in sdf.select(
            round_ratio_half_up(F.col("n"), F.col("d"), DIGITS).alias("v")
        ).collect()
    ]
    assert got_spark == pytest.approx(exp, abs=0), "Spark helper != Decimal"

    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.sql(
            f"SELECT FLOOR((n * {2 * SCALE}.0 + d) / (2.0 * NULLIF(d, 0)))"
            f" / {SCALE}.0 FROM t"
        ).fetchall()
    ]
    assert got_duck == pytest.approx(exp, abs=0), "DuckDB twin != Decimal"


def test_helper_exact_at_six_digits_on_observed_shapes(spark):
    """The three sums the adversarial sweep caught (s % n == n/2, rounded
    at 6 digits) — the helper must match Decimal in both engines on
    exactly these."""
    pdf = pd.DataFrame(
        {
            "n": [147765663, 160223490, 67116395, 147765663 + 1, 160223490 - 1],
            "d": [18000000, 20000000, 10000000, 18000000, 20000000],
        }
    ).astype("int64")
    exp = [
        float(
            (Decimal(int(n)) / Decimal(int(d))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for n, d in zip(pdf["n"], pdf["d"])
    ]
    sdf = spark.createDataFrame(pdf)
    got_spark = [
        r.v
        for r in sdf.select(
            round_ratio_half_up(F.col("n"), F.col("d"), 6).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.sql(
            "SELECT FLOOR((n * 2000000.0 + d) / (2.0 * d)) / 1000000.0 FROM t"
        ).fetchall()
    ]
    assert got_spark == pytest.approx(exp, abs=0)
    assert got_duck == pytest.approx(exp, abs=0)


def test_naive_round_diverges_on_observed_shapes(spark):
    """Document WHY the helper exists: the observed half-boundary ratios
    make naive F.round / ROUND at 6 digits disagree with true decimal
    half-up in at least one engine — and cross-engine (the exact failure
    mode the adversarial sweep caught in unigram_logprob_scores; if both
    engines ever become exactly half-up-correct, this xpasses and the
    helper becomes optional)."""
    pdf = pd.DataFrame(
        {
            "n": [147765663, 160223490, 67116395],
            "d": [18000000, 20000000, 10000000],
        }
    ).astype("int64")
    exp = [
        float(
            (Decimal(int(n)) / Decimal(int(d))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for n, d in zip(pdf["n"], pdf["d"])
    ]
    sdf = spark.createDataFrame(pdf)
    naive_spark = [
        r.v
        for r in sdf.select(F.round(F.col("n") / F.col("d"), 6).alias("v")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    naive_duck = [
        r[0]
        for r in con.sql("SELECT ROUND(n * 1.0 / d, 6) FROM t").fetchall()
    ]
    mism = [
        (s, k, e) for s, k, e in zip(naive_spark, naive_duck, exp) if s != e or k != e
    ]
    assert mism, "naive ROUND matched Decimal everywhere — helper now optional?"
    cross = [(s, k) for s, k, e in mism if s != k]
    assert cross, f"one-engine-only drift ({mism}) but no cross-engine split"


def test_envelope_guard_raises_beyond_bound(spark):
    """ADVICE r8 + round-9 review: past 2·n·10^digits + den = 9.0e15 the
    half-up semantics silently degrade; the helper must raise a loud
    in-plan error instead, while sums at/under the bound (and NULLs)
    pass. The guarded quantity is the SUM — a corpus-scale denominator
    alone can breach it even with a modest numerator."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = spark.createDataFrame(
        pd.DataFrame({"n": [449_999_999_999, 0], "d": [7, 7]}).astype("int64")
    )
    vals = [
        r.v
        for r in ok.select(round_ratio_half_up(F.col("n"), F.col("d"), 4).alias("v")).collect()
    ]
    assert vals[1] == 0.0 and vals[0] > 0

    bad = spark.createDataFrame(
        pd.DataFrame({"n": [500_000_000_000], "d": [7]}).astype("int64")
    )
    with pytest.raises(SparkRuntimeException, match="exactness bound"):
        bad.select(round_ratio_half_up(F.col("n"), F.col("d"), 4).alias("v")).collect()


def test_envelope_guard_catches_denominator_breach(spark):
    """The verified counterexample from the round-9 review: digits=0,
    n=3.45e15 (fine under a numerator-only bound), d=2.3e15 — the IEEE
    sum 4d-1 rounds up to 4d, FLOOR returns 2 while Decimal half-up of
    n/d = 1.4999... is 1. The sum guard must catch it loudly; a same-
    shape pair safely inside the envelope must still round correctly."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = spark.createDataFrame(
        pd.DataFrame(
            {"n": [3_450_000_000_000_001], "d": [2_300_000_000_000_001]}
        ).astype("int64")
    )
    with pytest.raises(SparkRuntimeException, match="exactness bound"):
        bad.select(round_ratio_half_up(F.col("n"), F.col("d"), 0).alias("v")).collect()

    n_ok, d_ok = 3_450_000_000_001, 2_300_000_000_001
    ok = spark.createDataFrame(
        pd.DataFrame({"n": [n_ok], "d": [d_ok]}).astype("int64")
    )
    got = ok.select(round_ratio_half_up(F.col("n"), F.col("d"), 0).alias("v")).collect()[0].v
    want = float(
        (Decimal(n_ok) / Decimal(d_ok)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    assert got == want

def test_sign_symmetric_half_up(spark):
    """ADVICE r10: the helper folds the sign in itself (negate-and-flip on
    |num|/|den|), so negative ratios round halves AWAY FROM ZERO like
    Decimal ROUND_HALF_UP — the raw FLOOR identity on a negative numerator
    would round them toward +inf instead (-1/2 at 0 digits: floor of
    (-2+2)/4 = 0, not the correct -1). Covers all four sign combinations
    plus half-boundary magnitudes in both directions."""
    rows = [
        (-1, 2), (1, -2), (-1, -2), (1, 2),          # ±0.5 at 0 digits
        (-3, 2), (3, -2), (-3, -2),                   # ±1.5
        (-147765663, 18000000), (147765663, -18000000),
        (-5, 4), (5, -4), (-7, 10), (0, -3), (0, 3),
    ]
    pdf = pd.DataFrame(rows, columns=["n", "d"]).astype("int64")
    for digits in (0, 4):
        q = Decimal(1).scaleb(-digits)
        exp = [
            float((Decimal(int(n)) / Decimal(int(d))).quantize(q, rounding=ROUND_HALF_UP))
            for n, d in rows
        ]
        got = [
            r.v
            for r in spark.createDataFrame(pdf)
            .select(round_ratio_half_up(F.col("n"), F.col("d"), digits).alias("v"))
            .collect()
        ]
        assert got == pytest.approx(exp, abs=0), f"digits={digits}: {got} != {exp}"
