"""Single-call SQL fragments for literal-heavy expression builders.

Round-14 optimization (guide §1 "measure first" + §7.3 driver diagnosis):
profiling showed the ANN/k-means plan *construction* time was ~97 % py4j
round-trips, not JVM planning — thread dumps took the driver JVM idle on
the py4j socket while cProfile attributed 20 s of a 26 s window to
``socket.recv_into`` across 30,168 ``send_command`` calls. Every
``F.lit``/``F.struct``/higher-order-function call is a synchronous py4j
round-trip (~0.7 ms here), so a k-centroid scoring expression built
element-by-element (k × dim literals + 4 lambda HOFs per centroid) costs
seconds of pure driver chatter before Spark ever sees the plan.
(``F.lit(list)`` does not help: classic PySpark expands it to per-element
``lit`` calls.)

The fix: render the whole expression as ONE SQL string and hand it to a
single ``F.expr`` call — measured 8–10× on the build (4.9 s → 0.46 s for
the 8-centroid cell expression) with collect-identical values. The
fragments below are the exact SQL spellings of the Column builders they
replace (same cast/fold/rounding semantics, same field names); equality
is pinned by the oracle suite plus a property test.

Double literals render via ``repr(float(v))`` — Python emits the shortest
round-trip decimal and Java's ``Double.parseDouble`` is correctly
rounded, so the parsed double is bit-identical to the ``F.lit`` path.
"""

from __future__ import annotations

from collections.abc import Iterable


def qcol(name: str) -> str:
    """Backtick-quote a column name for safe embedding in a fragment."""
    return "`" + name.replace("`", "``") + "`"


def dlit(v: float) -> str:
    """A double literal: shortest round-trip decimal + D suffix."""
    return repr(float(v)) + "D"


def arr_sql(vec: Iterable[float]) -> str:
    """array(…D, …D, …) literal of doubles."""
    return "array(" + ",".join(dlit(v) for v in vec) + ")"


def norm_sql(a: str) -> str:
    """L2 norm — the exact SQL spelling of ``similarity.norm``."""
    return (
        f"sqrt(aggregate({a}, 0.0D, (acc, v) -> "
        "acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def dot_sql(a: str, b: str) -> str:
    """Sequential-fold dot product — the SQL spelling of ``similarity.dot``."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def cosine_sql(a: str, b: str) -> str:
    """Cosine — the SQL spelling of ``similarity.cosine``."""
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def sq_dist_sql(a: str, b: str) -> str:
    """Squared L2 — the SQL spelling of ``clustering.sq_dist``."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, v) -> acc + v)"
    )
