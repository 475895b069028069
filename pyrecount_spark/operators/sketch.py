"""Distributed sketch operators (SURVEY.md §2.10 extension surface).

Count-min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
Summary: The Count-Min Sketch and its Applications") built as a pure
DataFrame aggregation:

- The sketch is a d×w counter table. Each item occurrence increments one
  bucket per hash row; buckets are content-derived (md5 with a per-row
  prefix salt — seedless, engine-portable, identical in DuckDB).
- Building it is ONE groupBy(r, bucket) whose map-side partial aggregation
  bounds shuffle volume to d·w rows PER PARTITION regardless of input
  size — the whole point of a sketch at 100 TB: the reduce stage moves
  (d·w·partitions) counters, never the corpus.
- Point estimates take min over the d row counters — the classic CMS
  guarantee: est ≥ true count, est ≤ true + ε·N with probability 1−δ for
  w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Everything is deterministic given (d, w), so a SQL oracle can rebuild the
IDENTICAL sketch and the estimates hash-match exactly — stronger than the
tolerance-boolean pattern used for engine-specific sketches (HLL/GK).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column | str, row: int, width: int) -> Column:
    """Bucket of ``item`` in hash row ``row``: the first 16 bits of
    md5('cm<row>:' || item), mod ``width``. Prefix-salted md5 gives an
    independent-enough family per row with zero seed state."""
    col = F.col(item) if isinstance(item, str) else item
    h = F.md5(F.concat(F.lit(f"cm{row}:"), col))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % width).alias(
        f"b{row}"
    )


def cms_sketch(df: DataFrame, item_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Build the d×w count-min sketch over item OCCURRENCES (one row = one
    occurrence). Returns (r, bucket, counter) — at most d·w rows.

    The explode over hash rows happens before the aggregate, so the
    groupBy's map-side combine collapses each partition to ≤ d·w partial
    counters before anything shuffles."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                cms_bucket(item_col, r, w).cast("long").alias("bucket"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, item_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-estimate each key against the sketch: min over the d row
    counters at the key's buckets. ``sketch`` is ≤ d·w rows, so it
    broadcasts; the whole estimate is then a narrow map + tiny join.
    Missing (r, bucket) combinations mean counter 0 — impossible for keys
    that occur in the sketched data, but coalesced for safety."""
    probes = keys.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        cms_bucket(item_col, r, w).cast("long").alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["r", "bucket"], how="left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_est"))
    )


def cms_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Join-size estimate from two count-min sketches built with the SAME
    (d, w, hash family): the classic CMS inner-product estimator
    (Cormode & Muthukrishnan §4.2) — Σ_w A[r][w]·B[r][w] per hash row,
    min over rows. Always ≥ the true equi-join cardinality, within
    ε·N_a·N_b with probability 1−δ.

    Scale: each sketch is ≤ d·w rows regardless of input size, so this is
    a tiny-join + d-group aggregate over at most 2·d·w counters — join
    cardinality estimation WITHOUT shuffling either fact table, the
    pre-flight check a planner runs before committing to a join strategy
    at 100 TB.
    """
    joined = sketch_a.alias("a").join(sketch_b.alias("b"), on=["r", "bucket"])
    per_row = joined.groupBy("r").agg(
        F.sum(F.col("a.counter") * F.col("b.counter")).alias("ip")
    )
    # A hash row with ZERO overlapping buckets has true inner product 0 but
    # drops out of the inner join above; min over the surviving rows alone
    # would overestimate (or return NULL when no buckets overlap at all).
    # Left-join from the full row set of sketch_a (every r in [0,d) appears
    # there whenever the sketch is non-empty) and coalesce missing rows to
    # 0 so the min sees them; coalesce the final min to 0 for the
    # empty-sketch degenerate case.
    rows = sketch_a.select("r").distinct()
    full = rows.join(per_row, on="r", how="left").select(
        F.coalesce(F.col("ip"), F.lit(0).cast("long")).alias("ip")
    )
    return full.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("long").alias("est_join_rows")
    )
