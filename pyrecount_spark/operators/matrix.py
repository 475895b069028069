"""Count-matrix semantics: wide<->long reshape and normalization operators.

The reference holds counts as a *wide* matrix — ``gene_id`` + one numeric
column per sample (accessor.py:342-388) — and scales it by collecting scale
factors into a Python dict and multiplying column-by-column
(accessor.py:146-153, 166-172). Neither survives 100 TB / 100k samples:
Spark's practical column limit and the driver round-trip both break.

Canonical design here (SURVEY.md §1.3): counts live **long**
``(feature_id, sample_id, count)``; scaling is a broadcast join against a
per-sample factor frame, fully in-plan; the wide matrix is a presentation
``pivot`` guarded by a cardinality check.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

MAX_PIVOT_COLUMNS = 10_000  # guard: wide views are presentation-only


def numeric_columns(df: DataFrame, exclude: Sequence[str] = ()) -> list[str]:
    """F8 (accessor.py:151, ``pl.selectors.numeric()``)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "sample_id",
    value_name: str = "count",
) -> DataFrame:
    """Wide → long. Uses native ``unpivot`` (JVM-side, no shuffle: each input
    row expands to N output rows within its partition)."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def pivot_wide(
    df: DataFrame,
    id_col: str,
    var_col: str,
    value_col: str,
    var_values: Sequence[str] | None = None,
    agg: str = "sum",
) -> DataFrame:
    """Long → wide presentation view. Passing ``var_values`` explicitly skips
    the extra distinct-collect job Spark otherwise runs, and enforces the
    pivot-cardinality guard (SURVEY.md §7 hard part (b))."""
    if var_values is None:
        var_values = [r[0] for r in df.select(var_col).distinct().limit(MAX_PIVOT_COLUMNS + 1).collect()]
    if len(var_values) > MAX_PIVOT_COLUMNS:
        raise ValueError(
            f"pivot would create {len(var_values)}+ columns (> {MAX_PIVOT_COLUMNS}); "
            "use the long format for computation"
        )
    return df.groupBy(id_col).pivot(var_col, list(var_values)).agg(getattr(F, agg)(value_col))


def column_chunks(var_values: Sequence[str], chunk_size: int) -> list[list[str]]:
    """Deterministic column groups for the chunked wide view."""
    vals = list(var_values)
    return [vals[i : i + chunk_size] for i in range(0, len(vals), chunk_size)]


def pivot_wide_chunk(
    df: DataFrame,
    id_col: str,
    var_col: str,
    value_col: str,
    var_values: Sequence[str],
    chunk: int,
    chunk_size: int,
    agg: str = "sum",
) -> DataFrame:
    """One column-group of a wide view too wide for a single pivot.

    The fallback the ``MAX_PIVOT_COLUMNS`` guard points at (SURVEY §7 hard
    part (b)): a 100k-sample matrix is presented as ``ceil(100k/chunk_size)``
    wide frames of bounded width instead of one impossible pivot. The isin
    filter on the chunk's columns reaches the parquet scan (PushedFilters) —
    and when the long table was landed with ``write_wide_chunked`` the
    filter is a partition prune, so each chunk pivot reads only its own
    files. Rows absent from a chunk's columns are absent from that chunk
    (sparse column groups); reassembly is the J2 align-merge (full-outer on
    the id), which is exactly how the reference's align-concat composes
    disjoint-column frames.
    """
    vals = column_chunks(var_values, chunk_size)[chunk]
    filtered = df.filter(F.col(var_col).isin(vals))
    if "_chunk" in df.columns:
        # the layout column from write_wide_chunked: the equality filter is
        # what the planner turns into the partition prune (a filter on the
        # var values alone cannot — Spark can't invert the value→chunk map)
        filtered = filtered.filter(F.col("_chunk") == chunk)
    return pivot_wide(filtered, id_col, var_col, value_col, vals, agg)


def write_wide_chunked(
    long_df: DataFrame,
    path: str,
    var_col: str,
    var_values: Sequence[str],
    chunk_size: int,
) -> None:
    """Land the long table hive-partitioned by column chunk.

    The (var value → chunk) map is a broadcast join (bounded by the number
    of wide columns — the same bound the reference's wide format already
    accepts); the write is one pass. After this layout, every
    ``pivot_wide_chunk`` is a partition-pruned scan: the 100 TB matrix is
    never read whole to present one column group.
    """
    spark = long_df.sparkSession
    mapping = spark.createDataFrame(
        [(v, i // chunk_size) for i, v in enumerate(var_values)],
        [var_col, "_chunk"],
    )
    (
        long_df.join(F.broadcast(mapping), on=var_col)
        .write.mode("overwrite")
        .partitionBy("_chunk")
        .parquet(path)
    )


def scale_factors_mapped_reads(
    metadata: DataFrame,
    target_size: float,
    read_length: int,
    sample_col: str = "external_id",
) -> DataFrame:
    """Q7 factor computation (accessor.py:122-144), casts explicit because the
    metadata lake is string-typed (SURVEY §1.2). Paired-end detection F5:
    ``round(avg_mapped_len / avg_read_len) == 2`` → factor 2 else 1."""
    mapped_reads = F.col("`star.all_mapped_reads`").cast("double")
    mapped_len = F.col("`star.average_mapped_length`").cast("double")
    read_len = F.col("avg_len").cast("double")
    paired = F.when(F.round(mapped_len / read_len) == 2, F.lit(2.0)).otherwise(F.lit(1.0))
    sf = (F.lit(target_size) * F.lit(read_length) * paired) / (
        mapped_reads * F.pow(mapped_len, 2)
    )
    return metadata.select(F.col(sample_col).alias("sample_id"), sf.alias("sf"))


def scale_factors_auc(
    metadata: DataFrame, target_size: float, sample_col: str = "external_id"
) -> DataFrame:
    """Q8 factor computation (accessor.py:155-164): ``target / auc``."""
    auc = F.col("`bc_auc.all_reads_all_bases`").cast("double")
    return metadata.select(
        F.col(sample_col).alias("sample_id"), (F.lit(target_size) / auc).alias("sf")
    )


def scale_long(
    counts_long: DataFrame,
    factors: DataFrame,
    round_to_int: bool = False,
    value_col: str = "count",
) -> DataFrame:
    """Apply per-sample scale factors to a long count table.

    Replaces the reference's engine-exit dict round-trip (accessor.py:146:
    ``dict(zip(...))`` then per-column multiply) with a broadcast hash join —
    no driver boundary, no shuffle of the fact table, scales to any sample
    count. ``round_to_int`` reproduces Q8's ``round(0).cast(Int64)``
    (accessor.py:170)."""
    scaled = F.col(value_col) * F.col("sf")
    if round_to_int:
        scaled = F.round(scaled, 0).cast("long")
    return (
        counts_long.join(F.broadcast(factors), on="sample_id", how="inner")
        .withColumn(value_col, scaled)
        .drop("sf")
    )


def scale_wide(
    counts_wide: DataFrame,
    factors: DataFrame,
    id_cols: Sequence[str] = ("gene_id",),
    round_to_int: bool = False,
) -> DataFrame:
    """Wide-format compatibility path for Q7/Q8: collects the (small,
    per-sample) factor frame to a dict — explicitly bounded by the number of
    sample *columns*, which the wide format already caps — and multiplies each
    numeric column (reference semantics: skip id column, accessor.py:172)."""
    sf_map = {r["sample_id"]: r["sf"] for r in factors.collect()}
    out = counts_wide
    for c in numeric_columns(counts_wide, exclude=id_cols):
        if c not in sf_map:
            continue
        scaled = F.col(c) * F.lit(sf_map[c])
        if round_to_int:
            scaled = F.round(scaled, 0).cast("long")
        out = out.withColumn(c, scaled)
    return out


def coo_matmul(
    a: DataFrame,
    b: DataFrame,
    out_row: str = "row_idx",
    out_col: str = "col_idx",
    out_val: str = "value",
) -> DataFrame:
    """Sparse matrix multiply in COO form: C = A · B without densifying.

    A as (row_idx, col_idx, value), B as (row_idx, col_idx, value);
    C[i,k] = Σ_j A[i,j]·B[j,k] = equi-join on the inner dimension +
    grouped sum — the canonical distributed SpGEMM plan. Shuffle volume is
    the number of (i,j,k) partial products, bounded by the inner
    dimension's row/column nnz product (hot inner indices are the skew to
    salt, same discipline as hot shingles). The reference densifies via
    scipy before any algebra (accessor.py:431-432) — this is the
    never-densify replacement.
    """
    aa = a.select(
        F.col("row_idx").alias("_i"), F.col("col_idx").alias("_j"),
        F.col("value").alias("_av"),
    )
    bb = b.select(
        F.col("row_idx").alias("_j"), F.col("col_idx").alias("_k"),
        F.col("value").alias("_bv"),
    )
    return (
        aa.join(bb, on="_j")
        .groupBy("_i", "_k")
        .agg(F.sum(F.col("_av") * F.col("_bv")).alias(out_val))
        .select(
            F.col("_i").alias(out_row), F.col("_k").alias(out_col), out_val
        )
    )
