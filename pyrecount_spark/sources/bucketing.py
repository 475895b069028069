"""Bucketed-table sink: the co-located-join layout for the 100 TB lake.

The reference caches raw files and re-joins per query
(/root/reference/src/pyrecount/accessor.py cache paths); at Spark scale the
equivalent investment is to LAND the lake bucketed on the join key so every
later fact-fact join is shuffle-free: both sides hash-bucket on the same
key with the same bucket count, and SortMergeJoin reads buckets pairwise —
no Exchange in the plan, ever, no matter how many queries reuse it.

Rule of thumb: bucket count ≈ (table bytes / 256 MB) rounded to a power of
two; both sides of a recurring join MUST use the same count or Spark
re-shuffles the mismatched side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally bucket-sorted) Parquet table.

    ``sortBy`` makes each bucket file key-sorted, so SortMergeJoin skips
    its sort as well — the join degenerates to a streaming merge of
    pre-sorted, pre-partitioned files.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables — produces a shuffle-free plan."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on))


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: Sequence[str],
    num_partitions: int,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted layout: the scan-pruning layout
    for range predicates (time ranges, key ranges) when a hive-style
    ``partitionBy`` would create too many directories.

    ``repartitionByRange`` samples split points so files hold disjoint key
    ranges; ``sortWithinPartitions`` makes parquet row-group min/max stats
    tight, so a range filter skips whole files and row groups at planning
    and read time. This is the poor-man's z-order — exactly right for a
    single dominant range dimension (e.g. event time at 100 TB).
    """
    cols = list(range_cols)
    (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
