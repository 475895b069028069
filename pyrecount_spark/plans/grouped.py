"""Grouped-map (applyInPandas) queries — the Python custom-operator path,
oracle-checked because per-group standardization is window-SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrecount_spark.operators.grouped import group_zscore
from pyrecount_spark.plans import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Per-group z-score via applyInPandas. The reference's per-sample scaling
# (accessor.py scale_mapped_reads/scale_auc paths) is this shape: a factor
# derived from the whole group applied back to each row. dev_scaled is the
# exact-integer check (n*x - sum x); z is the float path rounded to 4.
# ---------------------------------------------------------------------------
@register(
    "grouped_zscore_pandas",
    """
    SELECT l_returnflag,
           l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity,
           CAST(CAST(COUNT(*) OVER w AS BIGINT) * CAST(l_quantity AS BIGINT)
                - CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT)
                AS BIGINT) AS dev_scaled,
           ROUND((l_quantity - AVG(l_quantity) OVER w)
                 / stddev_samp(l_quantity) OVER w, 4) AS z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "l_linenumber", F.col("l_linenumber").cast("long")
    )
    return group_zscore(
        li,
        group_cols=["l_returnflag"],
        value_col="l_quantity",
        keep_cols=["l_orderkey", "l_linenumber"],
    )
