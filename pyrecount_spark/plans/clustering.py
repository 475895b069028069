"""K-means Lloyd query with an unrolled-CTE DuckDB oracle.

Same replay strategy as the PageRank oracle (plans/dedup.py): every float
quantity is rounded at each step (distances to 6 before the argmin,
centroid means to 6 after each update), so the iterative trajectory is
bit-replayable across engines and the final assignment value-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyrecount_spark.operators.clustering import kmeans_lloyd
from pyrecount_spark.plans import register

K = 4
ITERS = 2
DIM = 64


def _dist_cte(tag: str, cents: str) -> str:
    """Distances + argmin assignment under centroid set ``cents``."""
    return f"""
    d{tag} AS (
      SELECT e.vec_id, e.v, {cents}.cid,
             ROUND(list_sum(list_transform(generate_series(1, {DIM}),
                   i -> (e.v[i] - {cents}.c[i]) * (e.v[i] - {cents}.c[i]))), 6) AS d
      FROM e CROSS JOIN {cents}
    ),
    a{tag} AS (
      SELECT vec_id, v, cid, d FROM (
        SELECT d{tag}.*, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d{tag}
      ) WHERE rn = 1
    )"""


def _update_cte(tag: str, prev_cents: str) -> str:
    """Per-cluster per-dimension rounded means -> next centroid set."""
    return f"""
    m{tag} AS (
      SELECT cid, dim, ROUND(AVG(val), 6) AS val
      FROM (SELECT cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM a{tag})
      GROUP BY cid, dim
    ),
    c{tag} AS (
      SELECT {prev_cents}.cid, COALESCE(n.c, {prev_cents}.c) AS c
      FROM {prev_cents} LEFT JOIN
           (SELECT cid, list(val ORDER BY dim) AS c FROM m{tag} GROUP BY cid) n
           USING (cid)
    )"""


def _kmeans_sql(k: int, iters: int) -> str:
    parts = [
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (
      SELECT vec_id AS cid, v AS c FROM e
      WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for it in range(1, iters + 1):
        parts.append(_dist_cte(str(it), f"c{it - 1}"))
        parts.append(_update_cte(str(it), f"c{it - 1}"))
    parts.append(_dist_cte("f", f"c{iters}"))
    return (
        "WITH "
        + ",".join(parts)
        + """
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d AS dist FROM af
    """
    )


@register("kmeans_lloyd_embeddings", _kmeans_sql(K, ITERS))
def kmeans_lloyd_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_lloyd(emb, k=K, iters=ITERS, dim=DIM)
