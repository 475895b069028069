"""Vector similarity search over an embedding column (SURVEY.md §2.10).

- ``cosine`` / ``dot``: native ``F.aggregate``/``F.zip_with`` fold — JVM-side,
  no UDF, sequential left fold (deterministic accumulation order).
- ``brute_force_topk``: baseline — broadcast the query vector, narrow map to
  scores, TakeOrderedAndProject for top-k. At 100 TB this is one full scan,
  embarrassingly parallel, zero shuffles.
- ``lsh_bucketed_topk``: scale path — deterministic random-hyperplane LSH.
  Hyperplane h's component for dimension d is ±1 derived from md5(h,d)
  parity (seedless, reproducible on any cluster). Candidates = vectors in
  the query's bucket (optionally multi-probe); only candidates are scored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine against a single-row query frame.

    The one-row query side is broadcast (a literal cross join would also
    work); scoring is a narrow projection; top-k avoids any global sort.
    Score is rounded before ranking so rank boundaries are engine-stable;
    ``id_col`` breaks remaining ties totally.
    """
    q = query.select(F.col(vec_col).alias("_qvec"))
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_qvec")), round_digits).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def hyperplane_sign_bits(vec_col: Column, num_planes: int, dim: int) -> Column:
    """LSH bucket id: concatenated sign bits of <v, H_h> for each hyperplane.

    H_h[d] = +1 if md5("h:d") first hex digit is even else -1 — content-
    addressed pseudo-randomness, identical on every executor with no seed
    broadcast. Returns a '0'/'1' string of length ``num_planes``.
    """
    import hashlib

    bits = []
    for h in range(num_planes):
        signs = [
            1.0 if int(hashlib.md5(f"{h}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for d in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH bucket.

    At scale, write the lake bucketed/partitioned by this bucket id and the
    probe becomes a single-partition read instead of a full scan.
    """
    bucket = hyperplane_sign_bits(F.col(vec_col), num_planes, dim)
    emb_b = embeddings.withColumn("_bucket", bucket)
    q_b = query.select(F.col(vec_col).alias("_qvec")).withColumn(
        "_bucket", hyperplane_sign_bits(F.col("_qvec"), num_planes, dim)
    )
    candidates = emb_b.join(F.broadcast(q_b), on="_bucket")
    scored = candidates.select(
        id_col, F.round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold (id_a < id_b).

    Brute all-pairs here (correctness baseline); the LSH bucket join above is
    the scale path — identical output on bucket-colliding pairs.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
