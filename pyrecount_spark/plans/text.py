"""Text-analysis queries (SURVEY.md §2.10) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrecount_spark.operators.text import (
    LANG_STOPWORDS,
    normalized_fingerprint,
    quality_metrics,
    tokens,
)
from pyrecount_spark.plans import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens, total + distinct per document.
# ---------------------------------------------------------------------------
@register(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_distinct_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality scoring: integer char-class counts + a derived rounded ratio.
# ---------------------------------------------------------------------------
@register(
    "text_quality_metrics",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)  AS n_spaces,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
           CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           ROUND((length(text) - length(regexp_replace(text, ' ', '', 'g'))) * 1.0
                 / length(text), 4) AS space_ratio
    FROM documents
    """,
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    m = quality_metrics(d, "text", "doc_id")
    return m.withColumn(
        "space_ratio", F.round(F.col("n_spaces") * 1.0 / F.col("n_chars"), 4)
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-hit counts per language, deterministic
# argmax (ties broken by the fixed en > de > fr > es precedence).
# ---------------------------------------------------------------------------
def _lang_sql() -> str:
    cases = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        cases.append(f"CAST(SUM(CASE WHEN tok IN ({lst}) THEN 1 ELSE 0 END) AS BIGINT) AS c_{lang}")
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), scores AS (
      SELECT doc_id, {', '.join(cases)} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, c_en, c_de, c_fr, c_es,
           CASE WHEN c_en >= greatest(c_de, c_fr, c_es) THEN 'en'
                WHEN c_de >= greatest(c_fr, c_es) THEN 'de'
                WHEN c_fr >= c_es THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM scores
    """


@register("text_lang_id", _lang_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    aggs = [
        F.sum(F.when(F.col("tok").isin(words), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]
    scores = toks.groupBy("doc_id").agg(*aggs)
    predicted = (
        F.when(F.col("c_en") >= F.greatest("c_de", "c_fr", "c_es"), "en")
        .when(F.col("c_de") >= F.greatest("c_fr", "c_es"), "de")
        .when(F.col("c_fr") >= F.col("c_es"), "fr")
        .otherwise("es")
    )
    return scores.select(
        "doc_id", "c_en", "c_de", "c_fr", "c_es", predicted.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Document fingerprint: md5 of normalized text (lowercase, strip punct,
# collapse whitespace) — the canonical near-exact dedup key.
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                 '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", normalized_fingerprint(F.col("text")).alias("fingerprint"))
