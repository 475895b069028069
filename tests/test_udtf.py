"""Python UDTF (PySpark 4 table function): the API-surface demo for
row-to-table expansion with per-row Python logic. Kept OUT of the query
registry — UDTFs execute Python per input row (a BatchEvalPythonUDTF plan
node), which the plan lint forbids in the hot path; the native
transform()/explode composition in plans/text.py is the production shape.
The test proves the UDTF agrees with that native path exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngram_udtf_matches_native_transform(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: int, ngram: string")
    class BigramUDTF:
        def eval(self, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigrams", BigramUDTF)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.ngram
        FROM udtf_docs d, LATERAL bigrams(d.text) t
        """
    )
    native = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat_ws(' ', split(text, ' ')[i-1], split(text, ' ')[i]))"
                " ELSE array() END"
            )
        ).alias("pos", "ngram"),
    )
    a = {(r.doc_id, r.pos, r.ngram) for r in via_udtf.collect()}
    b = {(r.doc_id, r.pos, r.ngram) for r in native.collect()}
    assert a == b and len(a) > 0
