"""mapInArrow: the zero-copy Arrow-batch escape hatch one level below
mapInPandas (no pandas materialization — RecordBatch in, RecordBatch out).
Demo + contract test: value parity with the native expression and a narrow
(no-Exchange) plan. Production use: per-batch vectorized libraries that
speak Arrow natively (tokenizers, image codecs) without the pandas tax.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_map_in_arrow_matches_native(spark):
    import pyarrow as pa

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "n_chars"
    )

    def double_chars(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            out = pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "doubled": pa.compute.multiply(t.column("n_chars"), 2),
                }
            )
            yield from out.to_batches()

    arrow_df = df.mapInArrow(double_chars, "doc_id long, doubled long")
    native = df.select("doc_id", (F.col("n_chars") * 2).alias("doubled"))
    a = {(r.doc_id, r.doubled) for r in arrow_df.collect()}
    b = {(r.doc_id, r.doubled) for r in native.collect()}
    assert a == b and len(a) == 500

    plan = arrow_df._sc._jvm.PythonSQLUtils.explainString(
        arrow_df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
