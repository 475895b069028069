"""GTF reader + native attribute extraction (FIXTURES.md F5).

Mirrors the reference's golden-shape style (test_accessor.py) but offline and
value-exact. Semantics source: accessor.py:209-256.
"""

from __future__ import annotations

import textwrap

import pytest

from pyrecount_spark.functions.gtf import GTF_ATTRIBUTE_FIELDS, with_gtf_attributes
from pyrecount_spark.sources.readers import read_gtf

GTF = textwrap.dedent(
    """\
    #!genome-build GRCh38
    # comment line
    chr1\tHAVANA\tgene\t11869\t14409\t.\t+\t.\tgene_id "ENSG0001"; gene_name "DDX11L1"; gene_biotype "lncRNA";
    chr1\tHAVANA\texon\t11869\t12227\t.\t+\t.\tgene_id "ENSG0001"; transcript_id "ENST0001"; exon_number "1"; exon_id "ENSE0001"; tag "basic";
    chr2\tENSEMBL\tCDS\t500\t600\t.\t-\t0\tgene_id "ENSG0002"; protein_id "ENSP0001";
    """
)


@pytest.fixture(scope="module")
def gtf_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("gtf") / "anno.gtf"
    p.write_text(GTF)
    return str(p)


def test_gtf_scan_schema_and_comments(spark, gtf_path):
    df = read_gtf(spark, gtf_path)
    assert df.columns == [
        "seqname", "source", "feature", "start", "end",
        "score", "strand", "frame", "attribute",
    ]
    rows = df.collect()
    assert len(rows) == 3  # both '#' lines skipped
    assert rows[0].start == 11869 and rows[0].end == 14409


def test_gtf_attribute_extraction(spark, gtf_path):
    df = with_gtf_attributes(read_gtf(spark, gtf_path))
    assert set(GTF_ATTRIBUTE_FIELDS) <= set(df.columns)
    by_feature = {r.feature: r for r in df.collect()}
    gene, exon, cds = by_feature["gene"], by_feature["exon"], by_feature["CDS"]
    assert gene.gene_id == "ENSG0001"
    assert gene.gene_name == "DDX11L1"
    assert gene.gene_biotype == "lncRNA"
    assert gene.transcript_id is None  # absent key -> null (accessor.py:246-250)
    assert exon.exon_number == "1" and exon.tag == "basic"
    assert cds.protein_id == "ENSP0001" and cds.exon_id is None


def test_no_python_udf_in_plan(spark, gtf_path):
    """The extraction must stay native (SURVEY §2.9: zero Python UDFs)."""
    plan = with_gtf_attributes(read_gtf(spark, gtf_path))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
