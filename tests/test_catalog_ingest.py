"""Catalog URL synthesis, executor-parallel ingest, manifest (S1-S6, Q6)."""

from __future__ import annotations

import os

import pytest

from pyrecount_spark.sources.catalog import (
    Annotation,
    CatalogLocator,
    Dtype,
    ProjectLocator,
    discover_data_sources,
    normalize_organism,
    shard2,
)
from pyrecount_spark.sources.ingest import (
    bigwig_manifest,
    build_manifest,
    fetch_manifest,
    land_parquet,
    mirror_path,
)


def _locator(**kw):
    defaults = dict(
        root="https://example.org/release",
        organism="human",
        dbase="sra",
        project_ids=["SRP009615"],
        annotation=Annotation.GENCODE_V29,
    )
    defaults.update(kw)
    return ProjectLocator(**defaults)


def test_shard2_is_last_two_chars():
    # locator.py:66-80
    assert shard2("SRP009615") == "15"
    assert shard2("CHOL") == "OL"


def test_metadata_urls_tags_and_sharding():
    urls = _locator().metadata_urls()
    # tags = dbase + 4 recount tags (locator.py:59-60) for sra
    assert len(urls) == 5
    assert all("/metadata/15/SRP009615/" in u for u in urls)
    assert any(u.endswith("sra.recount_qc.SRP009615.MD.gz") for u in urls)


def test_metadata_urls_tcga_drops_pred():
    urls = _locator(dbase="tcga", project_ids=["CHOL"]).metadata_urls()
    # accessor.py:288-289: gtex/tcga exclude recount_pred
    assert len(urls) == 4
    assert not any("recount_pred" in u for u in urls)


def test_gene_urls_require_annotation():
    with pytest.raises(ValueError, match="annotation"):
        _locator(annotation=None).counts_urls(Dtype.GENE)


def test_junction_urls_triplet():
    urls = _locator().junction_urls()
    assert len(urls) == 3
    assert [u.rsplit(".", 2)[-2] for u in urls] == ["ID", "MM", "RR"]


def test_bigwig_manifest_rows(spark):
    loc = _locator(samples_by_project={"SRP009615": ["S1", "S2"]})
    rows = loc.bigwig_urls()
    assert len(rows) == 2  # one per sample (test_accessor.py:313 semantics)
    mf = bigwig_manifest(spark, rows, "/tmp/lake-cache")
    assert mf.columns == ["project_id", "url", "path"]
    assert mf.count() == 2


def test_catalog_locator_and_discovery():
    cat = CatalogLocator("https://example.org", "human", ["sra", "gtex"])
    assert len(cat.urls()) == 2
    srcs = discover_data_sources("data_sources/sra\ndata_sources/gtex\n\n")
    assert srcs == {"sra": "data_sources/sra", "gtex": "data_sources/gtex"}
    assert normalize_organism("Homo sapiens") == "human"


def test_fetch_manifest_idempotent(spark, tmp_path):
    """S5/S6 exists-skip semantics, executor-side, with an injected fetcher."""
    cache = str(tmp_path / "cache")
    urls = [f"https://example.org/f{i}.txt" for i in range(3)]
    manifest = build_manifest(spark, urls, cache)

    def fake_fetcher(url: str, dest: str) -> None:
        with open(dest, "w") as fh:
            fh.write(url)

    first = dict((u, s) for u, _, s in fetch_manifest(manifest, fake_fetcher))
    assert set(first.values()) == {"fetched"}
    second = dict((u, s) for u, _, s in fetch_manifest(manifest, fake_fetcher))
    assert set(second.values()) == {"cached"}  # idempotent re-run
    assert open(mirror_path(cache, urls[0])).read() == urls[0]


def test_fetch_manifest_per_file_errors(spark, tmp_path):
    """One bad URL doesn't fail the job (unlike accessor.py:327-329's
    silent None — the status row carries the error loudly)."""
    manifest = build_manifest(spark, ["https://x/ok", "https://x/bad"], str(tmp_path))

    def flaky(url: str, dest: str) -> None:
        if url.endswith("bad"):
            raise IOError("boom")
        open(dest, "w").write("ok")

    statuses = {u: s for u, _, s in fetch_manifest(manifest, flaky)}
    assert statuses["https://x/ok"] == "fetched"
    assert statuses["https://x/bad"].startswith("error")


def test_land_parquet_partitioned(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("human", "sra", "p1", 1), ("human", "sra", "p2", 2)],
        ["organism", "dbase", "project", "v"],
    )
    land_parquet(df, lake, partition_by=["organism", "dbase", "project"])
    assert os.path.isdir(f"{lake}/organism=human/dbase=sra/project=p1")
    back = spark.read.parquet(lake)
    assert back.count() == 2
    # partition pruning: only p1's directory is listed in the pruned plan
    plan = back.filter("project = 'p1'")._jdf.queryExecution().executedPlan().toString()
    assert "p1" in plan
