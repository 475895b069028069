"""Python Data Source plugin for MatrixMarket: schema, parallel byte-range
partitions, boundary ownership, header handling, gz fallback."""

from __future__ import annotations

import gzip

import pytest

from pyrecount_spark.sources.mm_datasource import (
    MatrixMarketDataSource,
    MatrixMarketReader,
    MMRange,
)


@pytest.fixture(scope="module")
def mtx(tmp_path_factory):
    p = tmp_path_factory.mktemp("mm") / "m.mtx"
    lines = ["%%MatrixMarket matrix coordinate real general",
             "% a comment line that makes the header longer than tiny ranges",
             "10 5 12"]
    rows = [(r, c, float(r * 10 + c)) for r in range(1, 5) for c in range(1, 4)]
    lines += [f"{r} {c} {v}" for r, c, v in rows]
    p.write_text("\n".join(lines) + "\n")
    return str(p), set(rows)


def test_registered_format_reads_and_matches_text_reader(spark, mtx):
    path, expected = mtx
    spark.dataSource.register(MatrixMarketDataSource)
    df = spark.read.format("matrixmarket").option("path", path).load()
    assert df.columns == ["row_idx", "col_idx", "value"]
    got = {(r.row_idx, r.col_idx, r.value) for r in df.collect()}
    assert got == expected

    from pyrecount_spark.sources.readers import read_matrix_market_coo

    legacy = {
        (r.row_idx, r.col_idx, r.value)
        for r in read_matrix_market_coo(spark, path).collect()
    }
    assert got == legacy


def test_byte_ranges_cover_exactly_once(mtx):
    # every numpartitions (including > line count) must yield each data
    # line exactly once — the splittable-text boundary contract
    path, expected = mtx
    for n in (1, 2, 3, 5, 64, 1000):
        reader = MatrixMarketReader({"path": path, "numpartitions": str(n)})
        parts = reader.partitions()
        rows = [t for p in parts for t in reader.read(p)]
        assert len(rows) == len(expected), f"n={n}"
        assert set(rows) == expected, f"n={n}"
    # parallelism is real: with n=3 more than one range yields rows
    reader = MatrixMarketReader({"path": path, "numpartitions": "3"})
    nonempty = [p for p in reader.partitions() if list(reader.read(p))]
    assert len(nonempty) > 1


def test_header_longer_than_first_range(tmp_path):
    # pathological: huge comment header, tiny body, many partitions — the
    # dims line must never leak through as a data row
    p = tmp_path / "h.mtx"
    p.write_text("%" + "x" * 500 + "\n%more\n2 2 2\n1 1 7.0\n2 2 9.0\n")
    reader = MatrixMarketReader({"path": str(p), "numpartitions": "16"})
    rows = [t for part in reader.partitions() for t in reader.read(part)]
    assert sorted(rows) == [(1, 1, 7.0), (2, 2, 9.0)]


def test_gz_single_partition(tmp_path):
    p = tmp_path / "g.mtx.gz"
    with gzip.open(p, "wt") as f:
        f.write("%c\n3 3 2\n1 2 4.0\n3 1 5.0\n")
    reader = MatrixMarketReader({"path": str(p)})
    parts = reader.partitions()
    assert len(parts) == 1  # gz is not byte-seekable
    assert sorted(reader.read(parts[0])) == [(1, 2, 4.0), (3, 1, 5.0)]


def test_pattern_only_matrix_defaults_value(tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n2 2 2\n1 2\n2 1\n")
    reader = MatrixMarketReader({"path": str(p), "numpartitions": "2"})
    rows = sorted(t for part in reader.partitions() for t in reader.read(part))
    assert rows == [(1, 2, 1.0), (2, 1, 1.0)]
