"""MatrixMarket as a PySpark 4 Python Data Source.

Formalizes the S10 scan (readers.py:82, reference accessor.py:431-432 —
which densifies via scipy ``mmread``; we stay sparse) as a first-class
``spark.read.format("matrixmarket")`` plugin using the Python Data Source
API (pyspark.sql.datasource, new in Spark 4): schema declaration, option
handling, and BYTE-RANGE input partitions so one large .mtx file scans in
parallel across executors — each task seeks to its range start, aligns to
the next newline, and parses to the first line boundary past its range
end (the standard splittable-text contract, same as Hadoop TextInputFormat).

Comment (``%``) lines are dropped; the dims header line (first
non-comment line, always in the first range) is skipped by the first
partition. Gzip inputs are not byte-seekable — a ``.gz`` path degrades to
a single partition rather than failing.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class MMRange(InputPartition):
    def __init__(self, path: str, start: int, end: int, first: bool):
        self.path = path
        self.start = start
        self.end = end
        self.first = first  # only the first range skips the dims header


class MatrixMarketDataSource(DataSource):
    """``spark.dataSource.register(MatrixMarketDataSource)`` then
    ``spark.read.format("matrixmarket").option("path", p).load()``."""

    @classmethod
    def name(cls) -> str:
        return "matrixmarket"

    def schema(self) -> str:
        return "row_idx bigint, col_idx bigint, value double"

    def reader(self, schema) -> "MatrixMarketReader":
        return MatrixMarketReader(self.options)


class MatrixMarketReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("matrixmarket source requires a path")
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> Sequence[MMRange]:
        size = os.path.getsize(self.path)
        if self.path.endswith(".gz") or size == 0:
            return [MMRange(self.path, 0, size, True)]
        # Locate the body start (after comments + the dims line) on the
        # driver — a bounded header scan — so byte ranges only ever cover
        # data lines and no range needs header-skipping logic. Without
        # this, a header longer than the first range would leak the dims
        # line into range 1 as a bogus data row.
        with open(self.path, "rb") as f:
            while True:
                raw = f.readline()
                if not raw:
                    break
                if not raw.decode().startswith("%") and raw.strip():
                    break  # dims line consumed
            data_start = f.tell()
        body = size - data_start
        n = max(1, min(self.num_partitions, max(body, 1)))
        step = body // n
        bounds = [data_start + i * step for i in range(n)] + [size]
        return [
            MMRange(self.path, bounds[i], bounds[i + 1], i == 0)
            for i in range(n)
        ]

    def read(self, part: MMRange) -> Iterator[tuple]:
        import gzip

        if part.path.endswith(".gz"):
            with gzip.open(part.path, "rt") as f:
                yield from self._parse_lines(f, skip_dims=True)
            return
        with open(part.path, "rb") as f:
            f.seek(part.start)
            if not part.first:
                # align: the line containing byte `start` belongs to the
                # previous range (range 0 starts exactly on the first data
                # line, so it must not align-skip)
                f.readline()
            while True:
                # a line belongs to the range containing its FIRST byte
                # (lines starting at exactly `end` belong here — the next
                # range's alignment readline skips them); it may extend
                # past `end`
                if f.tell() > part.end:
                    break
                raw = f.readline()
                if not raw:
                    break
                line = raw.decode()
                if line.startswith("%") or not line.strip():
                    continue
                yield self._parse(line)

    def _parse_lines(self, f, skip_dims: bool) -> Iterator[tuple]:
        for line in f:
            if line.startswith("%") or not line.strip():
                continue
            if skip_dims:
                skip_dims = False
                continue
            yield self._parse(line)

    @staticmethod
    def _parse(line: str) -> tuple:
        parts = line.split()
        value = float(parts[2]) if len(parts) > 2 else 1.0
        return (int(parts[0]), int(parts[1]), value)


def register(spark) -> None:
    """Idempotent registration of the matrixmarket format."""
    spark.dataSource.register(MatrixMarketDataSource)
