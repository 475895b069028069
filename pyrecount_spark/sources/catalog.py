"""Catalog layer: data coordinates, URL synthesis, endpoint discovery.

Reproduces the reference's addressing scheme (SURVEY.md §1.1, §2.1 S1-S4)
as a pure-Python driver-side catalog whose *output* is a manifest DataFrame
consumed by Spark ingest jobs (sources/ingest.py). Semantics sources:
``/root/reference/src/pyrecount/models.py:7-40`` (enums),
``locator.py:7-187`` (URL synthesis), ``api.py:14-57`` (discovery).

Nothing here touches executors: the catalog is small metadata. The 100 TB
design splits cleanly — catalog on the driver, bytes on the cluster.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence


class Annotation(str, Enum):
    """Annotation sources (models.py:7-14)."""

    GENCODE_V29 = "G029"
    GENCODE_V26 = "G026"
    FANTOM6 = "F006"
    REFSEQ = "R109"
    ERCC = "ERCC"
    SIRV = "SIRV"
    GENCODE_V23 = "M023"  # mouse


class Dtype(str, Enum):
    """Logical entity kinds (models.py:17-22)."""

    METADATA = "metadata"
    GENE = "gene_sums"
    EXON = "exon_sums"
    JXN = "junctions"
    BW = "base_sums"


class Tags(str, Enum):
    """Per-project metadata file tags (models.py:25-32)."""

    RECOUNT_PROJECT = "recount_project"
    RECOUNT_QC = "recount_qc"
    RECOUNT_SEQ_QC = "recount_seq_qc"
    RECOUNT_PRED = "recount_pred"


class Extensions(str, Enum):
    """File extensions (models.py:35-40); all gzip-transparent (S13)."""

    MD = "MD.gz"
    GZ = "gz"
    MM = "MM.gz"
    RR = "RR.gz"


ORGANISM_LATIN = {"Homo sapiens": "human", "Mus musculus": "mouse"}


def normalize_organism(name: str) -> str:
    """utils.py:6-9 — pass through unmatched values."""
    return ORGANISM_LATIN.get(name, name)


def shard2(ident: str) -> str:
    """2-char sharding index = last two characters of the project/sample id
    (locator.py:66-80). Keeps any one directory's fan-out bounded — the same
    idea as hash-prefix partitioning in the parquet lake."""
    return ident[-2:]


@dataclass
class ProjectLocator:
    """URL synthesis for per-project data files (locator.py:82-164).

    ``urls(dtype)`` produces the full cartesian tags × extensions fan-out the
    reference builds (locator.py:86), with per-dtype path templates.
    """

    root: str
    organism: str
    dbase: str
    project_ids: Sequence[str]
    annotation: Annotation | None = None
    jxn_format: str = "all"
    samples_by_project: dict[str, Sequence[str]] = field(default_factory=dict)

    def _base(self, project_id: str) -> str:
        return posixpath.join(
            self.root, self.organism, "data_sources", self.dbase,
        )

    def metadata_urls(self) -> list[str]:
        """S3 metadata variant: tags = [dbase] + the four recount tags
        (locator.py:59-60); gtex/tcga drop `pred` (accessor.py:288-289)."""
        tags = [self.dbase] + [t.value for t in Tags]
        if self.dbase in ("gtex", "tcga"):
            tags = [t for t in tags if t != Tags.RECOUNT_PRED.value]
        urls = []
        for pid in self.project_ids:
            for tag in tags:
                urls.append(
                    posixpath.join(
                        self._base(pid), "metadata", shard2(pid), pid,
                        f"{self.dbase}.{tag}.{pid}.{Extensions.MD.value}",
                    )
                )
        return urls

    def counts_urls(self, dtype: Dtype) -> list[str]:
        """GENE/EXON: one annotated counts file + one shared annotation GTF
        per project (locator.py:96-108)."""
        if self.annotation is None:
            raise ValueError(f"{dtype.value} requires an annotation (locator.py:19-20)")
        ann = self.annotation.value
        urls = []
        for pid in self.project_ids:
            urls.append(
                posixpath.join(
                    self._base(pid), dtype.value, shard2(pid), pid,
                    f"{self.dbase}.{dtype.value}.{pid}.{ann}.gz",
                )
            )
            urls.append(
                posixpath.join(
                    self.root, self.organism, "annotations", f"{dtype.value}",
                    f"{self.organism}.{dtype.value}.{ann}.gtf.gz",
                )
            )
        return urls

    def junction_urls(self) -> list[str]:
        """JXN: ID + MM + RR triplet per project (locator.py:110-135)."""
        urls = []
        for pid in self.project_ids:
            base = posixpath.join(self._base(pid), Dtype.JXN.value, shard2(pid), pid)
            stem = f"{self.dbase}.junctions.{pid}.{self.jxn_format.upper()}"
            urls += [
                posixpath.join(base, f"{stem}.ID.gz"),
                posixpath.join(base, f"{stem}.{Extensions.MM.value}"),
                posixpath.join(base, f"{stem}.{Extensions.RR.value}"),
            ]
        return urls

    def bigwig_urls(self) -> list[tuple[str, str]]:
        """BW: one BigWig per (project, sample) (locator.py:139-159);
        returns (project_id, url) rows — the Q6 manifest seed. Path levels are
        {base_sums}/{shard2(pid)}/{pid}/{shard2(sample)}/{file}, matching the
        reference's project_index/project_id/sample_index nesting."""
        rows = []
        for pid in self.project_ids:
            for sample in self.samples_by_project.get(pid, []):
                rows.append(
                    (
                        pid,
                        posixpath.join(
                            self._base(pid), Dtype.BW.value,
                            shard2(pid), pid, shard2(sample),
                            f"{self.dbase}.base_sums.{pid}_{sample}.ALL.bw",
                        ),
                    )
                )
        return rows

    def urls(self, dtype: Dtype) -> list[str]:
        if dtype == Dtype.METADATA:
            return self.metadata_urls()
        if dtype in (Dtype.GENE, Dtype.EXON):
            return self.counts_urls(dtype)
        if dtype == Dtype.JXN:
            return self.junction_urls()
        if dtype == Dtype.BW:
            return [u for _, u in self.bigwig_urls()]
        raise ValueError(f"unknown dtype: {dtype}")


@dataclass
class CatalogLocator:
    """S4 (locator.py:167-187): one recount_project MD file per data source."""

    root: str
    organism: str
    dbases: Sequence[str]

    def urls(self) -> list[str]:
        return [
            posixpath.join(
                self.root, self.organism, "data_sources", db, "metadata",
                f"{db}.recount_project.MD.gz",
            )
            for db in self.dbases
        ]


def discover_data_sources(index_text: str) -> dict[str, str]:
    """S1 (api.py:25-36): parse the homes_index line-per-datasource listing
    into {basename: path}. Network fetch is the caller's concern (offline
    harnesses pass fixture text)."""
    out = {}
    for line in index_text.splitlines():
        line = line.strip()
        if line:
            out[posixpath.basename(line)] = line
    return out
