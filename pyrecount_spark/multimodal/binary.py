"""Multimodal column plumbing (SURVEY.md §2.10): binary payloads + metadata.

Generalizes the reference's BigWig manifest pattern (Q6, accessor.py:585-610
— catalog the files, never parse them inline) to the training-data shape:
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas iterators (``mapInPandas``) so bytes cross the JVM↔Python boundary
in columnar batches, never row-at-a-time.

Image decode probes for PIL **at runtime on the executor**: when Pillow is
importable the real codec runs (``Image.open`` / ``Image.resize``); when it
isn't (this container) a deterministic content-hash fake keeps the
Spark-side contract — schema, batch shape, partitioning — real and
testable. The probe lives inside the nested UDF body so cloudpickle ships
everything by value; payloads that aren't decodable images (e.g. the text
bytes the test oracles use) fall back to the fake on either path, so
results are identical on PIL-less and PIL-ful clusters for non-image
bytes while real images get real dimensions wherever Pillow exists.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("length", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary lake scan via the ``binaryFile`` source: (path, modificationTime,
    length, content). Pushdown on path/length happens at the file index — at
    100 TB always filter by partition directory or pathGlobFilter, never
    post-scan."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_media_type(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Cheap typed metadata from the path extension (native expr)."""
    ext = F.lower(F.regexp_extract(F.col(path_col), r"\.([A-Za-z0-9]+)$", 1))
    media = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .when(ext.isin("bw", "bigwig"), "genomic_coverage")
        .otherwise("binary")
    )
    return df.withColumn("media_type", media)


def extract_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task receives columnar pandas batches; the decode
    loop is per-row *inside* the batch (unavoidable for codec calls) but
    transfer and scheduling stay vectorized. Narrow op — no shuffle.

    Decode probes Pillow on the executor: real images get
    ``PIL.Image.open(...).size``; undecodable payloads (and PIL-less
    executors) get deterministic fake dims from a content hash. Nested so
    cloudpickle ships it by value — the job runs on executors that don't
    have this package installed."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        try:
            from PIL import Image
        except ImportError:
            Image = None

        def decode_image(content: bytes) -> tuple[int, int]:
            if Image is not None:
                try:
                    with Image.open(io.BytesIO(content)) as im:
                        return int(im.width), int(im.height)
                except Exception:
                    pass
            h = hashlib.sha256(content).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192

        for pdf in batches:
            dims = [decode_image(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_bytes": [len(bytes(b)) for b in pdf[content_col]],
                    "content_sha": [
                        hashlib.sha256(bytes(b)).hexdigest() for b in pdf[content_col]
                    ],
                }
            )

    return df.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    content_col: str = "content",
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per sampled
    "frame" (here: a byte-offset slice marker — the decode stub). Explode is
    narrow; real decoders slot into the same shape."""
    offsets = F.sequence(
        F.lit(0),
        F.least(
            F.floor(F.length(F.col(content_col)) / every_n_bytes).cast("int"),
            F.lit(max_frames - 1),
        ),
    )
    return df.select("path", F.explode(offsets).alias("frame_idx")).withColumn(
        "byte_offset", F.col("frame_idx").cast("long") * every_n_bytes
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("dst_width", IntegerType()),
        StructField("dst_height", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resized_bytes", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: int = 224,
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched image resize to ``target`` on the short side, aspect
    preserved (the standard vision-model preprocessing shape).

    Same contract as ``extract_image_features``: mapInPandas columnar
    batches, narrow op, no shuffle. Pixel work probes Pillow on the
    executor: decodable images are really resized (RGB raw bytes out);
    undecodable payloads / PIL-less executors produce a deterministic
    content-seeded placeholder of exactly dst_w·dst_h·3 bytes so downstream
    schema and byte budgeting stay real either way. Nested fn ⇒ cloudpickle
    by-value (vanilla executors).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        try:
            from PIL import Image
        except ImportError:
            Image = None

        def real_resize(raw: bytes):
            """(src_w, src_h, dst_w, dst_h, rgb_bytes) or None."""
            if Image is None:
                return None
            try:
                with Image.open(io.BytesIO(raw)) as im:
                    w, h = int(im.width), int(im.height)
                    dw, dh = dst_dims(w, h)
                    rgb = im.convert("RGB").resize((dw, dh))
                    return w, h, dw, dh, rgb.tobytes()
            except Exception:
                return None

        def decode_image(content: bytes) -> tuple[int, int]:
            h = hashlib.sha256(content).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192

        def dst_dims(w: int, h: int) -> tuple[int, int]:
            if w <= h:
                return target, max(1, round(h * target / w))
            return max(1, round(w * target / h)), target

        for pdf in batches:
            rows = {k: [] for k in (
                "path", "src_width", "src_height", "dst_width", "dst_height",
                "resized", "resized_bytes",
            )}
            for path, content in zip(pdf["path"], pdf[content_col]):
                raw = bytes(content)
                real = real_resize(raw)
                if real is not None:
                    w, h, dw, dh, pixels = real
                else:
                    w, h = decode_image(raw)
                    dw, dh = dst_dims(w, h)
                    n = dw * dh * 3
                    # deterministic placeholder pixels: content-seeded, exact size
                    seed = hashlib.sha256(raw).digest()
                    pixels = (seed * (n // len(seed) + 1))[:n]
                rows["path"].append(path)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["dst_width"].append(dw)
                rows["dst_height"].append(dh)
                rows["resized"].append(pixels)
                rows["resized_bytes"].append(dw * dh * 3)
            yield pd.DataFrame(rows)

    return df.mapInPandas(resize, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("rms_q15", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame, content_col: str = "content", assumed_rate: int = 16_000
) -> DataFrame:
    """Audio feature extraction over opaque binary payloads — the audio twin
    of ``extract_image_features``: Arrow-batched ``mapInPandas``, narrow, no
    shuffle. The decode body is a STUB (no soundfile/librosa in this
    container): rate/channels/RMS come from a deterministic content hash,
    duration from the byte length at the assumed PCM16 rate. Production
    swaps the body for a real decoder at the same call site; the Spark-side
    contract (schema, batch shape, per-file row) is what's under test.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {k: [] for k in (
                "path", "sample_rate", "n_channels", "duration_ms", "rms_q15", "n_bytes",
            )}
            for path, content in zip(pdf["path"], pdf[content_col]):
                raw = bytes(content)
                h = hashlib.sha256(raw).digest()
                channels = 1 + h[2] % 2
                # PCM16: 2 bytes/sample/channel at the assumed rate
                n_samples = len(raw) // (2 * channels)
                rows["path"].append(path)
                rows["sample_rate"].append(assumed_rate)
                rows["n_channels"].append(channels)
                rows["duration_ms"].append(n_samples * 1000 // assumed_rate)
                rows["rms_q15"].append(int.from_bytes(h[3:5], "big") % 32768)
                rows["n_bytes"].append(len(raw))
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
