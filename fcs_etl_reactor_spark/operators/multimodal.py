"""Multimodal (binary) columns — SURVEY.md §2.11 L6.

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata, exactly like the FCS DATA segment: the
relational layer routes/filters/joins; Arrow-batched Python does the
per-blob work.

The container has no image/audio codecs, so the DECODE step is
stubbed (deterministic fake decoder behind ``decode_stub=True``;
``NotImplementedError`` otherwise) — but the Spark-side plumbing is
real and tested: binaryFile ingest, schema, mapInPandas batch shape,
partition-by-modality writes, and metadata extraction (magic-number
sniffing, byte stats) that needs no codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "path STRING, modality STRING, n_bytes BIGINT, magic STRING, content BINARY"
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
    (b"FCS", "cytometry/fcs"),
]


def sniff_modality(head: bytes) -> str:
    for magic, modality in _MAGIC:
        if head.startswith(magic):
            return modality
    return "application/octet-stream"


def sniff_media(blobs: DataFrame) -> DataFrame:
    """Attach sniffed modality + byte-level metadata to any
    (path STRING, content BINARY) frame — Arrow-batched, no codec."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": [sniff_modality(bytes(c[:16])) for c in content],
                    "n_bytes": [len(c) for c in content],
                    "magic": [bytes(c[:4]).hex() for c in content],
                    "content": content,
                }
            )

    return blobs.select("path", "content").mapInPandas(_meta, MEDIA_SCHEMA)


def read_media(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of arbitrary binary files with sniffed
    modality and byte-level metadata. One row per file; files are the
    parallel unit (same scaling argument as FCS ingest)."""
    return sniff_media(spark.read.format("binaryFile").load(path))


FEATURE_SCHEMA = "path STRING, modality STRING, feature ARRAY<FLOAT>"


def extract_features(
    df: DataFrame, feature_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract per blob via mapInPandas.

    With ``decode_stub`` the "decoder" is a deterministic byte-
    histogram projection (stands in for a real image/audio model; the
    batch shape, schema, and partitioning are what this operator
    exercises). Without it, raises NotImplementedError — the container
    has no codecs (PIL/ffmpeg); plug a real decoder there in prod.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if not decode_stub:
                    raise NotImplementedError(
                        "no media codecs in this environment; supply a real "
                        "decoder (PIL/torchaudio/ffmpeg) here"
                    )
                arr = np.frombuffer(bytes(c), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=feature_dim, range=(0, 256))
                denom = max(len(arr), 1)
                feats.append((hist / denom).astype(np.float32))
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return df.select("path", "modality", "content").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def write_partitioned_by_modality(df: DataFrame, path: str) -> None:
    """S5 for media: partition the lake by modality so downstream scans
    prune entire modalities."""
    df.write.mode("overwrite").partitionBy("modality").parquet(path)
