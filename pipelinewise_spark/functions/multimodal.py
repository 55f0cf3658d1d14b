"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row-by-row. The decode step itself is STUBBED
(codec libraries are not in this environment): ``decode_stub=True`` produces
a deterministic fake (header-derived pseudo width/height); ``False`` raises
NotImplementedError at the exact integration point a real decoder (PIL,
ffmpeg, torchaudio) plugs into. The Spark-side contract — schema, batch
iteration, partition independence — is real and tested.

Scale: mapInPandas streams Arrow batches per partition; media bytes stay in
columnar buffers, CPU-bound decode parallelizes with input splits. Decoded
features should be written as narrow sidecar tables keyed by content hash so
re-partitioning the 100 TB media table is never needed for feature joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str,
                   media_type: str = "image") -> DataFrame:
    """Wrap an arbitrary payload column as the canonical media table shape
    (binary content + content hash + size) — all JVM-side expressions."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.sha2(content, 256).alias("content_hash"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def _fake_decode(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derive pseudo dimensions from the
    first bytes. Replace with a real decoder at this seam."""
    if not content:
        return (0, 0, 0)
    w = 16 + (content[0] % 64) * 16
    h = 16 + (content[min(1, len(content) - 1)] % 64) * 16
    frames = 1 + content[min(2, len(content) - 1)] % 8
    return (w, h, frames)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode media and emit typed features via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg); "
                    "install and replace _fake_decode at this seam"
                )
            decoded = pdf["content"].map(
                lambda b: _fake_decode(bytes(b) if b is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
