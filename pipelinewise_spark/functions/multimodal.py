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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode → resize → re-encode, as Arrow-batched ``mapInPandas``.

    Stub re-encode: the "resized" payload is the first
    ``target_w*target_h/8`` bytes of the original (deterministic,
    oracle-checkable); a real implementation swaps the lambda for
    PIL/libvips at this seam. Output rows carry the new binary payload,
    its hash/size, and the target dimensions — the same shape a real
    resizer produces, so downstream plumbing is exercised for real."""
    import hashlib

    budget = (target_w * target_h) // 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires codec libraries (PIL/libvips);"
                    " replace the stub re-encode at this seam"
                )
            resized = pdf["content"].map(
                lambda b: (bytes(b) if b is not None else b"")[:budget]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": resized,
                    "content_hash": resized.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "n_bytes": resized.map(len).astype("int64"),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    fps: int = 25,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row-expanding
    ``mapInPandas`` — the Arrow path for 1→N decode). Frame count comes from
    the (stub) decoder; indices step by ``every_n``; ``ts_ms`` assumes
    ``fps``. Stub frame payload hash = sha256(content ‖ '-' ‖ index), so the
    expansion is deterministic and oracle-checkable; a real decoder emits
    actual frame bytes at the same seam."""
    import hashlib

    ms_per_frame = 1000 // fps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg; replace the stub "
                    "decoder at this seam"
                )
            ids, idxs, tss, hashes = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                content = bytes(b) if b is not None else b""
                _w, _h, n_frames = _fake_decode(content)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * ms_per_frame)
                    hashes.append(
                        hashlib.sha256(
                            content + b"-" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def perceptual_hash(
    media: DataFrame,
    content_col: str = "content",
    bits: int = 32,
    out_col: str = "phash",
) -> DataFrame:
    """Blockhash-style perceptual signature over raw media bytes — the
    image-modality entry into the near-dup family, entirely JVM-side.

    ``bits`` byte samples are taken at a fixed stride across the
    payload (positions cycle modulo length, so any size is total), and
    bit i of the signature is set when sample i exceeds the mean of all
    samples — the classic blockhash/aHash mean-threshold scheme. For
    real images the sampling grid should run over DECODED luma (plug a
    codec in at the extract_features seam and hash its grid instead);
    over raw bytes the signature is still a locality-sensitive content
    fingerprint: near-identical payloads (re-saves, appended metadata,
    truncated tails) agree on most sampled bytes, so their signatures
    sit within small Hamming distance — exactly what
    ``functions/dedup.py:hamming_near_dup_pairs`` consumes. All
    arithmetic is integer-or-exact (byte values via hex→conv; the mean
    divides by the power-of-two ``bits``), so any engine reproduces the
    signature bit-for-bit."""
    c = F.col(content_col)
    n = F.octet_length(c)
    nz = F.greatest(n, F.lit(1))
    stride = F.greatest(F.lit(1), F.floor(n / F.lit(bits)).cast("int"))

    def byte_at(i: int):
        pos = (F.lit(i) * stride) % nz + 1
        return F.conv(F.hex(F.substring(c, pos, F.lit(1))), 16, 10).cast(
            "int"
        )

    # materialize the sample array and its mean ONCE per row: the mean
    # is itself an aggregate over the array, and referencing it inside
    # the signature fold would re-evaluate all `bits` byte extractions
    # per fold step — an O(bits²) expression blowup (measured 16×
    # slower at sf0.1 before this split)
    stage = media.withColumn(
        "__ph_samples", F.array(*[byte_at(i) for i in range(bits)])
    ).withColumn(
        "__ph_mean",
        F.aggregate(
            F.col("__ph_samples"),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        / F.lit(float(bits)),
    )
    sig = F.aggregate(
        F.zip_with(
            F.col("__ph_samples"),
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda s, i: F.struct(s.alias("s"), i.alias("i")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.when(
            x["s"].cast("double") > F.col("__ph_mean"),
            # 2^i exact in double for i < 53, then exact bigint
            F.pow(F.lit(2.0), x["i"].cast("double")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return stage.withColumn(
        out_col, F.when(n > 0, sig).otherwise(F.lit(0).cast("bigint"))
    ).drop("__ph_samples", "__ph_mean")
