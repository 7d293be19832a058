"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake features, clearly marked) — but the Spark-side plumbing
is real and tested: schema contract, batch iteration shape, partition-count
control, and the metadata extraction that *is* computable from raw bytes
(size, magic-number sniffing, content hash).

At 100 TB, the rules this module encodes:
- binary payloads ride in their own column; metadata columns stay scalar so
  filters/pruning never touch the bytes;
- per-batch processing via ``mapInPandas`` (Arrow) — one Python round-trip
  per batch, not per row;
- ``repartition`` before heavy decode so each task holds a bounded number
  of payloads (``target_rows_per_partition``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC_NUMBERS = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sniff_content_type_bytes(payload: bytes | None) -> str:
    if not payload:
        return "unknown"
    for magic, content_type in _MAGIC_NUMBERS:
        if payload.startswith(magic):
            return content_type
    return "application/octet-stream"


def extract_media_metadata(df: DataFrame, id_col: str = "media_id",
                           binary_col: str = "payload") -> DataFrame:
    """Metadata pass that never leaves the JVM except for type sniffing:
    byte length and sha256 are native; content-type sniffing is a
    mapInPandas batch pass over (id, first-8-bytes) only."""
    head = F.expr(f"substring({binary_col}, 1, 8)")
    meta = df.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        head.alias("__head"),
        F.sha2(F.col(binary_col), 256).alias("content_sha256"),
    )

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "n_bytes", "content_sha256"]].copy()
            out["content_type"] = pdf["__head"].map(
                lambda b: sniff_content_type_bytes(bytes(b) if b is not None else None)
            )
            yield out[["media_id", "n_bytes", "content_type", "content_sha256"]]

    return meta.mapInPandas(sniff, MEDIA_META_SCHEMA)


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "payload",
    feature_dim: int = 8,
    target_rows_per_partition: int = 1024,
    real_decoder=None,
) -> DataFrame:
    """Decode + feature-extract pipeline shell.

    ``real_decoder(payload: bytes) -> list[float]`` plugs in an actual
    codec/model; without one, a DETERMINISTIC FAKE (byte-histogram buckets,
    normalized) stands in so the distributed plumbing is testable.  Raise-
    on-use behavior for genuinely unsupported media lives in the decoder.
    """
    n_parts = max(1, df.count() // target_rows_per_partition) if df.isStreaming is False else None
    work = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))
    if n_parts:
        work = work.repartition(n_parts)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                if real_decoder is not None:
                    features.append(real_decoder(data))
                else:
                    # STUB: deterministic byte-histogram "embedding".
                    buckets = [0] * feature_dim
                    for byte in data:
                        buckets[byte % feature_dim] += 1
                    total = max(1, len(data))
                    features.append([b / total for b in buckets])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": features})

    return work.mapInPandas(featurize, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "payload",
    frame_size: int = 256,
    max_frames: int = 8,
    real_decoder=None,
    target_rows_per_partition: int = 1024,
) -> DataFrame:
    """Frame sampling: one media row fans out to up to ``max_frames`` frame
    rows, each carrying (1-based index, byte offset, size, sha256) — the
    row-generator shape every video/audio chunking pipeline needs.

    ``real_decoder(payload: bytes) -> list[bytes]`` plugs in an actual
    demuxer (ffmpeg/pyav — not present in this container); the default is a
    DETERMINISTIC FAKE that windows the payload into fixed-size byte
    strides, so the distributed plumbing (repartition before fan-out, Arrow
    batch iteration, per-frame schema, offset bookkeeping) is real and
    oracle-checkable.  Frames are hashed, never returned as payload
    columns — downstream filters touch scalars only.
    """
    if not df.isStreaming:
        n_parts = max(1, df.count() // target_rows_per_partition)
        df = df.repartition(n_parts)
    work = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_index", "frame_offset", "n_frame_bytes",
                    "frame_sha256")}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if real_decoder is not None:
                    frames = list(real_decoder(data))[:max_frames]
                    offsets = [-1] * len(frames)  # codec frames have no byte offset
                else:
                    offsets = list(range(0, len(data), frame_size))[:max_frames]
                    frames = [data[o:o + frame_size] for o in offsets]
                for i, (off, frame) in enumerate(zip(offsets, frames)):
                    out["media_id"].append(media_id)
                    out["frame_index"].append(i + 1)
                    out["frame_offset"].append(off)
                    out["n_frame_bytes"].append(len(frame))
                    out["frame_sha256"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return work.mapInPandas(sample, FRAME_SCHEMA)


def plan_image_patches(
    df: DataFrame,
    patch: int = 32,
    id_col: str = "media_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """ViT-style patch-grid PLANNING from image dimension metadata: one
    (media_id, patch_idx, x0, y0) row per non-overlapping patch, row-major,
    truncating partial edges (floor(w/p) x floor(h/p) patches) — the
    coordinate plan a decode stage consumes, computed WITHOUT touching
    pixel bytes.  Pure arithmetic fan-out: a narrow ``sequence`` explode
    over the patch count, then div/mod recover the grid position — zero
    shuffles, no Python.  At 100 TB the payload column is never read
    (column pruning), so the plan stage costs metadata I/O only; the
    decode stage that consumes it is the Arrow ``mapInPandas`` path used
    by ``sample_frames``."""
    nx = F.floor(F.col(width_col) / patch)
    ny = F.floor(F.col(height_col) / patch)
    planned = df.select(
        F.col(id_col).alias("media_id"),
        nx.cast("long").alias("__nx"),
        (nx * ny).cast("long").alias("__n"),
    )
    return (
        planned.where(F.col("__n") >= 1)
        .select(
            "media_id",
            "__nx",
            F.explode(F.expr("sequence(0, __n - 1)")).alias("patch_idx"),
        )
        .select(
            "media_id",
            "patch_idx",
            ((F.col("patch_idx") % F.col("__nx")) * patch).alias("x0"),
            (F.floor(F.col("patch_idx") / F.col("__nx")) * patch).alias("y0"),
        )
    )
