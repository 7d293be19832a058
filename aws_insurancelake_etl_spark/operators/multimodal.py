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


def frame_sample_stub(df: DataFrame, id_col: str = "media_id",
                      binary_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Video frame sampling requires a codec not present in this container."""
    raise NotImplementedError(
        "Video frame sampling needs an ffmpeg/pyav decoder; wire one through "
        "decode_and_featurize(real_decoder=...) when available"
    )
