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
    (b"BM", "image/bmp"),
    (b"P6", "image/x-portable-pixmap"),
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


# --------------------------------------------------------- stdlib codecs
#
# The container ships no image libraries, but two public formats are
# decodable with struct alone: BMP (Windows BITMAPINFOHEADER, uncompressed
# 24-bit BI_RGB) and binary PPM (netpbm P6).  These give the multimodal
# pipeline one REAL pixel path end-to-end; compressed formats (JPEG/PNG)
# still go through the pluggable ``real_decoder`` and raise/stub honestly.


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24-bit BMP to (width, height, row-major
    top-down RGB bytes).  Supports positive (bottom-up, the common case)
    and negative (top-down) heights and the 4-byte row padding the format
    mandates; anything but 24 bpp / BI_RGB raises NotImplementedError."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width = struct.unpack_from("<i", data, 18)[0]
    height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    out = bytearray(width * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pix_off + src_row * stride
        rowbytes = data[base:base + width * 3]
        if len(rowbytes) < width * 3:
            raise ValueError("truncated BMP pixel data")
        # stored BGR -> emitted RGB (strided slice swap, no per-pixel loop)
        dst = memoryview(out)[row * width * 3:(row + 1) * width * 3]
        dst[0::3] = rowbytes[2::3]
        dst[1::3] = rowbytes[1::3]
        dst[2::3] = rowbytes[0::3]
    return width, h, bytes(out)


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Decode a binary netpbm P6 image (maxval 255) to (width, height,
    row-major top-down RGB bytes).  Header comments (#...) and arbitrary
    whitespace are handled per the public netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM file")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval-255 PPM supported")
    need = width * height * 3
    pixels = data[pos:pos + need]
    if len(pixels) < need:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes as an uncompressed 24-bit
    bottom-up BMP (the canonical layout) — the write path for tests and
    for materializing decoded frames."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        src = rgb[row * width * 3:(row + 1) * width * 3]
        bgr = bytearray(len(src))
        bgr[0::3] = src[2::3]
        bgr[1::3] = src[1::3]
        bgr[2::3] = src[0::3]
        body += bgr + pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes as binary P6 PPM."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM payload to (sample_rate, n_channels,
    interleaved integer samples).  Walks the RIFF chunk list per the
    public spec (tolerating LIST/fact/etc. chunks and odd-size padding),
    supports 16-bit signed and 8-bit unsigned PCM; anything else
    (float, ADPCM, extensible) raises NotImplementedError."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"only PCM (format 1) supported, got format {audio_fmt}"
                )
            if bits not in (8, 16):
                raise NotImplementedError(f"only 8/16-bit PCM, got {bits}")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            n_ch, rate, bits = fmt
            if bits == 16:
                usable = len(body) - len(body) % 2
                samples = list(
                    struct.unpack(f"<{usable // 2}h", body[:usable])
                )
            else:  # 8-bit PCM is unsigned, centered at 128
                samples = [b - 128 for b in body]
        pos += 8 + size + (size % 2)  # chunks pad to even offsets
    if fmt is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    n_ch, rate, _ = fmt
    return rate, n_ch, samples


def encode_wav(sample_rate: int, n_channels: int, samples: list[int],
               bits: int = 16) -> bytes:
    """Encode interleaved integer samples as RIFF/WAVE PCM."""
    import struct

    if bits == 16:
        body = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        body = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise NotImplementedError(f"only 8/16-bit PCM, got {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def audio_stat_features(data: bytes):
    """[sample_rate, n_channels, n_samples, rms, zero_crossings] from a
    PCM WAV payload, or None when the payload is not RIFF/WAVE.  All
    stats are exact-integer sums finished with one double op, so a SQL
    oracle reproduces them bit-for-bit."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    import math

    rate, n_ch, samples = decode_wav(data)
    n = len(samples)
    if n == 0:
        return [float(rate), float(n_ch), 0.0, 0.0, 0.0]
    sum_sq = sum(s * s for s in samples)
    crossings = sum(
        1 for i in range(1, n)
        if (samples[i] >= 0) != (samples[i - 1] >= 0)
    )
    return [
        float(rate),
        float(n_ch),
        float(n),
        math.sqrt(sum_sq / n),
        float(crossings),
    ]


def decode_image(data: bytes):
    """Dispatch to the stdlib codec for the payload's format, or None if
    no in-container codec exists (JPEG/PNG/...)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    return None


def image_stat_features(data: bytes):
    """[width, height, mean_r, mean_g, mean_b] from a decodable payload,
    or None when no stdlib codec applies.  Channel means are float64
    sums of exact ints — deterministic and oracle-reproducible."""
    decoded = decode_image(data)
    if decoded is None:
        return None
    width, height, rgb = decoded
    n = max(1, width * height)
    return [
        float(width),
        float(height),
        sum(rgb[0::3]) / n,
        sum(rgb[1::3]) / n,
        sum(rgb[2::3]) / n,
    ]


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
    """Decode + feature-extract pipeline.

    ``real_decoder(payload: bytes) -> list[float]`` plugs in an actual
    codec/model.  Without one, the DEFAULT path first tries the stdlib
    codecs (:func:`image_stat_features` — real pixel decode for
    uncompressed BMP/P6 PPM: [w, h, mean_r, mean_g, mean_b]); payloads
    with no in-container codec (JPEG/PNG/...) fall through to the
    clearly-marked DETERMINISTIC FAKE (byte-histogram buckets,
    normalized) so the distributed plumbing stays testable.  Raise-on-use
    behavior for genuinely unsupported media lives in the decoder.
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
                    continue
                stats = image_stat_features(data)
                if stats is None:
                    stats = audio_stat_features(data)
                if stats is not None:  # real stdlib pixel/PCM decode
                    features.append(stats)
                else:
                    # STUB: deterministic byte-histogram "embedding" for
                    # formats with no in-container codec.
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
