"""RoaringBitmap (de)serialization for Delta Lake DELETION VECTORS.

Delta's deletion vectors (PROTOCOL.md §Deletion Vectors) store the set
of deleted row indexes of one data file as a 64-bit roaring bitmap in
the "portable" layout of the published RoaringBitmap interchange spec
(github.com/RoaringBitmap/RoaringFormatSpec), prefixed by Delta's magic
number:

- ``magic``: int32 LE ``1681511377``
- ``number of 32-bit buckets``: int64 LE
- per bucket, ascending: ``key`` (int32 LE, the values' upper 32 bits)
  then the bucket's 32-bit roaring bitmap in the STANDARD portable
  format:

  - cookie int32 LE: ``12347`` in the low 16 bits ⇒ run containers
    present, container count = (cookie >> 16) + 1, followed by the
    run-flag bitset (ceil(n/8) bytes); ``12346`` ⇒ no runs, container
    count in the next int32 LE;
  - descriptive headers: per container ``(key uint16, cardinality-1
    uint16)``;
  - offset headers (int32 LE each): present when cookie is 12346 or
    container count >= 4 — skipped on read (containers are parsed in
    order);
  - containers: run = ``n_runs uint16`` then ``(start, length)`` uint16
    pairs (values start..start+length); array (cardinality <= 4096) =
    sorted uint16 values; bitmap = 8192 bytes (1024 uint64 LE words).

The DECODER accepts all three container kinds; the ENCODER always emits
the no-run layout (array/bitmap containers only) — legal per spec and
what fixture tables need.  Both live here so tests can assert exact
byte-level vectors against the spec, not just encode→decode identity.

Z85 (ZeroMQ base-85, the alphabet the Delta spec names for encoding DV
UUIDs and inline DVs in the log) is included: 4 bytes → 5 chars,
big-endian.
"""

from __future__ import annotations

import struct

DELTA_DV_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class RoaringError(ValueError):
    """Malformed or unsupported roaring-bitmap bytes."""


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise RoaringError(f"z85 input length {len(data)} not multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        value = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            value, rem = divmod(value, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise RoaringError(f"z85 text length {len(text)} not multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        value = 0
        for ch in text[i:i + 5]:
            try:
                value = value * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise RoaringError(f"invalid z85 character {ch!r}") from None
        if value >> 32:
            raise RoaringError("z85 chunk overflows 32 bits")
        out += value.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------------------ 32-bit part


def _decode_rbm32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit portable roaring bitmap starting at ``pos``;
    returns (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    run_flags = b""
    if cookie & 0xFFFF == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        n_flag_bytes = (n_containers + 7) // 8
        run_flags = buf[pos:pos + n_flag_bytes]
        pos += n_flag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        (n_containers,) = struct.unpack_from("<i", buf, pos)
        pos += 4
    else:
        raise RoaringError(f"unknown roaring cookie {cookie}")
    headers = []
    for _ in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    has_offsets = (
        cookie == _SERIAL_COOKIE_NO_RUNCONTAINER
        or n_containers >= _NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        pos += 4 * n_containers  # parsed in order; offsets unneeded
    values: list[int] = []
    for idx, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags) and bool(
            run_flags[idx // 8] & (1 << (idx % 8))
        )
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, word in enumerate(words):
                while word:
                    low = word & -word
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    word ^= low
    return values, pos


def _encode_rbm32(values: list[int]) -> bytes:
    """Encode sorted uint32 values in the NO_RUNCONTAINER portable
    layout (array/bitmap containers)."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    out = bytearray()
    out += struct.pack("<i", _SERIAL_COOKIE_NO_RUNCONTAINER)
    out += struct.pack("<i", len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    # offset header (mandatory for cookie 12346)
    body_start = len(out) + 4 * len(keys)
    offsets = []
    cursor = body_start
    bodies = []
    for k in keys:
        vals = sorted(buckets[k])
        if len(vals) <= 4096:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        offsets.append(cursor)
        cursor += len(body)
        bodies.append(body)
    for off in offsets:
        out += struct.pack("<i", off)
    for body in bodies:
        out += body
    return bytes(out)


# ------------------------------------------------ 64-bit + Delta wrapper


def encode_delta_dv(values) -> bytes:
    """Serialize row indexes as Delta's magic-prefixed portable 64-bit
    roaring bitmap (the ``deletionVector`` payload)."""
    values = sorted(set(int(v) for v in values))
    if values and values[0] < 0:
        raise RoaringError("negative row index")
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", DELTA_DV_MAGIC)
    out += struct.pack("<q", len(buckets))
    for key in sorted(buckets):
        out += struct.pack("<i", key)
        out += _encode_rbm32(sorted(buckets[key]))
    return bytes(out)


def decode_delta_dv(data: bytes) -> list[int]:
    """Parse a magic-prefixed portable 64-bit roaring bitmap into the
    sorted list of row indexes."""
    if len(data) < 12:
        raise RoaringError(f"deletion vector too short ({len(data)} bytes)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DELTA_DV_MAGIC:
        raise RoaringError(
            f"bad deletion-vector magic {magic} (want {DELTA_DV_MAGIC})"
        )
    (n_buckets,) = struct.unpack_from("<q", data, 4)
    pos = 12
    values: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        low, pos = _decode_rbm32(data, pos)
        base = key << 32
        values.extend(base + v for v in low)
    return sorted(values)
