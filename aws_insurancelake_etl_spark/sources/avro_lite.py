"""Minimal pure-stdlib Avro Object Container File reader/writer.

Implements the public Avro 1.x container spec (magic ``Obj\\x01``, file
metadata map carrying ``avro.schema``/``avro.codec``, sync-marker-framed
data blocks, zigzag-varint primitive encoding) for FLAT records of
primitive and nullable-primitive fields — the shape file-based ETL
ingestion actually sees.  ``sources.readers.read_input`` uses Spark's
external ``avro`` data source when its jar is on the classpath and falls
back here otherwise, so the ``.avro`` ingestion path executes (and is
tested against real container bytes) in jar-less environments.

Supported types: null, boolean, int, long, float, double, bytes, string,
enum, arrays, NESTED RECORDS (decoded as tuples in field order), maps
(block-encoded, decoded as dicts), fixed, and unions of null with one
branch — arbitrarily composed.  Codecs: ``null`` and ``deflate``
(stdlib zlib).  Not supported: snappy, named-type references, and
multi-branch non-null unions (clear raises for each).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decoding

def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (the Avro int/long wire format)."""
    shift = 0
    accum = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        accum |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _read_bool(buf: io.BytesIO) -> bool:
    byte = buf.read(1)
    if not byte:
        # b"" == b"\x01" would silently decode False from a truncated
        # buffer; every other primitive reader raises on EOF too.
        raise EOFError("truncated boolean")
    return byte == b"\x01"


def _primitive_reader(avro_type: str):
    return {
        "null": lambda buf: None,
        "boolean": _read_bool,
        "int": _read_long,
        "long": _read_long,
        "float": lambda buf: struct.unpack("<f", buf.read(4))[0],
        "double": lambda buf: struct.unpack("<d", buf.read(8))[0],
        "bytes": _read_bytes,
        "string": lambda buf: _read_bytes(buf).decode("utf-8"),
    }[avro_type]


def _field_reader(ftype):
    """Decoder for one field's schema (primitive | union | enum | array)."""
    if isinstance(ftype, str):
        return _primitive_reader(ftype)
    if isinstance(ftype, list):  # union: branch index then branch value
        branch_readers = [_field_reader(b) for b in ftype]

        def read_union(buf, readers=branch_readers):
            return readers[_read_long(buf)](buf)

        return read_union
    if isinstance(ftype, dict):
        kind = ftype["type"]
        if kind == "enum":
            symbols = ftype["symbols"]
            return lambda buf: symbols[_read_long(buf)]
        if kind == "array":
            item = _field_reader(ftype["items"])

            def read_array(buf):
                out = []
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:  # block with byte-size prefix
                        n = -n
                        _read_long(buf)
                    out.extend(item(buf) for _ in range(n))

            return read_array
        if kind == "record":  # nested record -> tuple in field order
            readers = [_field_reader(f["type"]) for f in ftype["fields"]]

            def read_record(buf, readers=readers):
                return tuple(r(buf) for r in readers)

            return read_record
        if kind == "map":  # block-encoded string->value pairs
            value_reader = _field_reader(ftype["values"])

            def read_map(buf, value_reader=value_reader):
                out = {}
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:  # block with byte-size prefix
                        n = -n
                        _read_long(buf)
                    for _ in range(n):
                        key = _read_bytes(buf).decode("utf-8")
                        out[key] = value_reader(buf)

            return read_map
        if kind == "fixed":
            size = ftype["size"]
            return lambda buf, size=size: buf.read(size)
        return _primitive_reader(kind)
    raise NotImplementedError(f"unsupported avro field schema: {ftype!r}")


def read_header(buf) -> tuple[dict, bytes]:
    """Parse the container header from any binary file-like object,
    reading only as many bytes as the header occupies: returns
    (metadata map with decoded ``avro.schema``, 16-byte sync marker).
    Used both by :func:`read_avro` and by the Python DataSource's
    schema inference, which must NOT slurp a multi-GB file to read a
    few-hundred-byte header."""
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated container header (missing sync marker)")
    return meta, sync


def read_avro(path: str) -> tuple[list[str], list[tuple]]:
    """Return (column_names, rows) from a container file of flat records."""
    with open(path, "rb") as handle:
        data = handle.read()
    buf = io.BytesIO(data)
    try:
        meta, sync = read_header(buf)
    except ValueError as exc:
        raise ValueError(f"{path}: {exc}") from None
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if schema.get("type") != "record":
        raise NotImplementedError("avro_lite reads record-schema files only")
    names = [f["name"] for f in schema["fields"]]
    readers = [_field_reader(f["type"]) for f in schema["fields"]]

    rows: list[tuple] = []
    while buf.tell() < len(data):
        count = _read_long(buf)
        block = buf.read(_read_long(buf))
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r} not supported")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            rows.append(tuple(r(bbuf) for r in readers))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
    return names, rows


# ---------------------------------------------------------------- encoding

def _write_varlong(out: bytearray, value: int) -> None:
    # zigzag then varint; (n << 1) ^ (n >> 63) covers both signs under
    # Python's arbitrary-precision two's-complement shift semantics.
    encoded = (value << 1) ^ (value >> 63)
    while True:
        if encoded < 0x80:
            out.append(encoded)
            return
        out.append((encoded & 0x7F) | 0x80)
        encoded >>= 7


def _encode_value(out: bytearray, avro_type, value) -> None:
    if isinstance(avro_type, list):  # nullable union
        idx = avro_type.index("null") if value is None else (
            1 - avro_type.index("null")
        )
        _write_varlong(out, idx)
        if value is None:
            return
        branch = avro_type[idx]
        _encode_value(out, branch, value)
        return
    if avro_type == "null":
        return
    if avro_type == "boolean":
        out.append(1 if value else 0)
    elif avro_type in ("int", "long"):
        _write_varlong(out, int(value))
    elif avro_type == "float":
        out.extend(struct.pack("<f", float(value)))
    elif avro_type == "double":
        out.extend(struct.pack("<d", float(value)))
    elif avro_type == "bytes":
        _write_varlong(out, len(value))
        out.extend(value)
    elif avro_type == "string":
        encoded = value.encode("utf-8")
        _write_varlong(out, len(encoded))
        out.extend(encoded)
    elif isinstance(avro_type, dict) and avro_type.get("type") == "array":
        if value:
            _write_varlong(out, len(value))
            for item in value:
                _encode_value(out, avro_type["items"], item)
        _write_varlong(out, 0)
    elif isinstance(avro_type, dict) and avro_type.get("type") == "enum":
        _write_varlong(out, avro_type["symbols"].index(value))
    elif isinstance(avro_type, dict) and avro_type.get("type") == "record":
        fields = avro_type["fields"]
        if isinstance(value, dict):
            items = [value[f["name"]] for f in fields]
        else:  # tuple/list in field order (the read_avro shape)
            items = list(value)
        for field, item in zip(fields, items):
            _encode_value(out, field["type"], item)
    elif isinstance(avro_type, dict) and avro_type.get("type") == "map":
        if value:
            _write_varlong(out, len(value))
            for key, item in value.items():
                encoded = key.encode("utf-8")
                _write_varlong(out, len(encoded))
                out.extend(encoded)
                _encode_value(out, avro_type["values"], item)
        _write_varlong(out, 0)
    elif isinstance(avro_type, dict) and avro_type.get("type") == "fixed":
        if len(value) != avro_type["size"]:
            raise ValueError(
                f"fixed field expects {avro_type['size']} bytes, "
                f"got {len(value)}"
            )
        out.extend(value)
    else:
        raise NotImplementedError(f"avro_lite cannot encode {avro_type!r}")


def write_avro(
    path: str, names: list[str], types: list, rows: list[tuple],
    codec: str = "null", record_name: str = "row",
) -> None:
    """Write a container file of flat records.  ``types`` entries are Avro
    field schemas (e.g. ``"long"``, ``["null", "string"]``)."""
    schema = {
        "type": "record",
        "name": record_name,
        "fields": [{"name": n, "type": t} for n, t in zip(names, types)],
    }
    out = bytearray()
    out.extend(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_varlong(out, len(meta))
    for key, val in meta.items():
        kb = key.encode("utf-8")
        _write_varlong(out, len(kb))
        out.extend(kb)
        _write_varlong(out, len(val))
        out.extend(val)
    _write_varlong(out, 0)
    sync = os.urandom(16)
    out.extend(sync)

    block = bytearray()
    for row in rows:
        for t, v in zip(types, row):
            _encode_value(block, t, v)
    payload = bytes(block)
    if codec == "deflate":
        compressor = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = compressor.compress(payload) + compressor.flush()
    elif codec != "null":
        raise NotImplementedError(f"codec {codec!r} not supported")
    _write_varlong(out, len(rows))
    _write_varlong(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    with open(path, "wb") as handle:
        handle.write(bytes(out))
