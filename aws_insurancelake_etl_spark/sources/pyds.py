"""Spark 4 Python DataSource wrapping the stdlib Avro container parser.

The reference ships custom connectors (DynamoDB lookups, crealytics
Excel) as JVM data sources; Spark 4's public Python DataSource API
(``pyspark.sql.datasource``) is the idiomatic PySpark way to add one
without a jar.  ``AvroLiteDataSource`` registers as
``spark.read.format("avro_lite")`` and plans ONE InputPartition PER
FILE, so a directory of container files scans in parallel across
executors — unlike a driver-side parse-then-createDataFrame fallback,
this is a real distributed scan (each task opens only its own file).

Schema is inferred from the first file's embedded Avro schema
(container files carry their schema by design); pass ``.schema(...)``
to skip inference.  Decoding per file reuses :mod:`.avro_lite`
(primitives, enums, arrays, nested records → struct, maps, fixed →
binary; null+deflate codecs).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_AVRO_TO_DDL = {
    "null": "string",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_ddl(ftype) -> str:
    if isinstance(ftype, str):
        return _AVRO_TO_DDL[ftype]
    if isinstance(ftype, list):  # union with null -> the non-null branch
        branches = [b for b in ftype if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError(f"multi-branch union {ftype!r}")
        return _field_ddl(branches[0])
    if isinstance(ftype, dict):
        kind = ftype["type"]
        if kind == "enum":
            return "string"
        if kind == "array":
            return f"array<{_field_ddl(ftype['items'])}>"
        if kind == "record":
            inner = ", ".join(
                f"`{f['name']}`: {_field_ddl(f['type'])}"
                for f in ftype["fields"]
            )
            return f"struct<{inner}>"
        if kind == "map":
            return f"map<string, {_field_ddl(ftype['values'])}>"
        if kind == "fixed":
            return "binary"
        return _AVRO_TO_DDL[kind]
    raise NotImplementedError(f"unsupported avro schema {ftype!r}")


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.avro")))
    else:
        files = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path!r}")
    return files


class AvroLiteDataSource(DataSource):
    """``spark.read.format("avro_lite").load(path)`` — path may be a
    file, a directory of ``*.avro``, or a glob."""

    @classmethod
    def name(cls) -> str:
        return "avro_lite"

    def schema(self) -> str:
        import json

        from .avro_lite import read_header

        first = _list_files(self.options["path"])[0]
        # Incremental header parse on the open file handle — reads only
        # the few hundred header bytes, never the (possibly multi-GB)
        # data blocks.
        with open(first, "rb") as handle:
            try:
                meta, _ = read_header(handle)
            except ValueError as exc:
                raise ValueError(f"{first}: {exc}") from None
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        return ", ".join(
            f"`{f['name']}` {_field_ddl(f['type'])}" for f in schema["fields"]
        )

    def reader(self, schema) -> "AvroLiteReader":
        return AvroLiteReader(self.options["path"])


class AvroLiteReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        return [InputPartition(f) for f in _list_files(self.path)]

    def read(self, partition):
        from . import avro_lite

        _, rows = avro_lite.read_avro(partition.value)
        yield from rows


def register(spark) -> None:
    """Idempotently register the data source on a session: re-registration
    is suppressed, every other failure (missing DataSource API, pickling
    error) propagates — silently continuing would surface later as a
    baffling 'Failed to find the data source: avro_lite'."""
    try:
        spark.dataSource.register(AvroLiteDataSource)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).lower()
        if "already" in msg and ("exist" in msg or "register" in msg):
            return
        raise
