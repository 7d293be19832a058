"""Pure-Python Apache Iceberg table READER (``iceberg_lite``).

The reference scans its entity-match primary table with
``read.format('iceberg')`` (``etl_consume_entity_match.py:395-397``);
this container has no Iceberg runtime jar (probe in COVERAGE.md), so
this module reads the OPEN Iceberg table format
(https://iceberg.apache.org/spec/) directly:

- ``metadata/vN.metadata.json`` (``version-hint.text`` or highest N)
  → snapshots, current snapshot, partition specs;
- the snapshot's MANIFEST LIST (an Avro container, parsed by the
  sibling ``avro_lite``) → manifest files;
- each DATA manifest (Avro) → live data-file entries (status≠DELETED),
  each carrying its ``partition`` record — the metadata tree IS the
  index: partition pruning happens on manifest entries before any
  parquet footer is opened, exactly how Iceberg plans scans at 100 TB;
- the surviving parquet files (Iceberg data files STORE identity
  partition columns, unlike Hive/Delta) read as one Spark scan.

Supported: format v1 and v2, snapshot time travel (``snapshot_id=``),
identity-partition pruning, relocated tables (paths rebase from the
metadata ``location`` to the local directory).  Honest limits raised
as errors: delete files (v2 row-level deletes, manifest ``content=1``)
and non-parquet data files.

Scale note: the manifest tree is parsed driver-side (pyarrow-free,
stdlib Avro) — one row per data file, the same O(files) metadata cost
the real reader pays; the DATA path is a normal distributed parquet
scan.
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import avro_lite


class IcebergLiteError(RuntimeError):
    """Missing/unsupported table feature (delete files, bad metadata)."""


def _schema_of(path: str) -> dict:
    with open(path, "rb") as fh:
        meta, _sync = avro_lite.read_header(io.BytesIO(fh.read()))
    return json.loads(meta["avro.schema"].decode("utf-8"))


def _tuples_to_dicts(value, schema):
    """avro_lite decodes nested records as tuples; rebuild name-keyed
    dicts by walking the writer schema."""
    if isinstance(schema, list):  # union — value carries the branch
        branches = [b for b in schema if b != "null"]
        if value is None or not branches:
            return value
        return _tuples_to_dicts(value, branches[0])
    if isinstance(schema, dict):
        kind = schema.get("type")
        if kind == "record":
            return {
                f["name"]: _tuples_to_dicts(v, f["type"])
                for f, v in zip(schema["fields"], value)
            }
        if kind == "array":
            return [_tuples_to_dicts(v, schema["items"]) for v in value]
        if kind == "map":
            return {
                k: _tuples_to_dicts(v, schema["values"])
                for k, v in value.items()
            }
    return value


def _read_manifest_rows(path: str) -> list[dict]:
    schema = _schema_of(path)
    names, rows = avro_lite.read_avro(path)
    fields = schema["fields"]
    return [
        {
            f["name"]: _tuples_to_dicts(v, f["type"])
            for f, v in zip(fields, row)
        }
        for row in rows
    ]


def _load_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, "metadata")
    if not os.path.isdir(meta_dir):
        raise IcebergLiteError(f"not an iceberg table (no metadata/): {table_path}")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint, encoding="utf-8") as fh:
            version = int(fh.read().strip())
        candidate = os.path.join(meta_dir, f"v{version}.metadata.json")
        if os.path.exists(candidate):
            with open(candidate, encoding="utf-8") as fh:
                return json.load(fh)
    versions = sorted(
        int(n[1:].split(".", 1)[0])
        for n in os.listdir(meta_dir)
        if n.endswith(".metadata.json") and n.startswith("v")
    )
    if not versions:
        raise IcebergLiteError(f"no vN.metadata.json under {meta_dir}")
    with open(
        os.path.join(meta_dir, f"v{versions[-1]}.metadata.json"), encoding="utf-8"
    ) as fh:
        return json.load(fh)


def _rebaser(meta: dict, table_path: str):
    location = (meta.get("location") or "").rstrip("/")

    def rebase(path: str) -> str:
        p = path
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
        if location and path.startswith(location):
            return table_path.rstrip("/") + path[len(location):]
        if location and p.startswith(location):
            return table_path.rstrip("/") + p[len(location):]
        return p

    return rebase


@dataclass
class DataFileEntry:
    path: str
    partition: dict
    record_count: int


def plan_files(
    table_path: str, snapshot_id=None, partition_filter=None
) -> list[DataFileEntry]:
    """Resolve the snapshot's live data files through the manifest tree,
    pruning on identity-partition values BEFORE touching any data file."""
    meta = _load_metadata(table_path)
    if int(meta.get("format-version", 1)) not in (1, 2):
        raise IcebergLiteError(
            f"unsupported format-version {meta.get('format-version')}"
        )
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        return []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    matches = [s for s in snapshots if s.get("snapshot-id") == snapshot_id]
    if not matches:
        known = [s.get("snapshot-id") for s in snapshots]
        raise IcebergLiteError(f"snapshot {snapshot_id} not in {known}")
    snap = matches[0]
    rebase = _rebaser(meta, table_path)
    if "manifest-list" not in snap:
        raise IcebergLiteError(
            "snapshot without manifest-list (v1 'manifests' inline lists "
            "are not produced by current writers and are unsupported here)"
        )
    manifest_list = rebase(snap["manifest-list"])
    out: list[DataFileEntry] = []
    want = {
        k: (None if v is None else str(v))
        for k, v in (partition_filter or {}).items()
    }
    for mf in _read_manifest_rows(manifest_list):
        if int(mf.get("content") or 0) == 1:
            raise IcebergLiteError(
                "table has DELETE manifests (v2 row-level deletes); "
                "iceberg_lite reads append/overwrite tables only"
            )
        for entry in _read_manifest_rows(rebase(mf["manifest_path"])):
            if int(entry.get("status") or 0) == 2:  # DELETED
                continue
            df = entry["data_file"]
            if int(df.get("content") or 0) != 0:
                raise IcebergLiteError("delete data files unsupported")
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise IcebergLiteError(f"file_format {fmt} unsupported")
            partition = df.get("partition") or {}
            if want and any(
                (None if partition.get(k) is None else str(partition.get(k)))
                != v
                for k, v in want.items()
            ):
                continue
            out.append(
                DataFileEntry(
                    path=rebase(df["file_path"]),
                    partition=partition,
                    record_count=int(df.get("record_count") or 0),
                )
            )
    return sorted(out, key=lambda e: e.path)


def snapshot_ids(table_path: str) -> list[int]:
    meta = _load_metadata(table_path)
    return [s["snapshot-id"] for s in meta.get("snapshots") or []]


def snapshot_as_of_timestamp(table_path: str, ts_ms: int):
    """Snapshot id current as of ``ts_ms`` (Iceberg's
    ``TIMESTAMP AS OF``): the newest snapshot whose timestamp-ms is
    <= the bound, or None when the table predates nothing."""
    meta = _load_metadata(table_path)
    best = None
    best_ts = -1
    for snap in meta.get("snapshots") or []:
        st = int(snap.get("timestamp-ms") or 0)
        if st <= ts_ms and st >= best_ts:
            best, best_ts = snap["snapshot-id"], st
    return best


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id=None,
    partition_filter=None,
) -> DataFrame:
    """Snapshot read of an Iceberg table directory: manifest-tree file
    planning (with partition pruning and time travel) + one distributed
    parquet scan.  Identity partition columns come from the data files
    themselves, per the Iceberg convention."""
    files = plan_files(table_path, snapshot_id, partition_filter)
    if not files:
        raise IcebergLiteError(
            f"no data files in snapshot (table {table_path}); "
            "empty-table reads need a schema source this reader "
            "intentionally does not guess"
        )
    return spark.read.parquet(*[f.path for f in files])
