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
metadata ``location`` to the local directory), and v2 POSITION deletes
(merge-on-read): delete manifests (``content=1``) plan position-delete
parquet files (``file_path``/``pos`` columns per spec §Position Delete
Files), and the read applies them distributively — the data scan
exposes Spark's ``_metadata.row_index`` (the same per-file row ordinal
Iceberg's ``pos`` refers to) and anti-joins the delete rows, honoring
the v2 sequence-number rule (a delete applies only to data files whose
data sequence number is <= the delete file's).  Honest limit raised as
an error: EQUALITY deletes (``data_file.content=2``) and non-parquet
data files.

Scale note: the manifest tree is parsed driver-side (pyarrow-free,
stdlib Avro) — one row per data file, the same O(files) metadata cost
the real reader pays; the DATA path is a normal distributed parquet
scan, and delete application is one distributed anti-join (only the
O(files) path/sequence mappings are broadcast, never delete rows).
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
    #: original (pre-rebase) path as written in the manifest — position
    #: delete rows reference THIS string in their ``file_path`` column
    orig_path: str = ""
    #: v2 data sequence number (0 for v1 / absent)
    sequence_number: int = 0


@dataclass
class DeleteFileEntry:
    path: str
    orig_path: str
    record_count: int
    sequence_number: int


def plan_files(
    table_path: str, snapshot_id=None, partition_filter=None
) -> list[DataFileEntry]:
    """Live DATA files of the snapshot (see :func:`plan_scan`)."""
    return plan_scan(table_path, snapshot_id, partition_filter)[0]


def plan_scan(
    table_path: str, snapshot_id=None, partition_filter=None
) -> tuple[list[DataFileEntry], list[DeleteFileEntry]]:
    """Resolve the snapshot's live data files AND position-delete files
    through the manifest tree, pruning data files on identity-partition
    values BEFORE touching any parquet footer.  Delete files are never
    partition-pruned (a delete manifest may target any data file; an
    inapplicable delete row simply fails the anti-join match)."""
    meta = _load_metadata(table_path)
    if int(meta.get("format-version", 1)) not in (1, 2):
        raise IcebergLiteError(
            f"unsupported format-version {meta.get('format-version')}"
        )
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        return [], []
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
    data: list[DataFileEntry] = []
    deletes: list[DeleteFileEntry] = []
    want = {
        k: (None if v is None else str(v))
        for k, v in (partition_filter or {}).items()
    }
    for mf in _read_manifest_rows(manifest_list):
        # v2 manifest-list rows carry the manifest's sequence number;
        # ADDED entries with a null sequence_number inherit it (spec
        # §Sequence Number Inheritance).  v1 / doctored fixtures without
        # the field default to 0.
        mf_seq = int(mf.get("sequence_number") or 0)
        for entry in _read_manifest_rows(rebase(mf["manifest_path"])):
            if int(entry.get("status") or 0) == 2:  # DELETED
                continue
            seq = entry.get("sequence_number")
            seq = mf_seq if seq is None else int(seq)
            df = entry["data_file"]
            content = int(df.get("content") or 0)
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise IcebergLiteError(f"file_format {fmt} unsupported")
            if content == 2:
                raise IcebergLiteError(
                    "table has EQUALITY delete files (data_file.content=2);"
                    " iceberg_lite applies position deletes only"
                )
            if content == 1:
                deletes.append(
                    DeleteFileEntry(
                        path=rebase(df["file_path"]),
                        orig_path=df["file_path"],
                        record_count=int(df.get("record_count") or 0),
                        sequence_number=seq,
                    )
                )
                continue
            partition = df.get("partition") or {}
            if want and any(
                (None if partition.get(k) is None else str(partition.get(k)))
                != v
                for k, v in want.items()
            ):
                continue
            data.append(
                DataFileEntry(
                    path=rebase(df["file_path"]),
                    partition=partition,
                    record_count=int(df.get("record_count") or 0),
                    orig_path=df["file_path"],
                    sequence_number=seq,
                )
            )
    return (
        sorted(data, key=lambda e: e.path),
        sorted(deletes, key=lambda e: e.path),
    )


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
    themselves, per the Iceberg convention.

    Position deletes (v2 merge-on-read) are applied as one distributed
    LEFT ANTI join: the data scan exposes ``_metadata.file_path`` +
    ``_metadata.row_index`` (Spark's per-file row ordinal — by spec the
    exact quantity a position delete's ``pos`` names), delete rows map
    their as-written ``file_path`` back to local planned files through a
    broadcast O(files) mapping, and the v2 visibility rule
    ``delete.sequence_number >= data.sequence_number`` filters
    inapplicable deletes.  Delete ROWS are never collected to the
    driver and never force-broadcast — at 100 TB AQE picks the join
    strategy from the delete side's actual size."""
    from pyspark.sql import functions as F

    files, deletes = plan_scan(table_path, snapshot_id, partition_filter)
    if not files:
        raise IcebergLiteError(
            f"no data files in snapshot (table {table_path}); "
            "empty-table reads need a schema source this reader "
            "intentionally does not guess"
        )
    reader = spark.read.parquet(*[f.path for f in files])
    if not deletes:
        return reader

    def _norm(col):
        # _metadata.file_path is a URI (file:///x); planned paths are
        # plain local paths (/x) — normalize to the latter
        return F.regexp_replace(col, "^file:/+", "/")

    base_cols = reader.columns
    data = reader.select(
        "*",
        _norm(F.col("_metadata.file_path")).alias("__ice_file"),
        F.col("_metadata.row_index").alias("__ice_pos"),
    )
    # O(data files) mapping: as-written path -> (local path, data seq)
    file_map = spark.createDataFrame(
        [(f.orig_path, f.path, f.sequence_number) for f in files],
        "orig string, local string, data_seq long",
    )
    # O(delete files) mapping: local delete file -> its sequence number
    del_map = spark.createDataFrame(
        [(d.path, d.sequence_number) for d in deletes],
        "dfile string, delete_seq long",
    )
    del_rows = (
        spark.read.parquet(*[d.path for d in deletes])
        .select(
            F.col("file_path").alias("orig"),
            F.col("pos").cast("long").alias("__ice_pos"),
            _norm(F.col("_metadata.file_path")).alias("dfile"),
        )
        .join(F.broadcast(del_map), "dfile")
        .join(F.broadcast(file_map), "orig")
        .where(F.col("delete_seq") >= F.col("data_seq"))
        .select(F.col("local").alias("__ice_file"), "__ice_pos")
    )
    return data.join(
        del_rows, ["__ice_file", "__ice_pos"], "left_anti"
    ).select(base_cols)
