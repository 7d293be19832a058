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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


def _spark_type_to_avro(dt, name_hint: str):
    """Map a Spark DataType to an Avro field schema (reverse of
    ``_field_ddl``).  Nullability is handled by the caller (union with
    null); unsupported logical types raise a named error."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        item = _spark_type_to_avro(dt.elementType, name_hint + "_item")
        if dt.containsNull:
            item = ["null", item]
        return {"type": "array", "items": item}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise NotImplementedError("avro maps require string keys")
        val = _spark_type_to_avro(dt.valueType, name_hint + "_value")
        if dt.valueContainsNull:
            val = ["null", val]
        return {"type": "map", "values": val}
    if isinstance(dt, T.StructType):
        safe = "".join(c if c.isalnum() or c == "_" else "_" for c in name_hint)
        return {
            "type": "record",
            "name": f"r_{safe}",
            "fields": [
                {
                    "name": f.name,
                    "type": (["null", _spark_type_to_avro(f.dataType, f.name)]
                             if f.nullable
                             else _spark_type_to_avro(f.dataType, f.name)),
                }
                for f in dt.fields
            ],
        }
    raise NotImplementedError(
        f"avro_lite writer does not support Spark type {dt.simpleString()}"
    )


def _to_avro_value(dt, value):
    """Convert a Spark Row value tree into the shapes avro_lite encodes:
    Rows → tuples, arrays → lists, maps → dicts, binary → bytes."""
    from pyspark.sql import types as T

    if value is None:
        return None
    if isinstance(dt, T.StructType):
        return tuple(
            _to_avro_value(f.dataType, v) for f, v in zip(dt.fields, value)
        )
    if isinstance(dt, T.ArrayType):
        return [_to_avro_value(dt.elementType, v) for v in value]
    if isinstance(dt, T.MapType):
        return {k: _to_avro_value(dt.valueType, v) for k, v in value.items()}
    if isinstance(dt, T.BinaryType):
        return bytes(value)
    return value


def _from_arrow_value(dt, value):
    """Convert a ``pyarrow`` ``to_pylist()`` value tree into the shapes
    avro_lite encodes: struct dicts → tuples (schema field order), map
    pair-lists → dicts, arrays → lists, binary stays bytes."""
    from pyspark.sql import types as T

    if value is None:
        return None
    if isinstance(dt, T.StructType):
        return tuple(
            _from_arrow_value(f.dataType, value.get(f.name))
            for f in dt.fields
        )
    if isinstance(dt, T.ArrayType):
        return [_from_arrow_value(dt.elementType, v) for v in value]
    if isinstance(dt, T.MapType):
        return {
            k: _from_arrow_value(dt.valueType, v) for k, v in value
        }
    return value


@dataclass
class _AvroCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str


class AvroLiteWriter(DataSourceArrowWriter):
    """Distributed Avro SINK: each task writes its partition to one
    container file under a temp name; the driver-side ``commit`` renames
    every temp into place (and clears pre-existing files on overwrite),
    ``abort`` removes them — the standard two-phase file commit, so a
    failed job leaves no half-written ``*.avro`` visible.  Assumes the
    path is shared storage (same contract as every file sink).

    An ``DataSourceArrowWriter``: partitions arrive as Arrow
    RecordBatches instead of pickled Rows (guide §4.1 — control HOW
    efficiently columns cross the boundary), and cells convert to the
    encoder's shapes column-wise via ``to_pylist``."""

    def __init__(self, path: str, schema, overwrite: bool):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        from .avro_lite import write_avro

        os.makedirs(self.path, exist_ok=True)
        fields = self.schema.fields
        names = [f.name for f in fields]
        types = [
            (["null", _spark_type_to_avro(f.dataType, f.name)] if f.nullable
             else _spark_type_to_avro(f.dataType, f.name))
            for f in fields
        ]
        simple = all(
            f.dataType.simpleString()
            in ("tinyint", "smallint", "int", "bigint", "float", "double",
                "string", "boolean", "binary")
            for f in fields
        )
        rows: list = []
        for batch in iterator:
            cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
            if simple:
                rows.extend(zip(*cols))
            else:
                rows.extend(
                    tuple(
                        _from_arrow_value(f.dataType, v)
                        for f, v in zip(fields, row)
                    )
                    for row in zip(*cols)
                )
        base = f"part-{uuid.uuid4().hex}.avro"
        tmp = os.path.join(self.path, f"_tmp_{base}")
        write_avro(tmp, names, types, rows, codec="deflate")
        return _AvroCommit(tmp_path=tmp, final_path=os.path.join(self.path, base))

    def commit(self, messages):
        if self.overwrite:
            keep = {m.tmp_path for m in messages if m is not None}
            for name in os.listdir(self.path):
                full = os.path.join(self.path, name)
                if name.endswith(".avro") and full not in keep:
                    os.remove(full)
        for message in messages:
            if message is not None:
                os.replace(message.tmp_path, message.final_path)

    def abort(self, messages):
        for message in messages:
            if message is not None and os.path.exists(message.tmp_path):
                os.remove(message.tmp_path)


class AvroLiteDataSource(DataSource):
    """``spark.read.format("avro_lite").load(path)`` — path may be a
    file, a directory of ``*.avro``, or a glob.
    ``df.write.format("avro_lite").save(path)`` — distributed sink, one
    deflate container file per partition, two-phase commit."""

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
        return AvroLiteReader(self.options["path"], schema)

    def writer(self, schema, overwrite: bool) -> "AvroLiteWriter":
        return AvroLiteWriter(self.options["path"], schema, overwrite)

    def streamReader(self, schema) -> "AvroLiteStreamReader":
        return AvroLiteStreamReader(self.options["path"], schema)


def _decoded_rows_to_arrow(schema_json, rows):
    """Pack decoded Avro row tuples into ONE pyarrow RecordBatch
    matching the session's declared Arrow schema, or ``None`` when any
    column resists lossless conversion (nested struct-as-tuple shapes,
    unknown logical types) — the caller then yields row tuples and
    Spark's pickle path handles them as before.

    The win (guide §4.1): the batch crosses the Python-worker boundary
    as Arrow instead of one pickled tuple per row, and the column
    build (`pa.array`) runs in C over the whole file."""
    import json as _json

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    if schema_json is None:
        return None
    try:
        pa_schema = to_arrow_schema(
            StructType.fromJson(_json.loads(schema_json))
        )
        cols = list(zip(*rows)) if rows else [[] for _ in pa_schema]
        arrays = [
            pa.array(col, type=field.type)
            for col, field in zip(cols, pa_schema)
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=pa_schema)
    except Exception:  # noqa: BLE001 — any lossy column -> row fallback
        return None


class AvroLiteStreamReader(DataSourceStreamReader):
    """Micro-batch STREAMING source over a directory of Avro container
    files — ``spark.readStream.format("avro_lite").load(dir)`` tails the
    directory the way Spark's built-in file sources tail parquet/csv
    (which have no jar-less Avro equivalent).  The offset is the set of
    file names already processed (a {name: true} dict — offsets must be
    primitive-valued JSON); each micro-batch plans one InputPartition
    per NEW file, so decoding distributes across executors exactly like
    the batch reader.  Checkpoint-restart safety comes from the offset
    contract: Spark persists the end offset per batch and replays
    `partitions(start, end)` deterministically from the name sets."""

    def __init__(self, path: str, schema=None):
        if not os.path.isdir(path):
            raise ValueError(
                f"avro_lite streaming requires a directory, got {path!r}"
            )
        self.path = path
        self.schema_json = schema.json() if schema is not None else None

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        try:
            files = _list_files(self.path)
        except FileNotFoundError:
            files = []
        return {"files": {os.path.basename(f): True for f in files}}

    def partitions(self, start: dict, end: dict):
        new = sorted(
            set(end.get("files", {})) - set(start.get("files", {}))
        )
        return [InputPartition(os.path.join(self.path, name)) for name in new]

    def read(self, partition):
        from . import avro_lite

        _, rows = avro_lite.read_avro(partition.value)
        batch = _decoded_rows_to_arrow(self.schema_json, rows)
        if batch is not None:
            yield batch
            return
        yield from rows

    def commit(self, end: dict) -> None:
        pass


class AvroLiteReader(DataSourceReader):
    def __init__(self, path: str, schema=None):
        self.path = path
        self.schema_json = schema.json() if schema is not None else None

    def partitions(self):
        return [InputPartition(f) for f in _list_files(self.path)]

    def read(self, partition):
        from . import avro_lite

        _, rows = avro_lite.read_avro(partition.value)
        batch = _decoded_rows_to_arrow(self.schema_json, rows)
        if batch is not None:
            yield batch
            return
        yield from rows


def register(spark) -> None:
    """Idempotently register the data source on a session: re-registration
    is suppressed, every other failure (missing DataSource API, pickling
    error) propagates — silently continuing would surface later as a
    baffling 'Failed to find the data source: avro_lite'."""
    for source in (
        AvroLiteDataSource, DeltaLiteDataSource, IcebergLiteDataSource,
    ):
        try:
            spark.dataSource.register(source)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).lower()
            if "already" in msg and ("exist" in msg or "register" in msg):
                continue
            raise


def _typed_partition_value(raw, dt):
    """Convert a log partitionValues string to the Python value Spark
    expects for the column's type (primitives only — the same subset
    delta_lite's writer produces)."""
    if raw is None:
        return None
    name = dt.simpleString()
    if name in ("tinyint", "smallint", "int", "bigint"):
        return int(raw)
    if name in ("float", "double"):
        return float(raw)
    if name == "boolean":
        return raw == "true"
    if name == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if name.startswith("timestamp"):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    if name.startswith("decimal"):
        import decimal

        return decimal.Decimal(raw)
    if name == "string":
        return raw
    raise ValueError(f"unsupported partition column type {name!r}")


def _arrow_batch_or_none(spark_schema, file_table, col_name_of, const_cols):
    """Build ONE pyarrow RecordBatch matching ``spark_schema`` exactly
    (the Arrow schema Spark's Python DataSource worker declares via
    ``to_arrow_schema``), or ``None`` when any column cannot be
    represented losslessly — the caller then falls back to row tuples.

    Yielding RecordBatches instead of per-row tuples keeps the whole
    file's data in Arrow form end to end (guide §4.2): the per-row
    Python loop, the per-cell ``to_pylist`` conversion, and the
    pickle-per-row serialization all disappear; Spark's worker streams
    the batch to the JVM verbatim.

    ``col_name_of(field_name)``: the FILE column carrying the field
    (``None`` = attached from metadata).  ``const_cols[field_name]``:
    the per-file constant for attached fields (partition literals,
    schema-evolution defaults, change-type/version/timestamp columns).
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    n = file_table.num_rows
    try:
        pa_schema = to_arrow_schema(spark_schema)
        arrays = []
        for f, pf in zip(spark_schema.fields, pa_schema):
            fname = col_name_of(f.name)
            if fname is not None:
                arrays.append(
                    file_table.column(fname).combine_chunks().cast(pf.type)
                )
            else:
                v = const_cols[f.name]
                arrays.append(
                    pa.nulls(n, pf.type)
                    if v is None
                    else pa.array([v] * n, type=pf.type)
                )
        return pa.RecordBatch.from_arrays(arrays, schema=pa_schema)
    except Exception:  # noqa: BLE001 — any lossy column -> row fallback
        return None


def _schema_signature(schema_json_str):
    """Order-sensitive (name, type) signature of a Delta schemaString —
    the comparison behind the mid-stream schema-change guard (metadata
    like column-mapping ids does NOT count as a change; a rename, drop,
    add, or retype does)."""
    import json as _json

    try:
        parsed = _json.loads(schema_json_str or "{}")
    except ValueError:
        return None
    return [
        (f.get("name"), _json.dumps(f.get("type"), sort_keys=True))
        for f in parsed.get("fields", [])
    ]


class DeltaLiteStreamReader(DataSourceStreamReader):
    """Micro-batch STREAMING source over a delta_lite table — the
    jar-less equivalent of Delta's streaming source: the offset is the
    TABLE VERSION, the first batch is the initial snapshot (every live
    file at the starting version), and each later batch is exactly the
    ``add`` actions with ``dataChange=true`` in ``(start, end]`` —
    OPTIMIZE/compaction commits (dataChange=false) are layout-only and
    produce NO reprocessing, the semantic that makes compacting an
    actively-streamed table safe.  One InputPartition per data file;
    executors read parquet via pyarrow and attach the log's partition
    literals (delta data files do not store partition columns)."""

    def __init__(self, path: str, schema_json: str, starting_version=None,
                 ignore_changes=False, physical_names=None):
        from . import delta_lite

        if not delta_lite.is_delta_table(path):
            raise ValueError(f"not a delta_lite table: {path!r}")
        self.path = path
        self.schema_json = schema_json
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes
        #: logical -> physical column names (column-mapped tables); the
        #: parquet files and partitionValues are keyed physically
        self.physical_names = dict(physical_names or {})

    def initialOffset(self) -> dict:
        # option("startingVersion", N): begin at version N's dataChange
        # adds instead of the full initial snapshot; "latest" = only
        # versions committed after the stream starts.  The bulk/backfill
        # path should batch-read the snapshot natively (PERFORMANCE.md
        # finding 44: the Python source costs ~6.6x the JVM scan) and
        # stream from "latest".
        if self.starting_version is None:
            return {"version": -1}
        if str(self.starting_version) == "latest":
            from . import delta_lite

            return {"version": delta_lite.snapshot(self.path).version}
        return {"version": int(self.starting_version) - 1}

    def latestOffset(self) -> dict:
        from . import delta_lite

        return {"version": delta_lite.snapshot(self.path).version}

    def _adds_between(self, start: int, end: int):
        import json as _json
        import os as _os

        from urllib.parse import unquote

        from . import delta_lite

        if start < 0 and self.starting_version is None:
            # initial snapshot: all live files at `end`
            snap = delta_lite.snapshot(self.path, version=end)
            return [(f.path, f.partition_values) for f in snap.files]
        start = max(start, -1)
        out = []
        log_dir = _os.path.join(self.path, "_delta_log")
        for v in range(start + 1, end + 1):
            commit = _os.path.join(log_dir, f"{v:020d}.json")
            adds, has_data_remove = [], False
            with open(commit, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = _json.loads(line)
                    md = action.get("metaData")
                    if md is not None and _schema_signature(
                        md.get("schemaString")
                    ) != _schema_signature(self.schema_json):
                        # delta-spark fails a running stream on a schema
                        # change for the same reason: rows after the
                        # change cannot bind to the stream's fixed
                        # schema (a RENAME would silently read nulls)
                        raise ValueError(
                            f"delta_lite stream: version {v} changed the "
                            "table schema; restart the stream to pick up "
                            "the new schema"
                        )
                    add = action.get("add")
                    remove = action.get("remove")
                    if add and add.get("dataChange", True):
                        adds.append(
                            (
                                unquote(add["path"]),
                                dict(add.get("partitionValues") or {}),
                            )
                        )
                    if remove and remove.get("dataChange", True):
                        has_data_remove = True
            if has_data_remove and not self.ignore_changes:
                # MERGE/DELETE/overwrite rewrote files: their adds contain
                # mostly PRE-EXISTING rows, so emitting them would
                # duplicate data downstream (review finding r6; real
                # Delta raises the same way).  ignoreChanges opts into
                # the duplicates explicitly, as in Delta.
                raise ValueError(
                    f"delta_lite stream: version {v} updated or deleted "
                    "existing rows; append-only streaming cannot represent "
                    "that without duplicates. Restart the stream from a "
                    "fresh checkpoint (startingVersion) or set "
                    "option('ignoreChanges', 'true') to accept re-emitted "
                    "rewritten files."
                )
            out.extend(adds)
        return out

    def partitions(self, start: dict, end: dict):
        import json as _json

        return [
            InputPartition(_json.dumps([rel, pvals]))
            for rel, pvals in self._adds_between(
                int(start["version"]), int(end["version"])
            )
        ]

    def read(self, partition):
        import json as _json
        import os as _os

        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType

        rel, pvals = _json.loads(partition.value)
        schema = StructType.fromJson(_json.loads(self.schema_json))
        table = pq.read_table(_os.path.join(self.path, rel))
        fields = schema.fields
        phys = self.physical_names
        # Arrow fast path (guide §4.2): one RecordBatch per file,
        # partition literals attached as constant arrays
        batch = _arrow_batch_or_none(
            schema,
            table,
            lambda name: (
                None
                if phys.get(name, name) in pvals
                else phys.get(name, name)
            ),
            {
                f.name: _typed_partition_value(
                    pvals.get(phys.get(f.name, f.name)), f.dataType
                )
                for f in fields
                if phys.get(f.name, f.name) in pvals
            },
        )
        if batch is not None:
            yield batch
            return
        cols = {name: table.column(name).to_pylist() for name in table.column_names}
        n = table.num_rows
        for i in range(n):
            yield tuple(
                _typed_partition_value(
                    pvals.get(phys.get(f.name, f.name)), f.dataType
                )
                if phys.get(f.name, f.name) in pvals
                else cols[phys.get(f.name, f.name)][i]
                for f in fields
            )

    def commit(self, end: dict) -> None:
        pass


class DeltaLiteCDFStreamReader(DataSourceStreamReader):
    """CHANGE-DATA-FEED streaming source over a delta_lite table —
    ``spark.readStream.format("delta_lite").option("readChangeFeed",
    "true")``: offsets are table versions, and each micro-batch emits
    the versions' ROW-LEVEL changes (insert / update_preimage /
    update_postimage / delete + _commit_version/_commit_timestamp)
    instead of whole snapshots, so a downstream incremental consumer
    processes only what moved — the same semantics as the batch
    :func:`delta_lite.read_change_feed`, planned per change/data file
    (one InputPartition each, decoded executor-side via pyarrow).

    Versions whose commits carry ``cdc`` actions read the
    ``_change_data`` files verbatim; versions without them derive
    inserts from dataChange adds and deletes from dataChange removes —
    REFUSED (like the batch reader and real Delta) when the feed was
    not enabled at that version, or for underivable MERGE/DELETE
    rewrites and deletion-vector adds."""

    def __init__(self, path: str, schema_json: str, starting_version=None,
                 physical_names=None):
        from . import delta_lite

        if not delta_lite.is_delta_table(path):
            raise ValueError(f"not a delta_lite table: {path!r}")
        self.path = path
        self.schema_json = schema_json
        self.starting_version = starting_version
        #: logical -> physical column names (column-mapped tables): the
        #: cdc/data files and partitionValues carry the physical names
        self.physical_names = dict(physical_names or {})

    def initialOffset(self) -> dict:
        from . import delta_lite

        if self.starting_version is None:
            return {"version": -1}  # changes from version 0 onward
        if str(self.starting_version) == "latest":
            return {"version": delta_lite.snapshot(self.path).version}
        return {"version": int(self.starting_version) - 1}

    def latestOffset(self) -> dict:
        from . import delta_lite

        return {"version": delta_lite.snapshot(self.path).version}

    def partitions(self, start: dict, end: dict):
        import json as _json
        import os as _os

        from urllib.parse import unquote

        from . import delta_lite

        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        cdf_on = delta_lite._cdf_enabled(
            delta_lite.snapshot(self.path, max(lo, 0))
        )
        log_dir = _os.path.join(self.path, "_delta_log")
        out = []
        for v in range(lo + 1, hi + 1):
            commit = _os.path.join(log_dir, f"{v:020d}.json")
            if not _os.path.exists(commit):
                raise ValueError(
                    f"change feed unavailable: commit {v} JSON aged out"
                )
            cdc_rels, adds, removes, dv_adds = [], [], [], []
            operation, ts_ms = None, None
            with open(commit, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = _json.loads(line)
                    if "cdc" in action:
                        cdc_rels.append(unquote(action["cdc"]["path"]))
                    elif "add" in action and action["add"].get(
                        "dataChange", True
                    ):
                        if action["add"].get("deletionVector"):
                            # only blocks DERIVED versions; cdc-carrying
                            # commits (our DV delete) read verbatim
                            dv_adds.append(action["add"]["path"])
                        adds.append(
                            (
                                unquote(action["add"]["path"]),
                                dict(action["add"].get("partitionValues") or {}),
                            )
                        )
                    elif "remove" in action and action["remove"].get(
                        "dataChange", True
                    ):
                        removes.append(unquote(action["remove"]["path"]))
                    elif "commitInfo" in action:
                        operation = action["commitInfo"].get("operation")
                        ts_ms = action["commitInfo"].get("timestamp")
                    elif "metaData" in action:
                        if _schema_signature(
                            action["metaData"].get("schemaString")
                        ) != _schema_signature(self.schema_json):
                            raise ValueError(
                                f"delta_lite change feed: version {v} "
                                "changed the table schema; restart the "
                                "stream to pick up the new schema"
                            )
                        cdf_on = (
                            str(
                                (action["metaData"].get("configuration") or {})
                                .get("delta.enableChangeDataFeed", "false")
                            ).lower()
                            == "true"
                        )
            if ts_ms is None:
                ts_ms = int(_os.path.getmtime(commit) * 1000)
            if cdc_rels:
                out.extend(
                    InputPartition(
                        _json.dumps(["cdc", rel, {}, v, ts_ms])
                    )
                    for rel in cdc_rels
                )
                continue
            if dv_adds:
                raise ValueError(
                    f"change feed cannot derive version {v}: add "
                    f"{dv_adds[0]!r} carries a deletion vector"
                )
            if operation in ("MERGE", "DELETE") and (adds or removes):
                raise ValueError(
                    f"change feed cannot derive version {v} ({operation} "
                    "committed without delta.enableChangeDataFeed)"
                )
            if not cdf_on and (adds or removes):
                raise ValueError(
                    f"change feed not enabled at version {v}; enable "
                    "delta.enableChangeDataFeed before the range you need"
                )
            out.extend(
                InputPartition(_json.dumps(["insert", rel, pvals, v, ts_ms]))
                for rel, pvals in adds
            )
            if removes:
                prev = delta_lite.snapshot(self.path, v - 1)
                by_rel = {f.path: f for f in prev.files}
                missing = [r for r in removes if r not in by_rel]
                if missing:
                    raise ValueError(
                        f"version {v} removes files absent from version "
                        f"{v - 1}: {missing}"
                    )
                out.extend(
                    InputPartition(
                        _json.dumps(
                            ["delete", r, by_rel[r].partition_values, v, ts_ms]
                        )
                    )
                    for r in removes
                )
        return out

    def read(self, partition):
        import datetime
        import json as _json
        import os as _os

        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType

        kind, rel, pvals, version, ts_ms = _json.loads(partition.value)
        schema = StructType.fromJson(_json.loads(self.schema_json))
        phys = self.physical_names
        table = pq.read_table(_os.path.join(self.path, rel))
        # Arrow fast path (guide §4.2): data columns straight from the
        # parquet table, partition/change/version/timestamp columns as
        # constant arrays — no per-row Python loop, no pickle
        from pyspark.sql.types import (
            LongType as _Long,
            StringType as _Str,
            StructField as _SF,
            TimestampType as _Ts,
        )

        out_schema = StructType(
            list(schema.fields)
            + [
                _SF("_change_type", _Str()),
                _SF("_commit_version", _Long()),
                _SF("_commit_timestamp", _Ts()),
            ]
        )
        extras = {"_change_type", "_commit_version", "_commit_timestamp"}

        def _file_col(name):
            if name == "_change_type":
                return "_change_type" if kind == "cdc" else None
            if name in extras:
                return None
            pname = phys.get(name, name)
            return None if (pname in pvals or name in pvals) else pname

        consts = {
            "_commit_version": version,
            "_commit_timestamp": datetime.datetime.fromtimestamp(
                ts_ms / 1000.0, tz=datetime.timezone.utc
            ),
        }
        if kind != "cdc":
            consts["_change_type"] = kind
        for f in schema.fields:
            pname = phys.get(f.name, f.name)
            if pname in pvals or f.name in pvals:
                raw = pvals.get(pname, pvals.get(f.name))
                consts[f.name] = _typed_partition_value(raw, f.dataType)
        batch = _arrow_batch_or_none(out_schema, table, _file_col, consts)
        if batch is not None:
            yield batch
            return
        cols = {
            name: table.column(name).to_pylist()
            for name in table.column_names
        }
        n = table.num_rows
        ts = datetime.datetime.fromtimestamp(ts_ms / 1000.0)
        change_types = (
            cols["_change_type"] if kind == "cdc" else [kind] * n
        )

        def cell(f, i):
            pname = phys.get(f.name, f.name)
            if pname in pvals or f.name in pvals:
                raw = pvals.get(pname, pvals.get(f.name))
                return _typed_partition_value(raw, f.dataType)
            return cols[pname][i]

        for i in range(n):
            yield (
                *(cell(f, i) for f in schema.fields),
                change_types[i],
                version,
                ts,
            )

    def commit(self, end: dict) -> None:
        pass


class DeltaLiteDataSource(DataSource):
    """``spark.readStream.format("delta_lite").load(table_path)`` — a
    streaming source whose offsets are delta_lite table versions.
    ``option("readChangeFeed", "true")`` switches the stream from
    snapshot/append tailing to ROW-LEVEL change rows (+ _change_type,
    _commit_version, _commit_timestamp)."""

    @classmethod
    def name(cls) -> str:
        return "delta_lite"

    def _cdf(self) -> bool:
        return str(self.options.get("readchangefeed", "")).lower() == "true"

    def schema(self):
        from pyspark.sql.types import (
            LongType as _Long,
            StringType as _Str,
            StructField as _SF,
            StructType as _ST,
            TimestampType as _Ts,
        )

        from . import delta_lite

        base = delta_lite.snapshot(self.options["path"]).schema
        if not self._cdf():
            return base
        return _ST(
            list(base.fields)
            + [
                _SF("_change_type", _Str()),
                _SF("_commit_version", _Long()),
                _SF("_commit_timestamp", _Ts()),
            ]
        )

    def streamReader(self, schema):
        if self._cdf():
            data_fields = [
                f
                for f in schema.fields
                if f.name
                not in ("_change_type", "_commit_version", "_commit_timestamp")
            ]
            from pyspark.sql.types import StructType as _ST

            phys = {
                f.name: (f.metadata or {}).get(
                    "delta.columnMapping.physicalName", f.name
                )
                for f in data_fields
            }
            return DeltaLiteCDFStreamReader(
                self.options["path"],
                _ST(data_fields).json(),
                self.options.get("startingversion"),
                physical_names=phys,
            )
        phys = {
            f.name: (f.metadata or {}).get(
                "delta.columnMapping.physicalName", f.name
            )
            for f in schema.fields
        }
        return DeltaLiteStreamReader(
            self.options["path"],
            schema.json(),
            self.options.get("startingversion"),
            str(self.options.get("ignorechanges", "")).lower() == "true",
            physical_names=phys,
        )


def _ice_default_py(ice, value):
    """Iceberg Appendix-D JSON single-value -> the plain python value a
    Python DataSource row yields (struct = tuple in field order, list =
    list, map = dict, temporal/decimal/binary parsed).  None when the
    pair has no faithful mapping — callers refuse by name."""
    import datetime
    from decimal import Decimal

    if value is None:
        return None
    if isinstance(ice, dict):
        kind = ice.get("type")
        if kind == "struct":
            if not isinstance(value, dict):
                return None
            return {
                f["name"]: _ice_default_py(
                    f.get("type"), value.get(str(f["id"]))
                )
                for f in ice.get("fields", [])
            }
        if kind == "list":
            if not isinstance(value, list):
                return None
            return [
                _ice_default_py(ice.get("element"), v) for v in value
            ]
        if kind == "map":
            if not isinstance(value, dict):
                return None
            return {
                _ice_default_py(ice.get("key"), k): _ice_default_py(
                    ice.get("value"), v
                )
                for k, v in zip(
                    value.get("keys", []), value.get("values", [])
                )
            }
        return None
    if isinstance(value, (dict, list)):
        return None
    try:
        if ice == "date":
            return datetime.date.fromisoformat(value)
        if ice in ("timestamp", "timestamptz"):
            return datetime.datetime.fromisoformat(value)
        if ice == "binary" or str(ice).startswith("fixed"):
            return bytes.fromhex(value)
        if str(ice).startswith("decimal("):
            return Decimal(value)
    except (TypeError, ValueError):
        return None
    return value


def _ice_default_values(schema_obj) -> list:
    """[(path segments tuple, python value)] for every defaulted field
    reachable through struct chains in an iceberg schema object.
    Defaults inside LIST/MAP elements refuse — exactly like the batch
    reader (iceberg_lite._collect_defaults); the two readers must
    never disagree on the same table."""
    out = []

    def walk(fields, prefix, in_container):
        for f in fields:
            dv = f.get("initial-default")
            segs = prefix + (f["name"],)
            if dv is not None:
                if in_container:
                    raise ValueError(
                        f"field {'.'.join(segs)!r} carries an "
                        "initial-default inside a list/map element; "
                        "materializing defaults there is not supported"
                    )
                pv = _ice_default_py(f.get("type"), dv)
                if pv is None:
                    raise ValueError(
                        f"field {'.'.join(segs)!r}: v3 initial-default "
                        f"{dv!r} has no faithful python mapping for "
                        f"type {f.get('type')!r}"
                    )
                out.append((segs, pv))
            t = f.get("type")
            if isinstance(t, dict):
                kind = t.get("type")
                if kind == "struct":
                    walk(t.get("fields", []), segs, in_container)
                elif kind == "list" and isinstance(
                    t.get("element"), dict
                ) and t["element"].get("type") == "struct":
                    walk(t["element"].get("fields", []), segs, True)
                elif kind == "map" and isinstance(
                    t.get("value"), dict
                ) and t["value"].get("type") == "struct":
                    walk(t["value"].get("fields", []), segs, True)

    walk(schema_obj.get("fields", []), (), False)
    return out


def _pa_paths(pa_schema) -> set:
    """Dotted struct paths present in a pyarrow schema (worker-side
    twin of iceberg_lite._footer_cols)."""
    import pyarrow as pa

    paths = set()

    def walk(fields, prefix):
        for f in fields:
            paths.add(prefix + f.name)
            if pa.types.is_struct(f.type):
                walk(f.type, prefix + f.name + ".")

    walk(pa_schema, "")
    return paths


def _inject_nested_default(value, segs, default):
    """Set ``segs`` (relative to this struct dict) to ``default`` in a
    row's struct value; null structs stay null (no fields to
    default)."""
    if value is None:
        return None
    out = dict(value)
    if len(segs) == 1:
        out[segs[0]] = default
    else:
        out[segs[0]] = _inject_nested_default(
            out.get(segs[0]), segs[1:], default
        )
    return out


class IcebergLiteStreamReader(DataSourceStreamReader):
    """Micro-batch STREAMING source over an iceberg_lite table — the
    jar-less twin of Iceberg's Spark streaming read: the offset is the
    SNAPSHOT ID, the first batch is the initial snapshot (every live
    file at the starting snapshot), and each later batch is the files
    APPENDED in ``(start, end]`` — planned as a pure-metadata set
    difference of the two snapshots' file lists.  A non-append snapshot
    (MERGE/equality upsert/compaction) in range raises, exactly like
    Iceberg's append-only incremental scan: added files there do not
    equal added rows.  ``rewrite_data_files`` commits as operation
    'replace' — also refused (restart from a fresh snapshot), the
    conservative reading of compaction under a live tail.  One
    InputPartition per appended file; PERFORMANCE.md finding 44's
    Python-source tax applies — bulk backfills should batch-read
    natively and stream from option("startingSnapshotId", "latest")."""

    def __init__(self, path: str, schema_json: str, starting_snapshot=None):
        from . import iceberg_lite

        if not iceberg_lite.is_iceberg_table(path):
            raise ValueError(f"not an iceberg_lite table: {path!r}")
        self.path = path
        self.schema_json = schema_json
        self.starting_snapshot = starting_snapshot
        # v3 initial-defaults (round 11): files predating a defaulted
        # column must stream the DEFAULT, not null — the same contract
        # as read_iceberg.  Computed once driver-side as plain python
        # values ((path segments, value) pairs), applied per-file in
        # read() only when the file's footer lacks the path.
        self.defaults = _ice_default_values(
            iceberg_lite._current_schema_of(
                iceberg_lite._load_metadata(path)
            )
        )

    def _current(self) -> int:
        from . import iceberg_lite

        ids = iceberg_lite.snapshot_ids(self.path)
        return ids[-1] if ids else 0

    def initialOffset(self) -> dict:
        if self.starting_snapshot is None:
            return {"snapshot": -1}
        if str(self.starting_snapshot) == "latest":
            return {"snapshot": self._current()}
        from . import iceberg_lite

        meta = iceberg_lite._load_metadata(self.path)
        return {
            "snapshot": iceberg_lite._resolve_ref(
                meta, self.starting_snapshot
            ) - 1
        }

    def latestOffset(self) -> dict:
        return {"snapshot": self._current()}

    def _files_between(self, start: int, end: int) -> list:
        from . import iceberg_lite

        if end <= max(start, -1):
            return []
        if start < 0 and self.starting_snapshot is None:
            return [
                f.path
                for f in iceberg_lite.plan_files(self.path, snapshot_id=end)
            ]
        meta = iceberg_lite._load_metadata(self.path)
        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
        not_append = [
            sid
            for sid, s in snaps.items()
            if start < sid <= end
            and (s.get("summary") or {}).get("operation", "append")
            != "append"
        ]
        if not_append:
            raise ValueError(
                f"iceberg_lite stream: snapshots {sorted(not_append)} are "
                "not pure appends; append-only streaming cannot represent "
                "them without duplicates.  Replay row-level changes via "
                "the MOR batch readers and restart the stream from a "
                "fresh snapshot (startingSnapshotId)."
            )
        base = (
            {
                f.path
                for f in iceberg_lite.plan_files(
                    self.path, snapshot_id=start
                )
            }
            if start in snaps
            else set()
        )
        return [
            f.path
            for f in iceberg_lite.plan_files(self.path, snapshot_id=end)
            if f.path not in base
        ]

    def partitions(self, start: dict, end: dict):
        return [
            InputPartition(p)
            for p in self._files_between(
                int(start["snapshot"]), int(end["snapshot"])
            )
        ]

    def read(self, partition):
        import json as _json

        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(_json.loads(self.schema_json))
        table = pq.read_table(partition.value)
        file_cols = set(table.column_names)
        # v3 initial-defaults: paths this FILE physically lacks fill
        # the default (the read_iceberg contract); files carrying the
        # path keep stored values, legitimate nulls included
        fills = {}  # top-level name -> constant
        nested_fills = []  # (head, tail segments, constant)
        if self.defaults:
            present = _pa_paths(table.schema)
            for segs, pv in self.defaults:
                if ".".join(segs) in present:
                    continue
                if len(segs) == 1:
                    fills[segs[0]] = pv
                elif segs[0] in file_cols:
                    nested_fills.append((segs[0], segs[1:], pv))
                elif segs[0] in fills:
                    # a struct column absent from the file whose OWN
                    # default predates this nested field's default:
                    # each field's default resolves independently, so
                    # the later-added leaf injects into the constant
                    # (matches the batch reader's withField order)
                    fills[segs[0]] = _inject_nested_default(
                        fills[segs[0]], list(segs[1:]), pv
                    )
        # Arrow fast path (guide §4.2): when no nested in-file default
        # injection is needed, ship the parquet table as ONE
        # RecordBatch — absent columns become constant/null arrays
        if not nested_fills:
            batch = _arrow_batch_or_none(
                schema,
                table,
                lambda name: name if name in file_cols else None,
                {
                    f.name: fills.get(f.name)
                    for f in schema.fields
                    if f.name not in file_cols
                },
            )
            if batch is not None:
                yield batch
                return
        cols = {
            name: table.column(name).to_pylist()
            for name in table.column_names
        }
        n = table.num_rows
        for head, tail, pv in nested_fills:
            cols[head] = [
                _inject_nested_default(v, list(tail), pv)
                for v in cols[head]
            ]
        # iceberg data files store source columns (identity partitions
        # included); a column the file predates reads as null (schema
        # evolution) — unless it carries an initial-default (above)
        for i in range(n):
            yield tuple(
                cols[f.name][i]
                if f.name in cols
                else fills.get(f.name)
                for f in schema.fields
            )

    def commit(self, end: dict) -> None:
        pass


class IcebergLiteDataSource(DataSource):
    """``spark.readStream.format("iceberg_lite").load(table_path)`` — a
    streaming source whose offsets are iceberg_lite snapshot ids."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_lite"

    def schema(self):
        from pyspark.sql import SparkSession

        from . import iceberg_lite

        meta = iceberg_lite._load_metadata(self.options["path"])
        st = iceberg_lite._spark_schema_from_meta(meta)
        if st is not None:
            return st
        # metadata carries no mappable schema (doctored v1 fixtures):
        # fall back to one file's parquet self-description
        files = iceberg_lite.plan_files(self.options["path"])
        if not files:
            raise ValueError("empty iceberg table has no schema source")
        spark = SparkSession.getActiveSession()
        return spark.read.parquet(files[0].path).schema

    def streamReader(self, schema):
        return IcebergLiteStreamReader(
            self.options["path"],
            schema.json(),
            self.options.get("startingsnapshotid"),
        )
