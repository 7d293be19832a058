"""Nested/structured-data transforms: jsonexpandarray, jsonexpandmap,
flatten, json (string→struct), xml (string→struct).

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_structureddata.py``
(jsonexpandarray :10-36, jsonexpandmap :38-76, flatten :78-101,
xmlstructured :103-132, jsonstructured :134-151).  Explode indexes are
1-based; outer explodes keep rows with null/empty collections.

``xml`` uses Spark 4's native ``schema_of_xml``/``from_xml`` (the reference
needed py4j calls into the Databricks spark-xml JAR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..context import RunContext


def _posexplode(df: DataFrame, source_expr: str, out_fields: list[str], drop_field: str) -> DataFrame:
    select_list = [f"`{name}`" for name in df.columns if name != drop_field]
    as_clause = ", ".join(f"`{name}`" for name in out_fields)
    return df.selectExpr(*select_list, f"posexplode_outer({source_expr}) as ({as_clause})")


def transform_jsonexpandarray(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, index_field}]`` — one row per array element with a
    1-based index column; null/empty arrays keep their row (outer)."""
    for entry in spec:
        source = entry.get("source", entry["field"])
        df = _posexplode(df, f"`{source}`", [entry["index_field"], entry["field"]], entry["field"])
        df = df.withColumn(entry["index_field"], F.col(entry["index_field"]) + 1)
        ctx.log_lineage("jsonexpandarray", df=df, transform=[entry])
    return df


def transform_jsonexpandmap(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, index_field, key_field}]`` — explode a map (or a
    struct with homogeneous value types, converted via JSON round-trip) into
    (1-based index, key, value) rows."""
    for entry in spec:
        source = entry.get("source", entry["field"])
        source_expr = f"`{source}`"
        if isinstance(df.schema[source].dataType, T.StructType):
            struct_type: T.StructType = df.schema[source].dataType  # type: ignore[assignment]
            if not struct_type.fields:
                raise RuntimeError(
                    f"Column {source} of type Struct does not have key-value pair "
                    "schema needed for Spark explode"
                )
            value_schema = struct_type.fields[0].dataType.simpleString()
            source_expr = f"from_json(to_json(`{source}`), 'map<string, {value_schema}>')"
        df = _posexplode(
            df,
            source_expr,
            [entry["index_field"], entry["key_field"], entry["field"]],
            entry["field"],
        )
        df = df.withColumn(entry["index_field"], F.col(entry["index_field"]) + 1)
        ctx.log_lineage("jsonexpandmap", df=df, transform=[entry])
    return df


def transform_flatten(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, keep_field?=true}]`` — shift one struct level left
    (``select *, field.*``), no row multiplication."""
    for entry in spec:
        keep = entry.get("keep_field", True)
        select_list = [f"`{name}`" for name in df.columns if keep or name != entry["field"]]
        df = df.selectExpr(*select_list, f"`{entry['field']}`.*")
        ctx.log_lineage("flatten", df=df, transform=[entry])
    return df


def transform_json(df: DataFrame, spec: list[str], ctx: RunContext) -> DataFrame:
    """``[field, ...]`` — parse JSON string columns into nested structs.

    Schema inference is sampled by default: a native bounded scan collects at
    most ``max_sample_rows`` (default 10 000) non-null values to the driver and
    infers locally with ``spark.read.json`` — one Spark job per column, no
    full-corpus pass through Python serialization.  Entries may be dicts:
    ``{"field": name, "sample_ratio": 0.01, "max_sample_rows": 10000,
    "full_scan": true}``.  ``full_scan`` opts into the reference's whole-column
    inference (``lib/glue_scripts/lib/datatransform_structureddata.py:134-151``)
    — a second full scan at 100 TB, so it is opt-in, not the default.
    The subsequent parse is a native ``from_json``.
    """
    cols = {}
    for entry in spec:
        if isinstance(entry, dict):
            field = entry["field"]
            sample_ratio = entry.get("sample_ratio")
            max_sample_rows = int(entry.get("max_sample_rows", 10_000))
            full_scan = bool(entry.get("full_scan", False))
        else:
            field, sample_ratio, max_sample_rows, full_scan = entry, None, 10_000, False
        source = df.select(F.col(field).cast("string").alias(field))
        if full_scan:
            schema = ctx.spark.read.json(source.rdd.map(lambda row: row[0] or "")).schema
        else:
            if sample_ratio is not None and float(sample_ratio) < 1.0:
                source = source.sample(fraction=float(sample_ratio), seed=42)
            samples = [
                row[0]
                for row in source.where(F.col(field).isNotNull())
                .limit(max_sample_rows)
                .collect()
            ]
            schema = ctx.spark.read.json(
                ctx.spark.sparkContext.parallelize(samples or ["{}"], 1)
            ).schema
        cols[field] = F.from_json(F.col(field), schema)
    ctx.log_lineage("jsonstructured", df=df, transform=spec)
    return df.withColumns(cols)


def transform_xml(df: DataFrame, spec: list[str], ctx: RunContext) -> DataFrame:
    """``[field, ...]`` — parse XML string columns into nested structs using
    Spark-native ``schema_of_xml`` + ``from_xml`` (Spark ≥ 4).

    Schema is inferred from a driver-side sample of non-null values (the
    widest sampled schema wins by field count)."""
    cols = {}
    for field in spec:
        samples = [
            row[0]
            for row in df.select(field).where(F.col(field).isNotNull()).limit(100).collect()
        ]
        if not samples:
            raise RuntimeError(f"Column {field} has no non-null XML values to infer schema from")
        # One driver round-trip for every sample: schema_of_xml requires a
        # foldable literal, so evaluate all N as columns of a single 1-row job.
        schemas = list(
            ctx.spark.range(1)
            .select(*[F.schema_of_xml(F.lit(s)).alias(f"_s{i}") for i, s in enumerate(samples)])
            .collect()[0]
        )
        best = max(schemas, key=len)
        cols[field] = F.from_xml(F.col(field), best)
    ctx.log_lineage("xmlstructured", df=df, transform=spec)
    return df.withColumns(cols)


# Reference spec-key compatibility: the reference dispatches
# ``transform_jsonstructured`` / ``transform_xmlstructured``
# (lib/glue_scripts/lib/datatransform_structureddata.py:103,134;
# docs/transforms.md:58-59).  Both key spellings resolve to the same
# implementation so reference-format dataset specs run unchanged.
transform_jsonstructured = transform_json
transform_xmlstructured = transform_xml
