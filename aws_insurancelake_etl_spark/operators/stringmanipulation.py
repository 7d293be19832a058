"""String-manipulation transforms: filename, columnfromcolumn, columnreplace,
literal, combinecolumns.

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_stringmanipulation.py``
(filename :8-46, columnfromcolumn :49-69, columnreplace :72-93,
literal :96-109, combinecolumns :112-140).

``combinecolumns`` differs physically from the reference: the reference
always runs a row-at-a-time Python UDF calling ``str.format``; here the
common case (a format string made only of ``{}`` placeholders and literal
text) compiles to a native ``concat`` expression, and only format strings
using Python format-spec features (``{:>8}``, ``{0}``, ...) fall back to an
Arrow-batched pandas UDF.  At 100 TB the native path keeps row-key
construction inside whole-stage codegen.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..context import RunContext

_SIMPLE_FORMAT_RE = re.compile(r"\{\}")


def transform_filename(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, pattern, required}]`` — constant column from regex group 1
    matched against the source file name (run-context ``base_file_name``).
    ``required`` and no match aborts the pipeline; else a null column."""
    base_file_name = str(ctx.arg("base_file_name", ""))
    cols: dict[str, Column] = {}
    for entry in spec:
        match = re.search(entry["pattern"], base_file_name)
        if match:
            cols[entry["field"]] = F.lit(match.group(1))
        elif entry.get("required", False):
            raise RuntimeError(
                f"Filename '{base_file_name}' failed to match required pattern "
                f"{entry['pattern']} for field '{entry['field']}'"
            )
        else:
            cols[entry["field"]] = F.lit(None).cast(StringType())
    ctx.log_lineage("filename", df=df, transform=spec)
    return df.withColumns(cols)


def transform_columnfromcolumn(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, pattern}]`` — regex group-1 extraction."""
    cols = {
        entry["field"]: F.regexp_extract(
            F.col(entry.get("source", entry["field"])), entry["pattern"], 1
        )
        for entry in spec
    }
    ctx.log_lineage("columnfromcolumn", df=df, transform=spec)
    return df.withColumns(cols)


def transform_columnreplace(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, pattern, replacement}]`` — regex substitution."""
    cols = {
        entry["field"]: F.regexp_replace(
            F.col(entry.get("source", entry["field"])), entry["pattern"], entry["replacement"]
        )
        for entry in spec
    }
    ctx.log_lineage("columnreplace", df=df, transform=spec)
    return df.withColumns(cols)


def transform_literal(df: DataFrame, spec: dict, ctx: RunContext) -> DataFrame:
    """``{field: value}`` — add constant columns (also used internally to
    inject partition and execution_id columns)."""
    cols = {field: F.lit(value) for field, value in spec.items()}
    ctx.log_lineage("literal", df=df, transform=spec)
    return df.withColumns(cols)


def _python_format_udf(format_string: str):
    @pandas_udf(StringType())
    def _format(*columns: pd.Series) -> pd.Series:
        frame = pd.concat(columns, axis=1)
        values = frame.astype(object).where(frame.notna(), "")
        return values.apply(lambda row: format_string.format(*row).strip(), axis=1)

    return _format


def combine_columns(format_string: str, *source_columns: str) -> Column:
    """Build the combined column for one combinecolumns entry.

    Null source values render as empty strings and the result is trimmed,
    matching the reference's ``format_column`` UDF contract.
    """
    simple = _SIMPLE_FORMAT_RE.sub("", format_string)
    if "{" not in simple and "}" not in simple:
        literals = format_string.split("{}")
        if len(literals) - 1 == len(source_columns):
            parts: list[Column] = []
            for i, text in enumerate(literals):
                if text:
                    parts.append(F.lit(text))
                if i < len(source_columns):
                    parts.append(
                        F.coalesce(F.col(source_columns[i]).cast("string"), F.lit(""))
                    )
            return F.trim(F.concat(*parts)) if parts else F.lit("")
    # Format-spec mini-language (e.g. '{:>10}', '{0}/{1}') → exact Python
    # semantics via Arrow-batched pandas UDF.
    return _python_format_udf(format_string)(*[F.col(c) for c in source_columns])


def transform_combinecolumns(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, format, source_columns}]`` — Python-style format-string
    column combination (native concat fast path, pandas UDF fallback)."""
    cols = {
        entry["field"]: combine_columns(entry["format"], *entry["source_columns"])
        for entry in spec
    }
    ctx.log_lineage("combinecolumns", df=df, transform=spec)
    return df.withColumns(cols)
