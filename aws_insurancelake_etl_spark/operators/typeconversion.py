"""Type-conversion transforms: date, timestamp, changetype, implieddecimal,
currency, titlecase.

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_typeconversion.py``
(date/timestamp :26-68, changetype :71-88, implieddecimal :91-123,
currency :126-160, titlecase :163-177).  All are pure Catalyst column
expressions (no Python UDFs) so they stay inside whole-stage codegen.

All transforms accept ``field`` (output), optional ``source`` (input,
defaults to ``field`` = in-place), and are applied as one batched
``withColumns`` per spec list.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..context import RunContext


def transform_date(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, format, source?}]`` — parse a string column into DateType
    using a Spark datetime pattern (CORRECTED parser)."""
    cols = {
        entry["field"]: F.to_date(F.col(entry.get("source", entry["field"])), entry["format"])
        for entry in spec
    }
    ctx.log_lineage("dateconversion", df=df, transform=spec)
    return df.withColumns(cols)


def transform_timestamp(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, format, source?}]`` — parse into TimestampType."""
    cols = {
        entry["field"]: F.to_timestamp(F.col(entry.get("source", entry["field"])), entry["format"])
        for entry in spec
    }
    ctx.log_lineage("timestampconversion", df=df, transform=spec)
    return df.withColumns(cols)


def transform_changetype(df: DataFrame, spec: dict[str, str], ctx: RunContext) -> DataFrame:
    """``{field: typeString}`` — cast columns; a whole ``struct<...>``
    simpleString re-declares nested field names; special type ``json``
    serializes the column to a JSON string."""
    cols: dict[str, Column] = {}
    for field, type_string in spec.items():
        if type_string.lower() == "json":
            cols[field] = F.to_json(F.col(field))
        else:
            cols[field] = F.col(field).cast(type_string)
    ctx.log_lineage("changetype", df=df, transform=spec)
    return df.withColumns(cols)


def transform_implieddecimal(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, format: 'p,s', num_implied?=2}]`` — numbers whose
    last N digits are an implied fraction (``1234567``, N=2 → ``12345.67``).

    Implemented as digit-splice (insert a ``.`` before the last N digits)
    followed by a decimal cast — all JVM-side string/cast expressions;
    non-conforming values become null via the decimal cast.
    """
    cols: dict[str, Column] = {}
    for entry in spec:
        source = entry.get("source", entry["field"])
        n = int(entry.get("num_implied", 2))
        pattern = r"([+-]?\d+)(\d{%d})$" % n
        integer_part = F.regexp_extract(F.col(source).cast("string"), pattern, 1)
        fraction_part = F.regexp_extract(F.col(source).cast("string"), pattern, 2)
        cols[entry["field"]] = F.concat_ws(".", integer_part, fraction_part).cast(
            f"decimal({entry['format']})"
        )
    ctx.log_lineage("implieddecimalconversion", df=df, transform=spec)
    return df.withColumns(cols)


def transform_currency(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, format?='16,2', euro?=false}]`` — strip currency
    formatting and cast to decimal.  ``euro`` treats ``.`` as thousands and
    ``,`` as the decimal separator (``5.000.000,12``).  Non-string source
    columns are cast directly (no regex) so values are never corrupted."""
    cols: dict[str, Column] = {}
    for entry in spec:
        source = entry.get("source", entry["field"])
        decimal_format = entry.get("format", "16,2")
        if not isinstance(df.schema[source].dataType, T.StringType):
            cleaned = F.col(source)
        elif entry.get("euro", False):
            cleaned = F.regexp_replace(
                F.regexp_replace(F.col(source), r"[^\-\d,-]+", ""), ",", "."
            )
        else:
            cleaned = F.regexp_replace(F.col(source), r"[^\-\d\.]+", "")
        cols[entry["field"]] = cleaned.cast(f"decimal({decimal_format})")
    ctx.log_lineage("currencyconversion", df=df, transform=spec)
    return df.withColumns(cols)


def transform_titlecase(df: DataFrame, spec: list[str], ctx: RunContext) -> DataFrame:
    """``[field, ...]`` — title-case string columns (``initcap``)."""
    cols = {field: F.initcap(F.col(field)) for field in spec}
    ctx.log_lineage("titlecaseconversion", df=df, transform=spec)
    return df.withColumns(cols)
