"""Misc transforms: merge (coalesce), filldown (ffill), rownumber, filterrows.

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_misc.py``
(merge :7-35, filldown :37-74, rownumber :76-98, filterrows :100-113).

Scale note: with no ``partition`` key, filldown/rownumber are *global*
sequential operations — the window degenerates to a single partition, which
is a deliberate semantic (total ordering) but a single-task bottleneck at
100 TB.  Both accept an optional ``partition`` list (same as the reference's
rownumber) so large datasets can scope the ordering to a key and keep the
work distributed; specs for big tables should always set it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..context import RunContext


def transform_merge(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source_list, default?, empty_string_is_null?=false}]`` —
    first-non-null merge of columns, optional constant fallback."""
    cols: dict[str, Column] = {}
    for entry in spec:
        sources: list[Column | str] = [
            F.when(F.col(name) == "", None).otherwise(F.col(name))
            if entry.get("empty_string_is_null", False)
            else F.col(name)
            for name in entry["source_list"]
        ]
        if "default" in entry:
            sources.append(F.lit(entry["default"]))
        cols[entry["field"]] = F.coalesce(*sources)
    ctx.log_lineage("merge", df=df, transform=spec)
    return df.withColumns(cols)


def transform_filldown(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, sort?, partition?}]`` — forward-fill nulls with the last
    non-null value in sort order (pandas ``ffill`` semantics).

    Single pass per entry: ``last(field, ignorenulls=True)`` over a running
    window ordered by the sort columns.
    """
    for entry in spec:
        sort_columns = entry.get("sort") or [F.lit(1)]
        partition_columns = entry.get("partition") or [F.lit(1)]
        window = (
            Window.partitionBy(*partition_columns)
            .orderBy(*sort_columns)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        df = df.withColumn(
            entry["field"], F.last(F.col(entry["field"]), ignorenulls=True).over(window)
        )
        ctx.log_lineage("filldown", df=df, transform=[entry])
    return df


def transform_rownumber(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, partition?, sort?}]`` — 1-based row number, optionally
    per-partition and sorted."""
    for entry in spec:
        sort_columns = entry.get("sort") or [F.lit(1)]
        partition_columns = entry.get("partition") or [F.lit(1)]
        window = Window.partitionBy(*partition_columns).orderBy(*sort_columns)
        df = df.withColumn(entry["field"], F.row_number().over(window))
        ctx.log_lineage("rownumber", df=df, transform=[entry])
    return df


def transform_filterrows(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{condition}]`` — keep rows matching each SQL WHERE condition
    (conjunction across entries, applied in order)."""
    for entry in spec:
        df = df.filter(entry["condition"])
    ctx.log_lineage("filterrows", df=df, transform=spec)
    return df


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the canonical
    grouped-map ``applyInPandas`` operator: the recurrence
    y_t = alpha*x_t + (1-alpha)*y_{t-1} is inherently sequential per key
    and NOT robustly expressible in Spark SQL (the closed-form
    scaled-cumsum trick needs (1-alpha)^(-t), which overflows double past
    a few hundred rows per key).  Spark's grouped-map is exactly the
    escape hatch reserved for this shape: one shuffle keyed on
    ``key_col``, Arrow-batched transfer, an O(n) Python loop per group —
    state never leaves the group, so 1000 executors each smooth their own
    keys.  The arithmetic is plain IEEE double in event order, so any
    engine replaying the same recurrence (e.g. a recursive SQL CTE)
    reproduces it bit-for-bit."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    w = 1.0 - alpha

    def smooth(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        out = []
        y = None
        for x in pdf[value_col].astype("float64").tolist():
            y = x if y is None else alpha * x + w * y
            out.append(y)
        pdf[out_col] = out
        return pdf

    return df.groupBy(key_col).applyInPandas(smooth, out_schema)


def transform_ewma(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, key, order, source, alpha?=0.3}]`` — per-key EWMA of a
    numeric column into ``field`` (spec-dispatchable wrapper over
    :func:`ewma_per_key`)."""
    for entry in spec:
        df = ewma_per_key(
            df,
            key_col=entry["key"],
            order_cols=list(entry["order"]) if isinstance(entry["order"], (list, tuple))
            else [entry["order"]],
            value_col=entry["source"],
            alpha=float(entry.get("alpha", 0.3)),
            out_col=entry["field"],
        )
    ctx.log_lineage("ewma", df=df, transform=spec)
    return df
