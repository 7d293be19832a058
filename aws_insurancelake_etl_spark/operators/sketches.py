"""Deterministic distinct-count sketches (KMV / k-minimum-values).

Spark's ``approx_count_distinct`` (HyperLogLog++) is the built-in answer,
but its estimates are engine-specific — no other engine reproduces them, so
they cannot sit behind a differential oracle, and its sketch state is not
exposed for incremental workflows.  KMV with an md5-derived hash fixes
both: the sketch is the k smallest normalized hashes of the distinct
values, the estimator is ``(k-1) / h_k`` (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM'02), and every step is
deterministic — DuckDB computes bit-identical sketches from the same rows.

Why a sketch at all, at 100 TB: the k-row summary is MERGEABLE.  Store one
sketch per partition (day, source) and the distinct count over any
partition union is re-ranking the unioned sketch rows — k·partitions rows,
no rescan of the data.  ``kmv_sketch`` → per-group sketch rows;
``kmv_estimate`` → estimates from sketch rows (works on a fresh sketch or
a union of stored ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit md5 prefix normalized to (0, 1]; +1 keeps 0 out of the domain so
# the estimator never divides by zero.
_TWO_60 = float(1 << 60)


def _hash01(col: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("double")
        + 1.0
    ) / F.lit(_TWO_60)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest (normalized md5) hashes of the
    group's distinct values — (group..., __h, __rn) rows, ≤ k per group.

    One distinct + one window rank, both keyed on the group columns; the
    second reuses the first's partitioning.  Ties (astronomically unlikely
    at 60 bits) break on the value itself, keeping the sketch
    deterministic."""
    distinct_vals = df.select(*group_cols, value_col).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h", value_col)
    return (
        distinct_vals.withColumn("__h", _hash01(F.col(value_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*group_cols, "__h", "__rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimates from sketch rows: ``(k-1)/h_k`` when the
    group filled its sketch, else the exact count (a sketch with < k rows
    saw every distinct value).  Accepts a union of stored sketches — rows
    re-rank here, so merged estimates need no access to the raw data."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    reranked = sketch.withColumn("__merged_rn", F.row_number().over(w)).where(
        F.col("__merged_rn") <= k
    )
    return reranked.groupBy(*group_cols).agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise((k - 1) / F.max(F.when(F.col("__merged_rn") == k, F.col("__h"))))
        .alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Sketch + estimate in one call: (group..., est_distinct)."""
    return kmv_estimate(kmv_sketch(df, value_col, group_cols, k), group_cols, k)
