"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional file skipping.

A lake table is usually partitioned by ONE key (date); queries that
also filter on other columns (customer, part, region) read every file.
Z-ordering interleaves the bits of several columns' quantized ranks so
rows close in ALL dimensions land in the same files — parquet min/max
footers then prune files for ANY of the participating columns (what
Delta OPTIMIZE ZORDER BY and Iceberg's sort orders do).  At 100 TB this
is the difference between scanning a full day and scanning the handful
of files whose (part, supplier) boxes overlap the predicate.

Everything here is engine-native: quantization bounds are one scalar
aggregate (bounded driver state, broadcast back as literals — the house
two-phase pattern), the z-value is a pure bit-arithmetic Column (cross-
engine deterministic, differentially checkable), and the layout itself
is ``repartitionByRange`` on the z-value + a within-partition sort, so
the write is one range shuffle — no skew, because z-values of distinct
rows spread uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into ``[0, 2^bits)`` by linear scaling —
    double math with an explicit clamp, so Spark and any SQL oracle
    compute identical buckets.  Degenerate ranges (lo == hi) collapse
    to bucket 0."""
    nb = 1 << bits
    if hi <= lo:
        return F.lit(0).cast("bigint")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(nb))
        / F.lit(float(hi - lo))
    ).cast("bigint")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(nb - 1))


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit ``i`` of bucket ``d`` lands at position
    ``i * n_dims + d``.  Built as a sum of shifted bit tests — pure
    integer arithmetic (codegen'd JVM-side, zero Python)."""
    n = len(buckets)
    if bits * n > 63:
        raise ValueError(
            f"interleave of {n} columns at {bits} bits needs {bits * n} "
            "bit positions; JVM shiftleft wraps the shift amount mod 64, "
            "so keys would silently alias — lower bits or drop columns"
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for d, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + d
            ).cast("bigint")
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, dict]:
    """Attach a ``__z`` Morton key over ``cols``: one scalar min/max
    aggregate (2·dims doubles to the driver, broadcast back as
    literals), then a narrow bit-interleave projection.  Returns the
    keyed frame and the bounds used (for reproducing the key
    elsewhere)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    if any(row[f"mn_{c}"] is None for c in cols):
        raise ValueError(
            "zorder_key needs at least one non-null row per column "
            f"(got empty/all-null input for {cols})"
        )
    bounds = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}
    buckets = [
        quantize(F.col(c), bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    return df.withColumn("__z", interleave_bits(buckets, bits)), bounds


def zorder_write(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 8
) -> dict:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    z-order of ``cols``: range-partition on the z-key (one shuffle,
    uniform because z-values interleave all dims), sort within
    partitions so row groups are tight, drop the key."""
    keyed, bounds = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds


def file_minmax_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max of ``cols`` — exactly the statistics a parquet
    footer exposes to a scan, computed here as a DataFrame so layout
    quality (how many files a box predicate must open) is measurable
    and testable."""
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file"), *cols
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    return df.groupBy("file").agg(*aggs)


def files_overlapping_box(
    stats: DataFrame, box: dict[str, tuple[float, float]]
) -> DataFrame:
    """Files whose min/max envelope intersects the predicate box — the
    set a footer-pruning scan would actually open."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"mx_{c}") >= lo) & (F.col(f"mn_{c}") <= hi)
    return stats.where(cond)
