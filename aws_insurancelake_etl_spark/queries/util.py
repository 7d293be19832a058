"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Ensure at least one partition per core before a fan-out stage.

    A small single-file parquet scans as ONE partition, so everything up to
    the first shuffle (explode, pairwise scoring after a broadcast join)
    would run on one core.  Repartitioning costs one pass over the
    *pre-fan-out* rows — negligible next to the work it parallelizes.  At
    100 TB the scan already yields thousands of partitions and this is a
    no-op.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-zoned ``timestamp``
    regardless of how the fixture was written.

    The testdata generator has shipped ``ts`` in two encodings over time:
    int64 nanoseconds-since-epoch (read as ``bigint`` under
    ``spark.sql.legacy.parquet.nanosAsLong``) and parquet ``timestamp[us]``
    (read as TIMESTAMP_NTZ).  Convert only when the column actually reads
    as an integer, then ALWAYS cast to ``timestamp`` — ``unix_micros()``
    and streaming watermarks reject TIMESTAMP_NTZ.
    """
    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type in ("bigint", "long", "int"):
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table with ``ts`` normalized to microsecond
    ``timestamp`` whether the parquet stores int64 nanos or timestamp[us]
    (see :func:`normalize_event_ts`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_ts(df)
