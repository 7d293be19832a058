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


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table is written with nanosecond parquet timestamps, which
    Spark's vectorized reader rejects.  Read ``ts`` as nanos-since-epoch and
    rebuild a microsecond timestamp (integer division — no float rounding)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
