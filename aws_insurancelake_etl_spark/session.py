"""SparkSession factory.

The reference configures its sessions ad hoc inside each Glue job
(``lib/glue_scripts/etl_collect_to_cleanse.py:58-76``,
``etl_cleanse_to_consume.py:84-143``): Arrow-accelerated pandas conversion,
``mapKeyDedupPolicy=LAST_WIN``, dynamic partition overwrite, CORRECTED time
parser.  Here the same semantics are centralized, with scale-oriented
defaults added (AQE incl. skew-join handling, partial-aggregation pushdown,
parquet predicate pushdown) so every pipeline stage inherits a plan-friendly
session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Semantics confs (parity with the reference jobs).
_SEMANTIC_CONFS: dict[str, str] = {
    # Arrow batch transfer for any pandas interop (pandas_udf hot paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Duplicate map keys resolved by last-win (key-value pivot SQL pattern).
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # Spark >= 3.0 datetime parser, explicit (odd formats error loudly).
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Partitioned-table rewrites replace only the partitions present in the
    # incoming DataFrame (Collect→Cleanse partition reload semantics).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "hive.exec.dynamic.partition": "true",
    "hive.exec.dynamic.partition.mode": "nonstrict",
}

# Scale confs: safe on local[32]; on a 1000-executor cluster these are the
# settings you'd want anyway (AQE resizes shuffle partitions at runtime).
_SCALE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # zstd over the snappy default: measured 20% smaller files with
    # equal-or-faster scans on lineitem sf0.1 (PERFORMANCE.md finding 27).
    # At 100 TB that is 20 TB of storage and scan I/O.
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Local mode runs driver and all 32 executor threads in ONE JVM whose
    # heap defaults to 1g — long benchmark sessions (hundreds of stages,
    # accumulated broadcasts) OOMed there (round 6).  The container has
    # 128 GiB; 32g is the heap a 32-core executor would get on a real
    # cluster.  Applies only at JVM launch: set before getOrCreate.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.driver.maxResultSize": "4g",
}


def build_session(
    app_name: str = "insurancelake-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster is attached; on a real cluster pass ``None`` with a
    pre-set master in spark-submit and it is left untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for conf in (_SEMANTIC_CONFS, _SCALE_CONFS, extra_confs or {}):
        for key, value in conf.items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Engine-bundled Python data sources (Spark 4 DataSource API):
    # avro_lite gives .avro ingestion a real distributed scan without
    # the spark-avro jar.
    from .sources import pyds  # noqa: PLC0415 - avoid import cycle at module load

    pyds.register(spark)
    return spark
