"""Bucketed co-located joins: same bucketing on both sides ⇒ the join plan
has NO shuffle exchange — the property that makes repeated fact⋈fact joins
affordable at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.plans.writer import write_bucketed_table


def _plan(df):
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "bucketdb", "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed_table(
        lineitem, "bucketdb", "lineitem_b", ["l_orderkey"], n_buckets=8
    )

    o = spark.table("bucketdb.orders_b")
    l = spark.table("bucketdb.lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").count()
        plan = _plan(joined)
        # The join itself must not reshuffle either bucketed side: no
        # exchange on the join keys anywhere (the post-join groupBy's
        # exchange on o_orderpriority is expected and fine).
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        # Sanity: result matches the unbucketed join.
        direct = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")


def test_bucketed_groupby_has_no_shuffle(spark, sf_dir):
    events_raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed_table(events_raw, "bucketdb", "orders_g", ["o_custkey"], n_buckets=8)
    try:
        agg = (
            spark.table("bucketdb.orders_g")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(agg)
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketdb.orders_g")
