"""Salted aggregation / join must be result-identical to the direct plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.operators.skew import salted_agg, salted_join


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(500)] + [("cold", i, 1.0) for i in range(3)],
        "k string, uid int, v double",
    )
    salted = salted_agg(
        df,
        ["k"],
        {"n": ("count", F.lit(1)), "s": ("sum", F.col("v")), "mx": ("max", F.col("uid"))},
        n_salts=7,
    )
    direct = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("uid").alias("mx")
    )
    assert _rows(salted) == _rows(direct)


def test_salted_agg_rejects_unknown_combiner(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    try:
        salted_agg(df, ["k"], {"bad": ("avg", F.col("v"))})
        raise AssertionError("expected ValueError")
    except ValueError as err:
        assert "avg" in str(err)


def test_salted_join_matches_direct(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(400)] + [("k2", i) for i in range(5)],
        "k string, payload int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("k2", "2"), ("unused", "U")], "k string, attr string"
    )
    salted = salted_join(fact, dim, ["k"], n_salts=4)
    direct = fact.join(dim, ["k"])
    assert _rows(salted.select("k", "payload", "attr")) == _rows(
        direct.select("k", "payload", "attr")
    )
    # a bare-string join key normalizes to a list (round-6 API fix)
    assert _rows(
        salted_join(fact, dim, "k", n_salts=4).select("k", "payload", "attr")
    ) == _rows(direct.select("k", "payload", "attr"))
    # left join keeps unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([("nomatch", 0)], "k string, payload int"))
    salted_left = salted_join(fact2, dim, ["k"], n_salts=4, how="left")
    direct_left = fact2.join(dim, ["k"], "left")
    assert _rows(salted_left.select("k", "payload", "attr")) == _rows(
        direct_left.select("k", "payload", "attr")
    )


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join handling must ACTIVATE on a genuinely skewed
    sort-merge join — the runtime safety net behind every big fact-fact
    join at 100 TB (salting, `operators/skew.py`, is the planned-ahead
    complement; AQE is the catch-all for skew discovered at runtime).
    Broadcast is disabled to force the shuffle-join shape, and the skew
    thresholds are lowered so the fixture-sized hot key qualifies; the
    executed plan must mark the join skew=true."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # one hot key carrying ~100x the rows of every other key
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 3 == 0, F.lit(7))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        joined = left.join(right, "k")
        # collect() executes the DataFrame's OWN QueryExecution, so its
        # adaptive plan finalizes (count() would spawn a separate one
        # whose final plan we could not reach)
        assert len(joined.collect()) == 60_000
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
