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
    # left join keeps unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([("nomatch", 0)], "k string, payload int"))
    salted_left = salted_join(fact2, dim, ["k"], n_salts=4, how="left")
    direct_left = fact2.join(dim, ["k"], "left")
    assert _rows(salted_left.select("k", "payload", "attr")) == _rows(
        direct_left.select("k", "payload", "attr")
    )
