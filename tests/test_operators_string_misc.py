"""String-manipulation + misc operators."""

from __future__ import annotations

import pytest

from aws_insurancelake_etl_spark.operators.misc import (
    transform_filldown,
    transform_filterrows,
    transform_merge,
    transform_rownumber,
)
from aws_insurancelake_etl_spark.operators.stringmanipulation import (
    transform_columnfromcolumn,
    transform_columnreplace,
    transform_combinecolumns,
    transform_filename,
    transform_literal,
)


def test_filename_match_and_required(spark, ctx):
    ctx.args["base_file_name"] = "policies-20220301.csv"
    df = spark.createDataFrame([(1,)], "id int")
    out = transform_filename(
        df,
        [
            {"field": "valuationdate", "pattern": r"\S+-(\d{8})\.csv", "required": True},
            {"field": "missing", "pattern": r"nope-(\d+)", "required": False},
        ],
        ctx,
    ).collect()[0]
    assert out["valuationdate"] == "20220301"
    assert out["missing"] is None

    with pytest.raises(RuntimeError, match="required pattern"):
        transform_filename(
            df, [{"field": "x", "pattern": r"nope-(\d+)", "required": True}], ctx
        )


def test_columnfromcolumn_and_replace(spark, ctx):
    df = spark.createDataFrame(
        [("jdoe@example.com", "0000-00-00")], "email string, baddate string"
    )
    out = transform_columnfromcolumn(
        df, [{"field": "username", "source": "email", "pattern": r"(\S+)@\S+"}], ctx
    )
    out = transform_columnreplace(
        out,
        [{"field": "cleandate", "source": "baddate", "pattern": "0000-00-00", "replacement": ""}],
        ctx,
    ).collect()[0]
    assert out["username"] == "jdoe"
    assert out["cleandate"] == ""


def test_literal_and_combinecolumns_native_path(spark, ctx):
    df = spark.createDataFrame([("GL", 123, None)], "lob string, policy int, nullcol string")
    df = transform_literal(df, {"source": "syntheticdata"}, ctx)
    out = transform_combinecolumns(
        df,
        [{"field": "RowKey", "format": "{}-{}-{}", "source_columns": ["lob", "policy", "nullcol"]}],
        ctx,
    ).collect()[0]
    assert out["source"] == "syntheticdata"
    assert out["RowKey"] == "GL-123-"


def test_combinecolumns_format_spec_fallback(spark, ctx):
    df = spark.createDataFrame([(7, "ab")], "num int, txt string")
    out = transform_combinecolumns(
        df, [{"field": "k", "format": "{:03d}/{}", "source_columns": ["num", "txt"]}], ctx
    ).collect()[0]
    assert out["k"] == "007/ab"


def test_merge_with_default_and_empty_string(spark, ctx):
    df = spark.createDataFrame(
        [(None, "TX"), ("", "CA"), (None, None)], "a string, b string"
    )
    out = transform_merge(
        df, [{"field": "m", "source_list": ["a", "b"], "default": "Unknown"}], ctx
    ).collect()
    assert [r["m"] for r in out] == ["TX", "", "Unknown"]

    out2 = transform_merge(
        df,
        [{"field": "m", "source_list": ["a", "b"], "default": "Unknown",
          "empty_string_is_null": True}],
        ctx,
    ).collect()
    assert [r["m"] for r in out2] == ["TX", "CA", "Unknown"]


def test_filldown_global_and_partitioned(spark, ctx):
    df = spark.createDataFrame(
        [(1, "cat-a"), (2, None), (3, None), (4, "cat-b"), (5, None)],
        "seq int, category string",
    )
    out = transform_filldown(df, [{"field": "category", "sort": ["seq"]}], ctx)
    got = {r["seq"]: r["category"] for r in out.collect()}
    assert got == {1: "cat-a", 2: "cat-a", 3: "cat-a", 4: "cat-b", 5: "cat-b"}


def test_rownumber_partitioned(spark, ctx):
    df = spark.createDataFrame(
        [("p1", 10), ("p1", 20), ("p2", 30)], "policy string, v int"
    )
    out = transform_rownumber(
        df, [{"field": "rn", "partition": ["policy"], "sort": ["v"]}], ctx
    )
    got = sorted((r["policy"], r["v"], r["rn"]) for r in out.collect())
    assert got == [("p1", 10, 1), ("p1", 20, 2), ("p2", 30, 1)]


def test_filterrows_conjunction(spark, ctx):
    df = spark.createDataFrame(
        [(1, "x"), (None, "y"), (3, None)], "claim_number int, file_number string"
    )
    out = transform_filterrows(
        df,
        [{"condition": "claim_number is not null or file_number is not null"},
         {"condition": "claim_number >= 1"}],
        ctx,
    )
    assert out.count() == 2


def test_transform_ewma_and_dateshift_dispatchable(spark, ctx):
    """The new operators are reachable through the declarative registry
    (the user-extensibility contract): a spec entry by name dispatches
    them like any reference transform."""
    from datetime import datetime

    from aws_insurancelake_etl_spark.operators.registry import get_transform

    ewma = get_transform("ewma")
    assert ewma is not None
    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), 10.0), (2, 1, datetime(2024, 1, 2), 20.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = ewma(df, [{"field": "sm", "key": "user_id",
                     "order": ["ts", "event_id"], "source": "value",
                     "alpha": 0.5}], ctx)
    got = {r.event_id: r.sm for r in out.collect()}
    assert got == {1: 10.0, 2: 15.0}

    shift = get_transform("dateshift")
    assert shift is not None
    out2 = shift(df, {"entity": "user_id", "fields": ["ts"]}, ctx)
    shifted = {r.event_id: r.ts for r in out2.collect()}
    assert (shifted[2] - shifted[1]).days == 1  # interval preserved
