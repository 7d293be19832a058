"""Type-conversion operators (reference parity:
``test/test_datatransform_typeconversion.py`` expectations)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from aws_insurancelake_etl_spark.operators.typeconversion import (
    transform_changetype,
    transform_currency,
    transform_date,
    transform_implieddecimal,
    transform_timestamp,
    transform_titlecase,
)


def test_date_formats_and_in_place(spark, ctx):
    df = spark.createDataFrame(
        [("1/2/22", "2022-01-15", "20220309")], "a string, b string, c string"
    )
    out = transform_date(
        df,
        [
            {"field": "a", "format": "M/d/yy"},
            {"field": "b", "format": "yyyy-MM-dd"},
            {"field": "valuation", "source": "c", "format": "yyyyMMdd"},
        ],
        ctx,
    ).collect()[0]
    assert out["a"] == datetime.date(2022, 1, 2)
    assert out["b"] == datetime.date(2022, 1, 15)
    assert out["valuation"] == datetime.date(2022, 3, 9)


def test_timestamp_with_millis(spark, ctx):
    df = spark.createDataFrame([("2022-01-02 03:04:05.678+0000",)], "t string")
    out = transform_timestamp(
        df, [{"field": "t", "format": "yyyy-MM-dd HH:mm:ss.SSSZ"}], ctx
    ).collect()[0]
    assert out["t"] == datetime.datetime(2022, 1, 2, 3, 4, 5, 678000)


def test_changetype_cast_and_json(spark, ctx):
    df = spark.createDataFrame([("12.345", 7, ("x", 1))], "a string, b int, s struct<f1:string,f2:int>")
    out = transform_changetype(
        df, {"a": "decimal(10,2)", "b": "bigint", "s": "json"}, ctx
    )
    row = out.collect()[0]
    assert row["a"] == Decimal("12.35")
    assert out.schema["b"].dataType.simpleString() == "bigint"
    assert row["s"] == '{"f1":"x","f2":1}'


def test_changetype_struct_simplestring_renames_nested_fields(spark, ctx):
    # Reference behavior (docs/transforms.md:177): casting to a struct<...>
    # simpleString re-declares nested field NAMES in place.
    df = spark.createDataFrame(
        [((1, "a"),)], "s struct<old1:int,old2:string>"
    )
    out = transform_changetype(df, {"s": "struct<new1:int,new2:string>"}, ctx)
    assert out.schema["s"].dataType.simpleString() == "struct<new1:int,new2:string>"
    row = out.collect()[0]
    assert row["s"]["new1"] == 1 and row["s"]["new2"] == "a"


def test_implieddecimal(spark, ctx):
    df = spark.createDataFrame(
        [("1234567", "-98765")], "a string, b string"
    )
    out = transform_implieddecimal(
        df,
        [
            {"field": "a", "num_implied": "4", "format": "16,4"},
            {"field": "bdec", "source": "b", "format": "16,2"},
        ],
        ctx,
    ).collect()[0]
    assert out["a"] == Decimal("123.4567")
    assert out["bdec"] == Decimal("-987.65")


def test_currency_us_euro_and_nonstring(spark, ctx):
    df = spark.createDataFrame(
        [("$1,234,567.89", "5.000.000,12", 42.5)], "us string, eu string, num double"
    )
    out = transform_currency(
        df,
        [
            {"field": "us", "format": "16,2"},
            {"field": "eu", "euro": True},
            {"field": "num", "format": "10,2"},
        ],
        ctx,
    ).collect()[0]
    assert out["us"] == Decimal("1234567.89")
    assert out["eu"] == Decimal("5000000.12")
    assert out["num"] == Decimal("42.50")


def test_titlecase(spark, ctx):
    df = spark.createDataFrame([("acme insurance CO",)], "name string")
    out = transform_titlecase(df, ["name"], ctx).collect()[0]
    assert out["name"] == "Acme Insurance Co"
