"""Structured-data operators: explode family, flatten, json/xml parsing."""

from __future__ import annotations

from aws_insurancelake_etl_spark.operators.structureddata import (
    transform_flatten,
    transform_json,
    transform_jsonexpandarray,
    transform_jsonexpandmap,
    transform_xml,
)


def test_jsonexpandarray_one_based_and_outer(spark, ctx):
    df = spark.createDataFrame(
        [(1, ["a@x.com", "b@x.com"]), (2, []), (3, None)], "id int, emails array<string>"
    )
    out = transform_jsonexpandarray(
        df, [{"field": "emails", "index_field": "email_index"}], ctx
    )
    rows = sorted((r["id"], r["email_index"], r["emails"]) for r in out.collect())
    assert rows == [(1, 1, "a@x.com"), (1, 2, "b@x.com"), (2, None, None), (3, None, None)]


def test_jsonexpandmap_struct_to_map(spark, ctx):
    df = spark.createDataFrame(
        [(1, (("1 Main St", "Austin"), ("2 Oak Ave", "Dallas")))],
        "id int, addr struct<Primary:struct<street:string,city:string>,"
        "Billing:struct<street:string,city:string>>",
    )
    out = transform_jsonexpandmap(
        df, [{"field": "addr", "index_field": "addr_index", "key_field": "addr_type"}], ctx
    )
    rows = sorted((r["addr_index"], r["addr_type"], r["addr"]["city"]) for r in out.collect())
    assert rows == [(1, "Primary", "Austin"), (2, "Billing", "Dallas")]


def test_flatten_keep_and_drop(spark, ctx):
    df = spark.createDataFrame(
        [(1, ("Acme", 10))], "id int, policy struct<name:string,term:int>"
    )
    out = transform_flatten(df, [{"field": "policy", "keep_field": False}], ctx)
    assert set(out.columns) == {"id", "name", "term"}
    assert out.collect()[0]["name"] == "Acme"


def test_json_string_to_struct(spark, ctx):
    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": {"c": "x"}}'), (2, '{"a": 2, "b": {"c": "y"}}')],
        "id int, payload string",
    )
    out = transform_json(df, ["payload"], ctx)
    assert out.schema["payload"].dataType.typeName() == "struct"
    got = {r["id"]: r["payload"]["b"]["c"] for r in out.collect()}
    assert got == {1: "x", 2: "y"}


def test_xml_string_to_struct(spark, ctx):
    df = spark.createDataFrame(
        [(1, "<row><name>abc</name><value>42</value></row>")], "id int, xmlfield string"
    )
    out = transform_xml(df, ["xmlfield"], ctx)
    row = out.collect()[0]
    assert row["xmlfield"]["name"] == "abc"
    assert row["xmlfield"]["value"] == 42
