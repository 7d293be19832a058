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


def test_reference_spec_keys_jsonstructured_xmlstructured(spark, ctx):
    # Reference dataset specs dispatch transform_jsonstructured /
    # transform_xmlstructured (docs/transforms.md:58-59); both spellings
    # must resolve in the registry and run through apply_transform_spec.
    from aws_insurancelake_etl_spark.operators import registry

    assert registry.get_transform("jsonstructured") is not None
    assert registry.get_transform("xmlstructured") is not None

    df = spark.createDataFrame(
        [(1, '{"a": 5}', "<row><v>9</v></row>")],
        "id int, jpayload string, xpayload string",
    )
    out = registry.apply_transform_spec(
        df, {"jsonstructured": ["jpayload"], "xmlstructured": ["xpayload"]}, ctx
    )
    row = out.collect()[0]
    assert row["jpayload"]["a"] == 5
    assert row["xpayload"]["v"] == 9


def test_json_sampled_inference_matches_full_scan(spark, ctx):
    df = spark.createDataFrame(
        [(i, '{"a": %d, "b": {"c": "x"}}' % i) for i in range(50)],
        "id int, payload string",
    )
    sampled = transform_json(df, ["payload"], ctx)
    full = transform_json(df, [{"field": "payload", "full_scan": True}], ctx)
    assert sampled.schema["payload"].dataType == full.schema["payload"].dataType
    assert sampled.where("payload.a = 7").count() == 1
