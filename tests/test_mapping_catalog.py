"""Schema mapping (custommapping/fuzzy/clean names) and the schema-evolution
gate (matrix mirrors reference ``test/test_glue_catalog_helpers.py``)."""

from __future__ import annotations

import pytest

from aws_insurancelake_etl_spark.catalog import check_schema_change
from aws_insurancelake_etl_spark.mapping import (
    clean_column_names,
    clean_nulltypes,
    custommapping,
    flatten_schema,
    parse_mapping_csv,
)


def test_custommapping_rename_drop_unmapped(spark):
    df = spark.createDataFrame(
        [(1, "x", "y", "z")], "field1 int, field2 string, dropme string, unmapped string"
    )
    out = custommapping(
        df,
        [
            {"sourcename": "field1", "destname": "id"},
            {"sourcename": "field2", "destname": "name"},
            {"sourcename": "dropme", "destname": "Null"},
        ],
    )
    assert out.columns == ["id", "name"]


def test_custommapping_fuzzy(spark):
    df = spark.createDataFrame([(1, "n")], "PolicyNumber int, NewRenewal string")
    out = custommapping(
        df,
        [
            {"sourcename": "PolicyNumber", "destname": "policynumber"},
            {"sourcename": "NewOrRenewal", "destname": "neworrenewal",
             "threshold": "80", "scorer": "ratio"},
        ],
    )
    assert out.columns == ["policynumber", "neworrenewal"]


def test_custommapping_nested_fields(spark):
    df = spark.createDataFrame(
        [((1, "Acme"),)], "insured struct<number:int,company:string>"
    )
    out = custommapping(
        df,
        [
            {"sourcename": "`insured`.`number`", "destname": "insurednumber"},
            {"sourcename": "`insured`.`company`", "destname": "insuredcompany"},
        ],
    )
    assert out.columns == ["insurednumber", "insuredcompany"]
    assert out.collect()[0]["insuredcompany"] == "Acme"


def test_flatten_schema_handles_array_of_struct(spark):
    df = spark.createDataFrame(
        [(1, [(1, "a")])], "id int, contacts array<struct<role:int,name:string>>"
    )
    names = [f.name for f in flatten_schema(df.schema)]
    assert names == ["id", "contacts", "contacts.role", "contacts.name"]


def test_clean_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["  Policy Number ", "A,B{C}", "x.y:z"])
    out, field_map = clean_column_names(df)
    assert out.columns == ["policy_number", "abc", "x_y_z"]
    assert field_map[0] == {"sourcename": "  Policy Number ", "destname": "policy_number"}


def test_clean_nulltypes(spark):
    df = spark.sql("select 1 as a, null as b")
    out = clean_nulltypes(df)
    assert out.schema["b"].dataType.simpleString() == "string"


def test_parse_mapping_csv():
    rows = parse_mapping_csv("SourceName,DestName,Threshold,Scorer\nA,B,,\nC,D,90,ratio\n")
    assert rows[0]["sourcename"] == "A" and rows[0]["destname"] == "B"
    assert rows[1]["threshold"] == "90" and rows[1]["scorer"] == "ratio"


# ---- schema evolution matrix -------------------------------------------------

BASE = [{"Name": "a", "Type": "int"}, {"Name": "b", "Type": "string"}]


@pytest.mark.parametrize(
    ("new_schema", "policy", "expected"),
    [
        (BASE, "strict", True),
        (list(reversed(BASE)), "strict", False),
        (list(reversed(BASE)), "reorder", True),
        (BASE + [{"Name": "c", "Type": "date"}], "reorder", False),
        (BASE + [{"Name": "c", "Type": "date"}], "evolve", True),
        ([BASE[0]], "evolve", False),  # deletion
        ([{"Name": "a", "Type": "bigint"}, BASE[1]], "evolve", True),  # widen
        ([{"Name": "a", "Type": "double"}, BASE[1]], "evolve", False),
        ([{"Name": "a", "Type": "string"}, BASE[1]], "evolve", False),  # narrow
        ([{"Name": "a", "Type": "double"}, BASE[1]], "permissive", True),
        (BASE + [BASE[0]], "evolve", False),  # duplicate col
    ],
)
def test_check_schema_change_matrix(new_schema, policy, expected):
    assert check_schema_change(BASE, new_schema, policy) is expected


@pytest.mark.parametrize(
    ("old", "new", "expected"),
    [
        ("decimal(10,2)", "decimal(12,2)", True),
        ("decimal(10,2)", "decimal(12,4)", True),
        ("decimal(10,2)", "decimal(10,2)", True),  # equal types ok
        ("decimal(12,2)", "decimal(10,2)", False),
        ("decimal(10,4)", "decimal(12,2)", False),  # scale shrink
    ],
)
def test_decimal_widening(old, new, expected):
    existing = [{"Name": "d", "Type": old}]
    incoming = [{"Name": "d", "Type": new}]
    assert check_schema_change(existing, incoming, "evolve") is expected


def test_bad_policy_raises():
    with pytest.raises(RuntimeError, match="Unsupported value"):
        check_schema_change(BASE, BASE, "bogus")


def test_string_to_int_evolution_allowed():
    existing = [{"Name": "a", "Type": "string"}]
    incoming = [{"Name": "a", "Type": "bigint"}]
    assert check_schema_change(existing, incoming, "evolve") is True
