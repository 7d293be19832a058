"""Data-protection + lookup operators."""

from __future__ import annotations

import hashlib

import pytest

from aws_insurancelake_etl_spark.operators.dataprotection import (
    transform_hash,
    transform_redact,
    transform_tokenize,
)
from aws_insurancelake_etl_spark.operators.lookup import (
    transform_lookup,
    transform_multilookup,
)


def sha(value: str) -> str:
    return hashlib.sha256(value.encode()).hexdigest()


def test_hash_matches_python_sha256_including_null(spark, ctx):
    df = spark.createDataFrame([("555-1234",), (None,)], "phone string")
    out = transform_hash(df, ["phone"], ctx).collect()
    assert out[0]["phone"] == sha("555-1234")
    assert out[1]["phone"] == sha("None")  # str(None) parity with reference


def test_hash_missing_field_is_fatal(spark, ctx):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(RuntimeError, match="not found in incoming data"):
        transform_hash(df, ["ssn"], ctx)


def test_redact(spark, ctx):
    df = spark.createDataFrame([(12345,)], "CustomerNo int")
    out = transform_redact(df, {"CustomerNo": "****"}, ctx).collect()[0]
    assert out["CustomerNo"] == "****"


def test_tokenize_stores_vault(spark, ctx):
    df = spark.createDataFrame([("12-3456789",), ("98-7654321",), ("12-3456789",)], "ein string")
    out = transform_tokenize(df, ["ein"], ctx)
    assert out.collect()[0]["ein"] == sha("12-3456789")
    vault = ctx.token_vault_df()
    rows = {r["raw_data"]: r["hash_key"] for r in vault.collect()}
    assert rows == {"12-3456789": sha("12-3456789"), "98-7654321": sha("98-7654321")}


def test_lookup_replace_and_new_column(spark, ctx):
    ctx.lookups.put_values("StateCd", {"TX": "Texas", "CA": "California"})
    df = spark.createDataFrame([("TX",), ("ZZ",)], "state string")
    out = transform_lookup(
        df,
        [{"field": "statename", "source": "state", "lookup": "StateCd", "nomatch": "N/A"}],
        ctx,
    )
    got = {r["state"]: r["statename"] for r in out.collect()}
    assert got == {"TX": "Texas", "ZZ": "N/A"}

    out2 = transform_lookup(df, [{"field": "state", "lookup": "StateCd"}], ctx)
    assert sorted(r["state"] for r in out2.collect() if r["state"]) == ["Texas"]


def test_multilookup(spark, ctx):
    ctx.lookups.put_multi(
        "LOBCoverage",
        {"progA-covX": {"coveragenormalized": "X-norm", "lob": "GL"}},
    )
    df = spark.createDataFrame([("progA", "covX"), ("progB", "covY")], "program string, coverage string")
    out = transform_multilookup(
        df,
        [{"lookup_group": "LOBCoverage", "match_columns": ["program", "coverage"],
          "return_attributes": ["coveragenormalized", "lob"], "nomatch": "N/A"}],
        ctx,
    )
    got = {r["program"]: (r["coveragenormalized"], r["lob"]) for r in out.collect()}
    assert got == {"progA": ("X-norm", "GL"), "progB": ("N/A", "N/A")}


def test_pii_scan_counts_and_redact_masks(spark, ctx):
    from aws_insurancelake_etl_spark.operators.dataprotection import (
        pii_scan,
        transform_piiredact,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c@d.org, call 25-989-741-2988"),
            (2, "ssn 123-45-6789 ip 10.0.0.1"),
            (3, "nothing sensitive"),
            (4, None),
        ],
        "id int, note string",
    )
    scan = {(r["kind"]): (r["n_rows_matched"], r["n_matches"])
            for r in pii_scan(df, ["note"]).collect()}
    assert scan["email"] == (1, 2)
    assert scan["phone"] == (1, 1)
    assert scan["ssn"] == (1, 1)
    assert scan["ipv4"] == (1, 1)

    out = transform_piiredact(df, {"note": ["email", "phone", "ssn", "ipv4"]}, ctx)
    notes = {r["id"]: r["note"] for r in out.collect()}
    assert notes[1] == "mail [PII:email] and [PII:email], call [PII:phone]"
    assert notes[2] == "ssn [PII:ssn] ip [PII:ipv4]"
    assert notes[3] == "nothing sensitive"
    assert notes[4] is None
