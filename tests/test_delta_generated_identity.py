"""Delta GENERATED and IDENTITY columns (round 9): the last two
writer features delta_lite refused by name.  PROTOCOL.md §Generated
Columns (``delta.generationExpression`` field metadata — compute when
absent, VALIDATE when provided) and §Identity Columns
(``delta.identity.*`` metadata — executor-side minting, high-water
mark advanced from staged footer stats, no extra job)."""

import json

import pytest
from pyspark.sql import Row

from aws_insurancelake_etl_spark.sources import delta_lite as dl


def _hwm(path, col):
    snap = dl.snapshot(path)
    for f in snap.schema.fields:
        if f.name == col:
            return dict(f.metadata or {}).get("delta.identity.highWaterMark")
    return None


# ------------------------------------------------------------ generated


def test_generated_column_computed_when_absent(spark, tmp_path):
    path = str(tmp_path / "gen")
    df = spark.createDataFrame(
        [Row(id=i, price=float(i) * 10) for i in range(5)]
    ).select("id", "price")
    dl.write_delta(
        df, path, generated_columns={"price_band": "CASE WHEN price >= 20 "
                                                   "THEN 'high' ELSE 'low' END"}
    )
    got = {(r.id, r.price_band) for r in dl.read_delta(spark, path).collect()}
    assert got == {(0, "low"), (1, "low"), (2, "high"), (3, "high"),
                   (4, "high")}
    # the expression is table metadata, and the protocol declares it
    snap = dl.snapshot(path)
    meta = {
        f.name: dict(f.metadata or {}) for f in snap.schema.fields
    }
    assert "delta.generationExpression" in meta["price_band"]
    assert "generatedColumns" in (snap.protocol.get("writerFeatures") or [])
    # appends WITHOUT the column keep computing it
    dl.write_delta(
        spark.createDataFrame([Row(id=9, price=5.0)]).select("id", "price"),
        path, mode="append",
    )
    rows = {r.id: r.price_band for r in dl.read_delta(spark, path).collect()}
    assert rows[9] == "low"


def test_generated_column_validates_provided_values(spark, tmp_path):
    path = str(tmp_path / "genv")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, price=30.0)]).select("id", "price"),
        path,
        generated_columns={"band": "CASE WHEN price >= 20 THEN 'high' "
                                   "ELSE 'low' END"},
    )
    ok = spark.createDataFrame(
        [Row(id=2, price=10.0, band="low")]
    ).select("id", "price", "band")
    dl.write_delta(ok, path, mode="append")  # consistent values pass
    bad = spark.createDataFrame(
        [Row(id=3, price=50.0, band="low")]
    ).select("id", "price", "band")
    with pytest.raises(dl.DeltaLiteError, match="generation expression"):
        dl.write_delta(bad, path, mode="append")
    got = {(r.id, r.band) for r in dl.read_delta(spark, path).collect()}
    assert got == {(1, "high"), (2, "low")}


# ------------------------------------------------------------- identity


def test_identity_column_mints_unique_monotonic_values(spark, tmp_path):
    path = str(tmp_path / "ident")
    df = spark.createDataFrame(
        [Row(name=f"n{i}") for i in range(100)]
    ).select("name")
    dl.write_delta(df, path, identity_columns={"id": {"start": 10,
                                                      "step": 5}})
    first = [r.id for r in dl.read_delta(spark, path).collect()]
    assert len(set(first)) == 100  # unique
    assert min(first) >= 10
    assert all((v - 10) % 5 == 0 for v in first)  # on the step grid
    hwm1 = _hwm(path, "id")
    assert hwm1 == max(first)
    # second append mints strictly above the recorded high-water mark
    dl.write_delta(
        spark.createDataFrame([Row(name="x"), Row(name="y")]).select("name"),
        path, mode="append",
    )
    all_ids = [r.id for r in dl.read_delta(spark, path).collect()]
    assert len(set(all_ids)) == 102
    new_ids = sorted(set(all_ids) - set(first))
    assert all(v > hwm1 for v in new_ids)
    assert _hwm(path, "id") == max(all_ids)
    snap = dl.snapshot(path)
    assert "identityColumns" in (snap.protocol.get("writerFeatures") or [])


def test_identity_explicit_insert_gated(spark, tmp_path):
    path = str(tmp_path / "ident_explicit")
    dl.write_delta(
        spark.createDataFrame([Row(name="a")]).select("name"),
        path, identity_columns={"id": {"start": 1, "step": 1}},
    )
    withid = spark.createDataFrame([Row(name="b", id=999)]).select(
        "name", "id"
    )
    with pytest.raises(dl.DeltaLiteError, match="explicit inserts"):
        dl.write_delta(withid, path, mode="append")
    # allow_explicit=True accepts and ADVANCES the high-water mark
    # (minted ids are SPARSE — monotonically_increasing_id offsets —
    # so pick an explicit value above the current mark)
    path2 = str(tmp_path / "ident_allow")
    dl.write_delta(
        spark.createDataFrame([Row(name="a")]).select("name"),
        path2,
        identity_columns={"id": {"start": 1, "step": 1,
                                 "allow_explicit": True}},
    )
    hwm0 = _hwm(path2, "id")
    explicit = hwm0 + 1000
    dl.write_delta(
        spark.createDataFrame([Row(name="b", id=explicit)]).select(
            "name", "id"
        ),
        path2, mode="append",
    )
    assert _hwm(path2, "id") == explicit
    # the next minted id clears the explicit value
    dl.write_delta(
        spark.createDataFrame([Row(name="c")]).select("name"),
        path2, mode="append",
    )
    ids = {r.name: r.id for r in dl.read_delta(spark, path2).collect()}
    assert ids["c"] > explicit


def test_identity_negative_step(spark, tmp_path):
    path = str(tmp_path / "ident_neg")
    dl.write_delta(
        spark.createDataFrame([Row(name=f"n{i}") for i in range(10)])
        .select("name"),
        path, identity_columns={"id": {"start": -1, "step": -2}},
    )
    ids = [r.id for r in dl.read_delta(spark, path).collect()]
    assert len(set(ids)) == 10 and max(ids) <= -1
    assert all((v + 1) % 2 == 0 for v in ids)
    assert _hwm(path, "id") == min(ids)


def test_gen_identity_are_creation_options_and_block_evolve(spark, tmp_path):
    path = str(tmp_path / "guards")
    dl.write_delta(
        spark.createDataFrame([Row(name="a")]).select("name"),
        path, identity_columns={"id": {}},
    )
    with pytest.raises(dl.DeltaLiteError, match="creation"):
        dl.write_delta(
            spark.createDataFrame([Row(name="b")]).select("name"),
            path, mode="append", identity_columns={"id2": {}},
        )
    widened = spark.createDataFrame([Row(name="b", extra=1)]).select(
        "name", "extra"
    )
    with pytest.raises(dl.DeltaLiteError, match="evolve"):
        dl.write_delta(widened, path, mode="append", schema_mode="evolve")


def test_identity_hwm_advances_without_footer_stats(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9 (low): footer stats are best-effort; when the staged
    adds lack the identity column's extremum, the hwm must advance via
    an agg-job fallback instead of silently keeping the old mark (a
    later append would mint duplicate ids)."""
    monkeypatch.setattr(dl, "_footer_stats", lambda p: None)
    path = str(tmp_path / "nostats")
    dl.write_delta(
        spark.createDataFrame([Row(name=f"n{i}") for i in range(20)])
        .select("name"),
        path, identity_columns={"id": {"start": 1, "step": 1}},
    )
    hwm1 = _hwm(path, "id")
    first = [r.id for r in dl.read_delta(spark, path).collect()]
    assert hwm1 == max(first)  # advanced despite missing stats
    dl.write_delta(
        spark.createDataFrame([Row(name="x"), Row(name="y")]).select(
            "name"
        ),
        path, mode="append",
    )
    all_ids = [r.id for r in dl.read_delta(spark, path).collect()]
    assert len(set(all_ids)) == 22  # no duplicates minted


def test_metadata_survives_checkpoint_roundtrip(spark, tmp_path):
    """The gen/identity metadata must survive log replay THROUGH a
    checkpoint (the schemaString is the carrier)."""
    path = str(tmp_path / "cp")
    dl.write_delta(
        spark.createDataFrame([Row(v=1.0)]).select("v"),
        path,
        generated_columns={"v2": "v * 2"},
        identity_columns={"id": {"start": 100}},
    )
    for i in range(12):  # cross the checkpoint interval
        dl.write_delta(
            spark.createDataFrame([Row(v=float(i))]).select("v"),
            path, mode="append",
        )
    snap = dl.snapshot(path)
    meta = {f.name: dict(f.metadata or {}) for f in snap.schema.fields}
    assert meta["v2"].get("delta.generationExpression") == "v * 2"
    assert meta["id"].get("delta.identity.start") == 100
    ids = [r.id for r in dl.read_delta(spark, path).collect()]
    assert len(set(ids)) == 13
    vals = {(r.v, r.v2) for r in dl.read_delta(spark, path).collect()}
    assert all(v2 == v * 2 for v, v2 in vals)


# ----------------------------------------------------- CHECK constraints


def test_check_constraint_gates_writes_and_merge(spark, tmp_path):
    path = str(tmp_path / "chk")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, v=10.0)]).select("id", "v"), path
    )
    dl.add_check_constraint(spark, path, "v_pos", "v > 0")
    # the protocol now REQUIRES constraint enforcement from any writer
    assert dl.snapshot(path).protocol["minWriterVersion"] >= 3
    ok = spark.createDataFrame([Row(id=2, v=5.0)]).select("id", "v")
    dl.write_delta(ok, path, mode="append")
    bad = spark.createDataFrame([Row(id=3, v=-1.0)]).select("id", "v")
    with pytest.raises(dl.DeltaLiteError, match="v_pos"):
        dl.write_delta(bad, path, mode="append")
    with pytest.raises(dl.DeltaLiteError, match="v_pos"):
        dl.merge_delta(spark, bad, path, keys=["id"])
    # NULL passes (SQL CHECK semantics)
    nul = spark.createDataFrame(
        [Row(id=4, v=None)], "id bigint, v double"
    )
    dl.write_delta(nul, path, mode="append")
    assert {r.id for r in dl.read_delta(spark, path).collect()} == {1, 2, 4}


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    path = str(tmp_path / "chk2")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, v=-5.0)]).select("id", "v"), path
    )
    with pytest.raises(dl.DeltaLiteError, match="violated"):
        dl.add_check_constraint(spark, path, "v_pos", "v > 0")
    # nothing committed by the failed attempt
    assert dl.snapshot(path).version == 0
    dl.add_check_constraint(spark, path, "v_neg", "v < 0")
    with pytest.raises(dl.DeltaLiteError, match="already exists"):
        dl.add_check_constraint(spark, path, "v_neg", "v < 0")
    dl.drop_check_constraint(path, "v_neg")
    # after the drop, formerly-violating rows write fine
    dl.write_delta(
        spark.createDataFrame([Row(id=2, v=7.0)]).select("id", "v"),
        path, mode="append",
    )
    with pytest.raises(dl.DeltaLiteError, match="no such constraint"):
        dl.drop_check_constraint(path, "v_neg")


def test_merge_computes_and_validates_generated_columns(spark, tmp_path):
    path = str(tmp_path / "gen_merge")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, price=30.0)]).select("id", "price"),
        path,
        generated_columns={"band": "CASE WHEN price >= 20 THEN 'high' "
                                   "ELSE 'low' END"},
    )
    # source WITHOUT the generated column: MERGE computes it
    src = spark.createDataFrame(
        [Row(id=1, price=5.0), Row(id=2, price=25.0)]
    ).select("id", "price")
    dl.merge_delta(spark, src, path, keys=["id"])
    got = {(r.id, r.band) for r in dl.read_delta(spark, path).collect()}
    assert got == {(1, "low"), (2, "high")}
    # source with WRONG generated values: MERGE refuses
    bad = spark.createDataFrame(
        [Row(id=3, price=50.0, band="low")]
    ).select("id", "price", "band")
    with pytest.raises(dl.DeltaLiteError, match="generation expression"):
        dl.merge_delta(spark, bad, path, keys=["id"])
