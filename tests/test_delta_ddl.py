"""ALTER TABLE column DDL on delta_lite tables (round 10).

RENAME COLUMN / DROP COLUMN are metadata-only commits that require
column mapping, keep field ids + physical names stable, and never
reuse a dropped field's id — mirroring delta-spark's ALTER TABLE
semantics (the reference consumes Delta through Spark SQL DDL).
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.queries.pipeline_ops import (
    build_column_mapped_table,
    build_nested_mapped_table,
)
from aws_insurancelake_etl_spark.sources import delta_lite as dl


@pytest.fixture()
def mapped(spark, tmp_path):
    path = str(tmp_path / "ddl_cm")
    df = spark.createDataFrame(
        [
            Row(id=i, grp="a" if i % 2 == 0 else "b", score=float(i))
            for i in range(10)
        ]
    ).select("id", "grp", "score")
    build_column_mapped_table(
        spark,
        df,
        path,
        physical={"id": "col-9a1b", "grp": "col-7f3e", "score": "col-0c42"},
        partition_by=["grp"],
    )
    return path


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_rename_is_metadata_only_and_keeps_values(spark, mapped):
    before = dl.snapshot(mapped)
    v = dl.rename_column(mapped, "score", "points")
    after = dl.snapshot(mapped)
    assert v == before.version + 1
    # zero files touched
    assert [f.path for f in after.files] == [f.path for f in before.files]
    df = dl.read_delta(spark, mapped)
    assert df.columns == ["id", "grp", "points"]
    got = {(r["id"], r["points"]) for r in df.collect()}
    assert (3, 3.0) in got and (7, 7.0) in got
    # field id + physical name survived the rename
    f = after.schema["points"]
    assert f.metadata["delta.columnMapping.physicalName"] == "col-0c42"
    assert f.metadata["delta.columnMapping.id"] == 3


def test_rename_time_travel_shows_old_name(spark, mapped):
    dl.rename_column(mapped, "score", "points")
    old = dl.read_delta(spark, mapped, version=0)
    assert "score" in old.columns and "points" not in old.columns


def test_rename_partition_column(spark, mapped):
    dl.rename_column(mapped, "grp", "segment")
    snap = dl.snapshot(mapped)
    assert snap.partition_columns == ["segment"]
    df = dl.read_delta(spark, mapped, partition_filter={"segment": "a"})
    assert _ids(df) == [0, 2, 4, 6, 8]
    # appends after the rename land in the SAME physical partition dirs
    dl.write_delta(
        spark.createDataFrame([Row(id=99, segment="a", score=9.0)]).select(
            "id", "segment", "score"
        ),
        mapped,
    )
    snap = dl.snapshot(mapped)
    assert all(f.path.startswith("col-7f3e=") for f in snap.files)


def test_rename_refuses_without_mapping(spark, tmp_path):
    path = str(tmp_path / "plain")
    dl.write_delta(
        spark.createDataFrame([Row(a=1, b=2)]), path, mode="overwrite"
    )
    with pytest.raises(dl.DeltaLiteError, match="columnMapping"):
        dl.rename_column(path, "a", "z")
    with pytest.raises(dl.DeltaLiteError, match="columnMapping"):
        dl.drop_column(path, "a")


def test_rename_refuses_sibling_collision(mapped):
    with pytest.raises(dl.DeltaLiteError, match="already exists"):
        dl.rename_column(mapped, "score", "id")
    # case-insensitive, like Delta's resolution
    with pytest.raises(dl.DeltaLiteError, match="already exists"):
        dl.rename_column(mapped, "score", "ID")


def test_rename_refuses_when_check_constraint_references(spark, mapped):
    dl.add_check_constraint(spark, mapped, "pos", "score >= 0")
    with pytest.raises(dl.DeltaLiteError, match="CHECK constraint"):
        dl.rename_column(mapped, "score", "points")
    with pytest.raises(dl.DeltaLiteError, match="CHECK constraint"):
        dl.drop_column(mapped, "score")
    dl.drop_check_constraint(mapped, "pos")
    dl.rename_column(mapped, "score", "points")  # now fine


def test_drop_column_hides_data_and_keeps_files(spark, mapped):
    before = dl.snapshot(mapped)
    dl.drop_column(mapped, "score")
    after = dl.snapshot(mapped)
    assert [f.path for f in after.files] == [f.path for f in before.files]
    df = dl.read_delta(spark, mapped)
    assert df.columns == ["id", "grp"]
    # physical bytes still on disk (drop is logical)
    raw = spark.read.parquet(os.path.join(mapped, after.files[0].path))
    assert "col-0c42" in raw.columns


def test_drop_then_readd_mints_fresh_physical_name(spark, mapped):
    """The field-id-reuse rule: a re-added column of the same logical
    name must NOT resurrect the dropped column's data."""
    dl.drop_column(mapped, "score")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=100, grp="a", score=123.0)]
        ).select("id", "grp", "score"),
        mapped,
        schema_mode="evolve",
    )
    snap = dl.snapshot(mapped)
    f = snap.schema["score"]
    # fresh physical name and a NEW field id past the old maximum
    assert f.metadata["delta.columnMapping.physicalName"] != "col-0c42"
    assert f.metadata["delta.columnMapping.id"] > 3
    df = dl.read_delta(spark, mapped)
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[100] == 123.0
    # old rows read NULL, not the dropped values
    assert all(rows[i] is None for i in range(10))


def test_drop_refusals(spark, mapped):
    with pytest.raises(dl.DeltaLiteError, match="partition column"):
        dl.drop_column(mapped, "grp")
    with pytest.raises(dl.DeltaLiteError, match="no such column"):
        dl.drop_column(mapped, "nope")
    with pytest.raises(dl.DeltaLiteError, match="no such column"):
        dl.rename_column(mapped, "nope", "x")


def test_rename_refuses_generated_reference(spark, mapped):
    """Inject a generationExpression into the mapped fixture's schema
    (creation-time generated+mapping is a deliberate non-goal of
    write_delta, but OTHER engines write such tables), then assert the
    DDL guard refuses renaming/dropping the referenced column."""
    from pyspark.sql.types import StructField, StructType

    snap = dl.snapshot(mapped)
    fields = []
    for f in snap.schema.fields:
        meta = dict(f.metadata or {})
        if f.name == "score":
            meta["delta.generationExpression"] = "id * 2"
        fields.append(
            StructField(f.name, f.dataType, f.nullable, metadata=meta)
        )
    dl._commit_schema_change(
        mapped, snap, StructType(fields), snap.partition_columns,
        "CHANGE COLUMN", {},
    )
    with pytest.raises(dl.DeltaLiteError, match="generated column"):
        dl.rename_column(mapped, "id", "ident")
    with pytest.raises(dl.DeltaLiteError, match="generated column"):
        dl.drop_column(mapped, "id")
    # renaming the generated column ITSELF is fine (expr unchanged)
    dl.rename_column(mapped, "score", "score_x2")
    assert "score_x2" in dl.read_delta(spark, mapped).columns


def test_nested_rename_and_drop(spark, tmp_path):
    path = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [
            Row(id=i, info=Row(city="x" * (i % 3 + 1), zip=10000 + i))
            for i in range(6)
        ]
    ).select("id", "info")
    build_nested_mapped_table(spark, df, path)
    dl.rename_column(path, "info.zip", "postal")
    got = dl.read_delta(spark, path).select("id", "info.postal").collect()
    assert {r["postal"] for r in got} == {10000 + i for i in range(6)}
    dl.drop_column(path, "info.city")
    df2 = dl.read_delta(spark, path)
    assert df2.select("info.*").columns == ["postal"]
    # dropping the whole struct works too
    dl.drop_column(path, "info")
    assert dl.read_delta(spark, path).columns == ["id"]


def test_ddl_composes_with_dml(spark, mapped):
    """rename -> DELETE with the new name -> drop -> append."""
    dl.rename_column(mapped, "score", "points")
    dl.delete_delta(spark, mapped, "points >= 8")
    assert _ids(dl.read_delta(spark, mapped)) == list(range(8))
    dl.drop_column(mapped, "points")
    dl.write_delta(
        spark.createDataFrame([Row(id=50, grp="b")]).select("id", "grp"),
        mapped,
    )
    df = dl.read_delta(spark, mapped)
    assert df.columns == ["id", "grp"] and 50 in _ids(df)


# ------------------------------------------------- nested mapped WRITES


def test_nested_struct_mapped_write_roundtrip(spark, tmp_path):
    """round 10: writing struct columns into a column-mapped table
    physicalizes nested field names recursively (inverse of the read
    path's _logical_col) and mints mapping ids at every level."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "nestedw")
    df = spark.createDataFrame(
        [
            Row(id=i, info=Row(city=f"c{i}", zip=10000 + i))
            for i in range(5)
        ]
    ).select("id", "info")
    dl.write_delta(df, path, mode="overwrite", column_mapping="name")
    snap = dl.snapshot(path)
    info = snap.schema["info"]
    ids = [
        f.metadata["delta.columnMapping.id"] for f in snap.schema.fields
    ] + [
        f.metadata["delta.columnMapping.id"] for f in info.dataType.fields
    ]
    assert len(set(ids)) == len(ids)  # unique at every level
    assert snap.configuration["delta.columnMapping.maxColumnId"] == str(
        max(ids)
    )
    footer = str(
        pq.read_schema(os.path.join(path, snap.files[0].path))
    )
    for logical in ("id:", "info", "city", "zip"):
        assert logical not in footer, f"logical name {logical} leaked"
    back = dl.read_delta(spark, path)
    assert {(r["id"], r["info"]["zip"]) for r in back.collect()} == {
        (i, 10000 + i) for i in range(5)
    }
    # appends compose; NULL structs stay null through the rebuild
    dl.write_delta(
        spark.createDataFrame(
            [(9, None)], back.schema
        ),
        path,
    )
    got = {r["id"]: r["info"] for r in dl.read_delta(spark, path).collect()}
    assert got[9] is None and got[2]["city"] == "c2"


def test_nested_mapped_write_array_of_struct_and_dml(spark, tmp_path):
    path = str(tmp_path / "nestedw2")
    df = spark.createDataFrame(
        [
            Row(
                id=i,
                tags=[Row(k="a", v=str(i)), Row(k="b", v=str(i * 2))],
            )
            for i in range(6)
        ]
    ).select("id", "tags")
    dl.write_delta(df, path, mode="overwrite", column_mapping="name")
    back = dl.read_delta(spark, path)
    assert {r["tags"][1]["v"] for r in back.collect()} == {
        str(i * 2) for i in range(6)
    }
    # COW DELETE rewrites survivors through the same physicalization
    dl.delete_delta(spark, path, "id >= 4")
    left = dl.read_delta(spark, path)
    assert sorted(r["id"] for r in left.collect()) == [0, 1, 2, 3]
    assert {r["tags"][0]["k"] for r in left.collect()} == {"a"}


def test_nested_rename_then_append_needs_new_shape(spark, tmp_path):
    """After a nested RENAME, appends must supply the NEW logical
    shape; the old shape refuses (nested evolution is a named limit)."""
    path = str(tmp_path / "nestedw3")
    df = spark.createDataFrame(
        [Row(id=1, info=Row(city="x", zip=7))]
    ).select("id", "info")
    dl.write_delta(df, path, mode="overwrite", column_mapping="name")
    dl.rename_column(path, "info.zip", "postal")
    with pytest.raises(dl.DeltaLiteError, match="shape|schema mismatch"):
        dl.write_delta(df, path)
    new_shape = dl.read_delta(spark, path)
    dl.write_delta(
        spark.createDataFrame(
            [(2, Row(city="y", postal=8))], new_shape.schema
        ),
        path,
    )
    got = {
        r["id"]: r["info"]["postal"]
        for r in dl.read_delta(spark, path).collect()
    }
    assert got == {1: 7, 2: 8}


# ---------------------------------------------------------- type widening


def test_widen_column_metadata_only_and_appends_wide(spark, tmp_path):
    path = str(tmp_path / "widen")
    dl.write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(5)], "id int, v float"
        ),
        path,
    )
    before = [f.path for f in dl.snapshot(path).files]
    dl.widen_column(path, "id", "long")
    dl.widen_column(path, "v", "double")
    snap = dl.snapshot(path)
    assert [f.path for f in snap.files] == before  # zero files touched
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    prev = snap.schema["id"].metadata["delta.typeWidening.previousTypes"]
    assert prev[0]["fromType"] == "int" and prev[0]["toType"] == "bigint"
    assert "typeWidening" in snap.protocol["readerFeatures"]
    # old int32 files scan under the widened schema; wide appends land
    big = 2**40
    dl.write_delta(
        spark.createDataFrame([(big, 1.5)], "id long, v double"), path
    )
    got = {r["id"] for r in dl.read_delta(spark, path).collect()}
    assert got == set(range(5)) | {big}


def test_widen_column_decimal_precision_growth(spark, tmp_path):
    path = str(tmp_path / "widen_dec")
    dl.write_delta(
        spark.createDataFrame([("1.25",)], "s string")
        .select(F.col("s").cast("decimal(5,2)").alias("amt")),
        path,
    )
    dl.widen_column(path, "amt", "decimal(12,2)")
    snap = dl.snapshot(path)
    assert snap.schema["amt"].dataType.simpleString() == "decimal(12,2)"
    assert [str(r["amt"]) for r in dl.read_delta(spark, path).collect()] \
        == ["1.25"]


def test_widen_column_refusals(spark, tmp_path):
    path = str(tmp_path / "widen_bad")
    dl.write_delta(
        spark.createDataFrame([(1, "x")], "id long, s string"), path
    )
    with pytest.raises(dl.DeltaLiteError, match="not a legal widening"):
        dl.widen_column(path, "id", "int")  # narrowing
    with pytest.raises(dl.DeltaLiteError, match="not a legal widening"):
        dl.widen_column(path, "s", "long")
    with pytest.raises(dl.DeltaLiteError, match="no such column"):
        dl.widen_column(path, "nope", "long")


def test_widen_nested_and_on_mapped_table(spark, tmp_path):
    """Widening composes with column mapping and the DDL family."""
    mapped = str(tmp_path / "widen_cm")
    build_column_mapped_table(
        spark,
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(10)],
            "id int, grp string, score float",
        ),
        mapped,
        physical={"id": "col-9a1b", "grp": "col-7f3e", "score": "col-0c42"},
        partition_by=["grp"],
    )
    dl.widen_column(mapped, "id", "long")
    snap = dl.snapshot(mapped)
    assert snap.schema["id"].dataType.simpleString() == "bigint"
    # mapping metadata survived
    assert snap.schema["id"].metadata[
        "delta.columnMapping.physicalName"
    ] == "col-9a1b"
    assert "columnMapping" in snap.protocol["readerFeatures"]
    df = dl.read_delta(spark, mapped)
    assert df.schema["id"].dataType.simpleString() == "bigint"
    assert sorted(r["id"] for r in df.collect()) == list(range(10))
    # rename after widen keeps the widening history
    dl.rename_column(mapped, "id", "ident")
    snap = dl.snapshot(mapped)
    assert snap.schema["ident"].metadata[
        "delta.typeWidening.previousTypes"
    ][0]["toType"] == "bigint"


# ----------------------------------------- property DDL / mapping upgrade


def test_enable_column_mapping_on_legacy_table(spark, tmp_path):
    """The migration that unlocks column DDL on a legacy table: every
    field keeps its on-disk name as physicalName (zero files touched),
    then RENAME works and post-rename appends keep writing the OLD
    physical name."""
    path = str(tmp_path / "legacy")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, label=f"l{i}") for i in range(4)]
        ).select("id", "label"),
        path,
    )
    with pytest.raises(dl.DeltaLiteError, match="columnMapping"):
        dl.rename_column(path, "label", "name")
    before = [f.path for f in dl.snapshot(path).files]
    dl.enable_column_mapping(path)
    snap = dl.snapshot(path)
    assert [f.path for f in snap.files] == before
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    f = snap.schema["label"]
    assert f.metadata["delta.columnMapping.physicalName"] == "label"
    assert snap.protocol["minReaderVersion"] >= 2
    with pytest.raises(dl.DeltaLiteError, match="already enabled"):
        dl.enable_column_mapping(path)
    dl.rename_column(path, "label", "name")
    got = dl.read_delta(spark, path)
    assert got.columns == ["id", "name"]
    dl.write_delta(
        spark.createDataFrame([Row(id=9, name="l9")]).select("id", "name"),
        path,
    )
    snap = dl.snapshot(path)
    new_file = [p for p in (f.path for f in snap.files) if p not in before]
    raw = spark.read.parquet(os.path.join(path, new_file[0]))
    assert "label" in raw.columns and "name" not in raw.columns
    assert sorted(
        r["id"] for r in dl.read_delta(spark, path).collect()
    ) == [0, 1, 2, 3, 9]


def test_set_delta_properties_toggles_and_guards(spark, tmp_path):
    path = str(tmp_path / "props")
    dl.write_delta(
        spark.createDataFrame([Row(id=1)]).select("id"), path
    )
    v = dl.set_delta_properties(
        path, {"delta.enableChangeDataFeed": "true", "custom.owner": "etl"}
    )
    snap = dl.snapshot(path)
    assert snap.version == v
    assert snap.configuration["custom.owner"] == "etl"
    assert snap.configuration["delta.enableChangeDataFeed"] == "true"
    # CDF is live from this version on
    dl.write_delta(
        spark.createDataFrame([Row(id=2)]).select("id"), path
    )
    feed = dl.read_change_feed(spark, path, v + 1, v + 1)
    assert [(r["id"], r["_change_type"]) for r in feed.collect()] \
        == [(2, "insert")]
    # UNSET removes
    dl.set_delta_properties(path, {"custom.owner": None})
    assert "custom.owner" not in dl.snapshot(path).configuration
    # guarded properties refuse and point at the dedicated path
    for bad in (
        "delta.columnMapping.mode",
        "delta.enableRowTracking",
        "delta.constraints.x",
    ):
        with pytest.raises(dl.DeltaLiteError, match="dedicated path"):
            dl.set_delta_properties(path, {bad: "true"})


def test_enable_mapping_then_drop_hides_legacy_bytes(spark, tmp_path):
    path = str(tmp_path / "legacy2")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, secret=f"s{i}", keep=i * 2) for i in range(3)]
        ).select("id", "secret", "keep"),
        path,
    )
    dl.enable_column_mapping(path)
    dl.drop_column(path, "secret")
    df = dl.read_delta(spark, path)
    assert df.columns == ["id", "keep"]
    # re-add mints a FRESH physical name even though the legacy file
    # carries a physical column literally named "secret"
    dl.write_delta(
        spark.createDataFrame([Row(id=7, keep=1, secret="new")])
        .select("id", "keep", "secret"),
        path,
        schema_mode="evolve",
    )
    rows = {r["id"]: r["secret"] for r in
            dl.read_delta(spark, path).collect()}
    assert rows[7] == "new"
    assert all(rows[i] is None for i in range(3))


# --------------------------------------------------- REORG APPLY PURGE


def test_reorg_purge_removes_dropped_bytes_and_dvs(spark, tmp_path):
    path = str(tmp_path / "reorg")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, secret=f"s{i}", keep=float(i)) for i in range(8)]
        ).select("id", "secret", "keep").orderBy("id").coalesce(1),
        path,
        column_mapping="name",
    )
    phys_secret = dl.snapshot(path).schema["secret"].metadata[
        "delta.columnMapping.physicalName"
    ]
    dl.drop_column(path, "secret")
    dl.delete_delta(spark, path, "id >= 6", use_deletion_vectors=True)
    res = dl.reorg_purge(spark, path)
    assert res["files_purged"] >= 1 and res["dv_files_purged"] >= 1
    snap = dl.snapshot(path)
    # the rewritten files carry neither the dropped bytes nor a DV
    for f in snap.files:
        assert f.deletion_vector is None
        raw = spark.read.parquet(os.path.join(path, f.path))
        assert phys_secret not in raw.columns
    got = dl.read_delta(spark, path)
    assert sorted(r["id"] for r in got.collect()) == list(range(6))
    # idempotent: nothing left to purge
    res2 = dl.reorg_purge(spark, path)
    assert res2 == {
        "version": None, "files_purged": 0, "dv_files_purged": 0
    }
    # dataChange=false: an append-only stream replays nothing
    assert all(not f.data_change for f in snap.files)


def test_reorg_purge_untouched_files_stay(spark, tmp_path):
    path = str(tmp_path / "reorg2")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v")
        .coalesce(1),
        path,
    )
    clean = {f.path for f in dl.snapshot(path).files}
    dl.write_delta(
        spark.createDataFrame([Row(id=2, v=2.0)]).select("id", "v")
        .coalesce(1),
        path,
    )
    dl.delete_delta(spark, path, "id = 2", use_deletion_vectors=True)
    (dv_file,) = [
        f.path for f in dl.snapshot(path).files if f.deletion_vector
    ]
    res = dl.reorg_purge(spark, path)
    assert res["files_purged"] == 1
    after = {f.path for f in dl.snapshot(path).files}
    assert clean <= after and dv_file not in after
    assert sorted(r["id"] for r in dl.read_delta(spark, path).collect()) \
        == [1]


def test_reorg_purge_preserves_row_ids(spark, tmp_path):
    path = str(tmp_path / "reorg_rt")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, v=float(i)) for i in range(6)]
        ).select("id", "v").orderBy("id").coalesce(1),
        path,
        configuration={"delta.enableRowTracking": "true"},
    )
    ids_before = {
        r["id"]: r["_row_id"]
        for r in dl.read_delta(spark, path, row_tracking=True).collect()
    }
    dl.delete_delta(spark, path, "id = 3", use_deletion_vectors=True)
    dl.reorg_purge(spark, path)
    ids_after = {
        r["id"]: r["_row_id"]
        for r in dl.read_delta(spark, path, row_tracking=True).collect()
    }
    assert ids_after == {
        k: v for k, v in ids_before.items() if k != 3
    }


# ----------------------------------------------------- liquid clustering


def test_liquid_clustering_set_and_optimize(spark, tmp_path):
    path = str(tmp_path / "liquid")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, k=i % 7, v=float(i)) for i in range(100)]
        ).select("id", "k", "v"),
        path,
    )
    dl.set_clustering(path, ["k", "id"])
    snap = dl.snapshot(path)
    assert dl.clustering_columns(snap) == ["k", "id"]
    assert "clustering" in snap.protocol["writerFeatures"]
    # appends stay free-form (no layout duty on the write path)
    dl.write_delta(
        spark.createDataFrame([Row(id=200, k=3, v=1.0)])
        .select("id", "k", "v"),
        path,
    )
    # OPTIMIZE without an explicit key clusters by the stored set
    res = dl.optimize(spark, path, target_files=4)
    assert res["clustered_by"] == ["k", "id"]
    assert res["files_after"] <= 4
    got = dl.read_delta(spark, path)
    assert got.count() == 101
    # clustered files have tight k-ranges: every file's k-span is
    # smaller than the global span (the point of clustering)
    snap = dl.snapshot(path)
    spans = []
    for f in snap.files:
        stats = f.stats or {}
        lo = stats.get("minValues", {}).get("k")
        hi = stats.get("maxValues", {}).get("k")
        if lo is not None and hi is not None:
            spans.append(int(hi) - int(lo))
    assert spans and min(spans) < 6  # global span is 6 (0..6)
    # CLUSTER BY NONE clears; optimize falls back to plain coalesce
    dl.set_clustering(path, [])
    assert dl.clustering_columns(dl.snapshot(path)) == []
    res2 = dl.optimize(spark, path, target_files=2)
    assert res2["clustered_by"] == []


def test_liquid_clustering_guards(spark, tmp_path):
    part = str(tmp_path / "liq_part")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, g="a")]).select("id", "g"),
        part, partition_by=["g"],
    )
    with pytest.raises(dl.DeltaLiteError, match="partitioned"):
        dl.set_clustering(part, ["id"])
    flat = str(tmp_path / "liq_flat")
    dl.write_delta(
        spark.createDataFrame([Row(id=1)]).select("id"), flat
    )
    with pytest.raises(dl.DeltaLiteError, match="no such clustering"):
        dl.set_clustering(flat, ["nope"])


def test_describe_detail(spark, tmp_path):
    path = str(tmp_path / "detail")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, v=float(i)) for i in range(5)]
        ).select("id", "v").coalesce(1),
        path,
    )
    dl.set_clustering(path, ["id"])
    dl.delete_delta(spark, path, "id = 0", use_deletion_vectors=True)
    d = dl.describe_detail(path)
    assert d["format"] == "delta" and d["numFiles"] == 1
    assert d["numDeletionVectors"] == 1
    assert d["clusteringColumns"] == ["id"]
    assert "clustering" in d["tableFeatures"]
    assert d["sizeInBytes"] > 0 and d["version"] == dl.snapshot(path).version


# --------------------------------------------- nested schema evolution


def test_nested_evolution_unmapped(spark, tmp_path):
    path = str(tmp_path / "nev")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=1, info=Row(a=10))]
        ).select("id", "info"),
        path,
    )
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=2, info=Row(a=20, b="x"))]
        ).select("id", "info"),
        path,
        schema_mode="evolve",
    )
    snap = dl.snapshot(path)
    assert [f.name for f in snap.schema["info"].dataType.fields] \
        == ["a", "b"]
    got = {r["id"]: (r["info"]["a"], r["info"]["b"])
           for r in dl.read_delta(spark, path).collect()}
    assert got == {1: (10, None), 2: (20, "x")}
    # retype refuses
    with pytest.raises(dl.DeltaLiteError, match="schema mismatch"):
        dl.write_delta(
            spark.createDataFrame(
                [Row(id=3, info=Row(a="not-an-int", b="y"))]
            ).select("id", "info"),
            path,
            schema_mode="evolve",
        )


def test_nested_evolution_mapped_mints_ids(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "nev_cm")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=1, info=Row(a=10))]
        ).select("id", "info"),
        path,
        column_mapping="name",
    )
    max_before = int(
        dl.snapshot(path).configuration["delta.columnMapping.maxColumnId"]
    )
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=2, info=Row(a=20, b="x"))]
        ).select("id", "info"),
        path,
        schema_mode="evolve",
    )
    snap = dl.snapshot(path)
    bf = snap.schema["info"].dataType["b"]
    assert bf.metadata["delta.columnMapping.id"] > max_before
    assert bf.metadata["delta.columnMapping.physicalName"].startswith(
        "col-"
    )
    assert int(
        snap.configuration["delta.columnMapping.maxColumnId"]
    ) == bf.metadata["delta.columnMapping.id"]
    # the new file carries physical names only, at every level
    new_file = snap.files[-1].path
    arrow = pq.read_schema(os.path.join(path, new_file))

    def names(field):
        out = {field.name}
        for i in range(field.type.num_fields):
            out |= names(field.type.field(i))
        return out

    all_names = set().union(*(names(f) for f in arrow))
    assert {"info", "a", "b", "id"}.isdisjoint(all_names)
    got = {r["id"]: (r["info"]["a"], r["info"]["b"])
           for r in dl.read_delta(spark, path).collect()}
    assert got == {1: (10, None), 2: (20, "x")}
    # a THIRD append at the evolved shape keeps the ids stable
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=3, info=Row(a=30, b="z"))]
        ).select("id", "info"),
        path,
    )
    snap2 = dl.snapshot(path)
    assert snap2.schema["info"].dataType["b"].metadata[
        "delta.columnMapping.id"
    ] == bf.metadata["delta.columnMapping.id"]
    assert dl.read_delta(spark, path).count() == 3


def test_nested_add_columns_unmapped(spark, tmp_path):
    """Round 11: dotted ADD COLUMNS targets append to their parent
    struct in one metadata commit; old files read NULL."""
    path = str(tmp_path / "na")
    df = spark.createDataFrame(
        [(1, ("a",))], "id int, info struct<name:string>"
    )
    dl.write_delta(df, path)
    v = dl.add_columns(path, [("info.city", "string"), ("flag", "int")])
    assert v == 1  # one commit for the whole list
    rows = dl.read_delta(spark, path).collect()
    assert rows[0]["info"]["city"] is None and rows[0]["flag"] is None
    df2 = spark.createDataFrame(
        [(2, ("b", "NYC"), 7)],
        "id int, info struct<name:string, city:string>, flag int",
    )
    dl.write_delta(df2, path, mode="append")
    got = {r["id"]: r["info"]["city"]
           for r in dl.read_delta(spark, path).collect()}
    assert got == {1: None, 2: "NYC"}


def test_nested_add_columns_mapped_mints_ids(spark, tmp_path):
    path = str(tmp_path / "nam")
    df = spark.createDataFrame(
        [(1, ("a",))], "id int, info struct<name:string>"
    )
    dl.write_delta(df, path, column_mapping="name")
    before = int(
        dl.snapshot(path).configuration["delta.columnMapping.maxColumnId"]
    )
    dl.add_columns(path, [("info.city", "string")])
    snap = dl.snapshot(path)
    meta = dict(
        snap.schema["info"].dataType["city"].metadata or {}
    )
    assert int(meta["delta.columnMapping.id"]) == before + 1
    assert meta["delta.columnMapping.physicalName"].startswith("col-")
    assert int(
        snap.configuration["delta.columnMapping.maxColumnId"]
    ) == before + 1
    # append through the mapped writer and read back
    df2 = spark.createDataFrame(
        [(2, ("b", "LA"))],
        "id int, info struct<name:string, city:string>",
    )
    dl.write_delta(df2, path, mode="append")
    got = {r["id"]: r["info"]["city"]
           for r in dl.read_delta(spark, path).collect()}
    assert got == {1: None, 2: "LA"}


def test_nested_add_columns_refusals(spark, tmp_path):
    path = str(tmp_path / "nr")
    df = spark.createDataFrame(
        [(1, ("a",), [(1,)])],
        "id int, info struct<name:string>, "
        "arr array<struct<x:int>>",
    )
    dl.write_delta(df, path)
    with pytest.raises(dl.DeltaLiteError, match="already exists"):
        dl.add_columns(path, [("info.name", "string")])
    with pytest.raises(dl.DeltaLiteError, match="non-struct"):
        dl.add_columns(path, [("arr.y", "int")])
    with pytest.raises(dl.DeltaLiteError, match="no such field"):
        dl.add_columns(path, [("nope.y", "int")])
