"""Lake-migration entry points (round 9): ``convert_to_delta`` (plain
parquet dir -> Delta IN PLACE, version-0 commit referencing existing
files) and iceberg ``add_files`` (import a Hive-layout dir into an
existing Iceberg table by absolute path).  Both are O(files) metadata —
at 100 TB the only viable migration is zero-copy.  Reference parity:
the reference's Collect->Cleanse promotion assumes managed-format
tables; these are how an existing estate gets there."""

import glob
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.sources import delta_lite as dl
from aws_insurancelake_etl_spark.sources import iceberg_lite as il


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def hive_dir(spark, tmp_path):
    """A plain Hive-partitioned parquet dir (no table format)."""
    path = str(tmp_path / "hive")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i % 2 == 0 else "b", v=float(i))
         for i in range(12)]
    ).select("id", "grp", "v")
    df.write.partitionBy("grp").parquet(path)
    return path


# ------------------------------------------------------ convert_to_delta


def test_convert_to_delta_in_place_zero_copy(spark, hive_dir):
    before = set(
        glob.glob(os.path.join(hive_dir, "**", "*.parquet"), recursive=True)
    )
    res = dl.convert_to_delta(spark, hive_dir, partition_by=["grp"])
    assert res["version"] == 0 and res["files"] == len(before)
    # no file moved, copied, or rewritten
    after = set(
        glob.glob(os.path.join(hive_dir, "**", "*.parquet"), recursive=True)
    )
    assert after == before
    got = dl.read_delta(spark, hive_dir)
    assert _ids(got) == list(range(12))
    # partition pruning works off the converted log
    assert _ids(dl.read_delta(spark, hive_dir,
                              partition_filter={"grp": "a"})) \
        == list(range(0, 12, 2))
    # the adds carry footer stats (data skipping from the first read)
    assert all(
        a.stats and a.stats.get("numRecords")
        for a in dl.snapshot(hive_dir).files
    )


def test_convert_then_delta_ops_work(spark, hive_dir):
    dl.convert_to_delta(spark, hive_dir, partition_by=["grp"])
    # converted schema puts partition cols LAST — appends match it
    extra = spark.createDataFrame([Row(id=100, grp="a", v=1.0)]).select(
        "id", "v", "grp"
    )
    dl.write_delta(extra, hive_dir, mode="append")
    dl.delete_delta(spark, hive_dir, "id < 3")
    assert _ids(dl.read_delta(spark, hive_dir)) == list(range(3, 12)) + [100]
    # history: CONVERT then APPEND then DELETE
    ops = [h["operation"] for h in dl.history(hive_dir)]
    assert ops[0] == "CONVERT" and ops[-1] == "DELETE"


def test_convert_partition_types_and_guards(spark, tmp_path):
    path = str(tmp_path / "typed")
    df = spark.createDataFrame(
        [Row(id=i, yr=2020 + i % 2) for i in range(6)]
    ).select("id", "yr")
    df.write.partitionBy("yr").parquet(path)
    dl.convert_to_delta(
        spark, path, partition_by=["yr"], partition_schema={"yr": "int"}
    )
    got = dl.read_delta(spark, path)
    assert dict(got.dtypes)["yr"] == "int"
    assert {r.yr for r in got.collect()} == {2020, 2021}
    with pytest.raises(dl.DeltaLiteError, match="already a delta table"):
        dl.convert_to_delta(spark, path, partition_by=["yr"])


def test_convert_refuses_layout_mismatch(spark, hive_dir):
    with pytest.raises(dl.DeltaLiteError, match="partition dirs"):
        dl.convert_to_delta(spark, hive_dir)  # forgot partition_by


# ----------------------------------------------------- iceberg add_files


def test_add_files_imports_hive_dir_in_place(spark, hive_dir, tmp_path):
    tbl = str(tmp_path / "ice")
    seed = spark.createDataFrame(
        [Row(id=100, grp="a", v=0.5), Row(id=101, grp="b", v=1.5)]
    ).select("id", "grp", "v")
    il.write_iceberg(spark, seed, tbl, partition_by=["grp"])
    res = il.add_files(spark, tbl, hive_dir)
    assert res["files"] == len(
        glob.glob(os.path.join(hive_dir, "**", "*.parquet"), recursive=True)
    )
    got = il.read_iceberg(spark, tbl)
    # identity partition column attaches from the manifest for the
    # imported files (their data lacks the grp column)
    assert _ids(got) == list(range(12)) + [100, 101]
    by_grp = {
        r.grp: r.n
        for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp == {"a": 7, "b": 7}
    # imported bytes stay where they were
    assert not glob.glob(os.path.join(tbl, "data", "**", "grp=*", "*id=*"),
                         recursive=True)
    # partition pruning still plans on the manifests
    pruned = il.read_iceberg(spark, tbl, partition_filter={"grp": "b"})
    assert _ids(pruned) == list(range(1, 12, 2)) + [101]


def test_add_files_expire_never_deletes_external_bytes(
    spark, hive_dir, tmp_path
):
    tbl = str(tmp_path / "ice2")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=500, grp="a", v=0.0)]).select(
            "id", "grp", "v"
        ),
        tbl,
        partition_by=["grp"],
    )
    il.add_files(spark, tbl, hive_dir)
    # rewrite everything internal, expiring the import snapshot
    il.rewrite_data_files(spark, tbl)
    before = set(
        glob.glob(os.path.join(hive_dir, "**", "*.parquet"), recursive=True)
    )
    il.expire_snapshots(tbl, keep_last=1)
    assert set(
        glob.glob(os.path.join(hive_dir, "**", "*.parquet"), recursive=True)
    ) == before
    assert _ids(il.read_iceberg(spark, tbl)) == list(range(12)) + [500]


def test_add_files_then_dml_binds_partition_column(
    spark, hive_dir, tmp_path
):
    """ADVICE r9 (medium): UPDATE/DELETE read planned files through the
    full reader, so add_files-imported Hive files (identity partition
    column absent in-data) get the manifest's partition value attached
    and a predicate naming it binds instead of failing."""
    tbl = str(tmp_path / "icedml")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=100, grp="a", v=0.5)]).select(
            "id", "grp", "v"
        ),
        tbl, partition_by=["grp"],
    )
    il.add_files(spark, tbl, hive_dir)
    # grp lives only in the imported dirs' names for ids 0..11
    res = il.update_iceberg(
        spark, tbl, {"v": "v + 1000"}, "grp = 'b' AND id < 4"
    )
    assert res["rows_updated"] == 2  # ids 1, 3
    got = {r.id: (r.grp, r.v) for r in il.read_iceberg(spark, tbl).collect()}
    assert got[1] == ("b", 1001.0) and got[3] == ("b", 1003.0)
    assert got[2] == ("a", 2.0) and got[100] == ("a", 0.5)
    res2 = il.delete_iceberg(spark, tbl, "grp = 'b' AND v >= 1000")
    assert res2["rows_deleted"] == 2
    assert _ids(il.read_iceberg(spark, tbl)) == \
        [0, 2] + list(range(4, 12)) + [100]


def test_add_files_guards(spark, hive_dir, tmp_path):
    with pytest.raises(il.IcebergLiteError, match="existing table"):
        il.add_files(spark, str(tmp_path / "none"), hive_dir)
    tbl = str(tmp_path / "ice3")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=1, grp="a", v=0.0)]).select(
            "id", "grp", "v"
        ),
        tbl,
    )
    # unpartitioned table, partitioned dir -> dir mismatch
    with pytest.raises(il.IcebergLiteError, match="partition dirs"):
        il.add_files(spark, tbl, hive_dir)


# --------------------------------------------------- uniform export


def test_export_uniform_mirrors_delta_reads(spark, tmp_path):
    delta = str(tmp_path / "d")
    ice = str(tmp_path / "i")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i % 2 == 0 else "b", v=float(i))
         for i in range(10)]
    ).select("id", "grp", "v")
    dl.write_delta(df, delta, partition_by=["grp"])
    res = il.export_uniform(delta, ice)
    assert res["delta_version"] == 0 and res["files"] >= 2
    got = il.read_iceberg(spark, ice)
    assert _ids(got) == list(range(10))
    # identity partition values attach from the manifest (delta files
    # lack the partition column in-data) and PRUNE at the manifest
    pruned = il.read_iceberg(spark, ice, partition_filter={"grp": "a"})
    assert _ids(pruned) == [0, 2, 4, 6, 8]
    # zero parquet under the iceberg dir: pure metadata mirror
    assert not glob.glob(os.path.join(ice, "data", "**", "*.parquet"),
                         recursive=True)


def test_export_uniform_refreshes_after_delta_mutation(spark, tmp_path):
    delta = str(tmp_path / "d2")
    ice = str(tmp_path / "i2")
    dl.write_delta(
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8)])
        .select("id", "v"),
        delta,
    )
    il.export_uniform(delta, ice)
    dl.delete_delta(spark, delta, "id < 3")
    dl.write_delta(
        spark.createDataFrame([Row(id=100, v=1.0)]).select("id", "v"),
        delta, mode="append",
    )
    res = il.export_uniform(delta, ice)
    assert res["delta_version"] == 2
    assert _ids(il.read_iceberg(spark, ice)) == [3, 4, 5, 6, 7, 100]
    # the first mirror snapshot still time-travels
    assert _ids(il.read_iceberg(spark, ice, snapshot_id=1)) \
        == list(range(8))


def test_export_uniform_flat_column_mapping_via_name_mapping(
    spark, tmp_path
):
    """round 10 (supersedes the r9 refusal): a FLAT column-mapped delta
    table exports through the Iceberg spec's name mapping
    (``schema.name-mapping.default``) — the parquet files keep their
    Delta physical names, the Iceberg schema keeps the logical names
    with field ids := the Delta columnMapping ids, and the alias list
    bridges them for any spec-conformant reader."""
    import json as _json

    cm = str(tmp_path / "cm")
    ice = str(tmp_path / "cm_ice")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=i, s=chr(97 + i % 3), v=float(i)) for i in range(9)]
        ).select("id", "s", "v"),
        cm, column_mapping="name",
    )
    res = il.export_uniform(cm, ice)
    assert res["files"] >= 1
    meta = il._load_metadata(ice)
    nm = _json.loads(meta["properties"]["schema.name-mapping.default"])
    snap = dl.snapshot(cm)
    delta_ids = {
        f.name: f.metadata["delta.columnMapping.id"]
        for f in snap.schema.fields
    }
    phys = {
        f.name: f.metadata["delta.columnMapping.physicalName"]
        for f in snap.schema.fields
    }
    by_id = {e["field-id"]: set(e["names"]) for e in nm}
    for name, fid in delta_ids.items():
        assert by_id[fid] == {name, phys[name]}
    cur = il._current_schema_of(meta)
    assert {f["name"]: f["id"] for f in cur["fields"]} == delta_ids
    got = il.read_iceberg(spark, ice)
    assert got.columns == ["id", "s", "v"]
    assert {(r["id"], r["s"]) for r in got.collect()} == {
        (i, chr(97 + i % 3)) for i in range(9)
    }
    # DV deletes on the mapped source compose with the nm mirror
    dl.delete_delta(spark, cm, "id in (1, 4)", use_deletion_vectors=True)
    il.export_uniform(cm, ice)
    assert _ids(il.read_iceberg(spark, ice)) == [0, 2, 3, 5, 6, 7, 8]


def test_export_uniform_nested_column_mapping(spark, tmp_path):
    """Round-10 third session (closes the r10 refusal): struct columns
    on a mapped source export through NESTED name-mapping entries —
    the alias tree covers every struct level, and the reader rebuilds
    logical names with pure Catalyst expressions."""
    nm_t = str(tmp_path / "cmn")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=1, prof=Row(name="x", age=3)),
             Row(id=2, prof=Row(name="y", age=4))]
        ).select("id", "prof"),
        nm_t, column_mapping="name",
    )
    ice = str(tmp_path / "cmn_ice")
    il.export_uniform(nm_t, ice)
    nm = json.loads(
        il._load_metadata(ice)["properties"]["schema.name-mapping.default"]
    )
    prof = next(e for e in nm if "prof" in e["names"])
    assert {n for f in prof["fields"] for n in f["names"]} >= {"name", "age"}
    got = sorted(
        (r["id"], r["prof"]["name"], r["prof"]["age"])
        for r in il.read_iceberg(spark, ice).collect()
    )
    assert got == [(1, "x", 3), (2, "y", 4)]


def test_export_uniform_partitioned_column_mapping(spark, tmp_path):
    """Round-10 third session (closes the r10 refusal): a PARTITIONED
    mapped source exports — manifest tuples carry logical partition
    keys; the reader's attach path resolves data columns through the
    name mapping per file and attaches the partition literal, so
    Delta's physically-named hive dirs never parse."""
    cp = str(tmp_path / "cmp")
    dl.write_delta(
        spark.createDataFrame(
            [Row(id=1, g="a", s="x"), Row(id=2, g="b", s="y"),
             Row(id=3, g="a", s="z")]
        ).select("id", "g", "s"),
        cp, column_mapping="name", partition_by=["g"],
    )
    ice = str(tmp_path / "cmp_ice")
    il.export_uniform(cp, ice)
    got = sorted(
        (r["id"], r["g"], r["s"])
        for r in il.read_iceberg(spark, ice).collect()
    )
    assert got == [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")]
    pruned = il.read_iceberg(spark, ice, partition_filter={"g": "a"})
    assert sorted(r["id"] for r in pruned.collect()) == [1, 3]


def test_export_uniform_nested_partitioned_evolution(spark, tmp_path):
    """The combined shape: partitioned + map-of-struct + DV delete +
    nested schema evolution, re-exported after each Delta commit.  Old
    files surface null for the added nested field; the evolved file
    reads its stored values — per-group nested resolution against the
    footer fingerprints."""
    d = str(tmp_path / "d")
    ice = str(tmp_path / "i")
    dl.write_delta(
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", {"k%d" % i: {"y": i * 10}})
             for i in range(8)],
            "id int, grp string, m map<string,struct<y:int>>",
        ),
        d, column_mapping="name", partition_by=["grp"],
    )
    il.export_uniform(d, ice)
    dl.delete_delta(spark, d, "id % 4 = 0", use_deletion_vectors=True)
    dl.write_delta(
        spark.createDataFrame(
            [(100, "a", {"kx": {"y": 1, "z": "new"}})],
            "id int, grp string, m map<string,struct<y:int,z:string>>",
        ),
        d, mode="append", schema_mode="evolve",
    )
    il.export_uniform(d, ice)
    got = {
        r["id"]: r["m"] for r in il.read_iceberg(spark, ice).collect()
    }
    assert sorted(got) == [1, 2, 3, 5, 6, 7, 100]
    assert got[100]["kx"]["z"] == "new"
    assert got[100]["kx"]["y"] == 1
    assert got[2]["k2"]["y"] == 20 and got[2]["k2"]["z"] is None


def test_export_uniform_translates_dvs_to_v3(spark, tmp_path):
    """Round 10 (closes the r8-era refusal): Delta DVs and Iceberg v3
    DVs share the interchange bytes, so a DV-carrying delta table
    exports as a FORMAT-VERSION 3 mirror whose puffin blobs hold the
    same deleted positions — no OPTIMIZE required, no resurrection."""
    dv = str(tmp_path / "dv")
    ice = str(tmp_path / "dv_ice")
    dl.write_delta(
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v").orderBy("id").coalesce(1),
        dv,
    )
    dl.delete_delta(spark, dv, "id in (3, 7)", use_deletion_vectors=True)
    res = il.export_uniform(dv, ice)
    assert res["dv_files"] == 1
    assert il._load_metadata(ice)["format-version"] == 3
    assert _ids(il.read_iceberg(spark, ice)) == [0, 1, 2, 4, 5, 6, 8, 9]
    # refresh after more DV deletes keeps the mirror consistent
    dl.delete_delta(spark, dv, "id = 0", use_deletion_vectors=True)
    il.export_uniform(dv, ice)
    assert _ids(il.read_iceberg(spark, ice)) == [1, 2, 4, 5, 6, 8, 9]


def test_export_uniform_upgrades_v2_mirror_when_source_grows_dvs(
    spark, tmp_path
):
    d = str(tmp_path / "d")
    ice = str(tmp_path / "i")
    dl.write_delta(
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
        .select("id", "v").orderBy("id").coalesce(1),
        d,
    )
    il.export_uniform(d, ice)
    assert il._load_metadata(ice)["format-version"] == 2
    dl.delete_delta(spark, d, "id < 2", use_deletion_vectors=True)
    il.export_uniform(d, ice)
    assert il._load_metadata(ice)["format-version"] == 3
    assert _ids(il.read_iceberg(spark, ice)) == [2, 3, 4, 5]


def test_external_hive_read_is_single_scan(spark, tmp_path):
    """Hive-consistent external files (uniform mirror / add_files
    import) must collapse into ONE basePath scan — a union branch per
    partition VALUE would be a 10k-way union at production partition
    counts (PERFORMANCE.md finding 49)."""
    delta = str(tmp_path / "d")
    ice = str(tmp_path / "i")
    df = spark.createDataFrame(
        [Row(id=i, grp=f"g{i % 6}", v=float(i)) for i in range(24)]
    ).select("id", "grp", "v")
    dl.write_delta(df, delta, partition_by=["grp"])
    il.export_uniform(delta, ice)
    mirror = il.read_iceberg(spark, ice)
    plan = mirror._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan
    assert _ids(mirror) == list(range(24))


# ---------------------------------------- iceberg -> delta conversion


def test_convert_iceberg_to_delta_in_place(spark, tmp_path):
    src = str(tmp_path / "ice2d")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i % 2 == 0 else "b", v=float(i))
         for i in range(10)]
    ).select("id", "grp", "v")
    il.write_iceberg(spark, df, src, partition_by=["grp"])
    res = dl.convert_iceberg_to_delta(spark, src)
    assert res["files"] >= 2 and res["partition_by"] == ["grp"]
    got = dl.read_delta(spark, src)
    assert _ids(got) == list(range(10))
    assert {r["grp"] for r in got.collect()} == {"a", "b"}
    # pruning via the converted partitionValues
    assert _ids(dl.read_delta(spark, src, partition_filter={"grp": "a"})) \
        == [0, 2, 4, 6, 8]
    # iceberg metadata still present and readable (frozen history)
    assert _ids(il.read_iceberg(spark, src)) == list(range(10))
    # delta writers take over
    dl.write_delta(
        spark.createDataFrame([Row(id=50, grp="a", v=0.5)])
        .select("id", "grp", "v"),
        src,
    )
    assert _ids(dl.read_delta(spark, src)) == list(range(10)) + [50]


def test_convert_iceberg_refusals(spark, tmp_path):
    # MOR debt refuses with the compaction hint
    src = str(tmp_path / "ice2d_mor")
    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(6)]
    ).select("id", "v")
    il.write_iceberg(spark, df, src)
    il.delete_iceberg(spark, src, "id = 3")
    with pytest.raises(dl.DeltaLiteError, match="rewrite_data_files"):
        dl.convert_iceberg_to_delta(spark, src)
    # folding the deletes in lifts it
    il.rewrite_data_files(spark, src)
    res = dl.convert_iceberg_to_delta(spark, src)
    assert res["files"] >= 1
    assert _ids(dl.read_delta(spark, src)) == [0, 1, 2, 4, 5]
    # transformed partition spec converts as UNPARTITIONED
    src2 = str(tmp_path / "ice2d_bucket")
    il.write_iceberg(
        spark, df, src2, partition_by=["bucket(4, id)"]
    )
    res2 = dl.convert_iceberg_to_delta(spark, src2)
    assert res2["partition_by"] == []
    assert _ids(dl.read_delta(spark, src2)) == list(range(6))


def test_convert_refuses_unmaterialized_defaults(spark, tmp_path):
    """Round 11: delta has no initial-default, so converting a v3
    table whose old files lean on the read-side default projection
    would silently flip those values to NULL — refuse by name;
    rewrite_data_files now counts unmaterialized defaults as
    read-side debt, materializes them, and unblocks the convert."""
    src = str(tmp_path / "t")
    il.write_iceberg(
        spark, spark.createDataFrame([(1,)], "id int"), src,
        format_version=3,
    )
    il.alter_iceberg_schema(
        src, adds={"region": {"type": "string", "default": "EMEA"}}
    )
    with pytest.raises(dl.DeltaLiteError, match="initial-default"):
        dl.convert_iceberg_to_delta(spark, src)
    r = il.rewrite_data_files(spark, src)
    assert r["rewritten"] is True
    dl.convert_iceberg_to_delta(spark, src)
    rows = dl.read_delta(spark, src).collect()
    assert rows[0]["region"] == "EMEA"
