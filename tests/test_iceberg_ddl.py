"""Iceberg ALTER TABLE rename/drop column DDL (round 10).

Spec §Schema Evolution: renames and drops are pure metadata commits —
field IDS are the identity, so a renamed column keeps resolving in
every existing file, and ``last-column-id`` guarantees a dropped
field's id is never reused.  Per-file name resolution walks each data
file's sequence number to its snapshot's recorded ``schema-id``.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.sources import iceberg_lite as il


def _write(spark, path, rows, partition_by=None, **kw):
    df = spark.createDataFrame(rows)
    cols = list(rows[0].asDict().keys())
    il.write_iceberg(
        spark, df.select(*cols), path, partition_by=partition_by, **kw
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(
        spark,
        path,
        [Row(id=i, grp="a" if i % 2 == 0 else "b", score=float(i))
         for i in range(8)],
    )
    return path


def _rows(spark, path):
    return {
        tuple(r) for r in il.read_iceberg(spark, path).collect()
    }


def test_rename_reads_old_and_new_files(spark, table):
    il.alter_iceberg_schema(table, renames={"score": "points"})
    df = il.read_iceberg(spark, table)
    assert df.columns == ["id", "grp", "points"]
    assert {(r["id"], r["points"]) for r in df.collect()} == {
        (i, float(i)) for i in range(8)
    }
    # append AFTER the rename: new files physically carry the new name,
    # old files the old name — one read resolves both
    _write(spark, table, [Row(id=100, grp="a", points=42.0)])
    df = il.read_iceberg(spark, table)
    assert df.count() == 9
    got = {(r["id"], r["points"]) for r in df.collect()}
    assert (100, 42.0) in got and (3, 3.0) in got
    # the field kept its id through the rename
    meta = il._load_metadata(table)
    cur = il._current_schema_of(meta)
    by_name = {f["name"]: f["id"] for f in cur["fields"]}
    assert by_name["points"] == 3


def test_rename_zero_files_touched(spark, table):
    files_before = sorted(f.path for f in il.plan_files(table))
    il.alter_iceberg_schema(table, renames={"score": "points"})
    assert sorted(f.path for f in il.plan_files(table)) == files_before


def test_rename_then_filter_and_dml(spark, table):
    il.alter_iceberg_schema(table, renames={"score": "points"})
    out = il.delete_iceberg(spark, table, "points >= 6")
    assert out["rows_deleted"] == 2
    df = il.read_iceberg(spark, table)
    assert sorted(r["id"] for r in df.collect()) == list(range(6))
    il.update_iceberg(
        spark, table, {"points": "points + 0.5"}, "id = 0"
    )
    got = {r["id"]: r["points"] for r in
           il.read_iceberg(spark, table).collect()}
    assert got[0] == 0.5


def test_drop_column_hides_values(spark, table):
    il.alter_iceberg_schema(table, drops=["score"])
    df = il.read_iceberg(spark, table)
    assert df.columns == ["id", "grp"]
    assert df.count() == 8


def test_drop_then_readd_mints_fresh_id_and_no_resurrection(spark, table):
    il.alter_iceberg_schema(table, drops=["score"])
    meta = il._load_metadata(table)
    assert meta["last-column-id"] == 3
    # evolve-append re-adds the NAME: must mint id 4, not reuse 3
    _write(spark, table, [Row(id=200, grp="b", score=9.9)])
    meta = il._load_metadata(table)
    cur = il._current_schema_of(meta)
    by_name = {f["name"]: f["id"] for f in cur["fields"]}
    assert by_name["score"] == 4
    rows = {r["id"]: r["score"] for r in
            il.read_iceberg(spark, table).collect()}
    assert rows[200] == 9.9
    # old rows must read NULL for the re-added column, never the
    # dropped column's bytes
    assert all(rows[i] is None for i in range(8))


def test_rename_swap_resolves_per_file(spark, table):
    """a->tmp, b->a, tmp->b style swaps are the hardest case: the same
    NAME means different fields in different files."""
    il.alter_iceberg_schema(table, renames={"score": "tmp_x"})
    il.alter_iceberg_schema(table, renames={"grp": "score"})
    _write(spark, table, [Row(id=300, score="z", tmp_x=1.25)])
    df = il.read_iceberg(spark, table)
    assert set(df.columns) == {"id", "score", "tmp_x"}
    got = {r["id"]: (r["score"], r["tmp_x"]) for r in df.collect()}
    assert got[300] == ("z", 1.25)
    assert got[2] == ("a", 2.0)  # old file: grp bytes -> score column


def test_alter_guards(spark, tmp_path, table):
    with pytest.raises(il.IcebergLiteError, match="no such column"):
        il.alter_iceberg_schema(table, renames={"nope": "x"})
    with pytest.raises(il.IcebergLiteError, match="collide"):
        il.alter_iceberg_schema(table, renames={"score": "id"})
    with pytest.raises(il.IcebergLiteError, match="nothing to do"):
        il.alter_iceberg_schema(table)
    # dotted paths are supported (round 10) — a missing root still
    # errors by name
    with pytest.raises(il.IcebergLiteError, match="no such column"):
        il.alter_iceberg_schema(table, drops=["a.b"])
    with pytest.raises(il.IcebergLiteError, match="every column"):
        il.alter_iceberg_schema(table, drops=["id", "grp", "score"])
    # partitioned table: dropping the active spec's source refuses,
    # renaming it is id-resolved and fine
    p2 = str(tmp_path / "p2")
    _write(
        spark, p2,
        [Row(id=i, grp="a" if i % 2 == 0 else "b", v=float(i))
         for i in range(6)],
        partition_by=["grp"],
    )
    with pytest.raises(il.IcebergLiteError, match="partition source"):
        il.alter_iceberg_schema(p2, drops=["grp"])
    il.alter_iceberg_schema(p2, renames={"grp": "segment"})
    df = il.read_iceberg(spark, p2)
    assert "segment" in df.columns
    assert df.where("segment = 'a'").count() == 3


def test_alter_refuses_on_live_equality_deletes(spark, table):
    src = spark.createDataFrame(
        [Row(id=1, grp="b", score=11.0)]
    ).select("id", "grp", "score")
    il.upsert_iceberg_equality(spark, src, table, keys=["id"])
    with pytest.raises(il.IcebergLiteError, match="equality-delete"):
        il.alter_iceberg_schema(table, renames={"id": "pk"})
    # un-equated columns still alter fine
    il.alter_iceberg_schema(table, renames={"score": "points"})
    got = {r["id"]: r["points"] for r in
           il.read_iceberg(spark, table).collect()}
    assert got[1] == 11.0
    # folding the deletes in lifts the refusal
    il.rewrite_data_files(spark, table)
    il.alter_iceberg_schema(table, renames={"id": "pk"})
    assert "pk" in il.read_iceberg(spark, table).columns


def test_rename_on_v3_preserves_row_lineage(spark, tmp_path):
    path = str(tmp_path / "v3")
    _write(
        spark, path,
        [Row(id=i, v=float(i)) for i in range(5)],
        format_version=3,
    )
    il.alter_iceberg_schema(path, renames={"v": "val"})
    df = il.read_iceberg(spark, path, row_lineage=True)
    got = {r["id"]: (r["val"], r["_row_id"]) for r in df.collect()}
    assert {g[1] for g in got.values()} == set(range(5))
    assert got[2][0] == 2.0


def test_snapshot_time_travel_reads_old_schema_names(spark, table):
    """spec §Scan Planning: a time-travel read uses the SNAPSHOT's
    schema — after the rename, snapshot 1 still reads as 'score'
    while the current table reads as 'points'."""
    il.alter_iceberg_schema(table, renames={"score": "points"})
    df = il.read_iceberg(spark, table, snapshot_id=1)
    assert df.count() == 8 and "score" in df.columns
    assert "points" in il.read_iceberg(spark, table).columns
    # values identical either way
    old = {(r["id"], r["score"]) for r in df.collect()}
    assert old == {(i, float(i)) for i in range(8)}


# ---------------------------------------------------------- ADD COLUMN


def test_add_column_plain_reads_null_for_old_files(spark, table):
    il.alter_iceberg_schema(table, adds={"note": "string"})
    df = il.read_iceberg(spark, table)
    assert df.columns == ["id", "grp", "score", "note"]
    assert all(r["note"] is None for r in df.collect())
    _write(
        spark, table,
        [Row(id=900, grp="a", score=1.0, note="hi")],
    )
    got = {r["id"]: r["note"] for r in il.read_iceberg(spark, table).collect()}
    assert got[900] == "hi" and got[0] is None


def test_add_column_with_default_requires_v3(spark, table):
    with pytest.raises(il.IcebergLiteError, match="format-version 3"):
        il.alter_iceberg_schema(
            table, adds={"region": {"type": "string", "default": "EU"}}
        )


def test_add_column_default_materializes_on_v3(spark, tmp_path):
    path = str(tmp_path / "v3d")
    _write(
        spark, path,
        [Row(id=i, v=float(i)) for i in range(4)],
        format_version=3,
    )
    il.alter_iceberg_schema(
        path, adds={"region": {"type": "string", "default": "EU"}}
    )
    # pre-add files surface the default, not null
    got = {r["id"]: r["region"] for r in
           il.read_iceberg(spark, path).collect()}
    assert got == {i: "EU" for i in range(4)}
    # post-add appends store real values (nulls included)
    _write(spark, path, [Row(id=10, v=1.0, region="US")])
    got = {r["id"]: r["region"] for r in
           il.read_iceberg(spark, path).collect()}
    assert got[10] == "US" and got[0] == "EU"
    # the added field's id is past every prior id and recorded
    meta = il._load_metadata(path)
    cur = il._current_schema_of(meta)
    by_name = {f["name"]: f["id"] for f in cur["fields"]}
    assert by_name["region"] == 3 and meta["last-column-id"] == 3


def test_add_column_guards(spark, table):
    with pytest.raises(il.IcebergLiteError, match="already exists"):
        il.alter_iceberg_schema(table, adds={"score": "double"})
    with pytest.raises(il.IcebergLiteError, match="unsupported iceberg"):
        il.alter_iceberg_schema(table, adds={"x": "struct<a:int>"})
    # drop then ADD back via alter: fresh id, no resurrection
    il.alter_iceberg_schema(table, drops=["score"])
    il.alter_iceberg_schema(table, adds={"score": "double"})
    meta = il._load_metadata(table)
    cur = il._current_schema_of(meta)
    by_name = {f["name"]: f["id"] for f in cur["fields"]}
    assert by_name["score"] == 4
    rows = {r["id"]: r["score"] for r in
            il.read_iceberg(spark, table).collect()}
    assert all(v is None for v in rows.values())


def test_incremental_scan_resolves_renamed_names(spark, table):
    il.alter_iceberg_schema(table, renames={"score": "points"})
    _write(spark, table, [Row(id=500, grp="a", points=5.5)])
    inc = il.read_iceberg_incremental(spark, table, from_snapshot=1)
    assert inc.columns == ["id", "grp", "points"]
    assert [(r["id"], r["points"]) for r in inc.collect()] == [(500, 5.5)]
    # a range beginning BEFORE the rename still resolves: the old
    # file scans under its as-written name and projects to current
    _write(spark, table, [Row(id=501, grp="b", points=6.5)])
    inc2 = il.read_iceberg_incremental(spark, table, from_snapshot=3)
    assert sorted(r["id"] for r in inc2.collect()) == [501]


def test_incremental_scan_straddles_a_rename(spark, table):
    """Round 10, third session (previously a named refusal): a range
    whose appends span a RENAME scans one per-schema group per
    distinct as-written naming and unions under CURRENT names."""
    _write(spark, table, [Row(id=600, grp="a", score=1.0)])  # pre-rename
    il.alter_iceberg_schema(table, renames={"score": "points"})
    _write(spark, table, [Row(id=601, grp="b", points=2.0)])  # post
    inc = il.read_iceberg_incremental(spark, table, from_snapshot=1)
    assert inc.columns == ["id", "grp", "points"]
    got = {r["id"]: r["points"] for r in inc.collect()}
    assert got == {600: 1.0, 601: 2.0}


# ---------------------------------------------------------------- nested


@pytest.fixture()
def nested_table(spark, tmp_path):
    path = str(tmp_path / "nt")
    df = spark.createDataFrame(
        [(1, ("alice", 10)), (2, ("bob", 20))],
        "id int, info struct<name:string, score:int>",
    )
    il.write_iceberg(spark, df, path)
    return path


def test_nested_rename_resolves_old_files(spark, nested_table):
    il.alter_iceberg_schema(
        nested_table, renames={"info.score": "points"}
    )
    rows = il.read_iceberg(spark, nested_table).orderBy("id").collect()
    assert [r["info"]["points"] for r in rows] == [10, 20]
    # append under the new name; both naming eras union cleanly
    df = spark.createDataFrame(
        [(3, ("carol", 30))], "id int, info struct<name:string, points:int>"
    )
    il.write_iceberg(spark, df, nested_table)
    rows = il.read_iceberg(spark, nested_table).orderBy("id").collect()
    assert [r["info"]["points"] for r in rows] == [10, 20, 30]


def test_nested_drop_then_readd_never_resurrects(spark, nested_table):
    il.alter_iceberg_schema(nested_table, drops=["info.score"])
    rows = il.read_iceberg(spark, nested_table).orderBy("id").collect()
    assert "score" not in rows[0]["info"].asDict()
    il.alter_iceberg_schema(nested_table, adds={"info.score": "long"})
    rows = il.read_iceberg(spark, nested_table).orderBy("id").collect()
    # the re-added field has a FRESH id: old bytes stay unreachable
    assert all(r["info"]["score"] is None for r in rows)
    meta = il._load_metadata(nested_table)
    cur = il._current_schema_of(meta)
    ids = [cur["fields"][0]["id"]]
    for f in cur["fields"]:
        ids.extend(il._walk_type_ids(f["type"]))
    assert len(set(ids)) == len(ids)


def test_nested_ddl_zero_files_touched(spark, nested_table):
    import glob, os

    data = sorted(glob.glob(os.path.join(nested_table, "data", "*")))
    before = [(p, os.path.getmtime(p)) for p in data]
    il.alter_iceberg_schema(nested_table, renames={"info.name": "nm"})
    il.alter_iceberg_schema(nested_table, adds={"info.extra": "string"})
    after = [
        (p, os.path.getmtime(p))
        for p in sorted(glob.glob(os.path.join(nested_table, "data", "*")))
    ]
    assert before == after


def test_nested_guards(spark, nested_table):
    with pytest.raises(il.IcebergLiteError, match="collides"):
        il.alter_iceberg_schema(
            nested_table, renames={"info.score": "name"}
        )
    with pytest.raises(il.IcebergLiteError, match="no such column"):
        il.alter_iceberg_schema(nested_table, drops=["info.nope"])
    with pytest.raises(il.IcebergLiteError, match="only field"):
        il.alter_iceberg_schema(
            nested_table, drops=["info.name", "info.score"]
        )
    with pytest.raises(il.IcebergLiteError, match="not a struct"):
        il.alter_iceberg_schema(nested_table, renames={"id.x": "y"})
    # round 11: nested defaults are SUPPORTED on v3 — on a v2 table
    # they refuse by format version, the genuinely ambiguous case left
    with pytest.raises(il.IcebergLiteError, match="format-version 3"):
        il.alter_iceberg_schema(
            nested_table,
            adds={"info.d": {"type": "int", "default": 7}},
        )


def test_nested_add_with_default_on_v3(spark, nested_table):
    """Round 11 (VERDICT r10 #3): nested ADD COLUMN with a default on a
    v3 table — pre-add rows surface the default, a post-add append
    omitting the field materializes the write-default, and an explicit
    append keeps its stored values."""
    il.upgrade_iceberg_format(nested_table, 3)
    il.alter_iceberg_schema(
        nested_table, adds={"info.d": {"type": "int", "default": 7}}
    )
    got = {r["id"]: r["info"]["d"]
           for r in il.read_iceberg(spark, nested_table).collect()}
    assert got == {1: 7, 2: 7}
    df = spark.createDataFrame(
        [(3, ("carol", 30, 5))],
        "id int, info struct<name:string, score:int, d:int>",
    )
    il.write_iceberg(spark, df, nested_table)
    omit = spark.createDataFrame(
        [(4, ("dave", 40))],
        "id int, info struct<name:string, score:int>",
    )
    il.write_iceberg(spark, omit, nested_table)
    got = {r["id"]: r["info"]["d"]
           for r in il.read_iceberg(spark, nested_table).collect()}
    assert got == {1: 7, 2: 7, 3: 5, 4: 7}


def test_composite_add_with_struct_default_on_v3(spark, tmp_path):
    """Round 11: struct-typed ADD COLUMN with a struct default (spec
    Appendix D JSON single-value, stored id-keyed)."""
    path = str(tmp_path / "cd")
    df = spark.createDataFrame([(1,)], "id int")
    il.write_iceberg(spark, df, path, format_version=3)
    il.alter_iceberg_schema(
        path,
        adds={
            "meta": {
                "type": {
                    "type": "struct",
                    "fields": [
                        {"name": "src", "type": "string"},
                        {"name": "ver", "type": "int"},
                    ],
                },
                "default": {"src": "legacy", "ver": 0},
            }
        },
    )
    meta = il._load_metadata(path)
    fd = next(
        f
        for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
        for f in s["fields"]
        if f["name"] == "meta"
    )
    assert all(k.isdigit() for k in fd["initial-default"])
    # nested ids minted past last-column-id, unique
    ids = [fd["id"]] + list(il._walk_type_ids(fd["type"]))
    assert len(ids) == len(set(ids))
    assert meta["last-column-id"] >= max(ids)
    row = il.read_iceberg(spark, path).collect()[0]
    assert row["meta"]["src"] == "legacy" and row["meta"]["ver"] == 0
    # a default that does not fit its type refuses by name
    with pytest.raises(il.IcebergLiteError, match="does not fit"):
        il.alter_iceberg_schema(
            path, adds={"bad": {"type": "int", "default": {"x": 1}}}
        )


def test_nested_rename_composes_with_mor_delete(spark, nested_table):
    il.alter_iceberg_schema(
        nested_table, renames={"info.score": "points"}
    )
    il.delete_iceberg(spark, nested_table, "info.points = 10")
    rows = il.read_iceberg(spark, nested_table).collect()
    assert [r["id"] for r in rows] == [2]


def test_nested_evolution_on_append_mints_and_widens(spark, tmp_path):
    path = str(tmp_path / "evo")
    df1 = spark.createDataFrame(
        [(1, ("a", 1))], "id int, info struct<name:string, score:int>"
    )
    il.write_iceberg(spark, df1, path)
    df2 = spark.createDataFrame(
        [(2, ("b", 2, "NYC"))],
        "id int, info struct<name:string, score:long, city:string>",
    )
    il.write_iceberg(spark, df2, path)
    meta = il._load_metadata(path)
    cur = il._current_schema_of(meta)
    info = next(f for f in cur["fields"] if f["name"] == "info")
    by_name = {f["name"]: f for f in info["type"]["fields"]}
    assert by_name["score"]["type"] == "long"  # widened in place
    assert "city" in by_name
    rows = il.read_iceberg(spark, path).orderBy("id").collect()
    assert rows[0]["info"]["city"] is None
    assert rows[1]["info"]["city"] == "NYC"
    # omitted nested field reads null for the narrow append
    df3 = spark.createDataFrame(
        [(3, ("c",))], "id int, info struct<name:string>"
    )
    il.write_iceberg(spark, df3, path)
    r3 = il.read_iceberg(spark, path).where("id = 3").collect()[0]
    assert r3["info"]["score"] is None


def test_nested_evolution_refuses_kind_change(spark, tmp_path):
    path = str(tmp_path / "evo2")
    df1 = spark.createDataFrame(
        [(1, ("a",))], "id int, info struct<name:string>"
    )
    il.write_iceberg(spark, df1, path)
    df2 = spark.createDataFrame([(2, "flat")], "id int, info string")
    with pytest.raises(il.IcebergLiteError, match="kind"):
        il.write_iceberg(spark, df2, path)


def test_widen_column_metadata_only(spark, tmp_path):
    """ALTER COLUMN TYPE (spec type promotion): int->long and decimal
    precision growth commit one metadata version, zero files touched;
    narrow files scan under the wide schema; appends write wide."""
    from aws_insurancelake_etl_spark.sources import iceberg_lite

    path = str(tmp_path / "widen")
    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)],
        "id int, qty int, price float",
    ).withColumn(
        "amt", F.col("qty").cast("decimal(6,2)")
    )
    iceberg_lite.write_iceberg(spark, df, path)
    import glob
    files_before = set(glob.glob(path + "/data/**/*.parquet", recursive=True))
    iceberg_lite.alter_iceberg_schema(
        path,
        widens={"qty": "long", "price": "double", "amt": "decimal(10,2)"},
    )
    assert set(
        glob.glob(path + "/data/**/*.parquet", recursive=True)
    ) == files_before
    read = iceberg_lite.read_iceberg(spark, path)
    dtypes = dict(read.dtypes)
    assert dtypes["qty"] == "bigint"
    assert dtypes["price"] == "double"
    assert dtypes["amt"] == "decimal(10,2)"
    assert sorted(r["qty"] for r in read.collect()) == [10, 20]
    # appends land wide and read together with the narrow files
    iceberg_lite.write_iceberg(
        spark,
        spark.createDataFrame(
            [(3, 2**40, 9.5)], "id int, qty long, price double"
        ).withColumn("amt", F.lit(12345678.25).cast("decimal(10,2)")),
        path,
    )
    read = iceberg_lite.read_iceberg(spark, path)
    assert read.count() == 3
    assert read.where(F.col("qty") == 2**40).count() == 1


def test_widen_rejects_narrowing_and_kind_changes(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources import iceberg_lite

    path = str(tmp_path / "widen-bad")
    iceberg_lite.write_iceberg(
        spark,
        spark.createDataFrame([(1, 2**40)], "id int, big long"),
        path,
    )
    import pytest as _pytest
    with _pytest.raises(iceberg_lite.IcebergLiteError, match="promotion"):
        iceberg_lite.alter_iceberg_schema(path, widens={"big": "int"})
    with _pytest.raises(iceberg_lite.IcebergLiteError, match="promotion"):
        iceberg_lite.alter_iceberg_schema(path, widens={"id": "string"})


def test_write_default_merges_later_nested_defaults(spark, tmp_path):
    """Round-11 review: an append omitting a defaulted struct column
    must materialize LATER-ADDED nested fields' own write-defaults,
    not NULL (each field's default resolves independently)."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = str(tmp_path / "wdm")
    il.write_iceberg(
        spark, spark.createDataFrame([(1,)], "id int"), path,
        format_version=3,
    )
    il.alter_iceberg_schema(
        path,
        adds={
            "meta": {
                "type": {
                    "type": "struct",
                    "fields": [{"name": "src", "type": "string"}],
                },
                "default": {"src": "legacy"},
            }
        },
    )
    il.alter_iceberg_schema(
        path, adds={"meta.ver": {"type": "int", "default": 7}}
    )
    before = set(glob.glob(os.path.join(path, "data", "*.parquet")))
    il.write_iceberg(
        spark, spark.createDataFrame([(2,)], "id int"), path
    )
    new = [
        f
        for f in glob.glob(os.path.join(path, "data", "*.parquet"))
        if f not in before
    ]
    staged = pq.read_table(new[0]).column("meta").to_pylist()
    assert staged == [{"src": "legacy", "ver": 7}]
    got = {
        r["id"]: (r["meta"]["src"], r["meta"]["ver"])
        for r in il.read_iceberg(spark, path).collect()
    }
    assert got == {1: ("legacy", 7), 2: ("legacy", 7)}


def test_renamed_defaulted_column_keeps_stored_values(spark, tmp_path):
    """Round-11 review: after RENAME x->y, files that physically carry
    'x' must read their STORED values, not the default (footer
    presence is judged under as-written names)."""
    path = str(tmp_path / "rdc")
    il.write_iceberg(
        spark, spark.createDataFrame([(1,)], "id int"), path,
        format_version=3,
    )
    il.alter_iceberg_schema(path, adds={"x": {"type": "int", "default": 9}})
    il.write_iceberg(
        spark, spark.createDataFrame([(2, 42)], "id int, x int"), path
    )
    il.alter_iceberg_schema(path, renames={"x": "y"})
    got = {r["id"]: r["y"] for r in il.read_iceberg(spark, path).collect()}
    assert got == {1: 9, 2: 42}


def test_default_value_validation_refusals(spark, tmp_path):
    path = str(tmp_path / "dvv")
    il.write_iceberg(
        spark, spark.createDataFrame([(1,)], "id int"), path,
        format_version=3,
    )
    # typo'd name key must raise, never silently drop
    with pytest.raises(il.IcebergLiteError, match="neither a field id"):
        il.alter_iceberg_schema(
            path,
            adds={
                "m": {
                    "type": {
                        "type": "struct",
                        "fields": [{"name": "src", "type": "string"}],
                    },
                    "default": {"srk": "l"},
                }
            },
        )
    # type-mismatched scalar refuses at DDL time
    with pytest.raises(il.IcebergLiteError, match="does not fit"):
        il.alter_iceberg_schema(
            path, adds={"prio": {"type": "int", "default": "high"}}
        )
    with pytest.raises(il.IcebergLiteError, match="does not fit"):
        il.alter_iceberg_schema(
            path, adds={"flag": {"type": "boolean", "default": 1}}
        )
