"""Iceberg ALTER TABLE rename/drop column DDL (round 10).

Spec §Schema Evolution: renames and drops are pure metadata commits —
field IDS are the identity, so a renamed column keeps resolving in
every existing file, and ``last-column-id`` guarantees a dropped
field's id is never reused.  Per-file name resolution walks each data
file's sequence number to its snapshot's recorded ``schema-id``.
"""

import pytest
from pyspark.sql import Row

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
    with pytest.raises(il.IcebergLiteError, match="top-level"):
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
