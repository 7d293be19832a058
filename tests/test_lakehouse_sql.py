"""SQL text front-end (`sources/lakehouse_sql.py`): the reference's
MERGE-as-SQL contract (etl_consume_entity_match.py:449-455) plus the
DML/DDL surface, driven end-to-end as SQL strings against delta_lite /
iceberg_lite paths."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.sources import delta_lite, iceberg_lite
from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
    LakehouseSqlError,
    lakehouse_sql,
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def delta_tbl(spark, tmp_path):
    path = str(tmp_path / "dtbl")
    df = _mk(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id int, name string, amount double",
    )
    delta_lite.write_delta(df, path)
    return path


@pytest.fixture()
def ice_tbl(spark, tmp_path):
    path = str(tmp_path / "itbl")
    df = _mk(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id int, name string, amount double",
    )
    iceberg_lite.write_iceberg(spark, df, path)
    return path


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------------- SELECT


def test_select_rewrites_delta_ref(spark, delta_tbl):
    out = lakehouse_sql(
        spark,
        f"SELECT id, amount * 2 AS dbl FROM delta.`{delta_tbl}` "
        "WHERE id >= 3 ORDER BY id",
    )
    assert _rows(out, "id", "dbl") == [(3, 60.0), (4, 80.0)]


def test_select_join_across_formats(spark, delta_tbl, ice_tbl):
    out = lakehouse_sql(
        spark,
        f"SELECT d.id, i.name FROM delta.`{delta_tbl}` d "
        f"JOIN iceberg.`{ice_tbl}` i ON d.id = i.id WHERE d.id <= 2",
    )
    assert _rows(out, "id", "name") == [(1, "a"), (2, "b")]


def test_select_version_travel(spark, delta_tbl):
    delta_lite.delete_delta(spark, delta_tbl, "id = 1")
    now = lakehouse_sql(spark, f"SELECT id FROM delta.`{delta_tbl}`")
    old = lakehouse_sql(
        spark, f"SELECT id FROM delta.`{delta_tbl}` VERSION AS OF 0"
    )
    assert now.count() == 3 and old.count() == 4


def test_wrong_format_prefix_is_a_named_error(spark, ice_tbl):
    with pytest.raises(LakehouseSqlError, match="IS an iceberg table"):
        lakehouse_sql(spark, f"SELECT * FROM delta.`{ice_tbl}`")


# -------------------------------------------------------------- MERGE


MERGE_CANON = (
    "MERGE INTO {fmt}.`{path}` t USING __src s ON t.id = s.id "
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED THEN INSERT *"
)


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_canonical_reference_shape(spark, delta_tbl, ice_tbl, fmt):
    path = delta_tbl if fmt == "delta" else ice_tbl
    src = _mk(
        spark,
        [(2, "B!", 99.0), (5, "e", 50.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__src")
    lakehouse_sql(spark, MERGE_CANON.format(fmt=fmt, path=path))
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert _rows(read, "id", "name", "amount") == [
        (1, "a", 10.0), (2, "B!", 99.0), (3, "c", 30.0),
        (4, "d", 40.0), (5, "e", 50.0),
    ]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_general_set_exprs_and_conditions(spark, delta_tbl, ice_tbl, fmt):
    path = delta_tbl if fmt == "delta" else ice_tbl
    src = _mk(
        spark,
        [(1, "x", 1.0), (2, "y", 2.0), (5, "e", 50.0)],
        "id int, name string, bump double",
    )
    src.createOrReplaceTempView("__src2")
    lakehouse_sql(
        spark,
        f"MERGE INTO {fmt}.`{path}` t USING __src2 s ON t.id = s.id "
        "WHEN MATCHED AND t.amount < 15 THEN "
        "  UPDATE SET amount = t.amount + s.bump, name = upper(s.name) "
        "WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)",
    )
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    # id=1 fired (amount 10<15): 10+1, upper('x'); id=2 matched but NOT
    # fired (20>=15): untouched; id=5 inserted with NULL amount
    assert _rows(read, "id", "name", "amount") == [
        (1, "X", 11.0), (2, "b", 20.0), (3, "c", 30.0),
        (4, "d", 40.0), (5, "e", None),
    ]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_delete_clause_one_commit(spark, delta_tbl, ice_tbl, fmt):
    path = delta_tbl if fmt == "delta" else ice_tbl
    before_version = (
        delta_lite.snapshot(path).version
        if fmt == "delta"
        else len(iceberg_lite.snapshot_ids(path))
    )
    src = _mk(
        spark,
        [(1, "gone", 0.0), (2, "upd", 99.0), (6, "new", 60.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__src3")
    lakehouse_sql(
        spark,
        f"MERGE INTO {fmt}.`{path}` t USING __src3 s ON t.id = s.id "
        "WHEN MATCHED AND s.name = 'gone' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert _rows(read, "id", "name", "amount") == [
        (2, "upd", 99.0), (3, "c", 30.0), (4, "d", 40.0), (6, "new", 60.0),
    ]
    after_version = (
        delta_lite.snapshot(path).version
        if fmt == "delta"
        else len(iceberg_lite.snapshot_ids(path))
    )
    assert after_version == before_version + 1, "delete clause must not cost a second commit"


def test_merge_source_subquery_with_lakehouse_ref(spark, delta_tbl, ice_tbl):
    lakehouse_sql(
        spark,
        f"MERGE INTO delta.`{delta_tbl}` t USING "
        f"(SELECT id, concat(name, '!') AS name, amount FROM iceberg.`{ice_tbl}` "
        "WHERE id = 1) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    read = delta_lite.read_delta(spark, delta_tbl)
    assert (1, "a!", 10.0) in _rows(read, "id", "name", "amount")


def test_merge_general_on_condition_refuses(spark, delta_tbl):
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("__s4")
    with pytest.raises(LakehouseSqlError, match="equality"):
        lakehouse_sql(
            spark,
            f"MERGE INTO delta.`{delta_tbl}` t USING __s4 s ON t.id > s.id "
            "WHEN MATCHED THEN UPDATE SET *",
        )


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_merge_not_matched_by_source_sync(spark, delta_tbl, ice_tbl, fmt):
    """The snapshot-sync MERGE: source is the authoritative state —
    matched rows update, unmatched source rows insert, target orphans
    DELETE — one commit."""
    path = delta_tbl if fmt == "delta" else ice_tbl
    src = _mk(
        spark,
        [(2, "B", 2.0), (5, "e", 5.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__s5")
    before_version = (
        delta_lite.snapshot(path).version
        if fmt == "delta"
        else len(iceberg_lite.snapshot_ids(path))
    )
    lakehouse_sql(
        spark,
        f"MERGE INTO {fmt}.`{path}` t USING __s5 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert _rows(read, "id", "name", "amount") == [
        (2, "B", 2.0), (5, "e", 5.0),
    ]
    after_version = (
        delta_lite.snapshot(path).version
        if fmt == "delta"
        else len(iceberg_lite.snapshot_ids(path))
    )
    assert after_version == before_version + 1


def test_merge_by_source_conditional_update(spark, delta_tbl):
    src = _mk(spark, [(1, "a", 10.0)], "id int, name string, amount double")
    src.createOrReplaceTempView("__s6")
    lakehouse_sql(
        spark,
        f"MERGE INTO delta.`{delta_tbl}` t USING __s6 s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.amount >= 30 THEN "
        "  UPDATE SET name = 'stale' "
        "WHEN NOT MATCHED BY SOURCE AND t.amount < 30 THEN DELETE",
    )
    read = delta_lite.read_delta(spark, delta_tbl)
    # id=1 matched (untouched); id=2 orphan amount 20 -> deleted;
    # id=3 (30) and id=4 (40) orphans -> renamed 'stale'
    assert _rows(read, "id", "name", "amount") == [
        (1, "a", 10.0), (3, "stale", 30.0), (4, "stale", 40.0),
    ]


def test_merge_by_source_update_star_refuses(spark, delta_tbl):
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("__s7")
    with pytest.raises(LakehouseSqlError, match="no source row"):
        lakehouse_sql(
            spark,
            f"MERGE INTO delta.`{delta_tbl}` t USING __s7 s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        )


# ------------------------------------------------------ UPDATE / DELETE


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_update_and_delete_sql(spark, delta_tbl, ice_tbl, fmt):
    path = delta_tbl if fmt == "delta" else ice_tbl
    lakehouse_sql(
        spark,
        f"UPDATE {fmt}.`{path}` SET amount = amount * 10 WHERE id <= 2",
    )
    lakehouse_sql(spark, f"DELETE FROM {fmt}.`{path}` WHERE name = 'c'")
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert _rows(read, "id", "amount") == [
        (1, 100.0), (2, 200.0), (4, 40.0),
    ]


# -------------------------------------------------------------- INSERT


def test_insert_into_and_overwrite(spark, delta_tbl):
    lakehouse_sql(
        spark,
        f"INSERT INTO delta.`{delta_tbl}` VALUES (9, 'z', 90.0)",
    )
    assert delta_lite.read_delta(spark, delta_tbl).count() == 5
    lakehouse_sql(
        spark,
        f"INSERT OVERWRITE delta.`{delta_tbl}` "
        f"SELECT id, name, amount FROM delta.`{delta_tbl}` WHERE id = 9",
    )
    assert _rows(delta_lite.read_delta(spark, delta_tbl), "id") == [(9,)]


def test_insert_with_column_list_fills_nulls(spark, ice_tbl):
    lakehouse_sql(
        spark,
        f"INSERT INTO iceberg.`{ice_tbl}` (id, name) VALUES (7, 'g')",
    )
    read = iceberg_lite.read_iceberg(spark, ice_tbl)
    assert (7, "g", None) in _rows(read, "id", "name", "amount")


# ------------------------------------------------------ CREATE TABLE AS


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_ctas_partitioned_with_props(spark, delta_tbl, tmp_path, fmt):
    newp = str(tmp_path / f"ctas_{fmt}")
    lakehouse_sql(
        spark,
        f"CREATE TABLE {fmt}.`{newp}` PARTITIONED BY (name) "
        "TBLPROPERTIES ('owner' = 'etl') AS "
        f"SELECT id, name, amount FROM delta.`{delta_tbl}` WHERE id <= 2",
    )
    read = (
        delta_lite.read_delta(spark, newp)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, newp)
    )
    assert read.count() == 2
    if fmt == "delta":
        assert delta_lite.snapshot(newp).partition_columns == ["name"]
        assert delta_lite.snapshot(newp).configuration.get("owner") == "etl"


# ------------------------------------------------------------- ALTER


def test_alter_table_delta_lifecycle(spark, delta_tbl):
    delta_lite.enable_column_mapping(delta_tbl)
    lakehouse_sql(
        spark, f"ALTER TABLE delta.`{delta_tbl}` RENAME COLUMN name TO label"
    )
    lakehouse_sql(
        spark, f"ALTER TABLE delta.`{delta_tbl}` ADD COLUMN note string"
    )
    lakehouse_sql(
        spark,
        f"ALTER TABLE delta.`{delta_tbl}` SET TBLPROPERTIES ('a.b' = '1')",
    )
    read = delta_lite.read_delta(spark, delta_tbl)
    assert "label" in read.columns and "note" in read.columns
    assert read.where(F.col("note").isNull()).count() == 4
    assert delta_lite.snapshot(delta_tbl).configuration["a.b"] == "1"
    lakehouse_sql(
        spark,
        f"ALTER TABLE delta.`{delta_tbl}` UNSET TBLPROPERTIES (a.b)",
    )
    assert "a.b" not in delta_lite.snapshot(delta_tbl).configuration


def test_alter_table_iceberg_add_drop(spark, ice_tbl):
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{ice_tbl}` ADD COLUMN flag boolean"
    )
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{ice_tbl}` DROP COLUMN amount"
    )
    read = iceberg_lite.read_iceberg(spark, ice_tbl)
    assert set(read.columns) == {"id", "name", "flag"}


def test_add_column_is_metadata_only(spark, delta_tbl):
    files_before = {a.path for a in delta_lite.snapshot(delta_tbl).files}
    lakehouse_sql(
        spark, f"ALTER TABLE delta.`{delta_tbl}` ADD COLUMN extra bigint"
    )
    files_after = {a.path for a in delta_lite.snapshot(delta_tbl).files}
    assert files_before == files_after


# ------------------------------------------------- utility statements


def test_optimize_vacuum_history_restore(spark, tmp_path):
    path = str(tmp_path / "util")
    for i in range(3):
        delta_lite.write_delta(
            _mk(spark, [(i, float(i))], "id int, v double"), path
        )
    out = lakehouse_sql(spark, f"OPTIMIZE delta.`{path}`")
    assert out.where("metric = 'files_after'").count() == 1
    hist = lakehouse_sql(spark, f"DESCRIBE HISTORY delta.`{path}`")
    assert hist.count() >= 4
    lakehouse_sql(
        spark, f"RESTORE TABLE delta.`{path}` TO VERSION AS OF 0"
    )
    assert delta_lite.read_delta(spark, path).count() == 1
    out = lakehouse_sql(spark, f"VACUUM delta.`{path}` RETAIN 0 HOURS")
    assert out.first()["metric"] == "files_removed"


def test_unsupported_statement_names_itself(spark):
    with pytest.raises(LakehouseSqlError, match="unsupported statement"):
        lakehouse_sql(spark, "GRANT ALL TO someone")


def test_iceberg_insert_overwrite_replace_snapshot(spark, ice_tbl):
    # fold in a MOR delete first so the overwrite must supersede
    # delete files too, not just data files
    iceberg_lite.delete_iceberg(spark, ice_tbl, "id = 4")
    n_before = len(iceberg_lite.snapshot_ids(ice_tbl))
    lakehouse_sql(
        spark,
        f"INSERT OVERWRITE iceberg.`{ice_tbl}` "
        f"SELECT id, name, amount * 100 AS amount FROM iceberg.`{ice_tbl}` "
        "WHERE id <= 2",
    )
    assert len(iceberg_lite.snapshot_ids(ice_tbl)) == n_before + 1
    read = iceberg_lite.read_iceberg(spark, ice_tbl)
    assert _rows(read, "id", "amount") == [(1, 1000.0), (2, 2000.0)]
    # time travel to the pre-overwrite snapshot still sees 3 live rows
    old = iceberg_lite.read_iceberg(
        spark, ice_tbl, snapshot_id=iceberg_lite.snapshot_ids(ice_tbl)[-2]
    )
    assert old.count() == 3


def test_iceberg_create_or_replace(spark, ice_tbl, delta_tbl):
    lakehouse_sql(
        spark,
        f"CREATE OR REPLACE TABLE iceberg.`{ice_tbl}` AS "
        f"SELECT id, name, amount FROM delta.`{delta_tbl}` WHERE id = 1",
    )
    assert iceberg_lite.read_iceberg(spark, ice_tbl).count() == 1
    with pytest.raises(LakehouseSqlError, match="partitioning"):
        lakehouse_sql(
            spark,
            f"CREATE OR REPLACE TABLE iceberg.`{ice_tbl}` "
            "PARTITIONED BY (name) AS SELECT 1 AS id",
        )


def test_iceberg_overwrite_schema_mismatch_refuses(spark, ice_tbl):
    # wrong arity trips the dispatcher's own check; wrong NAMES at the
    # right arity trip overwrite_iceberg's schema guard (positional
    # INSERT renames, so drive the primitive directly)
    with pytest.raises(LakehouseSqlError, match="arity"):
        lakehouse_sql(
            spark,
            f"INSERT OVERWRITE iceberg.`{ice_tbl}` SELECT 1 AS wrong",
        )
    bad = spark.createDataFrame([(1, "x", 1.0)], "a int, b string, c double")
    with pytest.raises(iceberg_lite.IcebergLiteError, match="schema mismatch"):
        iceberg_lite.overwrite_iceberg(spark, bad, ice_tbl)


def test_merge_into_primary_routes_lakehouse_refs(spark, tmp_path):
    from aws_insurancelake_etl_spark.operators.entitymatch import (
        merge_into_primary,
    )

    path = str(tmp_path / "primary")
    base = _mk(spark, [("g1", "x"), ("g2", "y")], "gid string, name string")
    iceberg_lite.write_iceberg(spark, base, path)
    incoming = _mk(
        spark, [("g2", "Y!"), ("g3", "z")], "gid string, name string"
    )
    merge_into_primary(spark, incoming, f"iceberg.`{path}`", "gid")
    read = iceberg_lite.read_iceberg(spark, path)
    assert _rows(read, "gid", "name") == [
        ("g1", "x"), ("g2", "Y!"), ("g3", "z"),
    ]


# ------------------------------------------------ CALL / REORG / CONVERT


def test_call_expire_and_orphans(spark, ice_tbl):
    iceberg_lite.write_iceberg(
        spark, _mk(spark, [(9, "i", 9.0)], "id int, name string, amount double"),
        ice_tbl,
    )
    out = lakehouse_sql(
        spark,
        f"CALL system.expire_snapshots(iceberg.`{ice_tbl}`, keep_last => 1)",
    )
    vals = {r["metric"]: r["value"] for r in out.collect()}
    assert vals["expired"] not in ("", "[]")
    out = lakehouse_sql(
        spark,
        f"CALL system.remove_orphan_files(iceberg.`{ice_tbl}`, dry_run => true)",
    )
    vals = {r["metric"]: r["value"] for r in out.collect()}
    assert vals["deleted"] == "0"


def test_call_rewrite_data_files_folds_mor_debt(spark, ice_tbl):
    iceberg_lite.delete_iceberg(spark, ice_tbl, "id = 2")
    out = lakehouse_sql(
        spark,
        f"CALL system.rewrite_data_files(iceberg.`{ice_tbl}`, target_files => 1)",
    )
    vals = {r["metric"]: r["value"] for r in out.collect()}
    assert vals["rewritten"] == "True"
    assert iceberg_lite.read_iceberg(spark, ice_tbl).count() == 3
    _, deletes = iceberg_lite.plan_scan(ice_tbl)
    assert not deletes


def test_call_rollback(spark, ice_tbl):
    first = iceberg_lite.snapshot_ids(ice_tbl)[0]
    iceberg_lite.delete_iceberg(spark, ice_tbl, "id <= 2")
    lakehouse_sql(
        spark,
        f"CALL system.rollback_to_snapshot(iceberg.`{ice_tbl}`, "
        f"snapshot_id => {first})",
    )
    assert iceberg_lite.read_iceberg(spark, ice_tbl).count() == 4


def test_call_on_delta_names_the_right_tools(spark, delta_tbl):
    with pytest.raises(LakehouseSqlError, match="OPTIMIZE / VACUUM"):
        lakehouse_sql(
            spark,
            f"CALL system.expire_snapshots(delta.`{delta_tbl}`)",
        )


def test_call_unknown_arg_refuses(spark, ice_tbl):
    with pytest.raises(LakehouseSqlError, match="does not accept"):
        lakehouse_sql(
            spark,
            f"CALL system.rewrite_manifests(iceberg.`{ice_tbl}`, bogus => 1)",
        )


def test_reorg_purge_sql(spark, delta_tbl):
    delta_lite.set_delta_properties(
        delta_tbl, {"delta.enableDeletionVectors": "true"}
    )
    delta_lite.delete_delta(spark, delta_tbl, "id = 1")
    out = lakehouse_sql(
        spark, f"REORG TABLE delta.`{delta_tbl}` APPLY (PURGE)"
    )
    assert out.where("metric = 'files_purged'").count() == 1
    assert delta_lite.read_delta(spark, delta_tbl).count() == 3


def test_convert_to_delta_from_iceberg_sql(spark, ice_tbl):
    lakehouse_sql(spark, f"CONVERT TO DELTA iceberg.`{ice_tbl}`")
    assert delta_lite.read_delta(spark, ice_tbl).count() == 4


def test_convert_to_delta_from_parquet_sql(spark, tmp_path):
    pdir = str(tmp_path / "plain")
    _mk(spark, [(1, "a"), (2, "b")], "id int, v string").write.parquet(pdir)
    lakehouse_sql(spark, f"CONVERT TO DELTA parquet.`{pdir}`")
    assert delta_lite.read_delta(spark, pdir).count() == 2


def test_alter_column_type_iceberg_sql(spark, ice_tbl):
    lakehouse_sql(
        spark,
        f"ALTER TABLE iceberg.`{ice_tbl}` ALTER COLUMN id TYPE bigint",
    )
    read = iceberg_lite.read_iceberg(spark, ice_tbl)
    assert dict(read.dtypes)["id"] == "bigint"
    assert read.count() == 4


# ------------------------------------------------- SHOW / $metadata


def test_show_tblproperties_and_partitions(spark, tmp_path):
    dpath = str(tmp_path / "showd")
    delta_lite.write_delta(
        _mk(spark, [(1, "a"), (2, "b"), (3, "a")], "id int, seg string"),
        dpath,
        partition_by=["seg"],
        configuration={"owner": "ops"},
    )
    props = lakehouse_sql(spark, f"SHOW TBLPROPERTIES delta.`{dpath}`")
    assert ("owner", "ops") in _rows(props, "key", "value")
    parts = lakehouse_sql(spark, f"SHOW PARTITIONS delta.`{dpath}`")
    assert _rows(parts, "seg") == [("a",), ("b",)]


def test_iceberg_metadata_tables_via_select(spark, ice_tbl):
    iceberg_lite.delete_iceberg(spark, ice_tbl, "id = 1")
    snaps = lakehouse_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM iceberg.`{ice_tbl}$snapshots`",
    )
    assert snaps.first()["n"] == 2
    hist = lakehouse_sql(spark, f"SELECT * FROM iceberg.`{ice_tbl}$history`")
    assert hist.count() == 2
    dels = lakehouse_sql(
        spark, f"SELECT * FROM iceberg.`{ice_tbl}$delete_files`"
    )
    assert dels.count() >= 1
    parts = lakehouse_sql(
        spark,
        f"SELECT record_count FROM iceberg.`{ice_tbl}$partitions`",
    )
    assert parts.count() >= 1


def test_metadata_table_on_delta_names_alternative(spark, delta_tbl):
    with pytest.raises(LakehouseSqlError, match="DESCRIBE HISTORY"):
        lakehouse_sql(
            spark, f"SELECT * FROM delta.`{delta_tbl}$snapshots`"
        )


# ---------------------------------------------------- branches / tags


def test_branch_tag_wap_via_sql(spark, ice_tbl):
    """Write-audit-publish as SQL text: CREATE BRANCH, INSERT into it
    (main unchanged), audit the branch with VERSION AS OF '<name>',
    publish with CALL fast_forward, tag the result."""
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{ice_tbl}` CREATE BRANCH audit"
    )
    lakehouse_sql(
        spark,
        f"INSERT INTO iceberg.`{ice_tbl}` BRANCH audit "
        "VALUES (5, 'e', 50.0)",
    )
    main_now = lakehouse_sql(spark, f"SELECT * FROM iceberg.`{ice_tbl}`")
    branch_now = lakehouse_sql(
        spark,
        f"SELECT * FROM iceberg.`{ice_tbl}` VERSION AS OF 'audit'",
    )
    assert main_now.count() == 4 and branch_now.count() == 5
    lakehouse_sql(
        spark,
        f"CALL system.fast_forward(iceberg.`{ice_tbl}`, "
        "source_branch => 'audit')",
    )
    assert lakehouse_sql(
        spark, f"SELECT * FROM iceberg.`{ice_tbl}`"
    ).count() == 5
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{ice_tbl}` CREATE TAG published"
    )
    lakehouse_sql(spark, f"DELETE FROM iceberg.`{ice_tbl}` WHERE id = 5")
    tagged = lakehouse_sql(
        spark,
        f"SELECT * FROM iceberg.`{ice_tbl}` VERSION AS OF 'published'",
    )
    assert tagged.count() == 5
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{ice_tbl}` DROP TAG published"
    )
    with pytest.raises(Exception, match="unknown snapshot ref"):
        lakehouse_sql(
            spark,
            f"SELECT * FROM iceberg.`{ice_tbl}` VERSION AS OF 'published'",
        ).count()


def test_delta_version_as_of_name_refuses(spark, delta_tbl):
    with pytest.raises(LakehouseSqlError, match="integer"):
        lakehouse_sql(
            spark,
            f"SELECT * FROM delta.`{delta_tbl}` VERSION AS OF 'branch'",
        )


# ---------------------------------------------------- name registry


def test_registered_names_work_everywhere(spark, delta_tbl, ice_tbl):
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        register_table,
        unregister_table,
    )

    register_table("dw.facts", "delta", delta_tbl)
    register_table("dims", "iceberg", ice_tbl)
    try:
        out = lakehouse_sql(
            spark,
            "SELECT f.id, d.name FROM dw.facts f "
            "JOIN dims d ON f.id = d.id WHERE f.id <= 2",
        )
        assert _rows(out, "id", "name") == [(1, "a"), (2, "b")]
        lakehouse_sql(spark, "UPDATE dw.facts SET amount = 0 WHERE id = 1")
        assert delta_lite.read_delta(spark, delta_tbl).where(
            "amount = 0"
        ).count() == 1
        spark.createDataFrame(
            [(9, "n", 1.0)], "id int, name string, amount double"
        ).createOrReplaceTempView("__reg_src")
        lakehouse_sql(
            spark,
            "MERGE INTO dims t USING __reg_src s ON t.id = s.id "
            "WHEN NOT MATCHED THEN INSERT *",
        )
        assert iceberg_lite.read_iceberg(spark, ice_tbl).count() == 5
        # a COLUMN named like a registered table must not rewrite: the
        # alias expression `dims.name` is not in table position
        out = lakehouse_sql(
            spark, "SELECT dims.name FROM dims WHERE dims.id = 1"
        )
        assert out.count() == 1
    finally:
        unregister_table("dw.facts")
        unregister_table("dims")


def test_unregistered_name_falls_back_to_spark_catalog(spark, delta_tbl):
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "plain_view"
    )
    out = lakehouse_sql(spark, "SELECT * FROM plain_view")
    assert out.count() == 1


def test_case_when_inside_merge_clauses(spark, delta_tbl):
    """A CASE expression's own WHEN/THEN/END must not terminate the
    MERGE clause scan."""
    src = _mk(
        spark,
        [(1, "x", 1.0), (5, "e", 50.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__case_src")
    lakehouse_sql(
        spark,
        f"MERGE INTO delta.`{delta_tbl}` t USING __case_src s "
        "ON t.id = s.id "
        "WHEN MATCHED AND (CASE WHEN s.amount < 10 THEN true ELSE false END) "
        "THEN UPDATE SET name = CASE WHEN t.amount > 5 THEN 'big' "
        "ELSE 'small' END, amount = s.amount "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    read = delta_lite.read_delta(spark, delta_tbl)
    assert _rows(read, "id", "name", "amount") == [
        (1, "big", 1.0), (2, "b", 20.0), (3, "c", 30.0),
        (4, "d", 40.0), (5, "e", 50.0),
    ]


def test_case_when_in_update_set(spark, ice_tbl):
    lakehouse_sql(
        spark,
        f"UPDATE iceberg.`{ice_tbl}` SET name = CASE WHEN amount >= 30 "
        "THEN upper(name) ELSE name END WHERE id >= 2",
    )
    read = iceberg_lite.read_iceberg(spark, ice_tbl)
    assert _rows(read, "id", "name") == [
        (1, "a"), (2, "b"), (3, "C"), (4, "D"),
    ]


# ------------------------------------------------------------ TRUNCATE


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_truncate_is_metadata_only_and_travelable(spark, delta_tbl, ice_tbl, fmt):
    path = delta_tbl if fmt == "delta" else ice_tbl
    import glob
    files_before = set(glob.glob(path + "/**/*.parquet", recursive=True))
    out = lakehouse_sql(spark, f"TRUNCATE TABLE {fmt}.`{path}`")
    vals = {r["metric"]: r["value"] for r in out.collect()}
    assert int(vals["files_removed"]) >= 1
    # zero files touched on disk — pure metadata
    assert set(glob.glob(path + "/**/*.parquet", recursive=True)) >= files_before
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert read.count() == 0
    assert set(read.columns) == {"id", "name", "amount"}
    old = lakehouse_sql(
        spark,
        f"SELECT * FROM {fmt}.`{path}` VERSION AS OF "
        + ("0" if fmt == "delta" else "1"),
    )
    assert old.count() == 4


def test_truncate_delta_cdf_emits_deletes(spark, tmp_path):
    path = str(tmp_path / "trunc-cdf")
    delta_lite.write_delta(
        _mk(spark, [(1, "a"), (2, "b")], "id int, v string"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    lakehouse_sql(spark, f"TRUNCATE TABLE delta.`{path}`")
    feed = delta_lite.read_change_feed(spark, path, starting_version=1)
    assert feed.where("_change_type = 'delete'").count() == 2


# ------------------------------------------- review-finding regressions


def test_null_clause_condition_does_not_poison_chain(spark, delta_tbl):
    """Three-valued logic: a NULL clause condition counts as not-fired;
    later clauses must still fire for that row."""
    src = _mk(
        spark,
        [(1, None, 1.0), (2, "ok", 2.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__null_src")
    lakehouse_sql(
        spark,
        f"MERGE INTO delta.`{delta_tbl}` t USING __null_src s "
        "ON t.id = s.id "
        "WHEN MATCHED AND s.name = 'gone' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amount = s.amount",
    )
    read = delta_lite.read_delta(spark, delta_tbl)
    # id=1: s.name IS NULL -> delete-cond NULL -> falls to UPDATE
    assert _rows(read, "id", "amount") == [
        (1, 1.0), (2, 2.0), (3, 30.0), (4, 40.0),
    ]


def test_delete_and_update_same_key_refuses(spark, delta_tbl):
    src = _mk(
        spark,
        [(1, "gone", 0.0), (1, "upd", 9.0)],
        "id int, name string, amount double",
    )
    src.createOrReplaceTempView("__dup_src")
    with pytest.raises(LakehouseSqlError, match="multiple source rows"):
        lakehouse_sql(
            spark,
            f"MERGE INTO delta.`{delta_tbl}` t USING __dup_src s "
            "ON t.id = s.id "
            "WHEN MATCHED AND s.name = 'gone' THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )


def test_escaped_quotes_and_comments_tokenize(spark, delta_tbl):
    out = lakehouse_sql(
        spark,
        "SELECT id, /* block 'comment' */ "
        "regexp_replace(name, 'a', 'O\\'Brien') AS who "
        f"FROM delta.`{delta_tbl}` WHERE id = 1",
    )
    assert out.first()["who"] == "O'Brien"


def test_set_wrong_qualifier_refuses(spark, delta_tbl):
    spark.createDataFrame(
        [(1, 5.0)], "id int, amount double"
    ).createOrReplaceTempView("__q_src")
    with pytest.raises(LakehouseSqlError, match="not the target alias"):
        lakehouse_sql(
            spark,
            f"MERGE INTO delta.`{delta_tbl}` t USING __q_src s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET s.amount = 1",
        )
    with pytest.raises(LakehouseSqlError, match="not the target alias"):
        lakehouse_sql(
            spark,
            f"UPDATE delta.`{delta_tbl}` SET addr.city = 'X'",
        )


def test_add_columns_is_one_commit(spark, delta_tbl):
    v0 = delta_lite.snapshot(delta_tbl).version
    lakehouse_sql(
        spark,
        f"ALTER TABLE delta.`{delta_tbl}` ADD COLUMNS (a int, b string)",
    )
    assert delta_lite.snapshot(delta_tbl).version == v0 + 1
    cols = set(delta_lite.read_delta(spark, delta_tbl).columns)
    assert {"a", "b"} <= cols


def test_vacuum_iceberg_retain_refuses(spark, ice_tbl):
    with pytest.raises(LakehouseSqlError, match="expire_snapshots"):
        lakehouse_sql(spark, f"VACUUM iceberg.`{ice_tbl}` RETAIN 1 HOURS")


def test_rewrite_leaves_no_temp_views(spark, delta_tbl):
    before = {
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__lh_sql_")
    }
    lakehouse_sql(
        spark, f"SELECT count(*) AS n FROM delta.`{delta_tbl}`"
    ).collect()
    after = {
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("__lh_sql_")
    }
    assert after <= before


def test_script_runs_statements_in_order(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_script,
    )

    path = str(tmp_path / "script")
    out = lakehouse_sql_script(
        spark,
        f"""
        CREATE TABLE delta.`{path}` AS SELECT 1 AS id, 'a;b' AS v;
        INSERT INTO delta.`{path}` VALUES (2, 'c');
        UPDATE delta.`{path}` SET v = 'Z' WHERE id = 2;
        SELECT * FROM delta.`{path}` ORDER BY id
        """,
    )
    assert _rows(out, "id", "v") == [(1, "a;b"), (2, "Z")]


def test_registry_is_session_scoped(spark, tmp_path):
    """Two sessions binding the SAME name to different tables must not
    cross-bind (VERDICT r10 'what's wrong' #2): each session's SQL
    resolves its own path."""
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        register_table,
        registered_tables,
        unregister_table,
    )

    p1 = str(tmp_path / "s1")
    p2 = str(tmp_path / "s2")
    delta_lite.write_delta(
        _mk(spark, [(1, "one")], "id int, tag string"), p1
    )
    delta_lite.write_delta(
        _mk(spark, [(2, "two")], "id int, tag string"), p2
    )
    other = spark.newSession()
    try:
        register_table("dw.shared", "delta", p1, spark=spark)
        register_table("dw.shared", "delta", p2, spark=other)
        r1 = lakehouse_sql(spark, "SELECT id FROM dw.shared").collect()
        r2 = lakehouse_sql(other, "SELECT id FROM dw.shared").collect()
        assert [r.id for r in r1] == [1]
        assert [r.id for r in r2] == [2]
        assert registered_tables(spark)["dw.shared"] == ("delta", p1)
        assert registered_tables(other)["dw.shared"] == ("delta", p2)
    finally:
        unregister_table("dw.shared", spark=spark)
        unregister_table("dw.shared", spark=other)
    assert "dw.shared" not in registered_tables(spark)
    assert "dw.shared" not in registered_tables(other)


def test_lakehouse_names_scope(spark, delta_tbl):
    """The context manager registers on enter and always unregisters."""
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        lakehouse_names,
        registered_tables,
    )

    with lakehouse_names(spark, {"scoped_t": ("delta", delta_tbl)}):
        out = lakehouse_sql(
            spark, "SELECT count(*) AS n FROM scoped_t"
        ).collect()
        assert out[0].n == 4
    assert "scoped_t" not in registered_tables(spark)
    with pytest.raises(Exception):
        with lakehouse_names(spark, {"scoped_t": ("delta", delta_tbl)}):
            raise RuntimeError("boom")
    assert "scoped_t" not in registered_tables(spark)


def test_analyze_table_stats_roundtrip(spark, delta_tbl, ice_tbl):
    """ANALYZE persists row count / bytes / NDVs in table properties on
    both formats; table_stats reads them back."""
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        analyze_table,
        table_stats,
    )

    res = analyze_table(spark, "delta", delta_tbl, columns=["id", "name"])
    assert res["row_count"] == 4
    assert res["ndv"]["id"] == 4
    st = table_stats("delta", delta_tbl)
    assert st["row_count"] == 4 and st["size_bytes"] > 0
    res_i = analyze_table(spark, "iceberg", ice_tbl, columns="all")
    assert res_i["row_count"] == 4 and res_i["ndv"]["name"] == 4
    assert table_stats("iceberg", ice_tbl)["row_count"] == 4


def test_analyze_sql_statement(spark, delta_tbl):
    out = lakehouse_sql(
        spark,
        f"ANALYZE TABLE delta.`{delta_tbl}` COMPUTE STATISTICS "
        "FOR COLUMNS id",
    )
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got["row_count"] == "4" and got["ndv.id"] == "4"


def test_stale_stats_never_broadcast(spark, delta_tbl):
    """A data commit after ANALYZE invalidates the stats — a grown
    table must not mis-broadcast off old numbers."""
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        analyze_table,
        table_stats,
    )

    analyze_table(spark, "delta", delta_tbl)
    assert table_stats("delta", delta_tbl) is not None
    delta_lite.write_delta(
        _mk(spark, [(9, "z", 90.0)], "id int, name string, amount double"),
        delta_tbl,
        mode="append",
    )
    assert table_stats("delta", delta_tbl) is None  # stale
    assert table_stats("delta", delta_tbl, fresh_only=False) is not None


def test_stats_inject_broadcast_hint(spark, tmp_path):
    """Fresh stats under the threshold put strategy=broadcast on the
    join against the lakehouse table; without stats the complex DV
    read plan loses the size estimate and no hint appears."""
    path = str(tmp_path / "dim")
    dim = spark.range(500).selectExpr("id AS k", "concat('n', id) AS name")
    delta_lite.write_delta(
        dim, path,
        configuration={"delta.enableDeletionVectors": "true"},
    )
    delta_lite.delete_delta(spark, path, "k % 10 = 0")
    spark.range(50000).selectExpr(
        "id % 500 AS k", "id AS v"
    ).createOrReplaceTempView("fact_sih")
    q = (
        "SELECT count(*) AS n FROM fact_sih "
        f"JOIN delta.`{path}` d ON fact_sih.k = d.k"
    )
    before = (
        lakehouse_sql(spark, q)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "strategy=broadcast" not in before
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        analyze_table,
    )

    analyze_table(spark, "delta", path, columns=["k"])
    after_df = lakehouse_sql(spark, q)
    after = after_df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in after
    assert after_df.collect()[0]["n"] == 45000


def test_describe_table_lists_columns(spark, delta_tbl, ice_tbl):
    rows = lakehouse_sql(
        spark, f"DESCRIBE TABLE delta.`{delta_tbl}`"
    ).collect()
    assert [(r["col_name"], r["data_type"]) for r in rows[:3]] == [
        ("id", "int"), ("name", "string"), ("amount", "double"),
    ]
    rows_i = lakehouse_sql(spark, f"DESCRIBE iceberg.`{ice_tbl}`").collect()
    assert [r["col_name"] for r in rows_i[:3]] == ["id", "name", "amount"]


def test_stats_broadcast_skips_time_travel(spark, tmp_path):
    """Stats describe the CURRENT snapshot — a VERSION AS OF read must
    never inherit the broadcast hint (the historical snapshot may be
    arbitrarily larger)."""
    path = str(tmp_path / "ttd")
    delta_lite.write_delta(
        spark.range(10).selectExpr("id AS k"), path
    )
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        analyze_table,
    )

    analyze_table(spark, "delta", path)
    spark.range(1000).selectExpr(
        "id % 10 AS k", "id AS v"
    ).createOrReplaceTempView("fact_tt")
    current = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM fact_tt f JOIN delta.`{path}` d "
        "ON f.k = d.k",
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in current
    travel = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM fact_tt f "
        f"JOIN delta.`{path}` VERSION AS OF 0 d ON f.k = d.k",
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in travel


def test_write_ordered_by_sql(spark, ice_tbl, delta_tbl):
    out = lakehouse_sql(
        spark,
        f"ALTER TABLE iceberg.`{ice_tbl}` WRITE ORDERED BY "
        "id ASC NULLS FIRST, amount DESC",
    )
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got["order_id"] == "1"
    from aws_insurancelake_etl_spark.sources.iceberg_lite import (
        _load_metadata,
    )

    meta = _load_metadata(ice_tbl)
    flds = meta["sort-orders"][-1]["fields"]
    assert [(f["direction"], f["null-order"]) for f in flds] == [
        ("asc", "nulls-first"), ("desc", "nulls-last"),
    ]
    with pytest.raises(LakehouseSqlError, match="iceberg-only"):
        lakehouse_sql(
            spark,
            f"ALTER TABLE delta.`{delta_tbl}` WRITE ORDERED BY id",
        )
