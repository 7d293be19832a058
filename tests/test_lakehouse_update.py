"""UPDATE — the last DML verb for both table formats (round 9).
delta_lite: copy-on-write touched-file rewrite with one-shot SET
semantics, generated-column recompute, CHECK gating, CDF pre/post
pairs.  iceberg_lite: merge-on-read (position deletes + transformed
appends in one snapshot)."""

import pytest
from pyspark.sql import Row

from aws_insurancelake_etl_spark.sources import delta_lite as dl
from aws_insurancelake_etl_spark.sources import iceberg_lite as il


def _rows(df):
    return sorted((r.id, r.v) for r in df.collect())


def test_update_delta_touched_files_only(spark, tmp_path):
    path = str(tmp_path / "u")
    for lo in (0, 10):
        dl.write_delta(
            spark.createDataFrame(
                [Row(id=i, v=float(i)) for i in range(lo, lo + 10)]
            ).select("id", "v").coalesce(1),
            path, mode="append",
        )
    res = dl.update_delta(spark, path, {"v": "v * 100"}, "id IN (3, 5)")
    assert res["rows_updated"] == 2
    # both matches live in the first file; the second file is untouched
    assert res["files_rewritten"] == 1 and res["files_kept"] == 1
    got = dict(_rows(dl.read_delta(spark, path)))
    assert got[3] == 300.0 and got[5] == 500.0
    assert got[4] == 4.0 and got[15] == 15.0
    # time travel sees the pre-update values
    old = dict(_rows(dl.read_delta(spark, path, version=res["version"] - 1)))
    assert old[3] == 3.0


def test_update_delta_one_shot_set_semantics(spark, tmp_path):
    """a=b, b=a must SWAP (both read the old row), not chain."""
    path = str(tmp_path / "swap")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, a=10, b=20)]).select("id", "a", "b"),
        path,
    )
    dl.update_delta(spark, path, {"a": "b", "b": "a"}, "id = 1")
    r = dl.read_delta(spark, path).collect()[0]
    assert (r.a, r.b) == (20, 10)


def test_update_delta_recomputes_generated_and_gates(spark, tmp_path):
    path = str(tmp_path / "gen")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, price=30.0)]).select("id", "price"),
        path,
        generated_columns={"band": "CASE WHEN price >= 20 THEN 'high' "
                                   "ELSE 'low' END"},
    )
    dl.update_delta(spark, path, {"price": "5.0"}, "id = 1")
    r = dl.read_delta(spark, path).collect()[0]
    assert r.price == 5.0 and r.band == "low"  # generated col recomputed
    with pytest.raises(dl.DeltaLiteError, match="not settable"):
        dl.update_delta(spark, path, {"band": "'x'"}, "id = 1")
    # CHECK constraints gate updated rows
    dl.add_check_constraint(spark, path, "p_pos", "price > 0")
    with pytest.raises(dl.DeltaLiteError, match="p_pos"):
        dl.update_delta(spark, path, {"price": "-1.0"}, "id = 1")
    assert dl.read_delta(spark, path).collect()[0].price == 5.0


def test_update_delta_cdf_emits_pre_post_pairs(spark, tmp_path):
    path = str(tmp_path / "cdf")
    dl.write_delta(
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(4)])
        .select("id", "v"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    res = dl.update_delta(spark, path, {"v": "v + 0.5"}, "id >= 2")
    feed = dl.read_change_feed(
        spark, path, starting_version=res["version"]
    )
    by_type = {
        (r.id, r._change_type): r.v
        for r in feed.where("_change_type like 'update%'").collect()
    }
    assert by_type[(2, "update_preimage")] == 2.0
    assert by_type[(2, "update_postimage")] == 2.5
    assert by_type[(3, "update_preimage")] == 3.0
    assert by_type[(3, "update_postimage")] == 3.5


def test_update_delta_no_match_no_commit(spark, tmp_path):
    path = str(tmp_path / "nomatch")
    dl.write_delta(
        spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v"), path
    )
    res = dl.update_delta(spark, path, {"v": "9.9"}, "id = 99")
    assert res["rows_updated"] == 0 and res["version"] == 0


def test_update_iceberg_mor_shape(spark, tmp_path):
    path = str(tmp_path / "iu")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(12)])
        .select("id", "v").coalesce(2),
        path,
    )
    res = il.update_iceberg(spark, path, {"v": "v * 10"}, "id % 4 = 1")
    assert res["rows_updated"] == 3  # ids 1, 5, 9
    assert res["delete_files"] >= 1 and res["appended_files"] >= 1
    got = dict(_rows(il.read_iceberg(spark, path)))
    assert got[1] == 10.0 and got[5] == 50.0 and got[9] == 90.0
    assert got[0] == 0.0 and got[2] == 2.0
    # pre-update snapshot intact
    old = dict(_rows(il.read_iceberg(spark, path,
                                     snapshot_id=res["snapshot_id"] - 1)))
    assert old[1] == 1.0
    # compaction folds the MOR debt; values keep
    il.rewrite_data_files(spark, path)
    assert dict(_rows(il.read_iceberg(spark, path)))[5] == 50.0


def test_update_iceberg_one_shot_and_guards(spark, tmp_path):
    path = str(tmp_path / "iu2")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=1, a=10, b=20)]).select("id", "a", "b"),
        path,
    )
    il.update_iceberg(spark, path, {"a": "b", "b": "a"}, "id = 1")
    r = il.read_iceberg(spark, path).collect()[0]
    assert (r.a, r.b) == (20, 10)
    with pytest.raises(il.IcebergLiteError, match="unknown SET"):
        il.update_iceberg(spark, path, {"zzz": "1"}, "id = 1")
    res = il.update_iceberg(spark, path, {"a": "1"}, "id = 99")
    assert res["rows_updated"] == 0 and res["snapshot_id"] is None


def test_update_iceberg_after_mor_merge_no_resurrection(spark, tmp_path):
    """ADVICE r9 (high): UPDATE must match LIVE rows only.  After a
    MOR merge position-deletes the old versions, an UPDATE whose
    predicate matches the OLD values must touch nothing — the buggy
    raw-parquet read resurrected every deleted row as a transformed
    live copy (10 rows became 20, rows_updated 11 instead of 0)."""
    path = str(tmp_path / "res")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v"),
        path,
    )
    # upsert ALL ids to v+100 → 10 position deletes + 10 new rows
    il.merge_iceberg(
        spark,
        spark.createDataFrame(
            [Row(id=i, v=float(i) + 100.0) for i in range(10)]
        ).select("id", "v"),
        path, keys="id",
    )
    # predicate matches only the DELETED versions (v < 100)
    res = il.update_iceberg(spark, path, {"v": "v * 1000"}, "v < 100")
    assert res["rows_updated"] == 0 and res["snapshot_id"] is None
    got = _rows(il.read_iceberg(spark, path))
    assert len(got) == 10
    assert got == [(i, float(i) + 100.0) for i in range(10)]
    # and an UPDATE matching the LIVE versions touches exactly those
    res2 = il.update_iceberg(spark, path, {"v": "v - 100"}, "v >= 100")
    assert res2["rows_updated"] == 10
    assert _rows(il.read_iceberg(spark, path)) == [
        (i, float(i)) for i in range(10)
    ]


def test_delete_iceberg_after_mor_merge_counts_live_only(spark, tmp_path):
    """ADVICE r9 (medium): DELETE's MOR path must not re-count /
    re-delete rows already masked by existing delete files."""
    path = str(tmp_path / "dres")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v"),
        path,
    )
    il.merge_iceberg(
        spark,
        spark.createDataFrame(
            [Row(id=i, v=float(i) + 100.0) for i in range(5)]
        ).select("id", "v"),
        path, keys="id",
    )
    # matches the 5 deleted old versions AND live ids 5..9 (v<100)
    res = il.delete_iceberg(spark, path, "v < 100")
    assert res["rows_deleted"] == 5  # only the live ones
    got = _rows(il.read_iceberg(spark, path))
    assert got == [(i, float(i) + 100.0) for i in range(5)]


def test_delete_iceberg_fast_path_count_respects_mor_debt(
    spark, tmp_path
):
    """Partition-aligned DELETE on a table carrying MOR debt stays a
    metadata-only commit but must subtract rows already masked by
    delete files from rows_deleted (ADVICE r9)."""
    path = str(tmp_path / "fpd")
    il.write_iceberg(
        spark,
        spark.createDataFrame(
            [Row(id=i, grp="a" if i < 6 else "b", v=float(i))
             for i in range(10)]
        ).select("id", "grp", "v"),
        path, partition_by=["grp"],
    )
    # MOR-delete 2 rows inside partition a (row path: data predicate)
    r0 = il.delete_iceberg(spark, path, "id IN (0, 1)")
    assert r0["metadata_only"] is False and r0["rows_deleted"] == 2
    # now drop partition a: 6 file rows, but only 4 are live
    res = il.delete_iceberg(spark, path, "grp = 'a'")
    assert res["metadata_only"] is True
    assert res["rows_deleted"] == 4
    got = _rows(il.read_iceberg(spark, path))
    assert got == [(i, float(i)) for i in range(6, 10)]


def test_update_iceberg_binds_evolved_schema(spark, tmp_path):
    """ADVICE r9 (medium): the DML reader must use the metadata table
    schema — files written BEFORE a column was added surface it as
    NULL, so SET/WHERE bind against the evolved table shape instead
    of failing or mis-reading old physical files."""
    path = str(tmp_path / "evo")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(4)])
        .select("id", "v"),
        path,
    )
    # schema evolution on append: new column `tag`
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=10, v=10.0, tag="new")])
        .select("id", "v", "tag"),
        path,
    )
    res = il.update_iceberg(
        spark, path, {"tag": "coalesce(tag, 'backfilled')"}, "id <= 10"
    )
    assert res["rows_updated"] == 5
    got = sorted((r.id, r.tag) for r in
                 il.read_iceberg(spark, path).collect())
    assert got == [(0, "backfilled"), (1, "backfilled"),
                   (2, "backfilled"), (3, "backfilled"), (10, "new")]
