"""Delta ROW TRACKING (round 10, PROTOCOL.md §Row Tracking / §Domain
Metadata): stable per-row ids — baseRowId blocks on add actions, the
high-water mark as domain metadata, fresh id = baseRowId + physical
index, and preservation when rows MOVE (materialized hidden columns
through COW UPDATE/DELETE/MERGE-survivors and OPTIMIZE; DV DML never
moves rows, so ids are stable there by construction).

The delta twin of iceberg v3 row lineage: both give CDC consumers and
incremental training pipelines a per-row identity that survives
rewrites.
"""

import pytest
from pyspark.sql import Row

from aws_insurancelake_etl_spark.sources import delta_lite as dl

CONF = {"delta.enableRowTracking": "true"}


def _t(spark, path, lo, hi, **kw):
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(lo, hi)])
        .select("id", "v").orderBy("id").coalesce(1)
    )
    dl.write_delta(df, path, **kw)


def _ids(spark, path):
    return {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in dl.read_delta(spark, path, row_tracking=True).collect()
    }


def test_create_assigns_blocks_and_advances_hwm(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 10, configuration=CONF)
    _t(spark, path, 10, 14, mode="append")
    snap = dl.snapshot(path)
    assert "rowTracking" in snap.protocol["writerFeatures"]
    assert "domainMetadata" in snap.protocol["writerFeatures"]
    assert dl._row_id_hwm(snap.domain_metadata) == 13
    f0, f1 = sorted(snap.files, key=lambda a: a.base_row_id)
    assert (f0.base_row_id, f0.default_row_commit_version) == (0, 0)
    assert (f1.base_row_id, f1.default_row_commit_version) == (10, 1)
    got = _ids(spark, path)
    assert got == {i: (i, 0 if i < 10 else 1) for i in range(14)}


def test_plain_reads_hide_tracking_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 5, configuration=CONF)
    dl.update_delta(spark, path, {"v": "-v"}, "id = 2",
                    use_deletion_vectors=False)
    assert dl.read_delta(spark, path).columns == ["id", "v"]


def test_dv_dml_keeps_ids_stable_for_free(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 8, configuration=CONF)
    dl.delete_delta(spark, path, "id = 3", use_deletion_vectors=True)
    got = _ids(spark, path)
    assert 3 not in got and got[4] == (4, 0)


def test_cow_update_preserves_id_and_bumps_commit_version(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 8, configuration=CONF)
    res = dl.update_delta(spark, path, {"v": "v * 10"}, "id = 5",
                          use_deletion_vectors=False)
    got = _ids(spark, path)
    assert got[5] == (5, res["version"])  # moved row kept its id
    assert got[6] == (6, 0)  # survivor carried BOTH fields
    # chained move keeps the ORIGINAL id
    res2 = dl.update_delta(spark, path, {"v": "v + 1"}, "id = 5",
                           use_deletion_vectors=False)
    assert _ids(spark, path)[5] == (5, res2["version"])


def test_dv_update_moved_copy_preserves_id(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 8, configuration=CONF)
    res = dl.update_delta(spark, path, {"v": "v + 9"}, "id = 1",
                          use_deletion_vectors=True)
    got = _ids(spark, path)
    assert got[1] == (1, res["version"])
    assert got[2] == (2, 0)


def test_cow_delete_preserves_survivors(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 6, configuration=CONF)
    dl.delete_delta(spark, path, "id in (0, 4)",
                    use_deletion_vectors=False)
    got = _ids(spark, path)
    assert sorted(got) == [1, 2, 3, 5]
    assert got[5] == (5, 0)


def test_cow_merge_preserves_survivors_fresh_for_source(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 6, configuration=CONF)
    src = spark.createDataFrame(
        [Row(id=2, v=22.0), Row(id=77, v=7.0)]
    ).select("id", "v")
    dl.merge_delta(spark, src, path, ["id"], use_deletion_vectors=False)
    got = _ids(spark, path)
    assert got[3] == (3, 0)  # survivor in the touched file preserved
    assert got[77][0] > 5  # insert minted a fresh id
    assert len({rid for rid, _ in got.values()}) == len(got)  # unique


def test_optimize_preserves_both_fields(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 6, configuration=CONF)
    _t(spark, path, 6, 9, mode="append")
    dl.update_delta(spark, path, {"v": "-v"}, "id = 7",
                    use_deletion_vectors=False)
    before = _ids(spark, path)
    dl.optimize(spark, path, target_files=1)
    assert _ids(spark, path) == before


def test_hwm_survives_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    _t(spark, path, 0, 7, configuration=CONF)
    before = _ids(spark, path)
    dl._write_checkpoint(path, dl.snapshot(path).version)
    snap = dl.snapshot(path)
    assert dl._row_id_hwm(snap.domain_metadata) == 6
    assert _ids(spark, path) == before
    # an append AFTER the checkpoint still mints non-colliding ids
    _t(spark, path, 100, 102, mode="append")
    got = _ids(spark, path)
    assert got[100][0] == 7 and got[101][0] == 8


def test_concurrent_append_refuses_stale_row_id_block(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    _t(spark, path, 0, 3, configuration=CONF)
    df = (
        spark.createDataFrame([Row(id=9, v=9.0)]).select("id", "v")
    )
    real_try = dl._try_commit
    calls = {"n": 0}

    def race(log_dir, version, actions, conf=None):
        if calls["n"] == 0:
            calls["n"] += 1
            # a concurrent writer lands the version first
            with open(
                os.path.join(log_dir, f"{version:020d}.json"), "x"
            ) as fh:
                fh.write("{}")
            return False
        return real_try(log_dir, version, actions, conf)

    dl._try_commit = race
    try:
        with pytest.raises(dl.ConcurrentWriteError, match="row ids"):
            dl.write_delta(df, path, mode="append")
    finally:
        dl._try_commit = real_try


def test_row_ids_on_encoded_partition_paths(spark, tmp_path):
    """Review r10: the row-id file map must key by the percent-encoded
    scan path (like the DV join) — a partition value with a space used
    to read null ids for the whole partition."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(id=1, seg="a b"), Row(id=2, seg="a b"), Row(id=3, seg="c")]
    ).select("id", "seg").orderBy("id").coalesce(1)
    dl.write_delta(df, path, partition_by=["seg"], configuration=CONF)
    got = {r["id"]: r["_row_id"]
           for r in dl.read_delta(spark, path, row_tracking=True).collect()}
    assert None not in got.values(), got
    assert sorted(got.values()) == [0, 1, 2]


def test_enable_on_existing_table_upgrades_protocol(spark, tmp_path):
    """Review r10: ALTER-style enable on an existing table must advance
    the protocol to table features BEFORE any domainMetadata action
    lands, and mint the materialized column names so later COW DML
    preserves ids; pre-enable files read null _row_id (lazy)."""
    path = str(tmp_path / "t")
    _t(spark, path, 0, 4)  # plain table, no tracking
    assert dl.snapshot(path).protocol.get("writerFeatures") is None
    _t(spark, path, 10, 13, mode="append", configuration=CONF)
    snap = dl.snapshot(path)
    feats = set(snap.protocol["writerFeatures"])
    assert {"rowTracking", "domainMetadata"} <= feats
    assert snap.protocol["minWriterVersion"] == 7
    assert all(dl._rt_col_names(snap.configuration))
    got = _ids(spark, path)
    assert got[0] == (None, None)  # pre-enable file: lazy nulls
    assert got[10] == (0, 1) and got[12] == (2, 1)
    # COW DML on the upgraded table preserves post-enable ids
    res = dl.update_delta(spark, path, {"v": "-v"}, "id = 11",
                          use_deletion_vectors=False)
    got = _ids(spark, path)
    assert got[11] == (1, res["version"])


def test_merge_preserves_row_ids_for_updated_rows(spark, tmp_path):
    """PROTOCOL.md §Row Tracking: ids are stable across DML — a
    MERGE-updated row keeps its _row_id in BOTH shapes (COW rewrite
    and DV tombstone+append); inserts mint fresh ids; the updated
    row's commit version advances."""
    from aws_insurancelake_etl_spark.sources import delta_lite as dl

    for dv in (False, True):
        path = str(tmp_path / f"rt-merge-{dv}")
        dl.write_delta(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
            ),
            path,
            configuration={
                "delta.enableRowTracking": "true",
                **({"delta.enableDeletionVectors": "true"} if dv else {}),
            },
        )
        before = {
            r["id"]: r["_row_id"]
            for r in dl.read_delta(spark, path, row_tracking=True).collect()
        }
        dl.merge_delta(
            spark,
            spark.createDataFrame([(2, "B!"), (9, "new")], "id int, v string"),
            path,
            keys=["id"],
        )
        after = {
            r["id"]: (r["_row_id"], r["_row_commit_version"])
            for r in dl.read_delta(spark, path, row_tracking=True).collect()
        }
        assert after[2][0] == before[2], f"dv={dv}: updated row lost its id"
        assert after[1][0] == before[1] and after[3][0] == before[3]
        assert after[9][0] not in set(before.values())
        assert after[2][1] > after[3][1] if not dv else True
