"""delta_lite: pure-Python Delta Lake protocol — log replay, time
travel, partition pruning, checkpoints, copy-on-write MERGE, vacuum,
and commit-conflict behavior.  Reference parity target: the Iceberg
``MERGE INTO`` upsert at ``etl_consume_entity_match.py:443-455``."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.sources import delta_lite as dl


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _people(spark, lo, hi, grp="a"):
    return spark.createDataFrame(
        [Row(id=i, grp=grp, score=float(i) * 1.5) for i in range(lo, hi)]
    ).select("id", "grp", "score")


def test_append_roundtrip_and_versions(spark, table):
    assert dl.write_delta(_people(spark, 0, 5), table) == 0
    assert dl.write_delta(_people(spark, 5, 8), table) == 1
    back = dl.read_delta(spark, table)
    assert _rows(back) == _rows(_people(spark, 0, 8))
    # time travel: version 0 sees only the first commit
    v0 = dl.read_delta(spark, table, version=0)
    assert _rows(v0) == _rows(_people(spark, 0, 5))
    with pytest.raises(dl.DeltaLiteError):
        dl.snapshot(table, version=7)


def test_overwrite_replaces_and_changes_schema(spark, table):
    dl.write_delta(_people(spark, 0, 5), table)
    new = spark.createDataFrame([Row(name="x", n=1), Row(name="y", n=2)])
    dl.write_delta(new, table, mode="overwrite")
    back = dl.read_delta(spark, table)
    assert set(back.columns) == {"name", "n"}
    assert back.count() == 2
    # the overwritten data is still reachable by time travel
    assert dl.read_delta(spark, table, version=0).count() == 5


def test_append_schema_mismatch_raises(spark, table):
    dl.write_delta(_people(spark, 0, 3), table)
    bad = spark.createDataFrame([Row(id=1, grp="a")])  # missing score
    with pytest.raises(dl.DeltaLiteError, match="schema mismatch"):
        dl.write_delta(bad, table)


def test_partitioned_write_prunes_without_opening_files(spark, table):
    df = _people(spark, 0, 4, "a").unionByName(_people(spark, 4, 10, "b"))
    dl.write_delta(df, table, partition_by=["grp"])
    snap = dl.snapshot(table)
    assert snap.partition_columns == ["grp"]
    pruned = dl._prune(snap.files, {"grp": "b"})
    assert pruned and all(f.partition_values == {"grp": "b"} for f in pruned)
    got = dl.read_delta(spark, table, partition_filter={"grp": "b"})
    assert _rows(got) == _rows(_people(spark, 4, 10, "b"))
    # partition columns are NOT in the data files (Delta convention):
    # the log's partitionValues are authoritative
    raw = spark.read.parquet(
        os.path.join(table, pruned[0].path)
    )
    assert "grp" not in raw.columns


def test_null_partition_value(spark, table):
    df = spark.createDataFrame(
        [Row(id=1, grp=None, score=0.5), Row(id=2, grp="a", score=1.0)]
    ).select("id", "grp", "score")
    dl.write_delta(df, table, partition_by=["grp"])
    back = dl.read_delta(spark, table)
    assert _rows(back) == _rows(df)
    nulls = dl.read_delta(spark, table, partition_filter={"grp": None})
    assert _rows(nulls) == [(1, None, 0.5)]


def test_non_hive_layout_falls_back_to_log_literals(spark, table):
    """A third-party writer may use arbitrary file names; the log's
    partitionValues must still drive the read."""
    dl.write_delta(_people(spark, 0, 6, "a"), table, partition_by=["grp"])
    snap = dl.snapshot(table)
    # flatten the hive dir: move the file to the root, patch the log
    old = snap.files[0]
    flat = "opaque-0001.parquet"
    os.rename(os.path.join(table, old.path), os.path.join(table, flat))
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    actions = [
        {"remove": {"path": old.path, "deletionTimestamp": 1, "dataChange": True}},
        {
            "add": {
                "path": flat,
                "partitionValues": {"grp": "a"},
                "size": 1,
                "modificationTime": 1,
                "dataChange": True,
            }
        },
    ]
    with open(log, "w", encoding="utf-8") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    back = dl.read_delta(spark, table)
    assert _rows(back) == _rows(_people(spark, 0, 6, "a"))


def test_checkpoint_written_and_sufficient(spark, table):
    for i in range(11):  # versions 0..10 -> checkpoint at 10
        dl.write_delta(_people(spark, i, i + 1), table)
    log = os.path.join(table, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    last = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert last["version"] == 10
    # Prove reads come FROM the checkpoint: age out the JSON tail
    for v in range(11):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    back = dl.read_delta(spark, table)
    assert _rows(back) == _rows(_people(spark, 0, 11))
    # one more append on top of the checkpointed state
    dl.write_delta(_people(spark, 11, 12), table)
    assert dl.read_delta(spark, table).count() == 12


def test_merge_rewrites_only_touched_files(spark, table):
    # two files: ids 0-4 and 5-9 (one commit each => one file each)
    dl.write_delta(_people(spark, 0, 5).coalesce(1), table)
    dl.write_delta(_people(spark, 5, 10).coalesce(1), table)
    before = {a.path for a in dl.snapshot(table).files}
    assert len(before) == 2
    source = spark.createDataFrame(
        [
            Row(id=2, grp="a", score=999.0),  # update (file 1)
            Row(id=42, grp="z", score=1.0),  # insert
        ]
    ).select("id", "grp", "score")
    stats = dl.merge_delta(spark, source, table, "id")
    assert stats["files_rewritten"] == 1 and stats["files_kept"] == 1
    after = {a.path for a in dl.snapshot(table).files}
    assert len(before & after) == 1  # the untouched file carried over
    back = dl.read_delta(spark, table)
    assert back.count() == 11
    assert back.where("id = 2").collect()[0].score == 999.0
    assert back.where("id = 42").count() == 1
    # time travel still sees the pre-merge state
    assert dl.read_delta(spark, table, version=1).where("id = 42").count() == 0


def test_merge_insert_only_and_duplicate_keys(spark, table):
    dl.write_delta(_people(spark, 0, 3), table)
    inserts = _people(spark, 100, 103)
    stats = dl.merge_delta(spark, inserts, table, ["id"])
    assert stats["files_rewritten"] == 0
    assert dl.read_delta(spark, table).count() == 6
    dup = inserts.unionByName(inserts)
    with pytest.raises(dl.DeltaLiteError, match="duplicate key"):
        dl.merge_delta(spark, dup, table, ["id"])


def test_merge_on_partitioned_table(spark, table):
    df = _people(spark, 0, 4, "a").unionByName(_people(spark, 4, 8, "b"))
    dl.write_delta(df, table, partition_by=["grp"])
    source = spark.createDataFrame(
        [Row(id=5, grp="b", score=-1.0), Row(id=9, grp="c", score=2.0)]
    ).select("id", "grp", "score")
    dl.merge_delta(spark, source, table, "id")
    back = dl.read_delta(spark, table)
    assert back.count() == 9
    assert back.where("id = 5").collect()[0].score == -1.0
    assert _rows(back.where("grp = 'c'").select("id")) == [(9,)]


def test_commit_conflict_append_retries_merge_raises(spark, table, monkeypatch):
    dl.write_delta(_people(spark, 0, 3), table)
    # simulate a concurrent writer claiming version 1
    claim = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(claim, "x", encoding="utf-8") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "OTHER"}}) + "\n")
    v = dl.write_delta(_people(spark, 3, 4), table)  # append lands at 2
    assert v == 2
    # a TRUE race: the merge plans against a stale snapshot while a
    # concurrent writer lands the next version
    stale = dl.snapshot(table)
    monkeypatch.setattr(dl, "snapshot", lambda p, version=None: stale)
    with open(
        os.path.join(table, "_delta_log", f"{stale.version + 1:020d}.json"), "x"
    ) as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "OTHER"}}) + "\n")
    with pytest.raises(dl.ConcurrentWriteError):
        dl.merge_delta(spark, _people(spark, 0, 1), table, "id",
                       max_retries=0)


def test_vacuum_deletes_only_tombstoned_files(spark, table):
    dl.write_delta(_people(spark, 0, 5).coalesce(1), table)
    first = dl.snapshot(table).files[0].path
    dl.write_delta(_people(spark, 0, 5), table, mode="overwrite")
    assert os.path.exists(os.path.join(table, first))
    deleted = dl.vacuum(table, retention_ms=0)
    assert first in deleted
    assert not os.path.exists(os.path.join(table, first))
    # current snapshot unaffected
    assert dl.read_delta(spark, table).count() == 5


def test_unsupported_reader_version_raises(spark, table):
    # reader-protocol gate (round 8): versions 1-3 replay; a v3 table
    # gates on its FEATURE LIST (columnMapping / deletionVectors /
    # timestampNtz / v2Checkpoint / variantType / typeWidening
    # implemented), an unknown feature or a v3 protocol missing the
    # mandatory list raises, and v4+ raises
    dl.write_delta(_people(spark, 0, 2), table)
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log, "x", encoding="utf-8") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors", "collations"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(dl.DeltaLiteError, match="collations"):
        dl.snapshot(table)


def test_v3_protocol_without_feature_list_raises(spark, table):
    dl.write_delta(_people(spark, 0, 2), table)
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log, "x", encoding="utf-8") as fh:
        fh.write(
            json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}})
            + "\n"
        )
    with pytest.raises(dl.DeltaLiteError, match="readerFeatures"):
        dl.snapshot(table)


def test_reader_version_4_raises(spark, table):
    dl.write_delta(_people(spark, 0, 2), table)
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log, "x", encoding="utf-8") as fh:
        fh.write(
            json.dumps({"protocol": {"minReaderVersion": 4, "minWriterVersion": 7}})
            + "\n"
        )
    with pytest.raises(dl.DeltaLiteError, match="minReaderVersion"):
        dl.snapshot(table)


def test_read_input_dispatches_table_directories(spark, tmp_path):
    """The engine's format dispatch recognizes transactional table dirs
    by their on-disk markers, so a pipeline input_spec can point at a
    Delta or Iceberg directory like any other source."""
    from pyspark.sql import Row

    from aws_insurancelake_etl_spark.queries.pipeline_ops import (
        build_iceberg_table,
    )
    from aws_insurancelake_etl_spark.sources.readers import read_input

    d = str(tmp_path / "d")
    dl.write_delta(_people(spark, 0, 4), d)
    dl.write_delta(_people(spark, 4, 6), d)
    assert read_input(spark, d, {}).count() == 6
    assert read_input(spark, d, {"delta": {"version": 0}}).count() == 4

    i = str(tmp_path / "i")
    df = spark.createDataFrame(
        [Row(id=1, g="a"), Row(id=2, g="b")]
    ).select("id", "g")
    build_iceberg_table(spark, i, [df], "g")
    assert read_input(spark, i, {}).count() == 2
    got = read_input(spark, i, {"iceberg": {"partition_filter": {"g": "a"}}})
    assert [r.id for r in got.collect()] == [1]


def test_optimize_compacts_and_zorders_without_data_change(spark, table):
    """OPTIMIZE ZORDER BY: many small commits compact into few files
    clustered by the Morton key; rows identical, time travel intact,
    and the commit is dataChange=false (layout-only)."""
    from aws_insurancelake_etl_spark.operators import layout

    for lo in range(0, 40, 5):
        df = spark.createDataFrame(
            [Row(id=i, other=(i * 7) % 40, score=float(i))
             for i in range(lo, lo + 5)]
        ).select("id", "other", "score")
        dl.write_delta(df, table)
    before = dl.snapshot(table)
    assert len(before.files) >= 8
    stats = dl.optimize(spark, table, target_files=2,
                        zorder_by=["id", "other"])
    assert stats["files_after"] <= 2
    snap = dl.snapshot(table)
    assert all(not a.data_change for a in snap.files)
    back = dl.read_delta(spark, table)
    assert back.count() == 40
    assert _rows(back) == _rows(dl.read_delta(spark, table,
                                              version=before.version))
    # clustering is real: a box predicate prunes at least one file
    stats_df = layout.file_minmax_stats(
        spark, table + "/" + os.path.dirname(snap.files[0].path)
        if "/" in snap.files[0].path else table, ["id", "other"])
    # files live at the table root for an unpartitioned table
    overl = layout.files_overlapping_box(stats_df, {"id": (0, 10),
                                                    "other": (0, 10)})
    assert overl.count() < stats_df.count()


def test_streaming_foreachbatch_merges_into_delta(spark, table, tmp_path):
    """Streaming SCD1 into a TRANSACTIONAL table: foreachBatch applies
    each micro-batch with delta_lite.merge_delta, so the sink keeps
    history (time travel) and survives replays (same keys upsert)."""
    import time as _time

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    dl.write_delta(_people(spark, 0, 4), table)

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dl.merge_delta(spark, batch_df.dropDuplicates(["id"]), table, "id")

    b1 = _people(spark, 2, 6)  # ids 2,3 update; 4,5 insert
    b1.coalesce(1).write.mode("overwrite").parquet(src_dir + "/b1")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/b1")
    )
    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    _time.sleep(0.2)
    back = dl.read_delta(spark, table)
    assert back.count() == 6
    assert dl.read_delta(spark, table, version=0).count() == 4


def test_append_schema_evolve_adds_columns(spark, table):
    dl.write_delta(_people(spark, 0, 3), table)
    wider = _people(spark, 3, 5).withColumn("nation", F.lit("NL"))
    with pytest.raises(dl.DeltaLiteError, match="evolve"):
        dl.write_delta(wider, table)  # strict default still refuses
    v = dl.write_delta(wider, table, schema_mode="evolve")
    back = dl.read_delta(spark, table)
    assert set(back.columns) == {"id", "grp", "score", "nation"}
    rows = {r.id: r.nation for r in back.collect()}
    assert rows[0] is None and rows[4] == "NL"  # old files read null
    # type drift is still an error under evolve
    drift = _people(spark, 9, 10).withColumn("score", F.lit("oops"))
    with pytest.raises(dl.DeltaLiteError, match="existing fields"):
        dl.write_delta(drift.select("id", "grp", "score"),
                       table, schema_mode="evolve")
    assert v == 1


# ---------------------------------------------------------------- model

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_op = st.one_of(
    st.tuples(st.just("append"),
              st.lists(st.integers(0, 30), min_size=1, max_size=4)),
    st.tuples(st.just("overwrite"),
              st.lists(st.integers(0, 30), min_size=1, max_size=4)),
    st.tuples(st.just("merge"),
              st.lists(st.integers(0, 30), min_size=1, max_size=4,
                       unique=True)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_delta_model_based_random_op_sequences(spark, tmp_path_factory, ops):
    """Model check: any sequence of append/overwrite/merge must leave
    BOTH the latest snapshot and every historical version equal to an
    in-memory reference model.  Append = multiset add; overwrite =
    replace; merge = upsert keyed on id (value becomes the op index so
    updates are observable)."""
    table = str(tmp_path_factory.mktemp("dlmodel") / "tbl")

    def df_for(ids, op_idx):
        return spark.createDataFrame(
            [(i, op_idx) for i in ids], "id long, v long"
        )

    multiset: list[tuple[int, int]] = []
    checkpoints: list[tuple[int, list]] = []  # (actual version, expected rows)
    for op_idx, (kind, ids) in enumerate(ops):
        if kind == "append":
            dl.write_delta(df_for(ids, op_idx), table)
            multiset += [(i, op_idx) for i in ids]
        elif kind == "overwrite":
            dl.write_delta(df_for(ids, op_idx), table, mode="overwrite")
            multiset = [(i, op_idx) for i in ids]
        else:
            if not dl.is_delta_table(table):
                # bootstrap: a merge into a fresh path creates the table
                dl.write_delta(df_for([], op_idx).limit(0), table)
            dl.merge_delta(spark, df_for(ids, op_idx), table, "id")
            keys = set(ids)
            multiset = [r for r in multiset if r[0] not in keys]
            multiset += [(i, op_idx) for i in ids]
        checkpoints.append((dl.snapshot(table).version, sorted(multiset)))

    for version, expected in checkpoints:
        got = sorted(
            (r.id, r.v)
            for r in dl.read_delta(spark, table, version=version).collect()
        )
        assert got == expected, (version, ops)


def test_concurrent_appends_all_land(spark, table):
    """Two writers racing on the same next-version slot: O_EXCL makes
    one lose and retry, and BOTH commits must be present afterward."""
    import threading

    dl.write_delta(_people(spark, 0, 2), table)
    errs = []

    def w(lo):
        try:
            dl.write_delta(_people(spark, lo, lo + 3), table)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=w, args=(lo,)) for lo in (10, 20)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert dl.read_delta(spark, table).count() == 8
    assert dl.snapshot(table).version == 2


def test_concurrent_merges_both_land(spark, table):
    """MERGE-vs-MERGE on OVERLAPPING files (Delta PROTOCOL.md conflict
    rules): both merges touch the single data file, so the loser's
    staged rewrite was computed against a stale snapshot.  It must
    discard and RE-EXECUTE against the winner's snapshot — blind
    re-commit would resurrect the winner's updates (lost update).
    Final state must equal the two merges applied serially in either
    order: here their key sets are disjoint, so the result is
    order-independent and exact."""
    import threading

    dl.write_delta(_people(spark, 0, 10).coalesce(1), table)
    barrier = threading.Barrier(2)
    errs, results = [], {}

    def m(lo, tag):
        # updates keys [lo, lo+2) with score*10, inserts key 100+lo
        src = spark.createDataFrame(
            [Row(id=i, grp="a", score=float(i) * 10.0)
             for i in list(range(lo, lo + 2)) + [100 + lo]]
        ).select("id", "grp", "score")
        barrier.wait()
        try:
            results[tag] = dl.merge_delta(spark, src, table, "id")
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=m, args=(0, "A")),
               threading.Thread(target=m, args=(5, "B"))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # both merges committed: versions 1 and 2, one of them retried
    assert {results["A"]["version"], results["B"]["version"]} == {1, 2}
    got = {
        r.id: r.score for r in dl.read_delta(spark, table).collect()
    }
    expected = {i: i * 1.5 for i in range(10)}
    expected.update({0: 0.0, 1: 10.0, 5: 50.0, 6: 60.0,
                     100: 1000.0, 105: 1050.0})
    assert got == expected
    # the serialized-equivalent invariant held through a real race:
    # 12 live rows, no duplicates, no resurrected pre-merge scores
    assert dl.snapshot(table).version == 2


def test_delete_rewrites_only_matching_files(spark, table):
    dl.write_delta(_people(spark, 0, 5).coalesce(1), table)
    dl.write_delta(_people(spark, 5, 10).coalesce(1), table)
    stats = dl.delete_delta(spark, table, "id IN (1, 3)")
    assert stats["rows_deleted"] == 2
    assert stats["files_rewritten"] == 1 and stats["files_kept"] == 1
    back = dl.read_delta(spark, table)
    assert back.count() == 8
    assert back.where("id IN (1, 3)").count() == 0
    # time travel still sees the deleted rows
    assert dl.read_delta(spark, table, version=1).count() == 10
    # no-match delete is a no-op commit-wise
    before_v = dl.snapshot(table).version
    stats2 = dl.delete_delta(spark, table, "id = 9999")
    assert stats2["rows_deleted"] == 0
    assert dl.snapshot(table).version == before_v


def test_delete_null_predicate_rows_survive(spark, table):
    df = spark.createDataFrame(
        [Row(id=1, grp=None, score=1.0), Row(id=2, grp="x", score=2.0)]
    ).select("id", "grp", "score")
    dl.write_delta(df, table)
    dl.delete_delta(spark, table, "grp = 'x'")
    back = dl.read_delta(spark, table)
    # SQL tri-state: NULL predicate rows are NOT deleted
    assert [r.id for r in back.collect()] == [1]


def test_merge_prunes_partitions_when_key_covers_them(spark, table):
    """Partition columns ⊆ merge key → the touched-file search never
    reads other partitions' files (the daily-upsert pattern)."""
    df = _people(spark, 0, 4, "a").unionByName(_people(spark, 4, 8, "b"))
    dl.write_delta(df, table, partition_by=["grp"])
    # corrupt partition b's data file on disk: if the merge tries to
    # read it, it fails — pruning means it never does
    snap = dl.snapshot(table)
    b_file = next(f for f in snap.files if f.partition_values == {"grp": "b"})
    with open(os.path.join(table, b_file.path), "wb") as fh:
        fh.write(b"not parquet at all")
    source = spark.createDataFrame(
        [Row(id=1, grp="a", score=111.0)]
    ).select("id", "grp", "score")
    stats = dl.merge_delta(spark, source, table, ["id", "grp"])
    assert stats["files_rewritten"] == 1
    # and partition b's (corrupt) file is untouched in the snapshot
    after = dl.snapshot(table)
    assert any(f.path == b_file.path for f in after.files)


def test_partition_values_with_special_chars_roundtrip(spark, table):
    """Hive-escaped partition dirs (':' -> %3A on disk) must round-trip
    through the log's URL encoding AND through merge's URI decoding
    (review findings r6: quote/unquote asymmetry, _metadata encoding)."""
    df = spark.createDataFrame(
        [Row(id=1, grp="a b:c", score=1.0), Row(id=2, grp="plain", score=2.0)]
    ).select("id", "grp", "score")
    dl.write_delta(df, table, partition_by=["grp"])
    back = dl.read_delta(spark, table)
    assert _rows(back) == _rows(df)
    got = dl.read_delta(spark, table, partition_filter={"grp": "a b:c"})
    assert [r.id for r in got.collect()] == [1]
    # merge into the funky partition
    src = spark.createDataFrame(
        [Row(id=1, grp="a b:c", score=9.0)]
    ).select("id", "grp", "score")
    stats = dl.merge_delta(spark, src, table, ["id", "grp"])
    assert stats["files_rewritten"] == 1
    assert dl.read_delta(spark, table).where("id = 1").collect()[0].score == 9.0
    # and DELETE through the same decoding path
    dl.delete_delta(spark, table, "id = 1")
    assert dl.read_delta(spark, table).count() == 1


def test_boolean_partition_values_normalize(spark, table):
    """Spark stores boolean partition literals lowercase; Python's
    str(True) must not silently match nothing (review finding r6)."""
    df = spark.createDataFrame(
        [Row(id=1, flag=True, v=1.0), Row(id=2, flag=False, v=2.0)]
    ).select("id", "flag", "v")
    dl.write_delta(df, table, partition_by=["flag"])
    got = dl.read_delta(spark, table, partition_filter={"flag": True})
    assert [r.id for r in got.collect()] == [1]
    src = spark.createDataFrame([Row(id=1, flag=True, v=5.0)]).select(
        "id", "flag", "v"
    )
    dl.merge_delta(spark, src, table, ["id", "flag"])
    back = dl.read_delta(spark, table)
    assert back.count() == 2  # update, NOT a duplicate-key insert
    assert back.where("id = 1").collect()[0].v == 5.0


def test_append_race_with_schema_change_raises_not_clobbers(
    spark, table, monkeypatch
):
    """A loser append must re-validate against the winner's state: if
    the winner changed the schema, raising beats silently committing
    files whose layout disagrees with the new metaData."""
    dl.write_delta(_people(spark, 0, 2), table)
    stale = dl.snapshot(table)
    real_snapshot = dl.snapshot
    # concurrent winner: overwrite with a DIFFERENT schema at version 1
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "x") as fh:
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet"},
            "schemaString": spark.createDataFrame(
                [Row(other=1)]).schema.json(),
            "partitionColumns": [],
        }}) + "\n")

    # the loser planned against the PRE-winner state: serve the stale
    # snapshot on its first read, reality on the conflict retry
    calls = {"n": 0}

    def racy_snapshot(p, version=None):
        calls["n"] += 1
        if calls["n"] == 1 and version is None:
            return stale
        return real_snapshot(p, version)

    monkeypatch.setattr(dl, "snapshot", racy_snapshot)
    with pytest.raises(dl.ConcurrentWriteError, match="concurrent writer"):
        dl.write_delta(_people(spark, 5, 7), table)
    monkeypatch.setattr(dl, "snapshot", real_snapshot)
    # and its staged files were discarded, not orphaned
    orphans = [n for n in os.listdir(table)
               if n.endswith(".parquet")
               and n not in {a.path for a in real_snapshot(table).files}]
    assert orphans == []


def test_vacuum_works_from_checkpoint_tombstones(spark, table):
    """Tombstones must survive checkpointing + JSON aging (review
    finding r6: vacuum used to scan only raw JSON commits)."""
    dl.write_delta(_people(spark, 0, 3).coalesce(1), table)
    first = dl.snapshot(table).files[0].path
    for i in range(10):  # versions 1..10 -> checkpoint at 10
        if i == 0:
            dl.write_delta(_people(spark, 10, 13), table, mode="overwrite")
        else:
            dl.write_delta(_people(spark, 20 + i, 21 + i), table)
    log = os.path.join(table, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    for v in range(11):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert os.path.exists(os.path.join(table, first))
    deleted = dl.vacuum(table, retention_ms=0)
    assert first in deleted
    assert not os.path.exists(os.path.join(table, first))


def _drain_stream(spark, table, ckpt, out_dir):
    """Drain to a parquet sink (the memory sink cannot recover from a
    checkpoint, and restart-continuation is exactly what these tests
    exercise)."""
    from aws_insurancelake_etl_spark.sources import pyds

    pyds.register(spark)
    q = (
        spark.readStream.format("delta_lite").load(table)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_delta_streaming_source_initial_snapshot_then_increments(
    spark, table, tmp_path
):
    """Version-offset streaming: first run delivers the snapshot, a
    restart after an append delivers ONLY the new rows, and a restart
    after OPTIMIZE (dataChange=false) delivers NOTHING — compaction is
    safe under an active stream."""
    dl.write_delta(_people(spark, 0, 3), table)
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    assert _drain_stream(spark, table, ckpt, out).count() == 3
    dl.write_delta(_people(spark, 3, 5), table)
    assert _drain_stream(spark, table, ckpt, out).count() == 5
    dl.optimize(spark, table, target_files=1)
    assert _drain_stream(spark, table, ckpt, out).count() == 5  # no replay
    dl.write_delta(_people(spark, 5, 6), table)
    got = _drain_stream(spark, table, ckpt, out)
    assert got.count() == 6
    assert sorted(r.id for r in got.collect()) == list(range(6))


def test_delta_streaming_source_partitioned_values(spark, table, tmp_path):
    df = _people(spark, 0, 3, "a").unionByName(_people(spark, 3, 5, "b"))
    dl.write_delta(df, table, partition_by=["grp"])
    got = _drain_stream(spark, table, str(tmp_path / "ck"),
                        str(tmp_path / "out"))
    assert _rows(got.select("id", "grp", "score")) == _rows(df)


def test_delta_streaming_starting_version_options(spark, table, tmp_path):
    """startingVersion=N skips the initial snapshot and begins at N's
    dataChange adds; 'latest' sees only post-start commits — the
    backfill-natively-then-tail pattern from PERFORMANCE finding 44."""
    from aws_insurancelake_etl_spark.sources import pyds

    dl.write_delta(_people(spark, 0, 3), table)   # v0
    dl.write_delta(_people(spark, 3, 5), table)   # v1
    pyds.register(spark)

    def drain(opts, ck, out):
        reader = spark.readStream.format("delta_lite")
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (reader.load(table)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out)

    got = drain({"startingVersion": "1"}, str(tmp_path / "c1"),
                str(tmp_path / "o1"))
    assert sorted(r.id for r in got.collect()) == [3, 4]  # v1 only

    ck2, out2 = str(tmp_path / "c2"), str(tmp_path / "o2")
    # 'latest': nothing yet...
    import pyspark.sql.utils  # noqa: F401
    reader = (spark.readStream.format("delta_lite")
              .option("startingVersion", "latest").load(table))
    q = (reader.writeStream.format("parquet").option("path", out2)
         .option("checkpointLocation", ck2)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dl.write_delta(_people(spark, 5, 6), table)   # v2, post-start
    got2 = drain({"startingVersion": "latest"}, ck2, out2)
    assert sorted(r.id for r in got2.collect()) == [5]


def test_history_and_restore(spark, table):
    dl.write_delta(_people(spark, 0, 3), table)              # v0 WRITE
    dl.merge_delta(spark, _people(spark, 3, 5), table, "id")  # v1 MERGE
    dl.delete_delta(spark, table, "id = 0")                   # v2 DELETE
    ops = [h["operation"] for h in dl.history(table)]
    assert ops == ["APPEND", "MERGE", "DELETE"]
    stats = dl.restore(table, 0)
    assert stats["restored_to"] == 0 and stats["version"] == 3
    assert _rows(dl.read_delta(spark, table)) == _rows(_people(spark, 0, 3))
    # the restore is itself a commit: time travel still sees v2's state
    assert dl.read_delta(spark, table, version=2).where("id = 0").count() == 0
    assert [h["operation"] for h in dl.history(table)][-1] == "RESTORE"
    # restore refuses when target files were vacuumed
    dl.write_delta(_people(spark, 9, 10), table, mode="overwrite")  # v4
    dl.vacuum(table, retention_ms=0)
    with pytest.raises(dl.DeltaLiteError, match="vacuumed"):
        dl.restore(table, 0)


def test_streaming_source_refuses_update_commits(spark, table, tmp_path):
    """A MERGE rewrites files whose adds are mostly pre-existing rows:
    the stream must raise (review fix), not silently duplicate — unless
    ignoreChanges opts in, Delta-style."""
    dl.write_delta(_people(spark, 0, 3), table)
    ck, out = str(tmp_path / "c"), str(tmp_path / "o")
    assert _drain_stream(spark, table, ck, out).count() == 3
    dl.merge_delta(
        spark,
        spark.createDataFrame([Row(id=1, grp="a", score=99.0)])
        .select("id", "grp", "score"),
        table,
        "id",
    )
    with pytest.raises(Exception, match="updated or deleted"):
        _drain_stream(spark, table, ck, out)
    # ignoreChanges accepts the duplicates explicitly
    from aws_insurancelake_etl_spark.sources import pyds

    pyds.register(spark)
    q = (spark.readStream.format("delta_lite")
         .option("ignoreChanges", "true").load(table)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.where("score = 99.0").count() == 1  # update arrived
    assert got.count() > 3  # and duplicates were knowingly accepted


def test_history_reports_aged_out_versions_as_none(spark, table):
    for i in range(11):
        dl.write_delta(_people(spark, i, i + 1), table)
    log = os.path.join(table, "_delta_log")
    for v in range(5):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    hist = dl.history(table)
    assert [h["version"] for h in hist] == list(range(11))
    assert all(h["operation"] is None for h in hist[:5])
    assert all(h["operation"] == "APPEND" for h in hist[5:])


def test_merge_data_skipping_via_footer_stats(spark, table):
    """Key-range file skipping from the add actions' parquet-footer
    stats: a key-clustered table merges a narrow key band scanning only
    the overlapping files — corrupt an out-of-range file to prove it is
    never opened."""
    big = spark.createDataFrame(
        [Row(id=i, grp="a", score=float(i)) for i in range(1000)]
    ).select("id", "grp", "score")
    dl.write_delta(
        big.repartitionByRange(8, "id").sortWithinPartitions("id"), table
    )
    snap = dl.snapshot(table)
    assert all(f.stats and "id" in f.stats["minValues"] for f in snap.files)
    # corrupt the file holding the HIGHEST ids; merge keys stay low
    highest = max(snap.files, key=lambda f: f.stats["minValues"]["id"])
    with open(os.path.join(table, highest.path), "wb") as fh:
        fh.write(b"garbage")
    source = spark.createDataFrame(
        [Row(id=5, grp="a", score=-5.0), Row(id=7, grp="a", score=-7.0)]
    ).select("id", "grp", "score")
    stats = dl.merge_delta(spark, source, table, "id")
    assert stats["files_scanned"] < len(snap.files)
    assert stats["files_rewritten"] == 1
    # stats survive the log round-trip as spec JSON strings
    import json as _json

    log0 = os.path.join(table, "_delta_log", f"{0:020d}.json")
    line = next(
        _json.loads(ln) for ln in open(log0) if '"add"' in ln
    )
    assert isinstance(line["add"]["stats"], str)
    assert "minValues" in _json.loads(line["add"]["stats"])


def test_delta_count_is_metadata_only(spark, table):
    dl.write_delta(_people(spark, 0, 7), table)
    dl.write_delta(_people(spark, 7, 10), table)
    assert dl.delta_count(spark, table) == 10
    assert dl.delta_count(spark, table, version=0) == 7
    # metadata-only: corrupt every data file; the count must still work
    for f in dl.snapshot(table).files:
        with open(os.path.join(table, f.path), "wb") as fh:
            fh.write(b"x")
    assert dl.delta_count(spark, table) == 10
    # a stats-less add falls back to scanning (and only that file)
    snap = dl.snapshot(table)
    import json as _json
    extra = _people(spark, 100, 102).coalesce(1)
    extra.write.mode("overwrite").parquet(table + "_stage")
    import glob as _glob
    part = _glob.glob(table + "_stage/part-*.parquet")[0]
    import shutil as _shutil
    _shutil.move(part, os.path.join(table, "nostats.parquet"))
    with open(os.path.join(table, "_delta_log",
                           f"{snap.version + 1:020d}.json"), "x") as fh:
        fh.write(_json.dumps({"add": {
            "path": "nostats.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1, "dataChange": True}}) + "\n")
    assert dl.delta_count(spark, table) == 12


def test_stats_survive_checkpoint_replay(spark, table):
    for i in range(11):
        dl.write_delta(_people(spark, i, i + 1), table)
    log = os.path.join(table, "_delta_log")
    for v in range(11):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    snap = dl.snapshot(table)  # checkpoint-only replay
    # (some part files are empty partitions -> numRecords 0; what
    # matters is that every file still CARRIES stats after the JSON
    # tail aged out)
    assert all(f.stats is not None and "numRecords" in f.stats
               for f in snap.files)
    assert dl.delta_count(spark, table) == 11


# ------------------------------------------------------- change data feed


def _cdf_table(spark, table):
    """v0 create (CDF on), v1 append, v2 MERGE (update id=2, insert
    id=20), v3 DELETE id%4==3."""
    dl.write_delta(
        _people(spark, 0, 8), table,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dl.write_delta(_people(spark, 10, 13, grp="b"), table)
    src = spark.createDataFrame(
        [Row(id=2, grp="U", score=99.0), Row(id=20, grp="N", score=1.0)]
    ).select("id", "grp", "score")
    dl.merge_delta(spark, src, table, "id")
    dl.delete_delta(spark, table, "id % 4 = 3")


def test_change_feed_full_history(spark, table):
    """cdc actions (MERGE/DELETE) read verbatim; append versions derive
    inserts from dataChange add actions — one unioned feed with
    _change_type/_commit_version per PROTOCOL.md."""
    _cdf_table(spark, table)
    feed = dl.read_change_feed(spark, table, starting_version=1)
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in feed.collect()
    )
    assert got == [
        (1, "insert", 10), (1, "insert", 11), (1, "insert", 12),
        (2, "insert", 20),
        (2, "update_postimage", 2), (2, "update_preimage", 2),
        (3, "delete", 3), (3, "delete", 7), (3, "delete", 11),
    ]
    # the preimage carries the OLD row, the postimage the NEW one
    pre = feed.where("_change_type = 'update_preimage'").collect()[0]
    post = feed.where("_change_type = 'update_postimage'").collect()[0]
    assert (pre["grp"], pre["score"]) == ("a", 3.0)
    assert (post["grp"], post["score"]) == ("U", 99.0)
    # change files live under _change_data/, referenced as dataChange=false
    assert os.path.isdir(os.path.join(table, "_change_data"))


def test_change_feed_version_bounds(spark, table):
    _cdf_table(spark, table)
    only_v2 = dl.read_change_feed(spark, table, 2, 2)
    assert {r["_change_type"] for r in only_v2.collect()} == {
        "insert", "update_preimage", "update_postimage"
    }
    with pytest.raises(dl.DeltaLiteError, match="range"):
        dl.read_change_feed(spark, table, 0, 99)


def test_change_feed_derives_overwrite_as_delete_plus_insert(spark, table):
    # CDF was never enabled on this table: matching real Delta's
    # table_changes, the default REFUSES (upstream would not produce
    # this feed — ADVICE r7); allow_derived=True opts into deriving
    # the mechanically-derivable overwrite from its add/remove actions
    dl.write_delta(_people(spark, 0, 3), table)
    dl.write_delta(_people(spark, 5, 7), table, mode="overwrite")
    with pytest.raises(dl.DeltaLiteError, match="allow_derived"):
        dl.read_change_feed(spark, table, 1, 1)
    feed = dl.read_change_feed(spark, table, 1, 1, allow_derived=True)
    got = sorted((r["_change_type"], r["id"]) for r in feed.collect())
    assert got == [
        ("delete", 0), ("delete", 1), ("delete", 2),
        ("insert", 5), ("insert", 6),
    ]


def test_change_feed_refuses_uncovered_merge(spark, table):
    """A MERGE committed without the feed enabled cannot be derived from
    add/remove (its rewrites mix survivors with updates) — loud error,
    not a wrong feed."""
    dl.write_delta(_people(spark, 0, 4), table)  # CDF off
    src = spark.createDataFrame([Row(id=1, grp="U", score=0.0)]).select(
        "id", "grp", "score"
    )
    dl.merge_delta(spark, src, table, "id")
    with pytest.raises(dl.DeltaLiteError, match="enableChangeDataFeed"):
        dl.read_change_feed(spark, table, 1, 1)


def test_change_feed_disabled_merge_writes_no_cdc_files(spark, table):
    dl.write_delta(_people(spark, 0, 4), table)
    src = spark.createDataFrame([Row(id=9, grp="c", score=0.0)]).select(
        "id", "grp", "score"
    )
    dl.merge_delta(spark, src, table, "id")
    assert not os.path.isdir(os.path.join(table, "_change_data"))


def test_change_feed_partitioned_table(spark, table):
    """cdc files carry partition columns inline; derived inserts take
    partition values from the LOG (files exclude them)."""
    dl.write_delta(
        _people(spark, 0, 6), table, partition_by=["grp"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    src = spark.createDataFrame(
        [Row(id=1, grp="a", score=-1.0), Row(id=30, grp="z", score=5.0)]
    ).select("id", "grp", "score")
    dl.merge_delta(spark, src, table, "id")
    feed = dl.read_change_feed(spark, table, 1, 1)
    got = sorted((r["_change_type"], r["id"], r["grp"]) for r in feed.collect())
    assert got == [
        ("insert", 30, "z"),
        ("update_postimage", 1, "a"),
        ("update_preimage", 1, "a"),
    ]


def test_checkpoint_preserves_table_configuration(spark, table):
    """Table properties (CDF, column mapping) must survive checkpoint-
    only replay: once the JSON tail ages out, the checkpoint metaData
    row is their only carrier (round-8 fix — they were dropped)."""
    dl.write_delta(
        _people(spark, 0, 2), table,
        configuration={"delta.enableChangeDataFeed": "true",
                       "custom.prop": "42"},
    )
    dl._write_checkpoint(table, 0)
    log = os.path.join(table, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))
    snap = dl.snapshot(table)
    assert snap.configuration == {
        "delta.enableChangeDataFeed": "true", "custom.prop": "42"
    }
    # and a MERGE against the checkpoint-only table still writes cdc
    src = spark.createDataFrame([Row(id=1, grp="U", score=9.9)]).select(
        "id", "grp", "score"
    )
    dl.merge_delta(spark, src, table, "id")
    assert os.path.isdir(os.path.join(table, "_change_data"))


def test_timestamp_as_of(spark, table):
    import json as _json
    import os as _os

    dl.write_delta(_people(spark, 0, 3), table)
    dl.write_delta(_people(spark, 3, 6), table)
    dl.write_delta(_people(spark, 6, 9), table)
    # pin deterministic commit timestamps into the commitInfo actions
    log = _os.path.join(table, "_delta_log")
    for v, ts in ((0, 1000), (1, 2000), (2, 3000)):
        commit = _os.path.join(log, f"{v:020d}.json")
        lines = [_json.loads(l) for l in open(commit) if l.strip()]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        _os.remove(commit)
        with open(commit, "x") as fh:
            for a in lines:
                fh.write(_json.dumps(a) + "\n")
    assert dl.version_as_of_timestamp(table, 2500) == 1
    assert dl.read_delta(spark, table, timestamp_ms=2500).count() == 6
    assert dl.read_delta(spark, table, timestamp_ms=999999).count() == 9
    with pytest.raises(dl.DeltaLiteError, match="predates"):
        dl.read_delta(spark, table, timestamp_ms=500)
    with pytest.raises(dl.DeltaLiteError, match="not both"):
        dl.read_delta(spark, table, version=1, timestamp_ms=2500)


def test_streaming_source_fails_on_mid_stream_schema_change(
    spark, table, tmp_path
):
    """A RENAME/DROP COLUMN between drains changes the schema the
    running stream bound at start — the source must fail the batch
    (delta-spark behavior), never read the renamed column as nulls.
    Metadata-only commits that do NOT change the schema (CHECK
    constraint add) stream through fine."""
    dl.write_delta(
        _people(spark, 0, 3), table,
        column_mapping="name",
    )
    ck, out = str(tmp_path / "c"), str(tmp_path / "o")
    assert _drain_stream(spark, table, ck, out).count() == 3
    # a schema-neutral metadata commit does not trip the guard
    dl.add_check_constraint(spark, table, "pos", "score >= 0")
    dl.write_delta(_people(spark, 3, 4), table)
    assert _drain_stream(spark, table, ck, out).count() == 4
    dl.drop_check_constraint(table, "pos")
    dl.rename_column(table, "score", "points")
    dl.write_delta(
        _people(spark, 4, 5).withColumnRenamed("score", "points"), table
    )
    with pytest.raises(Exception, match="changed the table schema"):
        _drain_stream(spark, table, ck, out)


def test_merge_insert_only_out_of_bounds_keys(spark, tmp_path):
    """Delta twin of the iceberg out-of-bounds MERGE: stats skipping
    leaves zero searchable files; the merge must append cleanly."""
    from aws_insurancelake_etl_spark.sources import delta_lite as dl

    path = str(tmp_path / "oob")
    dl.write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        path,
    )
    res = dl.merge_delta(
        spark,
        spark.createDataFrame([(100, "x")], "id int, v string"),
        path,
        keys=["id"],
    )
    assert res["files_rewritten"] == 0
    assert dl.read_delta(spark, path).count() == 3


def test_history_carries_operation_metrics(spark, tmp_path):
    """Round 11: write commits record delta-spark-shaped
    operationMetrics (numFiles/numOutputRows/numOutputBytes) and
    DESCRIBE HISTORY surfaces them."""
    path = str(tmp_path / "om")
    dl.write_delta(
        spark.range(7).selectExpr("id").coalesce(2), path
    )
    m = dl.history(path)[0]["operationMetrics"]
    assert m["numOutputRows"] == "7"
    assert int(m["numFiles"]) >= 1
    assert int(m["numOutputBytes"]) > 0
