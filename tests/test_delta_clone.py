"""SHALLOW CLONE (round 9): a version-0 commit referencing the source
snapshot's data files by ABSOLUTE path (PROTOCOL.md allows absolute
add paths) — zero data bytes copied.  The clone must read identically,
evolve independently (appends/deletes/vacuum stay inside its root),
and carry deletion vectors / column mapping / protocol forward.
Reference parity: Databricks ``CREATE TABLE ... SHALLOW CLONE`` — the
dev-copy workflow for the reference's Consume-layer Iceberg/Delta
tables."""

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.queries.pipeline_ops import (
    add_deletion_vector,
)
from aws_insurancelake_etl_spark.sources import delta_lite as dl


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _parquet_under(path):
    return [
        p
        for p in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
        if "_delta_log" not in p
    ]


@pytest.fixture()
def source(spark, tmp_path):
    path = str(tmp_path / "src")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i % 2 == 0 else "b", v=float(i))
         for i in range(20)]
    ).select("id", "grp", "v")
    dl.write_delta(df, path, partition_by=["grp"])
    return path


def test_shallow_clone_reads_equal_source_zero_bytes_copied(
    spark, source, tmp_path
):
    dst = str(tmp_path / "cl")
    res = dl.clone_delta(source, dst)
    assert res == {"version": 0, "files": res["files"], "source_version": 0}
    assert _ids(dl.read_delta(spark, dst)) == list(range(20))
    # zero data bytes copied: no parquet under the clone at all
    assert _parquet_under(dst) == []
    # partition pruning still works off the log literals
    pruned = dl.read_delta(spark, dst, partition_filter={"grp": "a"})
    assert _ids(pruned) == list(range(0, 20, 2))


def test_clone_evolves_independently_of_source(spark, source, tmp_path):
    dst = str(tmp_path / "cl")
    dl.clone_delta(source, dst)
    # append lands INSIDE the clone
    extra = spark.createDataFrame(
        [Row(id=100, grp="a", v=100.0)]
    ).select("id", "grp", "v")
    dl.write_delta(extra, dst, mode="append")
    assert len(_parquet_under(dst)) == 1
    assert 100 in _ids(dl.read_delta(spark, dst))
    assert 100 not in _ids(dl.read_delta(spark, source))
    # copy-on-write delete rewrites into the clone; source unchanged
    res = dl.delete_delta(spark, dst, "id < 5")
    assert res["rows_deleted"] == 5
    assert _ids(dl.read_delta(spark, dst)) == list(range(5, 20)) + [100]
    assert _ids(dl.read_delta(spark, source)) == list(range(20))


def test_clone_vacuum_never_reaches_into_source(spark, source, tmp_path):
    dst = str(tmp_path / "cl")
    dl.clone_delta(source, dst)
    dl.delete_delta(spark, dst, "id >= 0")  # tombstone every source file
    src_files_before = set(_parquet_under(source))
    deleted = dl.vacuum(dst, retention_ms=0)
    # nothing outside the clone root was touched
    assert set(_parquet_under(source)) == src_files_before
    assert all(not os.path.isabs(rel) for rel in deleted)
    assert _ids(dl.read_delta(spark, source)) == list(range(20))
    assert _ids(dl.read_delta(spark, dst)) == []


def test_clone_carries_deletion_vectors_as_absolute(spark, tmp_path):
    src = str(tmp_path / "src_dv")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v")
        .orderBy("id")
        .coalesce(1)
    )
    dl.write_delta(df, src)
    rel = dl.snapshot(src).files[-1].path
    add_deletion_vector(spark, src, rel, [0, 3, 7], storage="u")
    dst = str(tmp_path / "cl_dv")
    dl.clone_delta(src, dst)
    assert _ids(dl.read_delta(spark, dst)) == [1, 2, 4, 5, 6, 8, 9]
    dv = dl.snapshot(dst).files[0].deletion_vector
    assert dv["storageType"] == "p"
    assert os.path.isabs(dv["pathOrInlineDv"])


def test_clone_version_as_of_pins_the_source_snapshot(spark, tmp_path):
    src = str(tmp_path / "src_tt")
    one = spark.createDataFrame([Row(id=1)]).select("id")
    two = spark.createDataFrame([Row(id=2)]).select("id")
    dl.write_delta(one, src)
    dl.write_delta(two, src, mode="append")
    dst = str(tmp_path / "cl_tt")
    res = dl.clone_delta(src, dst, version=0)
    assert res["source_version"] == 0
    assert _ids(dl.read_delta(spark, dst)) == [1]
    # clone history starts at ITS version 0
    assert dl.snapshot(dst).version == 0


def test_clone_refuses_existing_delta_target(spark, source, tmp_path):
    dst = str(tmp_path / "cl")
    dl.clone_delta(source, dst)
    with pytest.raises(dl.DeltaLiteError, match="already a delta table"):
        dl.clone_delta(source, dst)


def test_clone_of_clone_keeps_absolute_paths_valid(spark, source, tmp_path):
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    dl.clone_delta(source, c1)
    dl.clone_delta(c1, c2)
    assert _ids(dl.read_delta(spark, c2)) == list(range(20))
    assert _parquet_under(c2) == []


def test_clone_of_column_mapped_table_stays_mapped(spark, tmp_path):
    src = str(tmp_path / "src_cm")
    df = spark.createDataFrame(
        [Row(id=i, s=chr(97 + i)) for i in range(5)]
    ).select("id", "s")
    dl.write_delta(df, src, column_mapping="name")
    dst = str(tmp_path / "cl_cm")
    dl.clone_delta(src, dst)
    snap = dl.snapshot(dst)
    assert snap.configuration.get("delta.columnMapping.mode") == "name"
    assert snap.protocol["minReaderVersion"] >= 2
    got = dl.read_delta(spark, dst)
    assert sorted((r.id, r.s) for r in got.collect()) == [
        (i, chr(97 + i)) for i in range(5)
    ]


def test_clone_dv_delete_on_external_files(spark, tmp_path):
    """Deletion-vector DELETE on a clone: the DV sidecar lands in the
    CLONE (the clone never writes into the source), the re-added
    action keeps the absolute source path, and the source table is
    untouched."""
    src = str(tmp_path / "src")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v")
        .orderBy("id")
        .coalesce(1)
    )
    dl.write_delta(df, src)
    dst = str(tmp_path / "cl")
    dl.clone_delta(src, dst)
    res = dl.delete_delta(spark, dst, "id IN (2, 5)",
                          use_deletion_vectors=True)
    assert res["rows_deleted"] == 2 and res["files_rewritten"] == 0
    assert _ids(dl.read_delta(spark, dst)) == [0, 1, 3, 4, 6, 7, 8, 9]
    assert _ids(dl.read_delta(spark, src)) == list(range(10))
    # the DV sidecar lives under the CLONE root
    import glob as _glob

    assert _glob.glob(os.path.join(dst, "deletion_vector_*.bin"))
    assert not _glob.glob(os.path.join(src, "deletion_vector_*.bin"))
    # the re-added file still points at the source bytes
    f = dl.snapshot(dst).files[0]
    assert os.path.isabs(f.path) and f.deletion_vector is not None


def test_partition_delete_is_metadata_only(spark, source, tmp_path):
    """DELETE WHERE <partition predicate>: pure remove actions, zero
    data files opened or rewritten — the retention-sweep shape."""
    res = dl.delete_delta(spark, source, "grp = 'a'")
    assert res.get("metadata_only") is True
    assert res["files_rewritten"] == 0 and res["files_removed"] >= 1
    assert res["rows_deleted"] == 10
    assert _ids(dl.read_delta(spark, source)) == list(range(1, 20, 2))
    # no new parquet appeared (nothing was rewritten)
    # (the partition dirs still hold the removed files until vacuum)
    assert res["version"] == 1
    # non-matching partition predicate: no-op without a commit
    res2 = dl.delete_delta(spark, source, "grp = 'zzz'")
    assert res2["rows_deleted"] == 0 and res2["version"] == 1
    # data-column predicates still take the rewrite path
    res3 = dl.delete_delta(spark, source, "id = 1")
    assert "metadata_only" not in res3 and res3["rows_deleted"] == 1
