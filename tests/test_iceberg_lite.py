"""iceberg_lite: manifest-tree reads of spec-conformant Iceberg v2
tables — snapshot time travel, identity-partition pruning at the
manifest level, path rebasing for relocated tables, POSITION deletes
(merge-on-read, incl. the sequence-number visibility rule), and honest
errors for equality deletes.  Reference parity: the Iceberg scan at
``etl_consume_entity_match.py:395-397`` over a format-version-2 table
(created at ``etl_consume_entity_match.py:385-389``) whose MERGE
history produces position deletes on any real deployment."""

import json
import os

import pytest
from pyspark.sql import Row

from aws_insurancelake_etl_spark.queries.pipeline_ops import build_iceberg_table
from aws_insurancelake_etl_spark.sources import avro_lite, iceberg_lite


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    snap1 = spark.createDataFrame(
        [Row(id=i, grp="a" if i < 3 else "b", v=float(i)) for i in range(6)]
    ).select("id", "grp", "v")
    snap2 = spark.createDataFrame(
        [Row(id=i, grp="c", v=float(i)) for i in range(10, 13)]
    ).select("id", "grp", "v")
    build_iceberg_table(spark, path, [snap1, snap2], "grp")
    return path


def test_latest_snapshot_reads_all(spark, table):
    df = iceberg_lite.read_iceberg(spark, table)
    assert df.count() == 9
    assert {r.grp for r in df.select("grp").distinct().collect()} == {"a", "b", "c"}


def test_time_travel_to_first_snapshot(spark, table):
    assert iceberg_lite.snapshot_ids(table) == [1, 2]
    df = iceberg_lite.read_iceberg(spark, table, snapshot_id=1)
    assert df.count() == 6
    assert {r.grp for r in df.select("grp").distinct().collect()} == {"a", "b"}
    with pytest.raises(iceberg_lite.IcebergLiteError, match="snapshot 99"):
        iceberg_lite.plan_files(table, snapshot_id=99)


def test_partition_pruning_happens_on_manifests(spark, table):
    all_files = iceberg_lite.plan_files(table)
    pruned = iceberg_lite.plan_files(table, partition_filter={"grp": "b"})
    assert len(pruned) == 1 and len(all_files) == 3
    assert pruned[0].partition == {"grp": "b"}
    df = iceberg_lite.read_iceberg(spark, table, partition_filter={"grp": "b"})
    assert sorted(r.id for r in df.collect()) == [3, 4, 5]


def test_paths_rebase_from_original_location(table):
    """The builder writes FAKE original-location URIs into every
    manifest; resolving them proves the relocation path."""
    meta = json.load(
        open(os.path.join(table, "metadata", "v2.metadata.json"))
    )
    assert meta["location"].startswith("file:///warehouse/orig")
    for f in iceberg_lite.plan_files(table):
        assert f.path.startswith(table)
        assert os.path.exists(f.path)


def test_position_deletes_applied(spark, tmp_path):
    """v2 merge-on-read: a delete snapshot's position-delete file drops
    exactly the named (file, row-ordinal) pairs; time travel to the
    pre-delete snapshot still sees every row.  The builder writes each
    partition's rows in input order, so ordinal i = i-th input row."""
    path = str(tmp_path / "mor")
    snap1 = spark.createDataFrame(
        [Row(id=i, grp="a" if i < 4 else "b", v=float(i)) for i in range(8)]
    ).select("id", "grp", "v").coalesce(1).sortWithinPartitions("id")
    empty = snap1.where("1=0")
    build_iceberg_table(
        spark, path, [snap1, empty], "grp",
        position_deletes={
            2: [("data/grp=a/f1-a.parquet", [0, 2]),
                ("data/grp=b/f1-b.parquet", [3])],
        },
    )
    latest = iceberg_lite.read_iceberg(spark, path)
    # grp=a file rows are ids [0,1,2,3] -> drop ordinals 0,2 = ids 0,2;
    # grp=b file rows are ids [4,5,6,7] -> drop ordinal 3 = id 7
    assert sorted(r.id for r in latest.collect()) == [1, 3, 4, 5, 6]
    time_travel = iceberg_lite.read_iceberg(spark, path, snapshot_id=1)
    assert time_travel.count() == 8
    data, deletes = iceberg_lite.plan_scan(path)
    assert len(data) == 2 and len(deletes) == 2
    assert all(d.sequence_number == 2 for d in deletes)
    # delete files live under the table after rebase
    assert all(os.path.exists(d.path) for d in deletes)


def test_position_delete_sequence_rule(spark, tmp_path):
    """A delete file only applies to data files with data sequence
    number <= the delete's (spec: Scan Planning).  A doctored delete at
    seq 2 forward-referencing a file added at seq 3 must NOT drop that
    file's rows — without the rule a compaction-rewritten file would
    lose rows to stale deletes."""
    path = str(tmp_path / "seq")
    mk = lambda ids, grp: spark.createDataFrame(
        [Row(id=i, grp=grp, v=float(i)) for i in ids]
    ).select("id", "grp", "v").coalesce(1).sortWithinPartitions("id")
    empty = mk(range(4), "a").where("1=0")
    build_iceberg_table(
        spark, path, [mk(range(4), "a"), empty, mk(range(10, 14), "c")],
        "grp",
        position_deletes={
            2: [("data/grp=a/f1-a.parquet", [1]),      # applies: 2 >= 1
                ("data/grp=c/f3-c.parquet", [0, 1])],  # ignored: 2 < 3
        },
    )
    rows = sorted(r.id for r in iceberg_lite.read_iceberg(spark, path).collect())
    assert rows == [0, 2, 3, 10, 11, 12, 13]


def test_equality_delete_raises(spark, tmp_path):
    """Equality deletes (data_file.content=2) must be a loud error, not
    a silently-wrong read."""
    path = str(tmp_path / "eq")
    snap1 = spark.createDataFrame(
        [Row(id=i, grp="a", v=float(i)) for i in range(4)]
    ).select("id", "grp", "v")
    empty = snap1.where("1=0")
    build_iceberg_table(
        spark, path, [snap1, empty], "grp",
        position_deletes={2: [("data/grp=a/f1-a.parquet", [0])]},
    )
    # rewrite the delete manifest's entry content 1 -> 2
    dman = os.path.join(path, "metadata", "delete-manifest-2.avro")
    names, rows = avro_lite.read_avro(dman)
    import io as _io

    with open(dman, "rb") as fh:
        meta, _ = avro_lite.read_header(_io.BytesIO(fh.read()))
    schema = json.loads(meta["avro.schema"].decode())
    doctored = []
    for status, snap_id, df in (tuple(r) for r in rows):
        df = (2,) + tuple(df)[1:]
        doctored.append((status, snap_id, df))
    avro_lite.write_avro(
        dman, [f["name"] for f in schema["fields"]],
        [f["type"] for f in schema["fields"]], doctored,
        record_name="manifest_entry",
    )
    with pytest.raises(iceberg_lite.IcebergLiteError, match="EQUALITY"):
        iceberg_lite.plan_scan(path)


def test_not_a_table_raises(tmp_path):
    with pytest.raises(iceberg_lite.IcebergLiteError, match="metadata"):
        iceberg_lite.plan_files(str(tmp_path / "nope"))


def test_snapshot_as_of_timestamp(table):
    """The builder stamps snapshot N at 1700000000000 + N ms."""
    base = 1700000000000
    assert iceberg_lite.snapshot_as_of_timestamp(table, base + 1) == 1
    assert iceberg_lite.snapshot_as_of_timestamp(table, base + 99) == 2
    assert iceberg_lite.snapshot_as_of_timestamp(table, base - 1) is None
