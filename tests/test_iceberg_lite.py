"""iceberg_lite: manifest-tree reads of spec-conformant Iceberg v2
tables — snapshot time travel, identity-partition pruning at the
manifest level, path rebasing for relocated tables, and honest errors
for v2 delete files.  Reference parity: the Iceberg scan at
``etl_consume_entity_match.py:395-397``."""

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


def test_delete_manifest_raises(spark, table):
    """A v2 delete manifest (content=1) must be a loud error, not a
    silently-wrong read."""
    ml_path = os.path.join(table, "metadata", "snap-2.avro")
    names, rows = avro_lite.read_avro(ml_path)
    types = ["string", "long", "int", "int", "long"]
    doctored = [tuple(r) for r in rows]
    doctored.append((doctored[0][0], doctored[0][1], 0, 1, 7))
    avro_lite.write_avro(ml_path, names, types, doctored,
                         record_name="manifest_file")
    with pytest.raises(iceberg_lite.IcebergLiteError, match="DELETE manifests"):
        iceberg_lite.plan_files(table)


def test_not_a_table_raises(tmp_path):
    with pytest.raises(iceberg_lite.IcebergLiteError, match="metadata"):
        iceberg_lite.plan_files(str(tmp_path / "nope"))


def test_snapshot_as_of_timestamp(table):
    """The builder stamps snapshot N at 1700000000000 + N ms."""
    base = 1700000000000
    assert iceberg_lite.snapshot_as_of_timestamp(table, base + 1) == 1
    assert iceberg_lite.snapshot_as_of_timestamp(table, base + 99) == 2
    assert iceberg_lite.snapshot_as_of_timestamp(table, base - 1) is None
