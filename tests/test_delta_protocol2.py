"""Delta reader protocol >= 2: DELETION VECTORS and COLUMN MAPPING
(round 8, VERDICT r7 item 2).  Modern Delta tables (Databricks
defaults, delta-rs >= 0.15) routinely carry both; a reader advertising
open-protocol compat must read them, not refuse.  Fixtures are built by
the independent encoder in ``queries.pipeline_ops``
(``add_deletion_vector`` / ``build_column_mapped_table``) — the reader
under test (``sources/delta_lite.py``) shares only the byte-level spec
(PROTOCOL.md; RoaringFormatSpec)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.queries.pipeline_ops import (
    add_deletion_vector,
    build_column_mapped_table,
)
from aws_insurancelake_etl_spark.sources import delta_lite as dl
from aws_insurancelake_etl_spark.sources import roaring


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _one_file_table(spark, path, lo, hi):
    """One sorted single-file commit: row position p == p-th smallest id."""
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(lo, hi)])
        .select("id", "v")
        .orderBy("id")
        .coalesce(1)
    )
    dl.write_delta(df, path)
    return dl.snapshot(path).files[-1].path


# ------------------------------------------------------------ roaring


def test_roaring_roundtrip_dense_and_multibucket():
    vals = list(range(5000)) + [2**32 + 5, 2**33]
    assert roaring.decode_delta_dv(roaring.encode_delta_dv(vals)) == sorted(vals)


def test_roaring_rejects_bad_magic():
    with pytest.raises(roaring.RoaringError, match="magic"):
        roaring.decode_delta_dv(b"\x00" * 16)


def test_z85_spec_vector():
    # the reference vector from the Z85 spec (rfc.zeromq.org/spec/32)
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert roaring.z85_encode(raw) == "HelloWorld"
    assert roaring.z85_decode("HelloWorld") == raw


# ----------------------------------------------------- deletion vectors


def test_dv_hides_rows_file_storage(spark, tmp_path):
    path = str(tmp_path / "dv_u")
    rel = _one_file_table(spark, path, 0, 10)
    add_deletion_vector(spark, path, rel, [0, 3, 7], storage="u")
    assert _ids(dl.read_delta(spark, path)) == [1, 2, 4, 5, 6, 8, 9]


def test_dv_hides_rows_inline_storage(spark, tmp_path):
    path = str(tmp_path / "dv_i")
    rel = _one_file_table(spark, path, 0, 8)
    add_deletion_vector(spark, path, rel, [1, 2], storage="i")
    assert _ids(dl.read_delta(spark, path)) == [0, 3, 4, 5, 6, 7]


def test_dv_applies_per_file_not_globally(spark, tmp_path):
    path = str(tmp_path / "dv_two")
    rel_a = _one_file_table(spark, path, 0, 5)
    _one_file_table(spark, path, 10, 15)  # second commit, second file
    # position 0 deleted ONLY in file A; file B's position 0 (id=10)
    # must survive
    add_deletion_vector(spark, path, rel_a, [0])
    assert _ids(dl.read_delta(spark, path)) == [1, 2, 3, 4, 10, 11, 12, 13, 14]


def test_dv_time_travel_sees_pre_dv_rows(spark, tmp_path):
    path = str(tmp_path / "dv_tt")
    rel = _one_file_table(spark, path, 0, 6)
    add_deletion_vector(spark, path, rel, [5])
    assert _ids(dl.read_delta(spark, path, version=0)) == list(range(6))
    assert _ids(dl.read_delta(spark, path)) == list(range(5))


def test_dv_delta_count_subtracts_cardinality(spark, tmp_path):
    path = str(tmp_path / "dv_cnt")
    rel = _one_file_table(spark, path, 0, 9)
    add_deletion_vector(spark, path, rel, [2, 4, 6])
    assert dl.delta_count(spark, path) == 6


def test_dv_checksum_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "dv_crc")
    rel = _one_file_table(spark, path, 0, 6)
    add_deletion_vector(spark, path, rel, [1], storage="u")
    # corrupt the DV payload on disk (keep size + CRC fields)
    (dv_file,) = [
        n for n in os.listdir(path) if n.startswith("deletion_vector_")
    ]
    full = os.path.join(path, dv_file)
    blob = bytearray(open(full, "rb").read())
    blob[8] ^= 0xFF
    open(full, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="checksum|magic|cookie"):
        dl.read_delta(spark, path).collect()


def test_dv_merge_rewrites_touched_file_and_drops_its_dv(spark, tmp_path):
    """MERGE on a DV-carrying table: the touched file's survivors are
    the DV-FILTERED rows (a resurrection would differ), the rewrite
    drops the DV, untouched DVs persist by reference."""
    path = str(tmp_path / "dv_merge")
    rel = _one_file_table(spark, path, 0, 6)
    add_deletion_vector(spark, path, rel, [0])  # id=0 deleted
    src = spark.createDataFrame([Row(id=3, v=300.0)]).select("id", "v")
    dl.merge_delta(spark, src, path, "id")
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 300.0, 4: 4.0, 5: 5.0}
    assert all(f.deletion_vector is None for f in dl.snapshot(path).files)


def test_dv_restore_carries_dv_back(spark, tmp_path):
    path = str(tmp_path / "dv_restore")
    rel = _one_file_table(spark, path, 0, 6)
    add_deletion_vector(spark, path, rel, [1, 2])  # v1
    dl.write_delta(
        spark.createDataFrame([Row(id=50, v=50.0)]).select("id", "v"),
        path,
        mode="overwrite",
    )  # v2
    dl.restore(path, 1)
    assert _ids(dl.read_delta(spark, path)) == [0, 3, 4, 5]


def test_dv_change_feed_derivation_refuses(spark, tmp_path):
    path = str(tmp_path / "dv_cdf")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
        .select("id", "v")
        .orderBy("id")
        .coalesce(1)
    )
    dl.write_delta(
        df, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    rel = dl.snapshot(path).files[-1].path
    add_deletion_vector(spark, path, rel, [1])
    with pytest.raises(dl.DeltaLiteError, match="deletion vector"):
        dl.read_change_feed(spark, path, 1, 1).collect()


# ------------------------------------------------------- column mapping


@pytest.fixture()
def mapped(spark, tmp_path):
    path = str(tmp_path / "cm")
    df = spark.createDataFrame(
        [
            Row(id=i, grp="a" if i % 2 == 0 else "b", score=float(i))
            for i in range(10)
        ]
    ).select("id", "grp", "score")
    build_column_mapped_table(
        spark,
        df,
        path,
        physical={
            "id": "col-9a1b",
            "grp": "col-7f3e",
            "score": "col-0c42",
        },
        partition_by=["grp"],
    )
    return path


def test_column_mapping_reads_logical_names(spark, mapped):
    df = dl.read_delta(spark, mapped)
    assert df.columns == ["id", "grp", "score"]
    assert df.count() == 10
    assert _ids(df) == list(range(10))
    got = {(r["id"], r["grp"]) for r in df.collect()}
    assert (0, "a") in got and (1, "b") in got


def test_column_mapping_files_are_physical_on_disk(spark, mapped):
    """Prove the fixture exercises mapping: the raw parquet carries
    PHYSICAL names and physical partition dirs."""
    snap = dl.snapshot(mapped)
    raw = spark.read.parquet(os.path.join(mapped, snap.files[0].path))
    assert "col-9a1b" in raw.columns and "id" not in raw.columns
    assert snap.files[0].path.startswith("col-7f3e=")


def test_column_mapping_partition_filter_uses_logical_names(spark, mapped):
    df = dl.read_delta(spark, mapped, partition_filter={"grp": "a"})
    assert _ids(df) == [0, 2, 4, 6, 8]


def test_column_mapping_append_physicalizes(spark, mapped):
    """round 8: writes to mapped tables physicalize through the schema
    metadata — the appended parquet carries PHYSICAL names and lands in
    a physical partition dir, and reads stay logical."""
    df = spark.createDataFrame([Row(id=99, grp="a", score=9.0)]).select(
        "id", "grp", "score"
    )
    dl.write_delta(df, mapped)
    back = dl.read_delta(spark, mapped)
    assert back.count() == 11 and 99 in _ids(back)
    snap = dl.snapshot(mapped)
    for f in snap.files:
        assert f.path.startswith("col-7f3e=")
        raw = spark.read.parquet(os.path.join(mapped, f.path))
        assert "col-9a1b" in raw.columns and "id" not in raw.columns
        assert set(f.partition_values) == {"col-7f3e"}


def test_column_mapping_merge_and_delete(spark, mapped):
    src = spark.createDataFrame(
        [Row(id=0, grp="a", score=999.0), Row(id=77, grp="b", score=7.0)]
    ).select("id", "grp", "score")
    dl.merge_delta(spark, src, mapped, "id")
    got = {r["id"]: r["score"] for r in dl.read_delta(spark, mapped).collect()}
    assert got[0] == 999.0 and got[77] == 7.0 and len(got) == 11
    dl.delete_delta(spark, mapped, "id = 3")
    assert 3 not in _ids(dl.read_delta(spark, mapped))
    dl.optimize(spark, mapped, target_files=2)
    assert len(_ids(dl.read_delta(spark, mapped))) == 10


def test_column_mapping_create_via_write_delta(spark, tmp_path):
    path = str(tmp_path / "cm_create")
    df = spark.createDataFrame(
        [Row(id=i, grp="x" if i % 2 else "y", score=float(i))
         for i in range(6)]
    ).select("id", "grp", "score")
    dl.write_delta(df, path, partition_by=["grp"], column_mapping="name")
    snap = dl.snapshot(path)
    assert _column_mapping_mode_of(snap) == "name"
    assert snap.protocol["minReaderVersion"] == 2
    phys = {
        f.name: f.metadata["delta.columnMapping.physicalName"]
        for f in snap.schema.fields
    }
    assert all(p.startswith("col-") for p in phys.values())
    ids = {f.metadata["delta.columnMapping.id"] for f in snap.schema.fields}
    assert ids == {1, 2, 3}
    raw = spark.read.parquet(os.path.join(path, snap.files[0].path))
    assert set(raw.columns) <= set(phys.values())
    assert _ids(dl.read_delta(spark, path)) == list(range(6))
    assert _ids(
        dl.read_delta(spark, path, partition_filter={"grp": "y"})
    ) == [0, 2, 4]


def _column_mapping_mode_of(snap):
    return snap.configuration.get("delta.columnMapping.mode", "none")


def test_column_mapping_evolve_mints_new_field_id(spark, tmp_path):
    path = str(tmp_path / "cm_evolve")
    df = spark.createDataFrame([Row(id=1, score=1.0)]).select("id", "score")
    dl.write_delta(df, path, column_mapping="name")
    wider = spark.createDataFrame(
        [Row(id=2, score=2.0, extra="e")]
    ).select("id", "score", "extra")
    dl.write_delta(wider, path, schema_mode="evolve")
    snap = dl.snapshot(path)
    by_name = {f.name: f.metadata for f in snap.schema.fields}
    assert by_name["extra"]["delta.columnMapping.id"] == 3
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    got = {(r["id"], r["extra"]) for r in dl.read_delta(spark, path).collect()}
    assert got == {(1, None), (2, "e")}


def test_column_mapping_cdf_roundtrip(spark, tmp_path):
    path = str(tmp_path / "cm_cdf")
    df = spark.createDataFrame(
        [Row(id=i, score=float(i)) for i in range(6)]
    ).select("id", "score")
    dl.write_delta(
        df, path, column_mapping="name",
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    src = spark.createDataFrame([Row(id=2, score=200.0)]).select("id", "score")
    dl.merge_delta(spark, src, path, "id")
    feed = dl.read_change_feed(spark, path, 1, 1)
    got = sorted(
        (r["_change_type"], r["id"], r["score"]) for r in feed.collect()
    )
    assert got == [
        ("update_postimage", 2, 200.0), ("update_preimage", 2, 2.0),
    ]


def test_column_mapping_schema_changing_overwrite_remaps(spark, tmp_path):
    """Round 10 (closes a named refusal): overwriteSchema on a mapped
    table — survivors keep (id, physicalName) matched by logical name,
    new columns mint past maxColumnId, dropped ids retire forever."""
    path = str(tmp_path / "cm_ow")
    dl.write_delta(
        spark.createDataFrame(
            [(1, "a", 1.0)], "id int, name string, score double"
        ),
        path,
        column_mapping="name",
    )
    before = {
        f.name: dict(f.metadata)
        for f in dl.snapshot(path).schema.fields
    }
    dl.write_delta(
        spark.createDataFrame(
            [(2, "b", "NYC")], "id int, name string, city string"
        ),
        path,
        mode="overwrite",
    )
    snap = dl.snapshot(path)
    after = {f.name: dict(f.metadata) for f in snap.schema.fields}
    for c in ("id", "name"):
        assert (
            after[c]["delta.columnMapping.id"]
            == before[c]["delta.columnMapping.id"]
        )
        assert (
            after[c]["delta.columnMapping.physicalName"]
            == before[c]["delta.columnMapping.physicalName"]
        )
    assert "score" not in after
    old_max = max(m["delta.columnMapping.id"] for m in before.values())
    assert after["city"]["delta.columnMapping.id"] > old_max
    assert int(
        snap.configuration["delta.columnMapping.maxColumnId"]
    ) >= after["city"]["delta.columnMapping.id"]
    rows = dl.read_delta(spark, path).collect()
    assert [(r["id"], r["city"]) for r in rows] == [(2, "NYC")]
    # a later append physicalizes through the remapped schema
    dl.write_delta(
        spark.createDataFrame(
            [(3, "c", "LA")], "id int, name string, city string"
        ),
        path,
    )
    assert dl.read_delta(spark, path).count() == 2


def test_column_mapping_nested_overwrite_keeps_surviving_ids(
    spark, tmp_path
):
    path = str(tmp_path / "cm_ow_nested")
    dl.write_delta(
        spark.createDataFrame(
            [(1, ("x", 5))], "id int, info struct<name:string, score:int>"
        ),
        path,
        column_mapping="name",
    )
    info0 = next(
        f for f in dl.snapshot(path).schema.fields if f.name == "info"
    )
    n0 = {f.name: dict(f.metadata) for f in info0.dataType.fields}
    dl.write_delta(
        spark.createDataFrame(
            [(2, ("y", "NYC"))],
            "id int, info struct<name:string, city:string>",
        ),
        path,
        mode="overwrite",
    )
    info1 = next(
        f for f in dl.snapshot(path).schema.fields if f.name == "info"
    )
    n1 = {f.name: dict(f.metadata) for f in info1.dataType.fields}
    assert (
        n1["name"]["delta.columnMapping.id"]
        == n0["name"]["delta.columnMapping.id"]
    )
    assert "score" not in n1
    assert n1["city"]["delta.columnMapping.id"] > max(
        m["delta.columnMapping.id"] for m in n0.values()
    )
    r = dl.read_delta(spark, path).collect()[0]
    assert r["info"]["city"] == "NYC" and r["info"]["name"] == "y"


def test_column_mapping_with_deletion_vector_composes(spark, tmp_path):
    """A mapped table whose file also carries a DV: both features
    resolve in one read (the protocol-3 readerFeatures pair)."""
    path = str(tmp_path / "cm_dv")
    df = (
        spark.createDataFrame([Row(id=i, score=float(i)) for i in range(8)])
        .select("id", "score")
        .orderBy("id")
        .coalesce(1)
    )
    build_column_mapped_table(
        spark, df, path, physical={"id": "c-1", "score": "c-2"}
    )
    rel = dl.snapshot(path).files[0].path
    add_deletion_vector(spark, path, rel, [0, 7])
    got = dl.read_delta(spark, path)
    assert got.columns == ["id", "score"]
    assert _ids(got) == [1, 2, 3, 4, 5, 6]


def test_column_mapping_unknown_mode_raises(spark, tmp_path):
    path = str(tmp_path / "cm_bad")
    df = spark.createDataFrame([Row(id=1)]).select("id")
    build_column_mapped_table(spark, df, path, physical={"id": "c-1"})
    # doctor the mode to something unknown
    import json

    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(l) for l in open(log) if l.strip()]
    for action in lines:
        if "metaData" in action:
            action["metaData"]["configuration"][
                "delta.columnMapping.mode"
            ] = "surprise"
    os.remove(log)
    with open(log, "x") as fh:
        for action in lines:
            fh.write(json.dumps(action) + "\n")
    with pytest.raises(dl.DeltaLiteError, match="columnMapping.mode"):
        dl.read_delta(spark, path)


# --------------------------------------------- deletion-vector WRITES


def test_dv_delete_rewrites_nothing(spark, tmp_path):
    path = str(tmp_path / "dvw")
    _one_file_table(spark, path, 0, 10)
    _one_file_table(spark, path, 10, 20)
    before = {f.path for f in dl.snapshot(path).files}
    stats = dl.delete_delta(spark, path, "id % 3 = 0",
                            use_deletion_vectors=True)
    assert stats["files_rewritten"] == 0 and stats["dv_files"] == 2
    assert stats["rows_deleted"] == 7  # 0,3,6,9,12,15,18
    snap = dl.snapshot(path)
    assert {f.path for f in snap.files} == before  # no data file moved
    assert all(f.deletion_vector is not None for f in snap.files)
    assert _ids(dl.read_delta(spark, path)) == [
        i for i in range(20) if i % 3
    ]
    # metadata-only count subtracts the DV cardinalities
    assert dl.delta_count(spark, path) == 13


def test_dv_delete_merges_into_existing_dv(spark, tmp_path):
    path = str(tmp_path / "dvw2")
    _one_file_table(spark, path, 0, 12)
    dl.delete_delta(spark, path, "id < 3", use_deletion_vectors=True)
    stats = dl.delete_delta(spark, path, "id >= 9",
                            use_deletion_vectors=True)
    assert stats["rows_deleted"] == 3
    snap = dl.snapshot(path)
    (f,) = snap.files
    assert f.deletion_vector["cardinality"] == 6  # 0,1,2,9,10,11 merged
    assert _ids(dl.read_delta(spark, path)) == [3, 4, 5, 6, 7, 8]
    # time travel: v1 sees the first delete only, v0 everything
    assert _ids(dl.read_delta(spark, path, version=1)) == list(range(3, 12))
    assert _ids(dl.read_delta(spark, path, version=0)) == list(range(12))


def test_dv_delete_untouched_files_unaffected(spark, tmp_path):
    path = str(tmp_path / "dvw3")
    _one_file_table(spark, path, 0, 5)
    _one_file_table(spark, path, 100, 105)
    stats = dl.delete_delta(spark, path, "id = 2",
                            use_deletion_vectors=True)
    assert stats["dv_files"] == 1
    snap = dl.snapshot(path)
    assert sum(1 for f in snap.files if f.deletion_vector) == 1
    assert _ids(dl.read_delta(spark, path)) == [0, 1, 3, 4, 100, 101,
                                                102, 103, 104]


def test_dv_delete_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "dvw4")
    _one_file_table(spark, path, 0, 5)
    stats = dl.delete_delta(spark, path, "id > 99",
                            use_deletion_vectors=True)
    assert stats["rows_deleted"] == 0 and stats["version"] == 0


def test_dv_delete_cdf_emits_delete_rows(spark, tmp_path):
    path = str(tmp_path / "dvw5")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8)])
        .select("id", "v").orderBy("id").coalesce(1)
    )
    dl.write_delta(df, path,
                   configuration={"delta.enableChangeDataFeed": "true"})
    dl.delete_delta(spark, path, "id in (1, 5)",
                    use_deletion_vectors=True)
    feed = dl.read_change_feed(spark, path, 1, 1)
    got = sorted((r["_change_type"], r["id"]) for r in feed.collect())
    assert got == [("delete", 1), ("delete", 5)]


def test_metadata_only_delete_subtracts_dv_cardinality(spark, tmp_path):
    """ADVICE r9 (low): a partition-aligned DELETE that drops whole
    files must not count rows already masked by deletion vectors on
    those files in rows_deleted."""
    path = str(tmp_path / "dvpart")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i < 6 else "b", v=float(i))
         for i in range(10)]
    ).select("id", "grp", "v")
    dl.write_delta(df, path, partition_by=["grp"])
    r0 = dl.delete_delta(spark, path, "id IN (0, 1)",
                         use_deletion_vectors=True)
    assert r0["rows_deleted"] == 2 and r0["dv_files"] >= 1
    res = dl.delete_delta(spark, path, "grp = 'a'")
    assert res.get("metadata_only") is True
    assert res["rows_deleted"] == 4  # 6 file rows - 2 DV-masked
    assert _ids(dl.read_delta(spark, path)) == list(range(6, 10))


def test_dv_delete_then_optimize_purges_dvs(spark, tmp_path):
    path = str(tmp_path / "dvw6")
    _one_file_table(spark, path, 0, 9)
    dl.delete_delta(spark, path, "id % 2 = 0", use_deletion_vectors=True)
    dl.optimize(spark, path, target_files=1)
    snap = dl.snapshot(path)
    assert all(f.deletion_vector is None for f in snap.files)
    assert _ids(dl.read_delta(spark, path)) == [1, 3, 5, 7]


# ------------------------------------------- writer protocol + appendOnly


def test_append_only_table_refuses_rewrites(spark, tmp_path):
    path = str(tmp_path / "ao")
    df = spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v")
    dl.write_delta(df, path, configuration={"delta.appendOnly": "true"})
    # appends stay legal
    dl.write_delta(
        spark.createDataFrame([Row(id=2, v=2.0)]).select("id", "v"), path
    )
    # layout-only OPTIMIZE stays legal (no rows change)
    dl.optimize(spark, path, target_files=1)
    assert _ids(dl.read_delta(spark, path)) == [1, 2]
    for op in (
        lambda: dl.write_delta(df, path, mode="overwrite"),
        lambda: dl.merge_delta(spark, df, path, "id"),
        lambda: dl.delete_delta(spark, path, "id = 1"),
        lambda: dl.delete_delta(spark, path, "id = 1",
                                use_deletion_vectors=True),
        lambda: dl.restore(path, 0),
    ):
        with pytest.raises(dl.DeltaLiteError, match="appendOnly"):
            op()


def test_unknown_writer_feature_refuses_writes_allows_reads(spark, tmp_path):
    import json

    path = str(tmp_path / "wf")
    df = spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v")
    dl.write_delta(df, path)
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(log, "x") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            # identityColumns/generatedColumns graduated to supported
            # in round 9 — use a feature no engine ships yet
            "writerFeatures": ["someFutureFeature"],
        }}) + "\n")
    assert _ids(dl.read_delta(spark, path)) == [1]  # reads unaffected
    with pytest.raises(dl.DeltaLiteError, match="someFutureFeature"):
        dl.write_delta(df, path)


def test_invariants_metadata_refuses_writes(spark, tmp_path):
    import json

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    path = str(tmp_path / "inv")
    df = spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v")
    dl.write_delta(df, path)
    # doctor the schemaString: column v carries an invariant expression
    schema = StructType([
        StructField("id", LongType(), True),
        StructField("v", DoubleType(), True,
                     metadata={"delta.invariants":
                               '{"expression":{"expression":"v > 0"}}'}),
    ])
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(log, "x") as fh:
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet"},
            "schemaString": schema.json(), "partitionColumns": [],
            "configuration": {},
        }}) + "\n")
    assert _ids(dl.read_delta(spark, path)) == [1]
    with pytest.raises(dl.DeltaLiteError, match="invariants"):
        dl.delete_delta(spark, path, "id = 1")


def test_timestamp_ntz_reader_feature(spark, tmp_path):
    """timestampNtz is in _SUPPORTED_READER_FEATURES: a v3 table whose
    only required features are timestampNtz(+DV) replays, and the
    TIMESTAMP_NTZ column reads natively."""
    import datetime
    import json

    path = str(tmp_path / "ntz")
    df = spark.createDataFrame(
        [Row(id=1, ts=datetime.datetime(2024, 6, 1, 12, 0))],
        "id bigint, ts timestamp_ntz",
    )
    dl.write_delta(df, path)
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    with open(log, "x") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz"],
            "writerFeatures": ["timestampNtz"],
        }}) + "\n")
    back = dl.read_delta(spark, path)
    assert back.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    assert back.collect()[0]["ts"] == datetime.datetime(2024, 6, 1, 12, 0)


# --------------------------------------------------- v2 checkpoints


def _to_v2_checkpoint(path, version, fmt="parquet", sidecar=True):
    """Convert a table's state at ``version`` into a hand-built V2
    CHECKPOINT (PROTOCOL.md §V2 Checkpoint Table Feature): top file
    ``N.checkpoint.<uuid>.{json|parquet}`` with protocol / metaData /
    checkpointMetadata (+ add/remove inline, or referenced through a
    ``sidecar`` action whose parquet lives under ``_sidecars/``), then
    ages out the JSON tail so replay MUST come from the checkpoint."""
    import json
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    snap = dl.snapshot(path, version)
    log_dir = os.path.join(path, "_delta_log")
    unique = _uuid.uuid4().hex
    adds = [
        {
            "path": f.path,
            "partitionValues": f.partition_values,
            "size": f.size,
            "modificationTime": f.modification_time,
            "dataChange": True,
            "stats": None,
            "deletionVector": f.deletion_vector,
        }
        for f in snap.files
    ]
    protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = {
        "id": "v2cp-fixture",
        "format": {"provider": "parquet"},
        "schemaString": snap.schema_string,
        "partitionColumns": snap.partition_columns,
        # pyarrow infers {} as a childless struct it cannot write; the
        # map encoding (list of pairs) is what real checkpoints use
        "configuration": sorted(snap.configuration.items()) or None,
    }
    cp_meta = {"version": version, "tags": None}
    side_rows = []
    if sidecar:
        side_name = f"{_uuid.uuid4().hex}.parquet"
        side_dir = os.path.join(log_dir, "_sidecars")
        os.makedirs(side_dir, exist_ok=True)
        add_struct = pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
            ]
        )
        pq.write_table(
            pa.Table.from_pylist(
                [
                    {
                        "add": {
                            **{k: v for k, v in a.items()
                               if k not in ("stats", "deletionVector")},
                            "partitionValues": sorted(
                                a["partitionValues"].items()
                            ),
                        },
                        "remove": None,
                    }
                    for a in adds
                ],
                schema=pa.schema(
                    [
                        pa.field("add", add_struct),
                        pa.field(
                            "remove",
                            pa.struct([("path", pa.string())]),
                        ),
                    ]
                ),
            ),
            os.path.join(side_dir, side_name),
        )
        side_rows = [
            {
                "sidecar": {
                    "path": side_name,
                    "sizeInBytes": os.path.getsize(
                        os.path.join(side_dir, side_name)
                    ),
                    "modificationTime": 0,
                    "tags": None,
                }
            }
        ]
        adds = []
    top_rows = (
        [{"checkpointMetadata": cp_meta},
         {"protocol": protocol},
         {"metaData": meta}]
        + [{"add": a} for a in adds]
        + side_rows
    )
    if fmt == "json":
        cp_name = f"{version:020d}.checkpoint.{unique}.json"
        with open(os.path.join(log_dir, cp_name), "x") as fh:
            for row in top_rows:
                fh.write(json.dumps(row) + "\n")
    else:
        import pyarrow as pa

        # parquet top file: union the action columns across rows
        def col(row, name):
            return row.get(name)

        names = ["checkpointMetadata", "protocol", "metaData", "add",
                 "sidecar"]
        pylist = [
            {n: col(r, n) for n in names} for r in top_rows
        ]
        cp_name = f"{version:020d}.checkpoint.{unique}.parquet"
        pq.write_table(
            pa.Table.from_pylist(pylist),
            os.path.join(log_dir, cp_name),
        )
    for v in range(version + 1):
        commit = os.path.join(log_dir, f"{v:020d}.json")
        if os.path.exists(commit):
            os.remove(commit)
    # classic checkpoints would shadow the v2 one: remove them
    for name in os.listdir(log_dir):
        if name.endswith(".checkpoint.parquet"):
            os.remove(os.path.join(log_dir, name))


@pytest.mark.parametrize("fmt,sidecar", [
    ("parquet", True), ("json", True), ("json", False),
])
def test_v2_checkpoint_replay(spark, tmp_path, fmt, sidecar):
    path = str(tmp_path / f"v2cp_{fmt}_{sidecar}")
    _one_file_table(spark, path, 0, 6)
    _one_file_table(spark, path, 10, 14)
    expected = _ids(dl.read_delta(spark, path))
    _to_v2_checkpoint(path, 1, fmt=fmt, sidecar=sidecar)
    snap = dl.snapshot(path)
    assert snap.version == 1
    assert snap.protocol["readerFeatures"] == ["v2Checkpoint"]
    assert _ids(dl.read_delta(spark, path)) == expected
    # and the table keeps working: append on top of the v2 checkpoint
    dl.write_delta(
        spark.createDataFrame([Row(id=99, v=99.0)]).select("id", "v"), path
    )
    assert 99 in _ids(dl.read_delta(spark, path))


def test_v2_checkpoint_missing_sidecar_raises(spark, tmp_path):
    path = str(tmp_path / "v2cp_bad")
    _one_file_table(spark, path, 0, 3)
    _to_v2_checkpoint(path, 0, fmt="json", sidecar=True)
    import glob as _glob

    for side in _glob.glob(
        os.path.join(path, "_delta_log", "_sidecars", "*.parquet")
    ):
        os.remove(side)
    with pytest.raises(dl.DeltaLiteError, match="sidecar"):
        dl.snapshot(path)


def test_multipart_classic_checkpoint_replay(spark, tmp_path):
    """Classic MULTI-PART checkpoints (N.checkpoint.i.n.parquet, what
    delta-spark writes for huge tables): replay requires ALL parts; an
    incomplete set is skipped rather than half-read."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "mpcp")
    _one_file_table(spark, path, 0, 4)
    _one_file_table(spark, path, 10, 14)
    expected = _ids(dl.read_delta(spark, path))
    log = os.path.join(path, "_delta_log")
    dl._write_checkpoint(path, 1)
    single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
    table = pq.read_table(single)
    # split the checkpoint rows into 2 parts
    n = table.num_rows
    pq.write_table(
        table.slice(0, n // 2),
        os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    part2 = os.path.join(
        log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    )
    pq.write_table(table.slice(n // 2), part2)
    os.remove(single)
    for v in (0, 1):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert _ids(dl.read_delta(spark, path)) == expected
    # incomplete set: drop part 2 -> no usable checkpoint -> the reader
    # refuses loudly instead of replaying half a file list
    os.remove(part2)
    with pytest.raises(dl.DeltaLiteError):
        dl.snapshot(path)


# ---------------------------------------------------------------- round 9:
# variantType + typeWidening reader/writer features (VERDICT r8 item 5)


def test_variant_column_roundtrip_declares_feature(spark, tmp_path):
    """A variant column round-trips through write_delta/read_delta; the
    CREATE commit declares protocol 3/7 with variantType listed."""
    from pyspark.sql import functions as F

    df = spark.sql(
        "select id, parse_json(format_string("
        "'{\"a\": %d, \"s\": \"x%d\"}', id, id*2)) as v from range(10)"
    )
    path = str(tmp_path / "variant")
    dl.write_delta(df, path)
    proto = dl.snapshot(path).protocol
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    out = dl.read_delta(spark, path)
    assert out.schema["v"].dataType.typeName() == "variant"
    got = {
        (r.id, r.a)
        for r in out.select(
            "id", F.expr("variant_get(v, '$.a', 'long')").alias("a")
        ).collect()
    }
    assert got == {(i, i) for i in range(10)}
    # appends against the feature-flagged table still work
    dl.write_delta(df.withColumn("id", F.col("id") + 10), path)
    assert dl.read_delta(spark, path).count() == 20


def test_type_widening_reads_old_int_files_as_long(spark, tmp_path):
    """A third-party widening commit (schemaString int->long, protocol
    3/7 + typeWidening) leaves old int32 files in place; the reader
    scans them under the widened schema (Spark 4 parquet widening
    promotion) — previously this table raised by feature name."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    path = str(tmp_path / "widen")
    narrow = spark.range(5).select(
        F.col("id").cast("int").alias("k"), F.col("id").cast("float").alias("f")
    )
    dl.write_delta(narrow, path)
    wide_df = spark.range(5, 10).select(
        F.col("id").cast("long").alias("k"),
        F.col("id").cast("double").alias("f"),
    )
    staging = tempfile.mkdtemp(prefix="_st_", dir=path)
    try:
        adds = dl._stage_from(wide_df, path, [], staging)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    wide_schema = StructType(
        [StructField("k", LongType(), True), StructField("f", DoubleType(), True)]
    )
    actions = [
        {"commitInfo": {"operation": "CHANGE COLUMN", "engine": "fixture"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening"],
                "writerFeatures": ["typeWidening", "appendOnly", "invariants"],
            }
        },
        {
            "metaData": {
                "id": "widen-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": wide_schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.enableTypeWidening": "true"},
                "createdTime": int(time.time() * 1000),
            }
        },
    ] + [dl._add_json(a) for a in adds]
    assert dl._try_commit(dl._log_dir(path), 1, actions)
    out = dl.read_delta(spark, path)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double",
    ]
    assert sorted((r.k, r.f) for r in out.collect()) == [
        (i, float(i)) for i in range(10)
    ]
    # appends to the widened table carry the widened type
    dl.write_delta(
        spark.range(10, 12).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("f")
        ),
        path,
    )
    assert dl.read_delta(spark, path).count() == 12


def test_unknown_reader_feature_still_refuses(spark, tmp_path):
    """Widening/variant support must not loosen the gate: an unknown
    feature name still raises before any data is misread."""
    import time

    path = str(tmp_path / "unknown_feat")
    dl.write_delta(spark.range(3).selectExpr("id as k"), path)
    actions = [
        {"commitInfo": {"operation": "UPGRADE", "engine": "fixture"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["collations"],
                "writerFeatures": ["collations"],
            }
        },
    ]
    assert dl._try_commit(dl._log_dir(path), 1, actions)
    with pytest.raises(dl.DeltaLiteError, match="collations"):
        dl.snapshot(path)


# ------------------------------------------------- round 9: in-commit
# timestamps (PROTOCOL.md §In-Commit Timestamps — mtimes lie after
# copies/restores, so commit time rides IN the commit)


def test_ict_table_stamps_monotonic_and_travels_by_it(spark, tmp_path):
    path = str(tmp_path / "ict")
    dl.write_delta(
        spark.range(3).selectExpr("id as k"),
        path,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    proto = dl.snapshot(path).protocol
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    dl.write_delta(spark.range(3, 6).selectExpr("id as k"), path)
    dl.delete_delta(spark, path, "k = 4")
    hist = dl.history(path)
    stamps = [h["timestamp"] for h in hist]
    assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps)
    # every commit carries the field
    import json as _json
    import os as _os

    for v in range(3):
        with open(
            _os.path.join(path, "_delta_log", f"{v:020d}.json"),
            encoding="utf-8",
        ) as fh:
            infos = [
                _json.loads(line)["commitInfo"]
                for line in fh
                if line.strip() and "commitInfo" in _json.loads(line)
            ]
        assert infos and infos[0].get("inCommitTimestamp") == stamps[v]
    # timestampAsOf resolves against the ICT, not the mtime: back-date
    # every log file's mtime and travel still works by the ICT clock
    for v in range(3):
        _os.utime(
            _os.path.join(path, "_delta_log", f"{v:020d}.json"), (0, 0)
        )
    assert dl.version_as_of_timestamp(path, stamps[0]) == 0
    assert dl.version_as_of_timestamp(path, stamps[2]) == 2
    assert dl.version_as_of_timestamp(path, stamps[1] - 1) == 0
    out = dl.read_delta(spark, path, timestamp_ms=stamps[1])
    assert out.count() == 6  # pre-delete


def test_third_party_ict_table_read_and_append(spark, tmp_path):
    """A doctored table with the inCommitTimestamp writer feature (the
    Databricks default since 2024): reads honor the in-commit clock and
    our appends keep stamping monotonically."""
    import json as _json
    import os as _os

    path = str(tmp_path / "ict3p")
    dl.write_delta(spark.range(2).selectExpr("id as k"), path)
    # upgrade: feature + config, with an ICT far in the future so a
    # non-monotonic stamper would violate the ordering
    future = int(2e12)  # year 2033
    snap = dl.snapshot(path)
    actions = [
        {"commitInfo": {"operation": "UPGRADE", "engine": "fixture",
                        "inCommitTimestamp": future}},
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": [
                    "appendOnly", "invariants", "inCommitTimestamp",
                ],
            }
        },
        {
            "metaData": {
                "id": "ict-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": snap.schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.enableInCommitTimestamps": "true"
                },
                "createdTime": 0,
            }
        },
    ]
    assert dl._try_commit(dl._log_dir(path), 1, actions)
    dl.write_delta(spark.range(2, 4).selectExpr("id as k"), path)
    with open(
        _os.path.join(path, "_delta_log", f"{2:020d}.json"), encoding="utf-8"
    ) as fh:
        first = _json.loads(fh.readline())
    assert first["commitInfo"]["inCommitTimestamp"] == future + 1
    assert dl.version_as_of_timestamp(path, future) == 1


# --------------------------------------- deletion-vector MERGE / UPDATE


def test_dv_merge_rewrites_nothing(spark, tmp_path):
    """MERGE on a DV-enabled shape: matched rows tombstone into DVs,
    the source appends, and NO original data file is rewritten."""
    path = str(tmp_path / "dvm")
    _one_file_table(spark, path, 0, 10)
    _one_file_table(spark, path, 100, 110)
    before = {f.path for f in dl.snapshot(path).files}
    src = spark.createDataFrame(
        [Row(id=3, v=300.0), Row(id=105, v=500.0), Row(id=999, v=9.0)]
    ).select("id", "v")
    stats = dl.merge_delta(spark, src, path, ["id"],
                           use_deletion_vectors=True)
    assert stats["files_rewritten"] == 0
    assert stats["dv_files"] == 2  # one per touched file
    snap = dl.snapshot(path)
    assert before <= {f.path for f in snap.files}  # originals untouched
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert got[3] == 300.0 and got[105] == 500.0 and got[999] == 9.0
    assert len(got) == 21
    # pre-merge snapshot still reads clean through time travel
    v1 = dl.read_delta(spark, path, version=1)
    assert sorted(r["id"] for r in v1.collect()) == list(range(0, 10)) + list(
        range(100, 110)
    )


def test_dv_merge_auto_from_table_property(spark, tmp_path):
    """delta.enableDeletionVectors=true flips MERGE to the DV shape
    without any per-call flag (the delta-spark default behavior)."""
    path = str(tmp_path / "dvma")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(8)])
        .select("id", "v").orderBy("id").coalesce(1)
    )
    dl.write_delta(df, path,
                   configuration={"delta.enableDeletionVectors": "true"})
    src = spark.createDataFrame([Row(id=2, v=22.0)]).select("id", "v")
    stats = dl.merge_delta(spark, src, path, ["id"])
    assert stats["files_rewritten"] == 0 and stats["dv_files"] == 1
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert got[2] == 22.0 and len(got) == 8
    # an explicit False overrides the property back to copy-on-write
    src2 = spark.createDataFrame([Row(id=3, v=33.0)]).select("id", "v")
    stats2 = dl.merge_delta(spark, src2, path, ["id"],
                            use_deletion_vectors=False)
    assert stats2["files_rewritten"] >= 1 and stats2["dv_files"] == 0


def test_dv_merge_merges_into_existing_dv(spark, tmp_path):
    """A DV MERGE on a file already carrying a DV unions the bitmaps —
    previously deleted rows stay dead, newly matched rows die."""
    path = str(tmp_path / "dvm2")
    _one_file_table(spark, path, 0, 12)
    dl.delete_delta(spark, path, "id < 3", use_deletion_vectors=True)
    src = spark.createDataFrame([Row(id=5, v=55.0)]).select("id", "v")
    dl.merge_delta(spark, src, path, ["id"], use_deletion_vectors=True)
    snap = dl.snapshot(path)
    dv_adds = [f for f in snap.files if f.deletion_vector]
    assert len(dv_adds) == 1
    assert dv_adds[0].deletion_vector["cardinality"] == 4  # 0,1,2 + 5
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert sorted(got) == [3, 4, 5, 6, 7, 8, 9, 10, 11]
    assert got[5] == 55.0


def test_dv_merge_cdf_rows(spark, tmp_path):
    path = str(tmp_path / "dvmc")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(6)])
        .select("id", "v").orderBy("id").coalesce(1)
    )
    dl.write_delta(df, path, configuration={
        "delta.enableChangeDataFeed": "true",
        "delta.enableDeletionVectors": "true",
    })
    src = spark.createDataFrame(
        [Row(id=1, v=11.0), Row(id=77, v=7.0)]
    ).select("id", "v")
    dl.merge_delta(spark, src, path, ["id"])
    feed = dl.read_change_feed(spark, path, 1, 1)
    got = sorted((r["_change_type"], r["id"], r["v"]) for r in feed.collect())
    assert got == [
        ("insert", 77, 7.0),
        ("update_postimage", 1, 11.0),
        ("update_preimage", 1, 1.0),
    ]


def test_dv_update_rewrites_nothing(spark, tmp_path):
    path = str(tmp_path / "dvu")
    _one_file_table(spark, path, 0, 10)
    _one_file_table(spark, path, 100, 110)
    before = {f.path for f in dl.snapshot(path).files}
    stats = dl.update_delta(spark, path, {"v": "v * 10"}, "id % 50 = 3",
                            use_deletion_vectors=True)
    assert stats["rows_updated"] == 2  # 3, 103
    assert stats["files_rewritten"] == 0 and stats["dv_files"] == 2
    snap = dl.snapshot(path)
    assert before <= {f.path for f in snap.files}
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert got[3] == 30.0 and got[103] == 1030.0 and len(got) == 20
    assert got[4] == 4.0  # survivor untouched


def test_dv_update_auto_property_and_existing_dv(spark, tmp_path):
    path = str(tmp_path / "dvua")
    df = (
        spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
        .select("id", "v").orderBy("id").coalesce(1)
    )
    dl.write_delta(df, path,
                   configuration={"delta.enableDeletionVectors": "true"})
    dl.delete_delta(spark, path, "id >= 8")  # property-driven DV delete
    stats = dl.update_delta(spark, path, {"v": "-v"}, "id = 1")
    assert stats["files_rewritten"] == 0 and stats["dv_files"] == 1
    snap = dl.snapshot(path)
    dv_adds = [f for f in snap.files if f.deletion_vector]
    # 8, 9 from the delete plus 1 from the update, merged in one DV
    assert dv_adds[0].deletion_vector["cardinality"] == 3
    got = {r["id"]: r["v"] for r in dl.read_delta(spark, path).collect()}
    assert got[1] == -1.0 and sorted(got) == list(range(8))


# --------------------------------------------- NESTED column mapping


def _nested_mapped(spark, tmp_path):
    from aws_insurancelake_etl_spark.queries.pipeline_ops import (
        build_nested_mapped_table,
    )

    path = str(tmp_path / "nm")
    df = spark.createDataFrame(
        [
            Row(id=0, prof=Row(name="a", acct=Row(bal=10, seg="X")),
                tags=[Row(k="t", v="1")], attrs={"m": Row(w=5)}),
            Row(id=1, prof=Row(name="b", acct=None),
                tags=[Row(k="u", v="2"), Row(k="w", v="3")], attrs={}),
            Row(id=2, prof=None, tags=[], attrs=None),
        ]
    ).select("id", "prof", "tags", "attrs").orderBy("id").coalesce(1)
    build_nested_mapped_table(spark, df, path)
    return path


def test_nested_mapping_read_rebuilds_logical_shape(spark, tmp_path):
    path = _nested_mapped(spark, tmp_path)
    got = {r["id"]: r for r in dl.read_delta(spark, path).collect()}
    assert got[0]["prof"]["acct"]["bal"] == 10
    assert got[0]["prof"]["acct"]["seg"] == "X"
    assert got[0]["tags"][0]["v"] == "1"
    assert got[0]["attrs"]["m"]["w"] == 5
    # null-preservation at both nesting levels
    assert got[1]["prof"]["name"] == "b" and got[1]["prof"]["acct"] is None
    assert got[2]["prof"] is None and got[2]["tags"] == [] and (
        got[2]["attrs"] is None
    )


def test_nested_mapping_files_carry_no_logical_names(spark, tmp_path):
    import pyarrow.parquet as pq

    path = _nested_mapped(spark, tmp_path)
    snap = dl.snapshot(path)
    footer = str(pq.read_schema(os.path.join(path, snap.files[0].path)))
    for logical in ("prof", "name", "acct", "bal", "seg", "tags", "attrs"):
        assert f"{logical}:" not in footer


def test_nested_mapping_dv_composes(spark, tmp_path):
    path = _nested_mapped(spark, tmp_path)
    rel = dl.snapshot(path).files[0].path
    add_deletion_vector(spark, path, rel, [1])
    got = sorted(r["id"] for r in dl.read_delta(spark, path).collect())
    assert got == [0, 2]


def test_nested_mapping_append_physicalizes_all_levels(spark, tmp_path):
    """round 10 (supersedes the r9 write refusal): appends into a
    nested-mapped table physicalize struct/array/map nesting through
    the schema metadata — the appended parquet carries ZERO logical
    names at any level, and the read rebuilds the logical shape."""
    path = _nested_mapped(spark, tmp_path)
    df = spark.createDataFrame(
        [Row(id=9, prof=Row(name="z", acct=Row(bal=1, seg="Y")),
             tags=[Row(k="t", v="9")], attrs={"m": Row(w=1)})]
    ).select("id", "prof", "tags", "attrs")
    before = {f.path for f in dl.snapshot(path).files}
    dl.write_delta(df, path, mode="append")
    snap = dl.snapshot(path)
    new_files = [f.path for f in snap.files if f.path not in before]
    assert new_files  # the append landed at least one new file
    import pyarrow.parquet as pq

    for nf in new_files:
        footer = str(pq.read_schema(os.path.join(path, nf)))
        for logical in ("prof", "name", "acct", "bal", "seg", "tags",
                        "attrs", "id:"):
            assert logical not in footer, f"logical {logical!r} leaked"
    got = {r["id"]: r for r in dl.read_delta(spark, path).collect()}
    assert got[9]["prof"]["acct"]["seg"] == "Y"
    assert got[9]["attrs"]["m"]["w"] == 1
    assert got[2]["prof"] is None  # old null struct stays null


def test_v2_checkpoint_writer_shards_sidecars(spark, tmp_path, monkeypatch):
    """round 10: the v2-checkpoint WRITER shards file actions into
    _sidecars/*.parquet above V2_SIDECAR_ACTIONS — one JSON document
    cannot hold a 10M-file table.  The top json carries only
    checkpointMetadata/protocol/metaData + sidecar refs, and replay
    (tail deleted) resolves every file through the shards."""
    import glob as _glob
    import json as _json

    monkeypatch.setattr(dl, "V2_SIDECAR_ACTIONS", 3)
    path = str(tmp_path / "v2side")
    _one_file_table(spark, path, 0, 3)
    _to_v2_checkpoint(path, 0, fmt="json", sidecar=False)
    for i in range(4):
        _one_file_table(spark, path, 10 * (i + 1), 10 * (i + 1) + 2)
    expected = _ids(dl.read_delta(spark, path))
    version = dl.snapshot(path).version
    dl._write_checkpoint(path, version)
    log = os.path.join(path, "_delta_log")
    (top,) = _glob.glob(
        os.path.join(log, f"{version:020d}.checkpoint.*.json")
    )
    actions = [
        _json.loads(line) for line in open(top) if line.strip()
    ]
    kinds = [next(iter(a)) for a in actions]
    assert "sidecar" in kinds and "add" not in kinds
    shards = [a["sidecar"]["path"] for a in actions if "sidecar" in a]
    assert len(shards) == 2  # 5 adds at 3 actions/shard
    for s in shards:
        assert os.path.exists(os.path.join(log, "_sidecars", s))
    # replay from the sharded checkpoint alone
    for v in range(version + 1):
        p = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    assert _ids(dl.read_delta(spark, path)) == expected
    # appends on top keep working
    dl.write_delta(
        spark.createDataFrame([Row(id=999, v=9.0)]).select("id", "v"),
        path,
    )
    assert 999 in _ids(dl.read_delta(spark, path))


def test_timestamp_ntz_create_advertises_feature(spark, tmp_path):
    """PROTOCOL.md: timestamp without time zone is a TYPE-level
    reader+writer feature — a create whose schema carries one (nested
    included) must advertise it."""
    path = str(tmp_path / "ntz")
    df = spark.sql(
        "select 1 as id, "
        "named_struct('at', timestamp_ntz'2024-01-02 03:04:05') as ev"
    )
    dl.write_delta(df, path)
    proto = dl.snapshot(path).protocol
    assert "timestampNtz" in proto.get("readerFeatures", [])
    assert "timestampNtz" in proto.get("writerFeatures", [])
    r = dl.read_delta(spark, path).collect()[0]
    assert str(r["ev"]["at"]) == "2024-01-02 03:04:05"


def test_timestamp_ntz_evolve_append_advances_protocol(spark, tmp_path):
    """An evolve-append introducing an ntz column to a legacy-protocol
    table advances the protocol IN THE SAME COMMIT (a log carrying the
    type without the feature is spec-invalid), lifting legacy-implied
    writer features forward; plain appends never touch the protocol."""
    path = str(tmp_path / "ntz_evolve")
    dl.write_delta(spark.createDataFrame([(1,)], "id int"), path)
    assert dl.snapshot(path).protocol == {
        "minReaderVersion": 1, "minWriterVersion": 2,
    }
    dl.write_delta(
        spark.sql("select 2 as id, timestamp_ntz'2025-05-05 05:05:05' as ts"),
        path,
        schema_mode="evolve",
    )
    proto = dl.snapshot(path).protocol
    assert "timestampNtz" in proto.get("readerFeatures", [])
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    rows = {r["id"]: r["ts"] for r in dl.read_delta(spark, path).collect()}
    assert rows[1] is None and str(rows[2]).startswith("2025-05-05")
