"""Iceberg FORMAT-VERSION 3 (round 10, VERDICT r9 item 1): deletion
vectors in puffin files replacing position-delete parquet, the
v2->v3 upgrade path with mixed delete forms, row lineage, and the
named refusals for the v3 sub-features that remain out.

Spec: iceberg.apache.org/spec §Deletion Vectors, §Row Lineage, and the
Puffin spec (``deletion-vector-v1`` blob).  Reference parity: the
reference's entity-match Iceberg table is written by the managed AWS
Glue/Iceberg runtime (etl_consume_entity_match.py:385-397), which on
Iceberg 1.8+/Spark 4 engines compacts position deletes into v3 DVs.
"""

import json
import os

import pytest
from pyspark.sql import Row

from aws_insurancelake_etl_spark.sources import iceberg_lite as il
from aws_insurancelake_etl_spark.sources import puffin_lite as pf
from aws_insurancelake_etl_spark.sources import roaring


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _table(spark, path, lo, hi, fv=3):
    df = (
        spark.createDataFrame(
            [Row(id=i, v=float(i)) for i in range(lo, hi)]
        )
        .select("id", "v")
        .orderBy("id")
        .coalesce(1)
    )
    il.write_iceberg(spark, df, path, format_version=fv)


# ------------------------------------------------------------- puffin


def test_dv_blob_byte_layout():
    """BE length + Delta-compatible magic + portable-64 roaring + BE
    CRC-32 — asserted at the byte level against the spec, not just
    round-trip."""
    blob = pf.dv_blob([1, 3])
    payload = roaring.encode_delta_dv([1, 3])
    assert blob[:4] == (len(payload)).to_bytes(4, "big")
    assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])  # spec magic
    assert blob[4:4 + len(payload)] == payload
    import zlib

    assert blob[-4:] == (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(
        4, "big"
    )
    assert pf.decode_dv_blob(blob) == [1, 3]


def test_dv_blob_crc_and_magic_guard():
    blob = bytearray(pf.dv_blob([7]))
    blob[-1] ^= 0xFF
    with pytest.raises(pf.PuffinError, match="CRC"):
        pf.decode_dv_blob(bytes(blob))
    blob = bytearray(pf.dv_blob([7]))
    blob[5] ^= 0xFF
    with pytest.raises(pf.PuffinError):
        pf.decode_dv_blob(bytes(blob))


def test_puffin_container_footer(tmp_path):
    p = str(tmp_path / "x.puffin")
    descs = pf.write_puffin(
        p,
        [
            {"referenced_data_file": "/d/a.parquet", "positions": [0, 9]},
            {"referenced_data_file": "/d/b.parquet",
             "positions": range(100)},
        ],
    )
    with open(p, "rb") as fh:
        assert fh.read(4) == b"PFA1"
    footer = pf.read_footer(p)
    assert [b["type"] for b in footer["blobs"]] == [
        "deletion-vector-v1", "deletion-vector-v1",
    ]
    props = footer["blobs"][1]["properties"]
    assert props["referenced-data-file"] == "/d/b.parquet"
    assert props["cardinality"] == "100"
    for d, b in zip(descs, footer["blobs"]):
        assert (d["offset"], d["length"]) == (b["offset"], b["length"])
        assert pf.read_dv(p, d["offset"], d["length"]) == sorted(
            set(int(x) for x in ([0, 9] if d is descs[0] else range(100)))
        )


# ---------------------------------------------------- v3 write + read


def test_v3_create_maintains_row_id_chain(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10)
    _table(spark, path, 10, 15)
    meta = il._load_metadata(path)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 15
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert snaps[1]["first-row-id"] == 0 and snaps[2]["first-row-id"] == 10
    lin = il.read_iceberg(spark, path, row_lineage=True)
    got = {r["id"]: r["_row_id"] for r in lin.collect()}
    assert got == {i: i for i in range(15)}  # sorted single-file commits


def test_v3_delete_writes_dv_not_position_parquet(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 12)
    res = il.delete_iceberg(spark, path, "id % 4 = 1")
    assert res["rows_deleted"] == 3
    _, dels = il.plan_scan(path)
    assert [d.file_format for d in dels] == ["PUFFIN"]
    assert dels[0].record_count == 3
    assert dels[0].referenced_data_file  # names its target
    assert _ids(il.read_iceberg(spark, path)) == [
        i for i in range(12) if i % 4 != 1
    ]


def test_v3_second_delete_supersedes_one_dv_per_file(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 12)
    il.delete_iceberg(spark, path, "id < 3")
    il.delete_iceberg(spark, path, "id >= 9")
    _, dels = il.plan_scan(path)
    refs = [d.referenced_data_file for d in dels]
    assert len(refs) == 1  # superseded DV dropped from the manifests
    assert dels[0].record_count == 6
    assert _ids(il.read_iceberg(spark, path)) == [3, 4, 5, 6, 7, 8]
    # and the blob itself holds the merged set
    got = pf.read_dv(
        dels[0].path, dels[0].content_offset, dels[0].content_size
    )
    assert got == [0, 1, 2, 9, 10, 11]


def test_v3_merge_dvs_plus_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10)
    src = spark.createDataFrame(
        [Row(id=4, v=44.0), Row(id=77, v=7.0)]
    ).select("id", "v")
    res = il.merge_iceberg(spark, src, path, ["id"])
    assert res["deleted_rows"] == 1 and res["delete_files"] == 1
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[4] == 44.0 and vals[77] == 7.0 and len(vals) == 11
    _, dels = il.plan_scan(path)
    assert all(d.file_format == "PUFFIN" for d in dels)


def test_v3_update_through_dvs(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 8)
    res = il.update_iceberg(spark, path, {"v": "-v"}, "id in (2, 5)")
    assert res["rows_updated"] == 2
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[2] == -2.0 and vals[5] == -5.0 and len(vals) == 8
    _, dels = il.plan_scan(path)
    assert all(d.file_format == "PUFFIN" for d in dels)


def test_v3_refuses_staged_position_delete_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 4)
    with pytest.raises(il.IcebergLiteError, match="forbids"):
        il._commit_snapshot(
            path, [], data_entries=[],
            delete_entries=[("data/d.parquet", {}, 1, 10, 1, None)],
        )


def test_v3_equality_deletes_still_legal(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 6)
    src = spark.createDataFrame([Row(id=3, v=33.0)]).select("id", "v")
    il.upsert_iceberg_equality(spark, src, path, ["id"])
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[3] == 33.0 and len(vals) == 6


# ------------------------------------------------------ upgrade path


def test_upgrade_is_metadata_only_and_mixed_forms_read(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10, fv=2)
    src = spark.createDataFrame([Row(id=6, v=66.0)]).select("id", "v")
    il.merge_iceberg(spark, src, path, ["id"])  # v2 MOR position delete
    files_before = {f.path for f in il.plan_scan(path)[0]}
    assert il.upgrade_iceberg_format(path, 3) == {
        "format_version": 3, "upgraded": True,
    }
    assert {f.path for f in il.plan_scan(path)[0]} == files_before
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[6] == 66.0 and len(vals) == 10  # pos deletes still apply
    # pre-upgrade rows read null _row_id (lazy assignment), new appends
    # get real ids starting at next-row-id = 0
    _table(spark, path, 100, 103)
    lin = {
        r["id"]: r["_row_id"]
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert lin[0] is None and lin[6] is None
    assert sorted(lin[i] for i in (100, 101, 102)) == [0, 1, 2]


def test_upgrade_dv_folds_existing_position_deletes(spark, tmp_path):
    """The spec's supersede rule: once a DV exists for a file, readers
    ignore its position-delete parquet — so the DV writer MUST fold the
    still-applicable position deletes in, or they'd resurrect."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10, fv=2)
    src = spark.createDataFrame([Row(id=3, v=33.0)]).select("id", "v")
    il.merge_iceberg(spark, src, path, ["id"])  # pos delete on row 3
    il.upgrade_iceberg_format(path, 3)
    il.delete_iceberg(spark, path, "id = 7")  # same file -> DV
    _, dels = il.plan_scan(path)
    dv = [d for d in dels if d.file_format == "PUFFIN"]
    assert len(dv) == 1
    assert pf.read_dv(
        dv[0].path, dv[0].content_offset, dv[0].content_size
    ) == [3, 7]
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[3] == 33.0 and 7 not in vals and len(vals) == 9


def test_upgrade_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 3, fv=3)
    assert il.upgrade_iceberg_format(path, 3)["upgraded"] is False
    with pytest.raises(il.IcebergLiteError, match="downgrade"):
        il.upgrade_iceberg_format(path, 2)
    with pytest.raises(il.IcebergLiteError, match="must be 2 or 3"):
        il.upgrade_iceberg_format(path, 4)
    with pytest.raises(il.IcebergLiteError, match="upgrade_iceberg_format"):
        il.write_iceberg(
            spark,
            spark.createDataFrame([Row(id=1, v=1.0)]).select("id", "v"),
            path,
            format_version=2,
        )


# -------------------------------------------- maintenance composition


def test_v3_rewrite_manifests_materializes_row_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 6)
    _table(spark, path, 6, 9)
    il.delete_iceberg(spark, path, "id = 1")
    before = {
        r["id"]: r["_row_id"]
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert il.rewrite_manifests(path)["rewritten"]
    after = {
        r["id"]: r["_row_id"]
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert after == before  # ids survived the manifest merge


def test_v3_compaction_and_expire_keep_dvs_consistent(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10)
    il.delete_iceberg(spark, path, "id % 2 = 0")
    il.rewrite_data_files(spark, path)
    assert _ids(il.read_iceberg(spark, path)) == [1, 3, 5, 7, 9]
    il.expire_snapshots(path, keep_last=1)
    il.remove_orphan_files(path)
    assert _ids(il.read_iceberg(spark, path)) == [1, 3, 5, 7, 9]


def test_v3_time_travel_sees_pre_delete_state(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 5)
    il.delete_iceberg(spark, path, "id = 2")
    sids = il.snapshot_ids(path)
    assert _ids(il.read_iceberg(spark, path, snapshot_id=sids[0])) == list(
        range(5)
    )
    assert _ids(il.read_iceberg(spark, path)) == [0, 1, 3, 4]


# --------------------------------------------------- named refusals


def test_v4_metadata_refused_by_name(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, 0, 3)
    meta_dir = os.path.join(path, "metadata")
    latest = sorted(
        int(n[1:].split(".")[0])
        for n in os.listdir(meta_dir)
        if n.startswith("v") and n.endswith(".metadata.json")
    )[-1]
    with open(os.path.join(meta_dir, f"v{latest}.metadata.json")) as fh:
        meta = json.load(fh)
    meta["format-version"] = 4
    with open(
        os.path.join(meta_dir, f"v{latest + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with pytest.raises(il.IcebergLiteError, match="format-version"):
        il.plan_scan(path)


def _doctor_default(path, default_value):
    """Doctor the latest metadata: ALTER TABLE ADD COLUMN region WITH
    DEFAULT — a new schema version whose added field carries
    initial-default (spec §Default values)."""
    meta_dir = os.path.join(path, "metadata")
    latest = sorted(
        int(n[1:].split(".")[0])
        for n in os.listdir(meta_dir)
        if n.startswith("v") and n.endswith(".metadata.json")
    )[-1]
    with open(os.path.join(meta_dir, f"v{latest}.metadata.json")) as fh:
        meta = json.load(fh)
    for s in meta["schemas"]:
        if s.get("schema-id") == meta.get("current-schema-id", 0):
            s["fields"] = list(s["fields"]) + [
                {"id": 99, "name": "region", "required": False,
                 "type": "string", "initial-default": default_value,
                 "write-default": default_value}
            ]
    with open(
        os.path.join(meta_dir, f"v{latest + 1}.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)


def test_initial_default_materializes_for_pre_add_files(spark, tmp_path):
    """v3 column defaults: files written BEFORE the column existed
    surface initial-default (not null); files written after read their
    stored values, legitimate nulls included."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 4)
    _doctor_default(path, "EMEA")
    got = {r["id"]: r["region"]
           for r in il.read_iceberg(spark, path).collect()}
    assert got == {i: "EMEA" for i in range(4)}
    # append files that CARRY the column, one row with a real null
    df = spark.createDataFrame(
        [Row(id=10, v=1.0, region="APAC"), Row(id=11, v=2.0, region=None)]
    ).select("id", "v", "region").coalesce(1)
    il.write_iceberg(spark, df, path)
    got = {r["id"]: r["region"]
           for r in il.read_iceberg(spark, path).collect()}
    assert got[0] == "EMEA" and got[10] == "APAC" and got[11] is None
    # deletes compose: the defaulted group still applies DVs
    il.delete_iceberg(spark, path, "id = 1")
    got = {r["id"]: r["region"]
           for r in il.read_iceberg(spark, path).collect()}
    assert 1 not in got and got[2] == "EMEA" and len(got) == 5


def test_unmappable_default_refused_by_name(spark, tmp_path):
    """Round 11 narrows the old blanket non-primitive refusal: struct/
    list defaults now materialize; what still refuses is a default
    VALUE that does not fit its declared type (here a dict on a
    string column — another engine's doctored metadata)."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 3)
    _doctor_default(path, {"nested": 1})
    with pytest.raises(il.IcebergLiteError, match="no faithful"):
        il.read_iceberg(spark, path).collect()


def test_delete_files_metadata_table(spark, tmp_path):
    """$delete_files: the MOR-debt ops view, covering all three delete
    forms — position parquet (v2 era), equality parquet, and v3 DVs."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 10, fv=2)
    src = spark.createDataFrame([Row(id=2, v=22.0)]).select("id", "v")
    il.merge_iceberg(spark, src, path, ["id"])  # position parquet
    il.upsert_iceberg_equality(
        spark,
        spark.createDataFrame([Row(id=5, v=55.0)]).select("id", "v"),
        path, ["id"],
    )  # equality parquet
    il.upgrade_iceberg_format(path, 3)
    il.delete_iceberg(spark, path, "id = 9")  # puffin DV
    got = sorted(
        (r["file_format"], r["content"])
        for r in il.inspect_delete_files(spark, path).collect()
    )
    assert ("PUFFIN", 1) in got
    assert ("PARQUET", 1) in got and ("PARQUET", 2) in got
    dv = [
        r for r in il.inspect_delete_files(spark, path).collect()
        if r["file_format"] == "PUFFIN"
    ][0]
    assert dv["referenced_data_file"] and dv["content_size_in_bytes"] > 0
    # the blob range is directly decodable
    assert 9 in pf.read_dv(
        dv["file_path"], dv["content_offset"], dv["content_size_in_bytes"]
    )


# ------------------------------------------------- lineage preservation


def test_update_preserves_row_id(spark, tmp_path):
    """spec §Row Lineage: an UPDATE moves the row to a new file but the
    row keeps its _row_id (materialized into the new file), while
    _last_updated_sequence_number advances to the new commit."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 6)
    before = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    il.update_iceberg(spark, path, {"v": "v + 100"}, "id = 3")
    after = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert after[3][0] == before[3][0]  # id preserved across the move
    assert after[3][1] > before[3][1]  # last-updated seq advanced
    for i in (0, 1, 2, 4, 5):
        assert after[i] == before[i]  # untouched rows unchanged
    # a SECOND update still carries the original id (chained moves)
    il.update_iceberg(spark, path, {"v": "v + 1"}, "id = 3")
    final = {
        r["id"]: r["_row_id"]
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert final[3] == before[3][0]


def test_compaction_preserves_both_lineage_fields(spark, tmp_path):
    """Carried-unmodified rows keep _row_id AND their original
    _last_updated_sequence_number through rewrite_data_files — bumping
    the latter would falsely mark every row as just-changed."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 6)
    _table(spark, path, 6, 9)
    il.update_iceberg(spark, path, {"v": "-v"}, "id = 7")
    before = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    res = il.rewrite_data_files(spark, path)
    assert res["rewritten"]
    after = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert after == before


def test_merge_matches_live_rows_only(spark, tmp_path):
    """Review r10 (the ADVICE-r9 defect class, now for MERGE): keys
    masked by an equality delete must not re-match — the dead row would
    be re-tombstoned and counted."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 6)
    # equality-upsert replaces key 2 (old copy masked by an eq delete)
    il.upsert_iceberg_equality(
        spark,
        spark.createDataFrame([Row(id=2, v=22.0)]).select("id", "v"),
        path, ["id"],
    )
    src = spark.createDataFrame([Row(id=2, v=222.0)]).select("id", "v")
    res = il.merge_iceberg(spark, src, path, ["id"])
    # exactly ONE live copy of key 2 existed; the masked original must
    # not inflate the count
    assert res["deleted_rows"] == 1, res
    vals = {r["id"]: r["v"] for r in il.read_iceberg(spark, path).collect()}
    assert vals[2] == 222.0 and len(vals) == 6


def test_merge_binds_evolved_schema(spark, tmp_path):
    """Live-row matching also means MERGE reads through the metadata
    schema: a column added by a later commit is visible to the key
    search instead of binding stale physical names."""
    path = str(tmp_path / "t")
    _table(spark, path, 0, 3)
    df = spark.createDataFrame(
        [Row(id=10, v=1.0, tag="x")]
    ).select("id", "v", "tag").coalesce(1)
    il.write_iceberg(spark, df, path)  # schema evolves: +tag
    src = spark.createDataFrame(
        [Row(id=0, v=0.5, tag="y")]
    ).select("id", "v", "tag")
    il.merge_iceberg(spark, src, path, ["id"])
    got = {r["id"]: (r["v"], r["tag"])
           for r in il.read_iceberg(spark, path).collect()}
    assert got[0] == (0.5, "y") and got[1] == (1.0, None)


def test_write_default_materializes_into_new_files(spark, tmp_path):
    """Round 10 (closes a named refusal): an append that OMITS a column
    carrying write-default materializes the default INTO its data
    files — spec-conforming writer behavior, files self-contained."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=1)]).select("id"),
        path,
        format_version=3,
    )
    il.alter_iceberg_schema(
        path, adds={"tier": {"type": "string", "default": "std"}}
    )
    il.write_iceberg(
        spark, spark.createDataFrame([Row(id=2)]).select("id"), path
    )
    got = {r["id"]: r["tier"]
           for r in il.read_iceberg(spark, path).collect()}
    assert got == {1: "std", 2: "std"}
    carrying = [
        p
        for p in glob.glob(os.path.join(path, "data", "*.parquet"))
        if "tier" in pq.read_schema(p).names
    ]
    assert len(carrying) == 1
    assert pq.read_table(carrying[0]).to_pydict()["tier"] == ["std"]
    # explicit values still win over the default
    il.write_iceberg(
        spark,
        spark.createDataFrame([Row(id=3, tier="gold")]).select(
            "id", "tier"
        ),
        path,
    )
    got = {r["id"]: r["tier"]
           for r in il.read_iceberg(spark, path).collect()}
    assert got[3] == "gold"


def test_staging_skips_empty_part_files(spark, tmp_path):
    """A tiny append on a many-core session must not commit zero-row
    data files (manifest bloat every later scan would plan)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([Row(id=1), Row(id=2)]).select("id")
    il.write_iceberg(spark, df, path)  # parallelism > row count
    files = il.plan_files(path)
    assert all(f.record_count > 0 for f in files)
    assert sum(f.record_count for f in files) == 2


def test_merge_preserves_row_ids_for_updated_rows(spark, tmp_path):
    """Spec §Row Lineage: a MERGE-updated row keeps its _row_id (its
    _last_updated_sequence_number advances to the new commit);
    inserted rows mint fresh ids."""
    from aws_insurancelake_etl_spark.sources import iceberg_lite as il

    path = str(tmp_path / "rl-merge")
    il.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                              "id int, v string"),
        path,
        format_version=3,
    )
    before = {
        r["id"]: r["_row_id"]
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    il.merge_iceberg(
        spark,
        spark.createDataFrame([(2, "B!"), (9, "new")], "id int, v string"),
        path,
        keys=["id"],
    )
    after = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in il.read_iceberg(spark, path, row_lineage=True).collect()
    }
    assert after[2][0] == before[2], "updated row must keep its _row_id"
    assert after[1][0] == before[1] and after[3][0] == before[3]
    assert after[9][0] not in set(before.values()), "insert mints fresh id"
    assert after[2][1] > after[1][1], (
        "updated row's last-updated sequence must advance past carried rows"
    )
