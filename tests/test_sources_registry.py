"""File readers (input_spec options) + transform registry dispatch."""

from __future__ import annotations

import json

from aws_insurancelake_etl_spark.operators.registry import (
    apply_transform_spec,
    available_transforms,
    get_transform,
)
from aws_insurancelake_etl_spark.sources.readers import read_fixed_width, read_input


def test_csv_default_and_custom_delimiter(spark, tmp_path):
    f = tmp_path / "data.csv"
    f.write_text("a,b\n1,x\n2,y\n")
    df = read_input(spark, str(f))
    assert df.columns == ["a", "b"] and df.count() == 2

    g = tmp_path / "data2.csv"
    g.write_text("a|b\n1|x\n")
    df2 = read_input(spark, str(g), {"pipe": {}})
    assert df2.columns == ["a", "b"] and df2.count() == 1


def test_tsv_no_header(spark, tmp_path):
    f = tmp_path / "data.tsv"
    f.write_text("1\tx\n2\ty\n")
    df = read_input(spark, str(f), {"tsv": {"header": False}})
    assert df.columns == ["_c0", "_c1"]
    assert df.count() == 2


def test_json_multiline(spark, tmp_path):
    f = tmp_path / "data.json"
    f.write_text(json.dumps([{"id": 1, "nested": {"x": "a"}}, {"id": 2, "nested": {"x": "b"}}]))
    df = read_input(spark, str(f), {"json": {"multiline": True}})
    assert df.count() == 2
    assert df.select("nested.x").collect()[0][0] == "a"


def test_jsonl_prefers_decimal(spark, tmp_path):
    f = tmp_path / "data.jsonl"
    f.write_text('{"id": 1, "amount": 10.55}\n{"id": 2, "amount": 20.10}\n')
    df = read_input(spark, str(f))
    assert df.schema["amount"].dataType.typeName() == "decimal"


def test_xml_row_tag(spark, tmp_path):
    f = tmp_path / "data.xml"
    f.write_text(
        "<rows><policy><id>1</id><name>a</name></policy>"
        "<policy><id>2</id><name>b</name></policy></rows>"
    )
    df = read_input(spark, str(f), {"xml": {"row_tag": "policy"}})
    assert df.count() == 2 and set(df.columns) == {"id", "name"}


def test_fixed_width(spark, tmp_path):
    f = tmp_path / "data.txt"
    f.write_text("  123ACME      99\n  456BETA      11\n")
    mapping = [
        {"sourcename": "id", "destname": "policy_id", "width": "5"},
        {"sourcename": "nm", "destname": "name", "width": "10"},
        {"sourcename": "zz", "destname": "Null", "width": "2"},
        {"sourcename": "v", "destname": "val", "width": "1"},
    ]
    df = read_fixed_width(spark, str(f), mapping)
    assert df.columns == ["policy_id", "name", "val"]
    rows = df.collect()
    assert rows[0]["policy_id"] == "123" and rows[0]["name"] == "ACME"


def test_excel_read_input(spark, tmp_path):
    # Workbook bytes come from the stdlib SpreadsheetML writer, so the
    # full read path executes with or without a pandas Excel engine.
    from aws_insurancelake_etl_spark.sources.xlsx_lite import write_xlsx

    f = tmp_path / "wb.xlsx"
    write_xlsx(str(f), {"Sheet1": [["a", "b"], [1, "x"], [2, "y"]]})
    df = read_input(spark, str(f), {"excel": {"sheet_names": ["0"], "data_address": "A1"}})
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_registry_dispatch_suffix_and_unknown(spark, ctx):
    assert get_transform("date") is not None
    assert get_transform("date:2") is get_transform("date")
    assert get_transform("nosuchtransform") is None
    assert "expandpolicymonths" in available_transforms()

    df = spark.createDataFrame([("2022-01-01", "x")], "d string, s string")
    out = apply_transform_spec(
        df,
        {
            "date": [{"field": "d", "format": "yyyy-MM-dd"}],
            "literal": {"tag": "v1"},
            "literal:2": {"tag2": "v2"},
            "bogus_transform": [{"whatever": 1}],
        },
        ctx,
    )
    row = out.collect()[0]
    assert str(row["d"]) == "2022-01-01"
    assert row["tag"] == "v1" and row["tag2"] == "v2"


def test_driver_window_covers_every_operator_family():
    from aws_insurancelake_etl_spark.queries import DRIVER_WINDOW, all_queries

    names = list(all_queries())
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert names[:50] == list(DRIVER_WINDOW)
    window = set(DRIVER_WINDOW)
    # r11 rotation (tools/driver_window.py --mode staleness, VERDICT
    # r10 item 2 — the rotation's final leg): the 4 round-11 gates with
    # no driver row lead (nested mapped evolution, iceberg v3 nested/
    # composite defaults, nested delta ADD COLUMN, ANALYZE broadcast),
    # then the 46 OLDEST rows — all 8 r1-era, all 24 r3-era, and the 14
    # oldest r4 rows.  Sentinels: the never-checked head plus staleness
    # representatives from each era.
    for sentinel in ("sink_delta_nested_mapped_evolve",
                     "sink_iceberg_nested_default",
                     "sink_delta_nested_add_column",
                     "sql_analyze_broadcast_stats",
                     "sink_iceberg_sort_order",
                     # r1-era block (pre-canonicalizer rows, last leg)
                     "q17_small_quantity_revenue",
                     "q19_disjunctive_revenue", "q6_forecast_revenue",
                     "setops_union_intersect", "tr_changetype_cast",
                     "window_analytics_deciles", "window_running_sum",
                     # r3-era block
                     "dedup_minhash_pairs", "dedup_simhash",
                     "dq_profile_orders", "sketch_kmv_distinct",
                     "text_token_stats", "tr_lookup_join",
                     "tr_earnedpremium", "tr_currency_parse",
                     # oldest r4 rows
                     "ann_recall_eval", "dedup_incremental_lsh",
                     "doc_fingerprint", "docs_pack_shards",
                     "emb_int8_quantize", "emb_label_centroids"):
        assert sentinel in window, sentinel


def test_excel_data_address_grammar():
    import pytest

    from aws_insurancelake_etl_spark.sources.readers import (
        _col_index,
        parse_data_address,
    )

    assert _col_index("A") == 0
    assert _col_index("Z") == 25
    assert _col_index("AA") == 26
    assert parse_data_address("A1") == (0, 0, None, None)
    assert parse_data_address("C3") == (2, 2, None, None)
    assert parse_data_address(None) == (0, 0, None, None)
    # range reference bounds the block: rows 2-10 (9 rows), cols A-D
    assert parse_data_address("A2:D10") == (1, 0, 4, 9)
    for bad in ("3C", "A1:B", "D10:A2"):
        with pytest.raises(ValueError):
            parse_data_address(bad)


def test_excel_encrypted_workbook_full_path(spark, tmp_path):
    """Password-protected Excel end-to-end (round 6 — the container DOES
    ship `cryptography`, so MS-OFFCRYPTO agile is implemented rather than
    stubbed): write → encrypt → read through the normal excel spec with
    a password; wrong/missing passwords fail loudly."""
    import pytest

    from aws_insurancelake_etl_spark.sources.offcrypto import (
        WrongPassword, encrypt_agile,
    )
    from aws_insurancelake_etl_spark.sources.readers import read_excel
    from aws_insurancelake_etl_spark.sources.xlsx_lite import write_xlsx

    plain = tmp_path / "wb.xlsx"
    write_xlsx(str(plain), {"Sheet1": [["a", "b"], [1, "x"], [2, "y"]]})
    enc = tmp_path / "wb_enc.xlsx"
    enc.write_bytes(encrypt_agile(plain.read_bytes(), "tops3cret",
                                  spin_count=5000))

    df = read_excel(spark, str(enc),
                    {"sheet_names": ["0"], "password": "tops3cret"})
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]

    with pytest.raises(WrongPassword):
        read_excel(spark, str(enc),
                   {"sheet_names": ["0"], "password": "nope"})
    with pytest.raises(ValueError, match="pass 'password'"):
        read_excel(spark, str(enc), {"sheet_names": ["0"]})


def test_excel_read_matrix(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources.readers import read_excel
    from aws_insurancelake_etl_spark.sources.xlsx_lite import write_xlsx

    path = str(tmp_path / "wb.xlsx")
    write_xlsx(
        path,
        {
            "Meta": [["ignored"]],
            "Data": [["a", "b"], [1, "x"], [2, "y"], [3, "z"]],
        },
    )
    # sheet fallback chain: first name missing, second resolves by name
    out = read_excel(spark, path, {"sheet_names": ["Missing", "Data"]})
    assert out.count() == 3 and set(out.columns) == {"a", "b"}
    # numeric string = 0-based sheet index
    meta = read_excel(spark, path, {"sheet_names": ["1"]})
    assert set(meta.columns) == {"a", "b"}


def test_excel_data_address_and_header(spark, tmp_path):
    """data_address slicing (cell + range refs) and header=False through
    a real workbook — the option surface the reference exposes via
    crealytics (docs/file_formats.md:325-344)."""
    from aws_insurancelake_etl_spark.sources.readers import read_excel
    from aws_insurancelake_etl_spark.sources.xlsx_lite import write_xlsx

    path = str(tmp_path / "wb.xlsx")
    rows = [
        ["junk", None, None],
        [None, "a", "b"],
        [None, 1, "x"],
        [None, 2, "y"],
        [None, 3, "z"],
    ]
    write_xlsx(path, {"Data": rows})
    # cell ref: header at B2, data below-right of the anchor
    out = read_excel(spark, path, {"sheet_names": ["Data"], "data_address": "B2"})
    assert set(out.columns) == {"a", "b"} and out.count() == 3
    # range ref bounds the block: B2:C4 = header + 2 data rows
    bounded = read_excel(
        spark, path, {"sheet_names": ["Data"], "data_address": "B2:C4"}
    )
    assert bounded.count() == 2
    # headerless: _c0.. names, all 4 block rows are data
    raw = read_excel(
        spark, path,
        {"sheet_names": ["Data"], "data_address": "B3:C5", "header": False},
    )
    assert raw.columns == ["_c0", "_c1"] and raw.count() == 3


def test_xlsx_lite_roundtrip_and_shared_strings(tmp_path):
    """The stdlib parser handles its own writer's output (inline strings,
    ints, floats, bools, blanks) plus a hand-built sharedStrings part."""
    import zipfile

    from aws_insurancelake_etl_spark.sources import xlsx_lite

    path = str(tmp_path / "rt.xlsx")
    matrix = [["h1", "h2", "h3"], [1, 2.5, True], [None, "s", False]]
    xlsx_lite.write_xlsx(path, {"S": matrix})
    assert xlsx_lite.sheet_names(path) == ["S"]
    assert xlsx_lite.read_sheet(path, 0) == matrix
    assert xlsx_lite.read_sheet(path, "S") == matrix
    import pytest

    with pytest.raises(KeyError):
        xlsx_lite.read_sheet(path, "nope")
    with pytest.raises(KeyError):
        xlsx_lite.read_sheet(path, 3)

    # sharedStrings path: rewrite the sheet to use t="s" references
    ss_path = str(tmp_path / "ss.xlsx")
    with zipfile.ZipFile(path) as src, zipfile.ZipFile(ss_path, "w") as dst:
        for item in src.namelist():
            if item == "xl/worksheets/sheet1.xml":
                continue
            dst.writestr(item, src.read(item))
        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        dst.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}" count="2" uniqueCount="2">'
            "<si><t>hello</t></si>"
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        dst.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c>'
            '<c r="B1" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    assert xlsx_lite.read_sheet(ss_path, 0) == [["hello", "rich"]]


def test_xlsx_lite_matches_pandas_when_engine_present(tmp_path):
    import pytest

    pytest.importorskip("openpyxl")
    import pandas as pd

    from aws_insurancelake_etl_spark.sources import xlsx_lite

    path = str(tmp_path / "parity.xlsx")
    xlsx_lite.write_xlsx(path, {"P": [["a", "b"], [1, "x"], [2, "y"]]})
    pdf = pd.read_excel(path, sheet_name="P")
    assert list(pdf.columns) == ["a", "b"]
    assert pdf["a"].tolist() == [1, 2]


def test_avro_lite_roundtrip_and_read_input(spark, tmp_path):
    """The stdlib Avro container path: write real container bytes
    (zigzag varints, metadata map, sync-framed blocks, both codecs),
    read them back, and drive the full read_input dispatch — executes
    with no spark-avro jar on the classpath."""
    from aws_insurancelake_etl_spark.sources import avro_lite
    from aws_insurancelake_etl_spark.sources.readers import read_input

    names = ["id", "label", "score", "flag", "note", "tags"]
    types = ["long", "string", "double", "boolean", ["null", "string"],
             {"type": "array", "items": "int"}]
    rows = [
        (1, "a", 1.5, True, "x", [1, 2]),
        (-2, "b", -0.25, False, None, []),
        (2**40, "c", 0.0, True, "z", [7]),
    ]
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"data_{codec}.avro")
        avro_lite.write_avro(path, names, types, rows, codec=codec)
        got_names, got_rows = avro_lite.read_avro(path)
        assert got_names == names
        assert [tuple(r) for r in got_rows] == rows

    path = str(tmp_path / "data_null.avro")
    df = read_input(spark, path, {"avro": {}})
    assert df.count() == 3
    assert set(df.columns) == set(names)
    by_id = {r.id: r for r in df.collect()}
    assert by_id[-2].note is None and by_id[2**40].label == "c"


def test_avro_lite_nested_records_maps_fixed(spark, tmp_path):
    """Round 6: nested records decode as structs, maps as map<string,V>,
    fixed as binary — arbitrarily composed, both codecs, through both
    the direct parser and the Spark DataSource."""
    from aws_insurancelake_etl_spark.sources.avro_lite import (
        read_avro, write_avro,
    )

    rec_t = {"type": "record", "name": "addr", "fields": [
        {"name": "city", "type": "string"},
        {"name": "zips", "type": {"type": "array", "items": "int"}}]}
    map_t = {"type": "map", "values": "long"}
    fix_t = {"type": "fixed", "name": "f4", "size": 4}
    names = ["id", "addr", "tags", "sig", "maybe"]
    types = ["long", rec_t, map_t, fix_t, ["null", rec_t]]
    rows = [
        (1, ("Springfield", [12345, 999]), {"a": 1, "b": 2},
         b"\x01\x02\x03\x04", ("X", [])),
        (2, ("Shelbyville", []), {}, b"\xff\x00\xff\x00", None),
    ]
    f = tmp_path / "nested.avro"
    write_avro(str(f), names, types, rows, codec="deflate")
    got_names, got_rows = read_avro(str(f))
    assert got_names == names and got_rows == rows

    # dict-shaped record values encode identically to tuples
    f2 = tmp_path / "nested2.avro"
    write_avro(str(f2), names, types,
               [(1, {"city": "Springfield", "zips": [12345, 999]},
                 {"a": 1, "b": 2}, b"\x01\x02\x03\x04",
                 {"city": "X", "zips": []})], codec="null")
    assert read_avro(str(f2))[1][0] == rows[0]

    from aws_insurancelake_etl_spark.sources import pyds

    pyds.register(spark)
    df = spark.read.format("avro_lite").load(str(f))
    assert dict(df.dtypes)["addr"] == "struct<city:string,zips:array<int>>"
    assert dict(df.dtypes)["tags"] == "map<string,bigint>"
    assert dict(df.dtypes)["sig"] == "binary"
    out = {r["id"]: r for r in df.collect()}
    assert out[1]["addr"]["city"] == "Springfield"
    assert list(out[1]["addr"]["zips"]) == [12345, 999]
    assert dict(out[1]["tags"]) == {"a": 1, "b": 2}
    assert out[2]["maybe"] is None and out[1]["maybe"]["city"] == "X"

    # fixed length mismatch fails loudly on encode
    import pytest

    with pytest.raises(ValueError, match="fixed field"):
        write_avro(str(tmp_path / "bad.avro"), ["s"], [fix_t], [(b"\x01",)])


def test_avro_lite_datasource_distributed_writer(spark, tmp_path):
    """Spark-4 Python DataSource WRITE path: one container per
    partition, nested/nullable types, two-phase commit semantics
    (overwrite replaces, no temp files left behind)."""
    import os

    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "sink")
    df = spark.range(40).select(
        "id",
        F.concat(F.lit("n"), F.col("id")).alias("s"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.struct(F.col("id").alias("a"), F.lit("x").alias("b")).alias("st"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("maybe"),
    ).repartition(3)
    df.write.format("avro_lite").mode("overwrite").save(out)
    files = sorted(os.listdir(out))
    assert len([f for f in files if f.endswith(".avro")]) == 3
    assert not any(f.startswith("_tmp_") for f in files)
    back = spark.read.format("avro_lite").load(out)
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 40
    assert rows[6]["st"]["a"] == 6 and rows[6]["st"]["b"] == "x"
    assert dict(rows[6]["m"]) == {"k": 6}
    assert rows[6]["maybe"] == 6 and rows[7]["maybe"] is None
    assert list(rows[39]["arr"]) == [39, 40]

    # overwrite fully replaces prior contents
    df.limit(5).repartition(1).write.format("avro_lite").mode(
        "overwrite"
    ).save(out)
    assert spark.read.format("avro_lite").load(out).count() == 5
    assert len(os.listdir(out)) == 1

    # unsupported type -> named error surfaced from the task
    import pytest

    with pytest.raises(Exception, match="does not support Spark type"):
        spark.range(2).select(
            F.current_timestamp().alias("ts")
        ).write.format("avro_lite").mode("overwrite").save(str(tmp_path / "bad"))


def test_avro_lite_streaming_source_with_checkpoint_restart(spark, tmp_path):
    """Round 6: the avro_lite STREAMING source tails a directory —
    micro-batches pick up only NEW container files (offset = seen-name
    set), decoding distributes one partition per file, and a restart
    from the checkpoint neither replays old files nor misses ones added
    while stopped."""
    import time

    from aws_insurancelake_etl_spark.sources import pyds
    from aws_insurancelake_etl_spark.sources.avro_lite import write_avro

    pyds.register(spark)
    src = tmp_path / "stream_src"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_avro(str(src / "f1.avro"), ["id", "v"], ["long", "string"],
               [(1, "a"), (2, "b")])

    def start():
        return (
            spark.readStream.format("avro_lite").load(str(src))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def wait_rows(n, timeout=60):
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                if spark.read.parquet(out_dir).count() >= n:
                    return True
            except Exception:  # noqa: BLE001 - sink dir not created yet
                pass
            time.sleep(0.4)
        return False

    q = start()
    assert wait_rows(2), "first file not ingested"
    write_avro(str(src / "f2.avro"), ["id", "v"], ["long", "string"],
               [(3, "c")], codec="deflate")
    assert wait_rows(3), "second file not ingested"
    q.stop()

    # file added while the stream is DOWN must appear after restart,
    # with no duplicates from f1/f2
    write_avro(str(src / "f3.avro"), ["id", "v"], ["long", "string"],
               [(4, "d"), (5, "e")])
    q = start()
    assert wait_rows(5), "post-restart file not ingested"
    q.stop()
    rows = sorted((r.id, r.v) for r in spark.read.parquet(out_dir).collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]

    import pytest

    # non-directory paths are rejected at reader construction (the
    # error surfaces on the stream thread in a live query, so assert
    # on the constructor directly)
    with pytest.raises(ValueError, match="requires a directory"):
        pyds.AvroLiteStreamReader(str(src / "f1.avro"))


def test_avro_lite_rejects_non_container(tmp_path):
    from aws_insurancelake_etl_spark.sources import avro_lite

    bad = tmp_path / "not.avro"
    bad.write_bytes(b"PAR1 not avro")
    import pytest

    with pytest.raises(ValueError, match="not an Avro"):
        avro_lite.read_avro(str(bad))


def test_avro_lite_wire_format_matches_spec(tmp_path):
    """Byte-level check against the published Avro spec (not just a
    self-round-trip, which would mask a symmetric encoding bug):
    zigzag(1)=0x02, zigzag(-1)=0x01, zigzag(64)=0x80 0x01 varint,
    string = zigzag length then utf-8 bytes."""
    from aws_insurancelake_etl_spark.sources import avro_lite

    path = str(tmp_path / "w.avro")
    avro_lite.write_avro(path, ["id", "name"], ["long", "string"],
                         [(1, "ab"), (-1, "c"), (64, "")])
    data = open(path, "rb").read()
    assert data[:4] == b"Obj\x01"
    # the one data block: count=3 (0x06), then records back-to-back
    expected_records = b"\x02\x04ab" + b"\x01\x02c" + b"\x80\x01\x00"
    assert expected_records in data
    # varint of block byte-size precedes the records
    assert data.index(b"\x06" + bytes([len(expected_records) << 1])
                      + expected_records) > 0


def test_avro_lite_python_datasource_distributed_scan(spark, tmp_path):
    """The Spark-4 Python DataSource path: a directory of container
    files plans one input partition per file (parallel scan), schema
    inferred from the embedded Avro schema, mixed codecs."""
    from aws_insurancelake_etl_spark.sources import avro_lite, pyds

    names = ["id", "name", "score"]
    types = ["long", ["null", "string"], "double"]
    avro_lite.write_avro(str(tmp_path / "a.avro"), names, types,
                         [(1, "x", 1.5), (2, None, 2.5)])
    avro_lite.write_avro(str(tmp_path / "b.avro"), names, types,
                         [(3, "y", 0.0)], codec="deflate")
    pyds.register(spark)
    df = spark.read.format("avro_lite").load(str(tmp_path))
    assert df.schema.simpleString() == "struct<id:bigint,name:string,score:double>"
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("x", 1.5), 2: (None, 2.5), 3: ("y", 0.0)}

    # read_input's .avro dispatch lands on the same distributed path
    from aws_insurancelake_etl_spark.sources.readers import read_input

    df2 = read_input(spark, str(tmp_path / "a.avro"), {"avro": {}})
    assert df2.count() == 2


def test_pyds_register_is_idempotent(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources import avro_lite, pyds

    pyds.register(spark)
    pyds.register(spark)  # second registration must not raise
    f = str(tmp_path / "x.avro")
    avro_lite.write_avro(f, ["a"], ["long"], [(5,)])
    assert spark.read.format("avro_lite").load(f).collect()[0].a == 5


def test_excel_empty_sheet_names_real_cause(spark, tmp_path):
    """An existing-but-empty sheet must surface 'no data rows', not a
    missing-sheet error."""
    import pytest

    from aws_insurancelake_etl_spark.sources.readers import read_excel
    from aws_insurancelake_etl_spark.sources.xlsx_lite import write_xlsx

    path = str(tmp_path / "empty.xlsx")
    write_xlsx(path, {"Data": []})
    with pytest.raises(RuntimeError, match="no data rows"):
        read_excel(spark, path, {"sheet_names": ["Data"]})


def test_avro_truncated_boolean_raises(tmp_path):
    """A container truncated mid-record at a boolean field must raise,
    never fabricate False."""
    import pytest

    from aws_insurancelake_etl_spark.sources import avro_lite

    path = str(tmp_path / "t.avro")
    avro_lite.write_avro(path, ["n", "flag"], ["long", "boolean"],
                         [(1, True), (2, True)])
    data = open(path, "rb").read()
    # truncate the trailing sync marker plus the last record's boolean
    # byte; the block header still claims 2 records, so decoding hits
    # EOF exactly at the boolean field
    open(path, "wb").write(data[:-17])
    with pytest.raises((EOFError, ValueError)):
        avro_lite.read_avro(path)


def test_avro_lite_datasource_user_schema_skips_inference(spark, tmp_path):
    """An explicit .schema(...) must bypass header inference entirely —
    the DataSource's schema() is never called, and the reader still
    yields rows matching the user-declared types."""
    from aws_insurancelake_etl_spark.sources import avro_lite, pyds

    f = str(tmp_path / "u.avro")
    avro_lite.write_avro(f, ["a", "b"], ["long", "string"], [(1, "x"), (2, "y")])
    pyds.register(spark)
    df = spark.read.format("avro_lite").schema("a bigint, b string").load(f)
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_avro_lite_datasource_corrupt_file_fails_loudly(spark, tmp_path):
    """A corrupt container among the partitions must fail the read with
    the real cause, not silently yield partial data."""
    import pytest

    from aws_insurancelake_etl_spark.sources import avro_lite, pyds

    good = str(tmp_path / "a.avro")
    avro_lite.write_avro(good, ["x"], ["long"], [(1,)])
    (tmp_path / "b.avro").write_bytes(b"Obj\x01garbage-not-a-real-header")
    pyds.register(spark)
    with pytest.raises(Exception) as err:
        spark.read.format("avro_lite").load(str(tmp_path)).collect()
    assert "b.avro" in str(err.value) or "truncated" in str(err.value).lower() \
        or "varint" in str(err.value).lower()
