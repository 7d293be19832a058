"""Structured Streaming ingest + multimodal column plumbing."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_insurancelake_etl_spark.operators.multimodal import (
    decode_and_featurize,
    extract_media_metadata,
    sniff_content_type_bytes,
)
from aws_insurancelake_etl_spark.streaming.ingest import (
    micro_batch_ingest,
    windowed_event_counts,
)


def test_micro_batch_ingest_drains_files(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    (src / "batch1.csv").write_text("id,amount\n1,10\n2,20\n")
    (src / "batch2.csv").write_text("id,amount\n3,30\n")
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("amount", T.IntegerType())]
    )
    out_dir = str(tmp_path / "lake")
    query = micro_batch_ingest(
        spark,
        str(src),
        schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_path=out_dir,
        transform=lambda df: df.withColumn("amount2", F.col("amount") * 2),
    )
    query.awaitTermination(120)
    result = spark.read.parquet(out_dir)
    assert result.count() == 3
    assert {r["amount2"] for r in result.collect()} == {20, 40, 60}

    # A restart with one new file processes ONLY the new file (checkpoint).
    (src / "batch3.csv").write_text("id,amount\n4,40\n")
    query2 = micro_batch_ingest(
        spark, str(src), schema,
        checkpoint_dir=str(tmp_path / "ckpt"), output_path=out_dir,
        transform=lambda df: df.withColumn("amount2", F.col("amount") * 2),
    )
    query2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 4


def test_windowed_event_counts_streaming(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    (src / "e.csv").write_text(
        "ts,event_type,value\n"
        "2024-01-01 00:01:00,click,1.0\n"
        "2024-01-01 00:02:00,click,2.0\n"
        "2024-01-01 00:15:00,view,3.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.format("csv").schema(schema).option("header", "true").load(str(src))
    windowed = windowed_event_counts(stream)
    query = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = {(r["event_type"], str(r["window_start"])): r["n_events"]
            for r in spark.sql("select * from win_counts").collect()}
    assert rows[("click", "2024-01-01 00:00:00")] == 2
    assert rows[("view", "2024-01-01 00:10:00")] == 1


JPEG = b"\xff\xd8\xff\xe0" + b"\x01\x02\x03\x04" * 10
PNG = b"\x89PNG\r\n\x1a\n" + b"\x05\x06" * 20


def test_sniff_content_type():
    assert sniff_content_type_bytes(JPEG) == "image/jpeg"
    assert sniff_content_type_bytes(PNG) == "image/png"
    assert sniff_content_type_bytes(b"plainbytes") == "application/octet-stream"
    assert sniff_content_type_bytes(None) == "unknown"


def _media_df(spark):
    return spark.createDataFrame(
        [(1, bytearray(JPEG)), (2, bytearray(PNG))],
        T.StructType(
            [T.StructField("media_id", T.LongType()),
             T.StructField("payload", T.BinaryType())]
        ),
    )


def test_extract_media_metadata(spark):
    out = {r["media_id"]: r for r in extract_media_metadata(_media_df(spark)).collect()}
    assert out[1]["content_type"] == "image/jpeg"
    assert out[2]["content_type"] == "image/png"
    assert out[1]["n_bytes"] == len(JPEG)
    assert len(out[1]["content_sha256"]) == 64


def test_decode_and_featurize_stub(spark):
    out = {r["media_id"]: r["feature"] for r in decode_and_featurize(_media_df(spark)).collect()}
    assert len(out[1]) == 8
    assert abs(sum(out[1]) - 1.0) < 1e-6  # normalized histogram
    # Deterministic: same payload → same feature.
    again = {r["media_id"]: r["feature"] for r in decode_and_featurize(_media_df(spark)).collect()}
    assert out == again


def test_bmp_golden_bytes_decode():
    """Hand-built BMP per the public BITMAPINFOHEADER spec (NOT produced
    by encode_bmp): 2x2, 24bpp, bottom-up, padded rows — pins stride,
    row order, and BGR->RGB so a symmetric encode/decode bug can't hide
    behind round-trip tests."""
    import struct

    from aws_insurancelake_etl_spark.operators.multimodal import decode_bmp

    # image top-down RGB: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    bottom_row = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    top_row = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    body = bottom_row + top_row  # bottom-up storage
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    assert decode_bmp(hdr + body) == (
        2, 2,
        bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]),
    )
    # top-down variant (negative height) stores rows in display order
    hdr_td = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    body_td = top_row + bottom_row
    assert decode_bmp(hdr_td + body_td)[2] == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )


def test_ppm_golden_bytes_decode_and_guards():
    import pytest

    from aws_insurancelake_etl_spark.operators.multimodal import (
        decode_bmp, decode_ppm,
    )

    # header with a comment line and mixed whitespace, per netpbm spec
    golden = b"P6 # a comment\n2\t1 # another\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    assert decode_ppm(golden) == (2, 1, bytes([10, 20, 30, 40, 50, 60]))
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00\x00")
    with pytest.raises(NotImplementedError, match="24-bit"):
        import struct as s
        decode_bmp(
            s.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
            + s.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 0, 0, 0, 0, 0)
        )


def test_codec_roundtrip_and_default_featurize(spark):
    from aws_insurancelake_etl_spark.operators.multimodal import (
        decode_and_featurize, decode_bmp, decode_ppm, encode_bmp, encode_ppm,
        image_stat_features,
    )

    w, h = 5, 3
    rgb = bytes((x * 3 + y * 5 + c) % 256
                for y in range(h) for x in range(w) for c in range(3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert image_stat_features(encode_ppm(w, h, rgb)) == [5.0, 3.0, 11.0, 12.0, 13.0]
    assert image_stat_features(JPEG) is None  # no stdlib codec -> stub path

    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(w, h, rgb))),
         (2, bytearray(encode_ppm(w, h, rgb))),
         (3, bytearray(JPEG))],
        T.StructType(
            [T.StructField("media_id", T.LongType()),
             T.StructField("payload", T.BinaryType())]
        ),
    )
    out = {r["media_id"]: r["feature"] for r in decode_and_featurize(df).collect()}
    # BMP and PPM of the same pixels -> identical REAL stats features
    assert out[1] == out[2] == [5.0, 3.0, 11.0, 12.0, 13.0]
    # undecodable payload falls through to the 8-bucket histogram stub
    assert len(out[3]) == 8 and abs(sum(out[3]) - 1.0) < 1e-6


def test_wav_golden_bytes_and_chunk_tolerance():
    """Hand-built RIFF bytes (not via encode_wav): extra LIST chunk
    before fmt, odd-size chunk padding, 16-bit signed samples — pins the
    chunk walk against the public spec."""
    import struct

    from aws_insurancelake_etl_spark.operators.multimodal import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    samples = [0, 1000, -1000, 32767, -32768]
    body = struct.pack("<5h", *samples)
    # odd-size junk chunk (3 bytes) must be padded to even when walking
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    chunks = (b"WAVE" + junk
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    wav = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    assert decode_wav(wav) == (8000, 1, samples)


def test_wav_roundtrip_8_and_16_bit_and_guards():
    import struct

    import pytest

    from aws_insurancelake_etl_spark.operators.multimodal import (
        audio_stat_features, decode_wav, encode_wav,
    )

    samples = [((i * 37) % 513) - 256 for i in range(100)]
    assert decode_wav(encode_wav(44100, 2, samples)) == (44100, 2, samples)
    small = [((i * 7) % 255) - 128 for i in range(31)]  # odd data size pads
    assert decode_wav(encode_wav(8000, 1, small, bits=8)) == (8000, 1, small)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    # float PCM (format 3) -> named NotImplementedError
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav3 = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3)
    with pytest.raises(NotImplementedError, match="format 3"):
        decode_wav(wav3)

    feats = audio_stat_features(encode_wav(8000, 1, [3, -4, 0, 5]))
    assert feats[0] == 8000.0 and feats[1] == 1.0 and feats[2] == 4.0
    assert abs(feats[3] - (50 / 4) ** 0.5) < 1e-6  # rms of 3,-4,0,5
    assert feats[4] == 2.0  # 3->-4 and -4->0 (0 counts as >=0)
    assert audio_stat_features(b"RIFFxxxxAVI ") is None  # RIFF, not WAVE


def test_stateful_user_totals_across_batches(spark, tmp_path):
    from aws_insurancelake_etl_spark.streaming.ingest import stateful_user_totals

    src = tmp_path / "evt"
    src.mkdir()
    (src / "b1.csv").write_text("user_id,value\n1,10.5\n1,2.0\n2,1.0\n")
    (src / "b2.csv").write_text("user_id,value\n1,7.5\n2,3.0\n3,9.0\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .csv(str(src))
    )
    out = stateful_user_totals(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.table("stateful_totals").collect()
    # state accumulated ACROSS batches: the final emission per user is the
    # running total over both files
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 20.0)
    assert final[2] == (2, 4.0)
    assert final[3] == (1, 9.0)
    # user 1 appears in both batches -> two emissions (running state visible)
    assert sum(1 for r in rows if r["user_id"] == 1) == 2


def test_transform_with_state_matches_group_state_twin(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (ValueState handle, processor
    lifecycle) accumulates across micro-batches with the same results as
    the applyInPandasWithState twin — both run over identical batches.

    The API's state server speaks protobuf between the JVM and a Python
    driver worker; without the protobuf package the worker crashes on
    startup (verified: ModuleNotFoundError 'google'), so this skips in
    protobuf-less containers — the GroupState twin above remains the
    always-tested stateful path."""
    pytest.importorskip("google.protobuf")
    from aws_insurancelake_etl_spark.streaming.ingest import (
        stateful_user_totals_tws,
    )

    src = tmp_path / "evt"
    src.mkdir()
    (src / "b1.csv").write_text("user_id,value\n1,10.5\n1,2.0\n2,1.0\n")
    (src / "b2.csv").write_text("user_id,value\n1,7.5\n2,3.0\n3,9.0\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    out = stateful_user_totals_tws(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.table("tws_totals").collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 20.0)
    assert final[2] == (2, 4.0)
    assert final[3] == (1, 9.0)
    assert sum(1 for r in rows if r["user_id"] == 1) == 2


def test_streaming_dedup_across_batches(spark, tmp_path):
    from aws_insurancelake_etl_spark.streaming.ingest import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    # b2 fully replays b1 (redelivery) and adds one new event.
    (src / "b1.csv").write_text("event_id,value\n1,10.0\n2,20.0\n")
    (src / "b2.csv").write_text("event_id,value\n1,10.0\n2,20.0\n3,30.0\n")
    schema = T.StructType(
        [T.StructField("event_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # replay lands in its own micro-batch
        .option("header", True)
        .csv(str(src))
    )
    out = streaming_dedup(stream, keys=("event_id",))
    query = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.table("dedup_sink").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_sample_frames_strides_and_cap(spark):
    import hashlib

    payload = b"GIF8" + b"x" * 600  # 604 bytes -> frames of 256/256/92
    big = b"y" * 5000  # would be 20 frames -> capped at 8
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(big))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    from aws_insurancelake_etl_spark.operators.multimodal import sample_frames

    rows = sample_frames(df, frame_size=256, max_frames=8).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    f1 = sorted(by_media[1], key=lambda r: r["frame_index"])
    assert [(r["frame_index"], r["frame_offset"], r["n_frame_bytes"]) for r in f1] == [
        (1, 0, 256), (2, 256, 256), (3, 512, 92)
    ]
    assert f1[0]["frame_sha256"] == hashlib.sha256(payload[:256]).hexdigest()
    assert len(by_media[2]) == 8  # max_frames cap


def test_sample_frames_pluggable_decoder(spark):
    df = spark.createDataFrame(
        [(7, bytearray(b"abcdef"))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    from aws_insurancelake_etl_spark.operators.multimodal import sample_frames

    def fake_codec(data: bytes):
        return [data[:2], data[2:4]]

    rows = sample_frames(df, real_decoder=fake_codec).collect()
    assert [(r["frame_index"], r["frame_offset"], r["n_frame_bytes"]) for r in rows] == [
        (1, -1, 2), (2, -1, 2)
    ]


def test_streaming_restart_from_checkpoint(spark, tmp_path):
    """Exactly-once across a STOP/RESTART: a windowed-count query runs to
    completion on batch 1, stops, new data lands, and a SECOND query
    started from the SAME checkpoint processes only the new file —
    committed offsets survive the restart, nothing is reprocessed and
    nothing is lost.  This is the recovery path a production stream
    relies on after every deploy/crash."""
    src = tmp_path / "evt"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("header", True).csv(str(src)))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain within 120s"

    (src / "b1.csv").write_text("user_id,value\n1,10.0\n2,20.0\n")
    run_once()
    first = spark.read.parquet(out_dir).count()
    assert first == 2

    (src / "b2.csv").write_text("user_id,value\n3,30.0\n")
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    # 3 rows total: batch 1 NOT reprocessed (no duplicates), batch 2 present
    assert sorted((r.user_id, r.value) for r in rows) == [
        (1, 10.0), (2, 20.0), (3, 30.0)
    ]


def test_streamed_cdf_on_column_mapped_table(spark, tmp_path):
    """round 8: the streaming CDF source resolves physical column names
    and physically-keyed partitionValues on a column-mapped table."""
    import uuid as _uuid

    from pyspark.sql import Row

    from aws_insurancelake_etl_spark.sources import delta_lite as dl
    from aws_insurancelake_etl_spark.sources import pyds

    pyds.register(spark)
    path = str(tmp_path / "cm_stream")
    df = spark.createDataFrame(
        [Row(id=i, grp="a" if i % 2 else "b", v=float(i)) for i in range(6)]
    ).select("id", "grp", "v")
    dl.write_delta(
        df, path, partition_by=["grp"], column_mapping="name",
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    dl.write_delta(
        spark.createDataFrame([Row(id=10, grp="a", v=10.0)])
        .select("id", "grp", "v"),
        path,
    )
    dl.delete_delta(spark, path, "id = 3")
    sink = f"cmstream_{_uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("delta_lite")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load(path)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(
        (r["_change_type"], r["id"], r["grp"])
        for r in spark.table(sink).collect()
    )
    assert got == [("delete", 3, "a"), ("insert", 10, "a")]


def test_iceberg_stream_source_tails_appends_and_refuses_merges(
    spark, tmp_path
):
    """Round 9: the iceberg_lite streaming source — snapshot-id
    offsets, initial snapshot then appended files only; a MERGE in
    range fails the stream by snapshot id (append-only semantics,
    like Iceberg's own streaming read)."""
    import pytest as _pytest

    from aws_insurancelake_etl_spark.sources import iceberg_lite, pyds

    pyds.register(spark)
    path = str(tmp_path / "istream")
    iceberg_lite.write_iceberg(
        spark, spark.range(4).selectExpr("id", "id * 2 as v"), path
    )
    iceberg_lite.write_iceberg(
        spark, spark.range(4, 6).selectExpr("id", "id * 2 as v"), path
    )
    q = (
        spark.readStream.format("iceberg_lite")
        .load(path)
        .writeStream.format("memory")
        .queryName("istream_t1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.sql("select * from istream_t1").collect())
    assert got == [0, 1, 2, 3, 4, 5]
    # startingSnapshotId=2: only the second append
    q2 = (
        spark.readStream.format("iceberg_lite")
        .option("startingSnapshotId", 2)
        .load(path)
        .writeStream.format("memory")
        .queryName("istream_t2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = sorted(r.id for r in spark.sql("select * from istream_t2").collect())
    assert got2 == [4, 5]
    # a MERGE snapshot in range refuses
    iceberg_lite.merge_iceberg(
        spark, spark.range(2).selectExpr("id", "id * 9 as v"), path, ["id"]
    )
    q3 = (
        spark.readStream.format("iceberg_lite")
        .option("startingSnapshotId", 2)
        .load(path)
        .writeStream.format("memory")
        .queryName("istream_t3")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception, match="not pure appends"):
        q3.awaitTermination(120)


def test_kafka_reader_options_mapping():
    """Pure option mapping for the jar-gated Kafka source (VERDICT r10
    #7) — testable without the jar."""
    from aws_insurancelake_etl_spark.streaming.ingest import (
        kafka_reader_options,
    )

    opts = kafka_reader_options(
        "b1:9092,b2:9092",
        ["t1", "t2"],
        starting_offsets={"t1": {"0": 23}},
        max_offsets_per_trigger=1000,
        fail_on_data_loss=False,
        kafka_options={"security.protocol": "SASL_SSL"},
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == '{"t1": {"0": 23}}'
    assert opts["maxOffsetsPerTrigger"] == "1000"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.security.protocol"] == "SASL_SSL"

    patt = kafka_reader_options("b:9092", subscribe_pattern="logs-.*")
    assert patt["subscribePattern"] == "logs-.*"
    assign = kafka_reader_options("b:9092", assign={"t1": [0, 1]})
    assert assign["assign"] == '{"t1": [0, 1]}'

    import pytest as _pt

    with _pt.raises(ValueError, match="exactly one"):
        kafka_reader_options("b:9092", ["t"], subscribe_pattern="x")
    with _pt.raises(ValueError, match="exactly one"):
        kafka_reader_options("b:9092")


def test_kafka_refuses_by_name_without_jar(spark):
    """In-container (no spark-sql-kafka jar) the entry point refuses
    with a named, actionable error — never Spark's opaque 'failed to
    find data source'."""
    import pytest as _pt

    from aws_insurancelake_etl_spark.streaming.ingest import (
        KafkaSourceUnavailable,
        kafka_available,
        read_kafka_stream,
    )

    if kafka_available(spark):
        _pt.skip("kafka jar present; the refusal path is inert")
    with _pt.raises(KafkaSourceUnavailable, match="spark-sql-kafka"):
        read_kafka_stream(spark, "b:9092", ["t"])


def test_iceberg_stream_source_surfaces_v3_defaults(spark, tmp_path):
    """Round 11: the streaming source fills v3 initial-defaults for
    files predating the column — top-level, struct-typed, and nested —
    exactly like the batch reader (which is the oracle here)."""
    from aws_insurancelake_etl_spark.sources import iceberg_lite, pyds

    pyds.register(spark)
    path = str(tmp_path / "idflt")
    iceberg_lite.write_iceberg(
        spark, spark.createDataFrame([(1,), (2,)], "id int"), path,
        format_version=3,
    )
    iceberg_lite.alter_iceberg_schema(
        path,
        adds={
            "region": {"type": "string", "default": "EMEA"},
            "s": {
                "type": {
                    "type": "struct",
                    "fields": [{"name": "a", "type": "int"}],
                },
                "default": {"a": 5},
            },
        },
    )
    iceberg_lite.write_iceberg(
        spark,
        spark.sql(
            "select 3 as id, 'APAC' as region, named_struct('a', 9) as s"
        ),
        path,
    )
    iceberg_lite.alter_iceberg_schema(
        path, adds={"s.b": {"type": "string", "default": "nb"}}
    )
    q = (
        spark.readStream.format("iceberg_lite")
        .load(path)
        .writeStream.format("memory")
        .queryName("idflt_t")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "cp")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        (r["id"], r["region"], r["s"]["a"], r["s"]["b"])
        for r in spark.table("idflt_t").collect()
    )
    batch = sorted(
        (r["id"], r["region"], r["s"]["a"], r["s"]["b"])
        for r in iceberg_lite.read_iceberg(spark, path).collect()
    )
    assert streamed == batch
    assert streamed == [
        (1, "EMEA", 5, "nb"),
        (2, "EMEA", 5, "nb"),
        (3, "APAC", 9, "nb"),
    ]


def test_kafka_batch_refuses_by_name_without_jar(spark):
    import pytest as _pt

    from aws_insurancelake_etl_spark.streaming.ingest import (
        KafkaSourceUnavailable,
        kafka_available,
        read_kafka_batch,
    )

    if kafka_available(spark):
        _pt.skip("kafka jar present; the refusal path is inert")
    with _pt.raises(KafkaSourceUnavailable, match="spark-sql-kafka"):
        read_kafka_batch(spark, "b:9092", ["t"])
