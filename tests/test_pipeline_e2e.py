"""End-to-end pipeline: CSV drop → mapping → DQ → transforms → partitioned
Cleanse table → Spark SQL → Consume table + view (mirrors the reference's
job-level integration tests, ``test/test_etl_collect_to_cleanse.py`` /
``test_etl_cleanse_to_consume.py``)."""

from __future__ import annotations

import json

import pytest

from aws_insurancelake_etl_spark.config import DatasetConfig, load_dataset_config
from aws_insurancelake_etl_spark.context import RunContext
from aws_insurancelake_etl_spark.plans.lineage import LineageLog
from aws_insurancelake_etl_spark.plans.pipeline import cleanse_to_consume, collect_to_cleanse

CSV = """PolicyNumber,EffectiveDate,ExpirationDate,WrittenPremium,InsuredName,StateCd,NewRenewal
101,2022-01-01,2022-12-31,12000.50,acme corp,TX,New
102,2022-03-15,2023-03-15,"4,500.00",beta llc,CA,Renewal
103,2022-06-01,2023-06-01,-50.00,gamma inc,ZZ,New
"""

SPEC = {
    "input_spec": {"csv": {"header": True}},
    "transform_spec": {
        "date": [
            {"field": "effectivedate", "format": "yyyy-MM-dd"},
            {"field": "expirationdate", "format": "yyyy-MM-dd"},
        ],
        "currency": [{"field": "writtenpremium", "format": "10,2"}],
        "titlecase": ["insuredname"],
        "lookup": [
            {"field": "statename", "source": "statecd", "lookup": "StateCd",
             "nomatch": "N/A"}
        ],
        "policymonths": [
            {"field": "policymonths", "policy_effective_date": "effectivedate",
             "policy_expiration_date": "expirationdate", "normalized": True}
        ],
        "literal": {"lineofbusiness": "general"},
    },
}

MAPPING = """SourceName,DestName,Threshold,Scorer
PolicyNumber,policynumber,,
EffectiveDate,effectivedate,,
ExpirationDate,expirationdate,,
WrittenPremium,writtenpremium,,
InsuredName,insuredname,,
StateCd,statecd,,
NewOrRenewal,neworrenewal,85,ratio
"""

DQ = {
    # NOTE: before_transform runs after schema mapping (reference order:
    # etl_collect_to_cleanse.py:252-268), so rules see mapped column names.
    "before_transform": {
        "warn_rules": ["Completeness 'policynumber' > 0.9"],
    },
    "after_transform": {
        "quarantine_rules": ["ColumnValues 'writtenpremium' >= 0"],
        "halt_rules": ["(ColumnExists 'policynumber') and (IsComplete 'policynumber')"],
    },
}


@pytest.fixture()
def config_dir(tmp_path):
    d = tmp_path / "etl-config"
    d.mkdir()
    (d / "testdb-policies.json").write_text(json.dumps(SPEC))
    (d / "testdb-policies.csv").write_text(MAPPING)
    (d / "dq-testdb-policies.json").write_text(json.dumps(DQ))
    (d / "spark-testdb-policies.sql").write_text(
        "SELECT policynumber, statename, writtenpremium, policymonths,"
        " year, month, day FROM {database}.{table} WHERE writtenpremium > 5000"
    )
    (d / "view-testdb-policies.sql").write_text(
        "CREATE OR REPLACE VIEW {database}.policy_summary AS"
        " SELECT policynumber, writtenpremium FROM {database}.policies_consume"
    )
    return str(d)


def test_collect_to_cleanse_and_consume(spark, tmp_path, config_dir):
    source = tmp_path / "drop" / "policies-20220301.csv"
    source.parent.mkdir()
    source.write_text(CSV)

    ctx = RunContext(
        spark=spark,
        args={"base_file_name": source.name, "execution_id": "run-1"},
        lineage=LineageLog(execution_id="run-1", dataset="testdb/policies"),
    )
    ctx.lookups.put_values("StateCd", {"TX": "Texas", "CA": "California"})
    config = load_dataset_config(config_dir, "testdb", "policies")
    assert config.spark_sql is not None

    result = collect_to_cleanse(
        ctx,
        str(source),
        database="testdb",
        table="policies",
        config=config,
        partition={"year": "2022", "month": "03", "day": "01"},
    )

    cleansed = spark.table("testdb.policies")
    rows = {r["policynumber"]: r for r in cleansed.collect()}
    # negative premium row quarantined
    assert set(rows) == {101, 102}
    assert rows[101]["statename"] == "Texas"
    assert rows[101]["insuredname"] == "Acme Corp"
    assert str(rows[102]["writtenpremium"]) == "4500.00"
    assert rows[101]["policymonths"] == 11
    assert rows[101]["year"] == 2022 or str(rows[101]["year"]) == "2022"
    # fuzzy-mapped column made it through
    assert "neworrenewal" in cleansed.columns
    # quarantine table exists with the bad row
    quarantined = spark.table("testdb.policies_quarantine_after_transform")
    assert quarantined.count() == 1
    assert "quarantine_timestamp" in quarantined.columns

    # ---- consume stage ----
    consume = cleanse_to_consume(
        ctx,
        "CREATE TABLE policies_consume AS " + config.spark_sql,
        database="testdb",
        table="policies",
        config=config,
        substitutions={"database": "testdb", "table": "policies"},
    )
    assert consume.table == "policies_consume"
    out = spark.table("testdb.policies_consume")
    assert [r["policynumber"] for r in out.collect()] == [101]
    view = spark.sql("SELECT * FROM testdb.policy_summary")
    assert view.count() == 1

    # lineage captured read/write/transform events in order
    ops = [e["operation"] for e in ctx.lineage.events]
    assert "read" in ops and "write" in ops and "mapping" in ops

    # re-run same partition is idempotent (partition cleared first)
    collect_to_cleanse(
        ctx, str(source), "testdb", "policies", config,
        {"year": "2022", "month": "03", "day": "01"},
    )
    assert spark.table("testdb.policies").count() == 2


def test_missing_config_gracefully_empty(tmp_path):
    cfg = load_dataset_config(str(tmp_path), "nodb", "notable")
    assert cfg.transform_spec == {} and cfg.mapping == [] and cfg.spark_sql is None
    assert isinstance(cfg, DatasetConfig)


def test_compact_partition_merges_small_files(spark, ctx):
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.plans.writer import compact_partition

    db, tbl = "compactdb", "events_c"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    # simulate 6 per-drop appends -> 6+ small files in one partition
    for i in range(6):
        (
            spark.range(i * 10, (i + 1) * 10)
            .withColumn("year", F.lit("2024"))
            .write.mode("append").format("parquet")
            .partitionBy("year")
            .saveAsTable(f"{db}.{tbl}")
        )
    before = spark.table(f"{db}.{tbl}").where("year = '2024'").inputFiles()
    assert len(before) >= 6
    result = compact_partition(ctx, db, tbl, {"year": "2024"}, target_file_mb=128)
    assert result["files_before"] >= 6 and result["files_after"] == 1
    after_df = spark.table(f"{db}.{tbl}").where("year = '2024'")
    assert len(after_df.inputFiles()) == 1
    assert after_df.count() == 60
    assert {r["id"] for r in after_df.select("id").collect()} == set(range(60))


def test_range_partitioned_write_yields_disjoint_file_ranges(spark, ctx):
    import pyarrow.parquet as pq

    from aws_insurancelake_etl_spark.plans.writer import write_range_partitioned

    df = spark.range(0, 100_000).withColumnRenamed("id", "k")
    write_range_partitioned(df, "layoutdb", "sorted_k", ["k"], ctx, n_files=8)
    files = spark.table("layoutdb.sorted_k").inputFiles()
    assert len(files) == 8
    ranges = []
    for path in files:
        meta = pq.ParquetFile(path.removeprefix("file:")).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # disjoint: each file's max < next file's min -> a key predicate can
    # skip every other file on footer statistics alone
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo
    assert spark.table("layoutdb.sorted_k").count() == 100_000


def test_zorder_layout_bounds_both_dimensions(spark, ctx):
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from aws_insurancelake_etl_spark.plans.writer import (
        write_range_partitioned,
        write_zorder_table,
    )

    # 256x256 grid; z-order into 16 files -> each file's (x, y) spans must
    # both be bounded (~quadrant-sized), unlike a linear sort where the
    # second column spans the full domain in every file.
    grid = (
        spark.range(256 * 256)
        .select((F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y"))
    )
    write_zorder_table(grid, "layoutdb", "zorder_xy", ["x", "y"], ctx, n_files=16, bits=8)
    files = spark.table("layoutdb.zorder_xy").inputFiles()
    assert len(files) == 16

    def file_spans(paths):
        out = []
        for path in paths:
            meta = pq.ParquetFile(path.removeprefix("file:")).metadata
            spans = {}
            for rg in range(meta.num_row_groups):
                for ci in range(meta.row_group(rg).num_columns):
                    col = meta.row_group(rg).column(ci)
                    name = col.path_in_schema
                    lo, hi = col.statistics.min, col.statistics.max
                    cur = spans.get(name, (lo, hi))
                    spans[name] = (min(cur[0], lo), max(cur[1], hi))
            out.append({k: hi - lo for k, (lo, hi) in spans.items()})
        return out

    # Files that straddle a z-curve quadrant boundary can span a full
    # dimension (range boundaries aren't tile-aligned); the layout claim
    # is statistical: MOST files bound BOTH dims.
    z_spans = file_spans(files)
    bounded = sum(1 for s in z_spans if s["x"] <= 128 and s["y"] <= 128)
    assert bounded >= 12, z_spans

    # Contrast: a linear sort on x leaves y unbounded in EVERY file.
    write_range_partitioned(grid, "layoutdb", "linear_x", ["x"], ctx, n_files=16)
    lin_spans = file_spans(spark.table("layoutdb.linear_x").inputFiles())
    assert all(s["y"] >= 250 for s in lin_spans)
    assert spark.table("layoutdb.zorder_xy").count() == 256 * 256


def test_consume_sql_reads_lakehouse_refs(ctx, spark, tmp_path):
    """A spark-*.sql consume file can join the cleanse catalog table
    with a delta/iceberg path reference — rewritten to protocol-reader
    views, the rest of the statement goes to Catalyst verbatim."""
    from aws_insurancelake_etl_spark.plans.pipeline import cleanse_to_consume
    from aws_insurancelake_etl_spark.sources import delta_lite

    dim = str(tmp_path / "dim")
    delta_lite.write_delta(
        spark.createDataFrame(
            [("r1", "EAST"), ("r2", "WEST")], "rk string, region string"
        ),
        dim,
    )
    spark.createDataFrame(
        [(1, "r1", 10.0), (2, "r2", 20.0), (3, "r1", 30.0)],
        "id int, rk string, v double",
    ).createOrReplaceTempView("fact_src")
    res = cleanse_to_consume(
        ctx,
        f"SELECT f.id, d.region, f.v FROM fact_src f "
        f"JOIN delta.`{dim}` d ON f.rk = d.rk",
        database="testdb_lh",
        table="fact_with_region",
    )
    got = sorted((r["id"], r["region"]) for r in res.df.collect())
    assert got == [(1, "EAST"), (2, "WEST"), (3, "EAST")]


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_cleanse_zone_on_lakehouse_table(ctx, spark, tmp_path, fmt):
    """Collect-to-Cleanse with table_format=delta|iceberg: the write is
    a transactional commit, a re-run of the SAME partition is
    idempotent (partition-aligned DELETE then append), and downstream
    consume SQL reads the table by NAME through the registry."""
    import csv as _csv

    from aws_insurancelake_etl_spark.config import DatasetConfig
    from aws_insurancelake_etl_spark.plans.pipeline import (
        cleanse_to_consume,
        collect_to_cleanse,
    )
    from aws_insurancelake_etl_spark.sources import delta_lite, iceberg_lite
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        unregister_table,
    )

    src = tmp_path / "drop.csv"
    with open(src, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["policy_id", "premium"])
        w.writerows([[1, "100.5"], [2, "200.25"], [3, "-5"]])
    cfg = DatasetConfig(
        input_spec={"csv": {"header": True}},
        transform_spec={
            "changetype": {"premium": "Decimal(16,2)"},
            "filterrows": [{"condition": "premium >= 0"}],
        },
        mapping=None,
        dq_rules={},
    )
    db = f"lkz_{fmt}"
    part = {"year": "2026", "month": "08", "day": "16"}
    for _ in range(2):  # second run must be idempotent
        res = collect_to_cleanse(
            ctx, str(src), db, "policies", cfg, part,
            table_format=fmt,
        )
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    path = f"{warehouse}/{db}.lakehouse/policies"
    read = (
        delta_lite.read_delta(spark, path)
        if fmt == "delta"
        else iceberg_lite.read_iceberg(spark, path)
    )
    assert read.count() == 2  # filtered, not doubled
    try:
        out = cleanse_to_consume(
            ctx,
            f"SELECT policy_id, premium * 2 AS dbl FROM {db}.policies",
            database=db + "_consume",
            table="policy_dbl",
        )
        assert sorted(r["policy_id"] for r in out.df.collect()) == [1, 2]
    finally:
        unregister_table(f"{db}.policies")


def test_consume_zone_on_lakehouse_rebuild(ctx, spark, tmp_path):
    """cleanse_to_consume(table_format='iceberg'): the full-table
    rebuild is a REPLACE snapshot — a second run overwrites in ONE
    commit and the previous consume state stays travelable."""
    from aws_insurancelake_etl_spark.plans.pipeline import cleanse_to_consume
    from aws_insurancelake_etl_spark.sources import iceberg_lite
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        unregister_table,
    )

    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"
    ).createOrReplaceTempView("consume_src")
    db = "lkz_consume_ice"
    try:
        cleanse_to_consume(
            ctx, "SELECT id, v FROM consume_src", database=db,
            table="agg", table_format="iceberg",
        )
        cleanse_to_consume(
            ctx, "SELECT id, v * 2 AS v FROM consume_src", database=db,
            table="agg", table_format="iceberg",
        )
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir"
        ).replace("file:", "")
        path = f"{warehouse}/{db}.lakehouse/agg"
        now = iceberg_lite.read_iceberg(spark, path)
        assert sorted(r["v"] for r in now.collect()) == [20.0, 40.0]
        snaps = iceberg_lite.snapshot_ids(path)
        assert len(snaps) == 2
        old = iceberg_lite.read_iceberg(spark, path, snapshot_id=snaps[0])
        assert sorted(r["v"] for r in old.collect()) == [10.0, 20.0]
    finally:
        unregister_table(f"{db}.agg")


def test_lakehouse_strict_policy_blocks_schema_change(ctx, spark, tmp_path):
    """The lakehouse cleanse write honors the SAME policy matrix as
    parquet: strict refuses an added column on both formats; a typo'd
    policy raises."""
    from aws_insurancelake_etl_spark.plans.writer import (
        add_partition_columns,
        write_cleanse_table,
    )
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        unregister_table,
    )

    part = {"year": "2026", "month": "01", "day": "01"}
    for fmt in ("delta", "iceberg"):
        db = f"strict_{fmt}"
        loc = str(tmp_path / fmt)
        base = add_partition_columns(
            spark.createDataFrame([(1, "a")], "id int, v string"), part
        )
        write_cleanse_table(
            base, db, "t", part, ctx, "strict",
            table_format=fmt, table_location=loc,
        )
        wider = add_partition_columns(
            spark.createDataFrame(
                [(2, "b", 9.0)], "id int, v string, extra double"
            ),
            part,
        )
        with pytest.raises(RuntimeError, match="not allowed"):
            write_cleanse_table(
                wider, db, "t", part, ctx, "strict",
                table_format=fmt, table_location=loc,
            )
        with pytest.raises(RuntimeError, match="Unsupported value"):
            write_cleanse_table(
                base, db, "t", part, ctx, "premissive",
                table_format=fmt, table_location=loc,
            )
        unregister_table(f"{db}.t")


def test_lakehouse_view_sql_over_registry(ctx, spark, tmp_path):
    """view_sql referencing a lakehouse-registered consume table: the
    rewrite makes the view TEMPORARY (Spark forbids permanent views
    over temp relations) and it must be queryable."""
    from aws_insurancelake_etl_spark.config import DatasetConfig
    from aws_insurancelake_etl_spark.plans.pipeline import cleanse_to_consume
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        unregister_table,
    )

    spark.createDataFrame(
        [(1, 10.0)], "id int, v double"
    ).createOrReplaceTempView("vsrc")
    db = "lkz_view"
    cfg = DatasetConfig(
        input_spec={}, transform_spec={}, mapping=None, dq_rules={},
        view_sql=f"CREATE OR REPLACE VIEW vz AS SELECT * FROM {db}.agg",
    )
    try:
        cleanse_to_consume(
            ctx, "SELECT id, v FROM vsrc", database=db, table="agg",
            config=cfg, table_format="delta",
        )
        assert spark.table("vz").count() == 1
    finally:
        unregister_table(f"{db}.agg")


def test_iceberg_consume_rebuild_survives_schema_change(ctx, spark, tmp_path):
    from aws_insurancelake_etl_spark.plans.pipeline import cleanse_to_consume
    from aws_insurancelake_etl_spark.plans.writer import lakehouse_table_path
    from aws_insurancelake_etl_spark.sources import iceberg_lite
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        unregister_table,
    )

    spark.createDataFrame(
        [(1, 10.0)], "id int, v double"
    ).createOrReplaceTempView("csrc")
    db = "lkz_reshape"
    try:
        cleanse_to_consume(
            ctx, "SELECT id, v FROM csrc", database=db, table="agg",
            table_format="iceberg",
        )
        cleanse_to_consume(
            ctx, "SELECT id, v AS renamed FROM csrc", database=db,
            table="agg", table_format="iceberg",
        )
        path = lakehouse_table_path(spark, db, "agg")
        read = iceberg_lite.read_iceberg(spark, path)
        assert set(read.columns) == {"id", "renamed"}
    finally:
        unregister_table(f"{db}.agg")


def test_script_trailing_comment_ok(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources.lakehouse_sql import (
        lakehouse_sql_script,
    )

    path = str(tmp_path / "tc")
    out = lakehouse_sql_script(
        spark,
        f"CREATE TABLE delta.`{path}` AS SELECT 1 AS id;\n-- done\n",
    )
    assert out is not None
