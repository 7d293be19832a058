"""Orchestrator: path-convention parsing + full-file pipeline run."""

from __future__ import annotations

import json

from aws_insurancelake_etl_spark.orchestrator import parse_drop_path, run_pipeline


def test_parse_drop_path_with_date_override(tmp_path):
    root = str(tmp_path)
    args = parse_drop_path(f"{root}/syntheticgeneral/policydata/2022/3/1/file.csv", root)
    assert args["database"] == "syntheticgeneral"
    assert args["table"] == "policydata"
    assert args["partition"] == {"year": "2022", "month": "03", "day": "01"}
    assert args["base_file_name"] == "file.csv"


def test_parse_drop_path_defaults_to_today(tmp_path):
    root = str(tmp_path)
    args = parse_drop_path(f"{root}/db1/t1/file.csv", root)
    assert len(args["partition"]["year"]) == 4


def test_run_pipeline_end_to_end(spark, tmp_path):
    landing = tmp_path / "landing"
    drop = landing / "orchdb" / "claims" / "2024" / "01" / "15"
    drop.mkdir(parents=True)
    (drop / "claims-day1.csv").write_text(
        "ClaimNo,Amount,Status\n1,100.50,open\n2,200.00,closed\n"
    )
    config_dir = tmp_path / "cfg"
    config_dir.mkdir()
    (config_dir / "orchdb-claims.json").write_text(json.dumps({
        "input_spec": {"csv": {"header": True}},
        "transform_spec": {
            "currency": [{"field": "amount", "format": "10,2"}],
            "titlecase": ["status"],
        },
    }))
    (config_dir / "spark-orchdb-claims.sql").write_text(
        "SELECT claimno, amount, status, year, month, day FROM {database}.{table}"
    )

    summary = run_pipeline(
        spark,
        str(drop / "claims-day1.csv"),
        landing_root=str(landing),
        config_dir=str(config_dir),
        audit_log=str(tmp_path / "audit.jsonl"),
    )
    assert summary["stages"] == ["collect_to_cleanse", "cleanse_to_consume"]
    assert summary["partition"] == {"year": "2024", "month": "01", "day": "15"}

    cleansed = spark.table("orchdb.claims")
    assert cleansed.count() == 2
    assert {r["status"] for r in cleansed.collect()} == {"Open", "Closed"}
    consume = spark.table("orchdb_consume.claims")
    assert consume.count() == 2
    audit = (tmp_path / "audit.jsonl").read_text().strip().splitlines()
    assert len(audit) == 1 and json.loads(audit[0])["database"] == "orchdb"
