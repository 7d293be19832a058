"""File-drop orchestrator: path convention → three-stage pipeline run.

Re-hosts the reference's control plane (S3 event → Lambda path parsing →
Step Functions → Glue jobs; ``state_machine_trigger/lambda_handler.py:85-248``
and ``step_functions_stack.py:100-152``) as one in-process runner:

- dropped file path ``<landing>/<source_system>/<table>/[yyyy/mm/dd/]file``
  names the target database/table;
- partition y/m/d comes from the path override when present, else today;
- stages run in sequence: Collect→Cleanse → Cleanse→Consume (if SQL config
  exists) → Entity-Match (if an entitymatch spec exists);
- every run appends an audit record (the DynamoDB job-audit table becomes a
  JSONL log).
"""

from __future__ import annotations

import datetime
import json
import os
import re
import uuid

from .config import load_dataset_config
from .context import LookupStore, RunContext
from .operators.entitymatch import entity_match, merge_into_primary
from .plans.lineage import LineageLog
from .plans.pipeline import cleanse_to_consume, collect_to_cleanse

_DATE_DIR_RE = re.compile(r"(\d{4})/(\d{1,2})/(\d{1,2})")


def parse_drop_path(path: str, landing_root: str) -> dict:
    """``<root>/<source_system>/<table>/[yyyy/mm/dd/]file`` → run args."""
    rel = os.path.relpath(path, landing_root)
    parts = rel.split(os.sep)
    if len(parts) < 3:
        raise ValueError(
            f"Dropped file path {rel!r} must be <source_system>/<table>/[yyyy/mm/dd/]file"
        )
    database, table, *rest = parts
    file_name = rest[-1]
    date_match = _DATE_DIR_RE.search("/".join(rest[:-1]))
    if date_match:
        year, month, day = date_match.groups()
    else:
        today = datetime.date.today()
        year, month, day = str(today.year), str(today.month), str(today.day)
    return {
        "database": database,
        "table": table,
        "base_file_name": file_name,
        "partition": {"year": year.zfill(4), "month": month.zfill(2), "day": day.zfill(2)},
    }


def run_pipeline(
    spark,
    dropped_file: str,
    landing_root: str,
    config_dir: str,
    lookup_dir: str | None = None,
    audit_log: str | None = None,
    entitymatch_spec: dict | None = None,
    allow_schema_change: str = "permissive",
) -> dict:
    """Run the full pipeline for one dropped file; returns a run summary."""
    args = parse_drop_path(dropped_file, landing_root)
    database, table = args["database"], args["table"]
    execution_id = str(uuid.uuid4())

    ctx = RunContext(
        spark=spark,
        args={"base_file_name": args["base_file_name"], "execution_id": execution_id,
              "database": database, "table": table},
        lineage=LineageLog(execution_id=execution_id, dataset=f"{database}/{table}"),
        lookups=LookupStore(lookup_dir),
    )
    config = load_dataset_config(config_dir, database, table)

    summary: dict = {"execution_id": execution_id, "database": database, "table": table,
                     "partition": args["partition"], "stages": []}

    result = collect_to_cleanse(
        ctx, dropped_file, database, table, config, args["partition"], allow_schema_change
    )
    summary["stages"].append("collect_to_cleanse")
    if result.recommendations:
        summary["recommendations"] = result.recommendations

    if config.spark_sql:
        consume = cleanse_to_consume(
            ctx,
            config.spark_sql,
            database=f"{database}_consume",
            table=table,
            config=config,
            substitutions={"database": database, "table": table, **args["partition"]},
        )
        summary["stages"].append("cleanse_to_consume")
        if entitymatch_spec:
            primary_table = f"{database}_consume.{entitymatch_spec['primary_entity_table']}"
            if spark.catalog.tableExists(primary_table):
                primary = spark.table(primary_table)
                matched = entity_match(consume.df, primary, entitymatch_spec,
                                       persist_intermediates=True)
                merge_into_primary(
                    spark, matched, primary_table, entitymatch_spec["global_id_field"]
                )
            else:
                from pyspark.sql import functions as F  # noqa: PLC0415

                gid = entitymatch_spec["global_id_field"]
                first = consume.df.withColumn(
                    gid,
                    F.coalesce(
                        F.col(gid) if gid in consume.df.columns else F.lit(None), F.expr("uuid()")
                    ),
                )
                first.write.mode("overwrite").format("parquet").saveAsTable(primary_table)
            summary["stages"].append("entity_match")

    if audit_log:
        with open(audit_log, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(summary, default=str) + "\n")
    return summary
