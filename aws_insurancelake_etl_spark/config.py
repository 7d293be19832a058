"""Per-dataset config discovery: transform spec JSON, mapping CSV, DQ rules
JSON, SQL files — by the reference's ``<db>-<table>.*`` naming convention
(``etl_collect_to_cleanse.py:99-134``, ``etl_cleanse_to_consume.py:104-122,
201-210,226-235``).  Missing artifacts degrade gracefully (feature skipped),
exactly like the reference.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from .mapping import parse_mapping_csv


@dataclass
class DatasetConfig:
    input_spec: dict = field(default_factory=dict)
    transform_spec: dict = field(default_factory=dict)
    mapping: list[dict] = field(default_factory=list)
    dq_rules: dict = field(default_factory=dict)
    spark_sql: str | None = None
    view_sql: str | None = None


def load_dataset_config(config_dir: str, database: str, table: str) -> DatasetConfig:
    cfg = DatasetConfig()
    base = f"{database}-{table}"

    spec_path = os.path.join(config_dir, f"{base}.json")
    if os.path.exists(spec_path):
        with open(spec_path, encoding="utf-8") as fh:
            spec = json.load(fh)
        cfg.input_spec = spec.get("input_spec", {})
        cfg.transform_spec = spec.get("transform_spec", {})

    mapping_path = os.path.join(config_dir, f"{base}.csv")
    if os.path.exists(mapping_path):
        with open(mapping_path, encoding="utf-8") as fh:
            cfg.mapping = parse_mapping_csv(fh.read())

    dq_path = os.path.join(config_dir, f"dq-{base}.json")
    if os.path.exists(dq_path):
        with open(dq_path, encoding="utf-8") as fh:
            cfg.dq_rules = json.load(fh)

    sql_path = os.path.join(config_dir, f"spark-{base}.sql")
    if os.path.exists(sql_path):
        with open(sql_path, encoding="utf-8") as fh:
            cfg.spark_sql = fh.read()

    view_path = os.path.join(config_dir, f"view-{base}.sql")
    if os.path.exists(view_path):
        with open(view_path, encoding="utf-8") as fh:
            cfg.view_sql = fh.read()

    return cfg
