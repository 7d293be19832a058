"""Named query registry for the correctness harness and benchmarks.

Each query is ``(spark, sf_dir) -> DataFrame`` paired with an ANSI-SQL
oracle string DuckDB runs over the same parquet tables.  Aggregates are
computed in decimal (exact, order-independent) and surfaced as rounded
doubles so Spark and DuckDB hash identically; every computed column is
aliased the same in both.

Organization mirrors SURVEY.md §2's operator inventory:
- ``relational``  — scans, joins, aggregation, windows, set ops, reshaping
- ``transforms``  — the declarative transform library re-expressed as queries
- ``entity``      — entity-match joins (exact composite-key + blocked fuzzy)
- ``text``        — text analysis + dedup family over ``documents``
- ``similarity``  — embedding similarity / ANN over ``embeddings``
- ``events``      — time-series ops over ``events`` (as-of join,
  sessionization, range join, JSON extraction)
- ``pipeline_ops`` — engine machinery in the gate: full Collect-to-Cleanse
  run, DQDL quarantine split, Structured Streaming windowed aggregation
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    entity,
    events,
    pipeline_ops,
    relational,
    similarity,
    text,
    tpch_extra,
    transforms,
)

_MODULES = (
    relational,
    tpch_extra,
    transforms,
    entity,
    text,
    similarity,
    events,
    pipeline_ops,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for module in _MODULES:
        overlap = queries.keys() & module.QUERIES.keys()
        if overlap:
            raise RuntimeError(f"Duplicate query names: {overlap}")
        queries.update(module.QUERIES)
    return queries


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    for module in _MODULES:
        oracles.update(module.ORACLE)
    return oracles
