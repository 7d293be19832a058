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

# The round driver's differential oracle checks the FIRST 50 registered
# queries.  Round-9 window: the 24 round-9 gates with no driver row yet
# (iceberg transforms/refs/spec evolution/incremental/metadata tables/
# rollback/stream source/WAP/add_files/manifest rewrite/streaming
# upsert sink/DELETE WHERE/UPDATE, delta variant/widening/ICT/shallow clone/convert/
# generated+identity/check constraints, uniform export,
# standard-encrypted xlsx), then the 21 gates whose ENGINE modules
# changed this round (iceberg_lite + iceberg_transforms, delta_lite,
# entitymatch, offcrypto), then the OLDEST r1-era rows (VERDICT r8
# item 3's staleness rotation — r1 rows predate the oracle
# canonicalizer fixes).  The remaining r1 rows + the r3 block roll to
# round 10 (the window holds 50; never-checked and churned code
# outrank stale-but-unchanged code, the policy VERDICT r8 endorsed —
# the late-session gates displaced 8 r1 staleness rows q7-q9/q16-q21
# into the round-10 rotation).
DRIVER_WINDOW: tuple[str, ...] = (
    "src_iceberg_day_partition",  # never
    "sink_iceberg_bucket_upsert",  # never
    "src_delta_type_widening",  # never
    "src_delta_variant",  # never
    "src_iceberg_ref_read",  # never
    "src_standard_encrypted_xlsx",  # never
    "sink_iceberg_spec_evolution",  # never
    "src_delta_ict_travel",  # never
    "src_iceberg_incremental",  # never
    "src_iceberg_partitions_meta",  # never
    "sink_iceberg_schema_evolution",  # never
    "stream_iceberg_source_totals",  # never
    "sink_iceberg_rollback",  # never
    "sink_iceberg_wap_publish",  # never
    "sink_delta_shallow_clone",  # never
    "src_convert_to_delta",  # never
    "sink_iceberg_add_files",  # never
    "sink_iceberg_manifest_rewrite",  # never
    "sink_delta_identity_generated",  # never
    "src_uniform_iceberg_over_delta",  # never
    "sink_delta_check_constraint",  # never
    "stream_iceberg_upsert_sink",  # never
    "sink_iceberg_delete_where",  # never
    "sink_lakehouse_update",  # never
    "src_delta_time_travel",  # engine churn (delta_lite); last green r7
    "src_iceberg_position_deletes",  # engine churn (iceberg_lite); r7
    "src_iceberg_snapshot_read",  # engine churn (iceberg_lite); r7
    "stream_delta_merge_sink",  # engine churn (delta_lite); r7
    "stream_delta_source_totals",  # engine churn (delta_lite); r7
    "em_full_flow",  # engine churn (entitymatch default block_cap); r8
    "em_fuzzy_skew_stress",  # engine churn (entitymatch); r8
    "sink_delta_cm_roundtrip",  # engine churn (delta_lite); r8
    "sink_delta_dv_delete",  # engine churn (delta_lite); r8
    "sink_delta_merge_upsert",  # engine churn (delta_lite); r8
    "sink_iceberg_compaction",  # engine churn (iceberg_lite); r8
    "sink_iceberg_eq_upsert",  # engine churn (iceberg_lite); r8
    "sink_iceberg_merge_mor",  # engine churn (iceberg_lite); r8
    "src_delta_change_feed",  # engine churn (delta_lite); r8
    "src_delta_column_mapping",  # engine churn (delta_lite); r8
    "src_delta_deletion_vectors",  # engine churn (delta_lite); r8
    "src_delta_partition_prune",  # engine churn (delta_lite); r8
    "src_encrypted_xlsx_read",  # engine churn (offcrypto dispatch); r8
    "src_iceberg_bounds_pruning",  # engine churn (iceberg_lite); r8
    "src_iceberg_equality_deletes",  # engine churn (iceberg_lite); r8
    "stream_delta_cdf_rows",  # engine churn (delta_lite); r8
    "q1_pricing_summary",  # staleness: r1 row
    "q2_min_price_supplier",  # staleness: r1 row
    "q3_shipping_priority",  # staleness: r1 row
    "q4_order_priority_semi",  # staleness: r1 row
    "setops_segments",  # staleness: r1 row
)

def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for module in _MODULES:
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise RuntimeError(f"Duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    missing = [name for name in DRIVER_WINDOW if name not in merged]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    queries = {name: merged[name] for name in DRIVER_WINDOW}
    queries.update((k, v) for k, v in merged.items() if k not in queries)
    return queries


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for module in _MODULES:
        merged.update(module.ORACLE)
    oracles = {name: merged[name] for name in DRIVER_WINDOW if name in merged}
    oracles.update((k, v) for k, v in merged.items() if k not in oracles)
    return oracles
