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
# queries.  Round-10 window (tools/driver_window.py --mode staleness,
# VERDICT r9 item 3): the 16 round-10 gates with no driver row yet
# (iceberg v3 DV read/DML/row lineage, delta DV merge/update, nested
# column mapping read AND write, delta row tracking, rename/drop
# column DDL on both formats, uniform-over-mapped export), then the
# 32 OLDEST green rows — all 26 r1-era rows (predating the oracle
# canonicalizer fixes) and 6 of the 29 r3-era rows.  Churn-ranked
# gates step aside this round: every r10-churned gate was re-verified
# by this round's full registry sweeps (sf0.01 green; sf0.1 at round
# close); after r10 no gate's latest driver row is older than r3, and
# the remaining r3 rows rotate in r11.  Fifth session: the 3 new SQL
# front-end gates take the head (never outranks stale); 3 non-sentinel
# r1 rows whose operator family keeps another window representative
# (setops/tr/window) step back to the r11 rotation.  Late fifth
# session: the WAP-lifecycle and lakehouse-pipeline gates join
# (never-checked); q19/q20 (the TPC-H family keeps 8 other window
# representatives) rotate to r11.
DRIVER_WINDOW: tuple[str, ...] = (
    "sql_merge_canonical",  # never (round-10 fifth session, SQL front-end)
    "sql_merge_general_clauses",  # never (round-10 fifth session)
    "sql_ctas_ddl_lifecycle",  # never (round-10 fifth session)
    "sql_merge_sync_by_source",  # never (round-10 fifth session)
    "sql_wap_branch_lifecycle",  # never (round-10 fifth session)
    "pipeline_cleanse_lakehouse",  # never (round-10 fifth session)
    "src_iceberg_v3_dv_read",  # never
    "sink_iceberg_v3_dv_merge",  # never
    "src_iceberg_v3_row_lineage",  # never
    "src_delta_nested_mapping",  # never
    "sink_delta_dv_merge",  # never
    "sink_delta_dv_update",  # never
    "sink_delta_row_tracking",  # never
    "src_delta_row_tracking_read",  # never
    "sink_delta_column_ddl",  # never
    "sink_iceberg_column_ddl",  # never
    "sink_delta_nested_mapped_write",  # never
    "src_uniform_mapped_export",  # never
    "src_iceberg_nested_types",  # never
    "src_convert_iceberg_to_delta",  # never
    "sink_delta_ddl_lifecycle",  # never
    "src_iceberg_changelog",  # never
    "src_iceberg_changelog_upsert",  # never (round-10 third session)
    "src_uniform_nested_partitioned",  # never (round-10 third session)
    "sink_iceberg_nested_ddl",  # never (round-10 fourth session)
    "sink_iceberg_write_default",  # never (round-10 fourth session)
    "sink_delta_timestamp_ntz",  # never (round-10 fourth session)
    "q16_supplier_count",  # last green r1
    "q18_top_large_orders",  # last green r1
    "q21_sole_failing_supplier",  # last green r1
    "q22_wealthy_inactive",  # last green r1
    "q5_region_supplier_revenue",  # last green r1
    "q7_nation_volume",  # last green r1
    "q8_market_share",  # last green r1
    "q9_product_profit",  # last green r1
    "scan_filter_project",  # last green r1
    "scd2_customer_history",  # last green r1
    "setops_except_custkeys",  # last green r1
    "setops_union_aligned_feed",  # last green r1
    "tr_date_roundtrip",  # last green r1
    "tr_implieddecimal",  # last green r1
    "unpivot_measures",  # last green r1
    "window_rank_orders",  # last green r1
    "window_share_of_segment",  # last green r1
    "yoy_customer_retention",  # last green r1
    "agg_numeric_audit",  # last green r3
    "ann_cosine_topk",  # last green r3
    "dedup_exact",  # last green r3
    "dedup_lsh_verified",  # last green r3
    "emb_kmeans_clusters",  # last green r3
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
