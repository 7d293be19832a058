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
# queries.  Round-7 window (computed by ``tools/driver_window.py`` from
# CORRECTNESS_r01-r06 — VERDICT r6 items 1, 2, 10): the 29 gates that
# have never had a driver row, then ``sql_array_functions`` (the one
# red r6 row — array columns now serialized for the driver's
# canonicalizer), then the 20 stalest re-checks (all last green in r1).
# After this round every registered gate has had a driver-green row;
# subsequent rounds refresh arbitrary 50-subsets by staleness (rerun
# the tool each round).
DRIVER_WINDOW: tuple[str, ...] = (
    "sketch_kmv_merge_tables",
    "sql_map_functions",
    "sketch_hll_cardinality",
    "layout_zorder_cells",
    "sketch_histogram_quantiles",
    "dedup_cap_skew_stress",
    "dedup_keep_best",
    "docs_unimax_allocation",
    "dedup_cosine_prefix_pairs",
    "docs_leakage_free_split",
    "text_bpe_learn_merges",
    "text_html_extract",
    "ann_ivfpq_search",
    "sql_timestamp_functions",
    "mm_decode_featurize",
    "src_avro_nested_roundtrip",
    "stream_dedup_within_watermark",
    "sink_avro_write_roundtrip",
    "src_encrypted_xlsx_read",
    "src_xlsx_date_styles",
    "mm_audio_featurize",
    "stream_stream_left_outer",
    "sink_delta_merge_upsert",
    "src_delta_time_travel",
    "src_delta_partition_prune",
    "src_iceberg_snapshot_read",
    "stream_delta_merge_sink",
    "stream_delta_source_totals",
    "dq_match_rules",
    "src_iceberg_position_deletes",
    "sink_iceberg_merge_mor",
    # round-7 session additions (zero prior evidence -> take the two
    # slots of the stalest r1 re-checks, which have 6 green rows each)
    "src_iceberg_equality_deletes",
    "src_delta_change_feed",
    "sql_array_functions",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_price_histogram",
    "agg_rollup_priority",
    "anti_customers_no_orders",
    "distinct_flag_status",
    "explode_order_months",
    "feat_iqr_outliers",
    "feat_zscore_by_segment",
    "join_broadcast_dims",
    "pivot_status_by_priority",
    "q10_returned_items",
    "q11_important_parts",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
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
