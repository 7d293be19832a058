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
# queries.  Round-6 window (rotation plan: VERDICT r5 item 1): the 52
# gates that have never had a driver row — the 22 family-redundant ones
# deferred from r5 plus the 30 gates registered after the r5 window
# froze — minus two function batteries (sql_map_functions,
# sql_timestamp_functions) deferred to r7 to fit the 50-gate window.
# r7 window plan (authoritative list computed from CORRECTNESS_r01-r05
# ∪ this window, 2026-08-14): 29 gates will remain never-driver-checked
# after r6 — the 2 deferred batteries (sql_map_functions,
# sql_timestamp_functions) plus the 27 gates registered during round 6:
# ann_ivfpq_search, dedup_cap_skew_stress, dedup_cosine_prefix_pairs,
# dedup_keep_best, docs_leakage_free_split, docs_unimax_allocation,
# dq_match_rules, layout_zorder_cells, mm_audio_featurize,
# mm_decode_featurize, sink_avro_write_roundtrip,
# sink_delta_merge_upsert, sketch_histogram_quantiles,
# sketch_hll_cardinality, sketch_kmv_merge_tables,
# src_avro_nested_roundtrip, src_delta_partition_prune,
# src_delta_time_travel, src_encrypted_xlsx_read,
# src_iceberg_snapshot_read, src_xlsx_date_styles,
# stream_dedup_within_watermark, stream_delta_merge_sink,
# stream_delta_source_totals, stream_stream_left_outer,
# text_bpe_learn_merges, text_html_extract.
# Put these 29 first in the r7 window, fill the remaining 21 slots with
# re-checks; thereafter every registered gate has a driver-green row
# and arbitrary 50-subsets keep rows fresh.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- single-evidence operators first (VERDICT r5 priority list)
    "src_xml_roundtrip",
    "tr_xml_structured",
    "tr_filename_parse",
    "tr_flatten_clean_names",
    "tr_jsonexpandarray",
    "sink_partition_clear",
    "src_orc_roundtrip",
    # -- r5 deferrals (family-redundant, never driver-checked)
    "agg_boolean_family",
    "agg_cube_status_priority",
    "window_rank_fractions",
    "setops_except_all",
    "text_quality_buckets",
    "text_blocklist_filter",
    "text_classifier_filter",
    "text_inverted_index",
    "text_bm25_topk",
    "text_dup_ngram_coverage",
    "docs_token_chunks",
    "docs_lang_rebalance",
    "docs_source_cap",
    "docs_weighted_sample",
    "docs_temperature_mix",
    # -- gates added in round 5 (registered after the r5 window froze)
    "docs_quality_ensemble",
    "docs_doremi_weights",
    "docs_ccnet_buckets",
    "scd2_point_in_time_join",
    "ann_mips_norm_augment",
    "sketch_kmv_set_ops",
    "evt_funnel_attribution",
    "emb_matryoshka_prefix_recall",
    "docs_curation_funnel",
    "em_linkage_eval",
    "sql_string_functions",
    "sql_datetime_functions",
    "sql_math_functions",
    "sql_array_functions",
    "sql_conditional_functions",
    "agg_stats_functions",
    "sql_regex_functions",
    "sql_json_functions",
    "sql_variant_type",
    "evt_tumbling_ohlc",
    "agg_ordered_string_concat",
    "sql_try_cast_functions",
    "text_line_dedup",
    "stat_welch_ttest",
    "stat_chi_square_independence",
    "evt_changepoint_cusum",
    "tr_luhn_checksum",
    "stat_ks_grid_test",
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
