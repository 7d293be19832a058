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
# queries.  Round-5 window (rotation plan: VERDICT r4 item 2):
#   - the 6 gates that were driver-red in r2-r4 solely from the DuckDB
#     HUGEINT->float64 oracle dtype artifact, now fixed with
#     CAST(... AS BIGINT) — re-windowed to land their first green row;
#   - the 5 never-checked gates whose oracle texts were touched by the
#     same BIGINT sweep;
#   - 39 of the remaining never-driver-checked gates (the novel /
#     higher-risk ones: dq, streaming, sketches, embeddings, as-of,
#     graph, SCD2, recursive SQL).
# 30 never-checked gates remain for the r6 window — the 22
# family-redundant ones deferred from r5 (each has a driver-green
# sibling exercising the same operator family):
#   agg_boolean_family, agg_cube_status_priority, window_rank_fractions,
#   setops_except_all, tr_jsonexpandarray, tr_flatten_clean_names,
#   tr_filename_parse, tr_xml_structured, src_xml_roundtrip,
#   src_orc_roundtrip, sink_partition_clear, text_quality_buckets,
#   text_blocklist_filter, text_classifier_filter, text_inverted_index,
#   text_bm25_topk, text_dup_ngram_coverage, docs_token_chunks,
#   docs_lang_rebalance, docs_source_cap, docs_weighted_sample,
#   docs_temperature_mix
# plus the 30 gates ADDED in round 5 (registered after this window
# froze):
#   docs_quality_ensemble, docs_doremi_weights, docs_ccnet_buckets,
#   scd2_point_in_time_join, ann_mips_norm_augment, sketch_kmv_set_ops,
#   evt_funnel_attribution, emb_matryoshka_prefix_recall,
#   docs_curation_funnel, em_linkage_eval, sql_string_functions,
#   sql_datetime_functions, sql_math_functions, sql_array_functions,
#   sql_conditional_functions, agg_stats_functions, sql_regex_functions,
#   sql_json_functions, sql_timestamp_functions, sql_map_functions,
#   sql_variant_type, evt_tumbling_ohlc, agg_ordered_string_concat,
#   sql_try_cast_functions, text_line_dedup, stat_welch_ttest,
#   stat_chi_square_independence, evt_changepoint_cusum,
#   tr_luhn_checksum, stat_ks_grid_test.
# That is 52 never-checked — more than one window: put 50 of them in
# the r6 window (prioritize the novel operators over the function
# batteries), and the remaining 2 plus re-checks in r7; thereafter
# every registered gate has a driver row — keep rotating arbitrary
# 50-subsets so rows stay fresh.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- driver-red r2-r4, oracle dtype fixed this round
    "text_langid",
    "evt_signup_funnel",
    "evt_sessionize",
    "tr_pii_scan_redact",
    "q12_priority_lines",
    "text_unigram_entropy",
    # -- never checked; oracle text touched by the BIGINT sweep
    "text_corpus_xent",
    "docs_token_budget_fill",
    "dedup_lsh_recall_eval",
    "docs_pii_scan",
    "stream_static_enrich",
    # -- never driver-checked
    "ann_pq_adc_rerank",
    "dedup_minhash_est_error",
    "dedup_simhash_pairs",
    "dedup_substring_runs",
    "docs_mix_epochs",
    "dq_referential_integrity",
    "dq_stats_rules",
    "em_transitive_gid",
    "emb_gram_matrix",
    "emb_pc1_scores",
    "emb_pq_codes",
    "emb_rp_lsh_pairs",
    "emb_semdedup_keep",
    "evt_anomaly_mad",
    "evt_asof_next_purchase",
    "evt_asof_tolerance",
    "evt_ewma_applyinpandas",
    "evt_markov_transitions",
    "evt_native_session_window",
    "evt_range_frame_sum",
    "evt_rate_limit_first_n",
    "evt_sliding_window_counts",
    "evt_top_types_per_window",
    "evt_window_distinct_users",
    "graph_pagerank_trade",
    "join_null_safe_keys",
    "join_salted_hotkey",
    "mm_image_patches",
    "pipeline_drop_to_cleanse_orchestrated",
    "scd2_change_feed",
    "sketch_bloom_membership",
    "sketch_cms_user_counts",
    "sql_lateral_top2",
    "sql_recursive_reachability",
    "stat_ols_price_on_qty",
    "stream_late_data_drop",
    "stream_upsert_totals",
    "tr_date_shift_anonymize",
    "tr_k_anonymity_audit",
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
