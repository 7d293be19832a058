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
# queries.  Rotate this list each round until every registered query has a
# driver-green row.  Round-4 window = the 33 queries that have NEVER had a
# driver-green row (computed from CORRECTNESS_r01..r03; includes
# evt_sessionize, r2's one hash mismatch, now expected green under the
# micros fixture) + the 6 other r3 `err` rows just fixed by the
# schema-aware read_events + the 2 events-touching queries last
# driver-checked against the old int64-nanos fixture (window_filldown,
# kv_pivot_map_agg) + 5 of the 8 queries added this round (emb_pq_codes,
# emb_rp_lsh_pairs, evt_sliding_window_counts rotate in r5, along
# with text_quality_buckets, transform_jsonexpandarray, and the nine
# added after the window froze: text_dup_ngram_coverage,
# docs_lang_rebalance, docs_token_chunks, emb_semdedup_keep,
# src_xml_roundtrip, sink_partition_clear, tr_filename_parse,
# tr_flatten_clean_names, docs_source_cap, stream_upsert_totals,
# dq_stats_rules, evt_asof_tolerance, join_salted_hotkey,
# docs_temperature_mix, sketch_cms_user_counts, sketch_bloom_membership,
# tr_xml_structured, text_inverted_index, text_bm25_topk,
# agg_cube_status_priority, evt_range_frame_sum, and the round-4
# continuation additions: dedup_substring_runs, text_corpus_xent,
# docs_weighted_sample, docs_token_budget_fill, graph_pagerank_trade,
# docs_mix_epochs, stream_static_enrich, evt_asof_next_purchase,
# emb_gram_matrix, emb_pc1_scores, tr_date_shift_anonymize,
# tr_k_anonymity_audit, evt_rate_limit_first_n, mm_image_patches,
# evt_anomaly_mad, stream_late_data_drop, dq_referential_integrity,
# evt_ewma_applyinpandas, scd2_change_feed, evt_native_session_window,
# ann_pq_adc_rerank, join_null_safe_keys, src_orc_roundtrip,
# sql_recursive_reachability, sql_lateral_top2, dedup_simhash_pairs,
# text_classifier_filter, evt_window_distinct_users,
# text_blocklist_filter, dedup_lsh_recall_eval, stat_ols_price_on_qty,
# em_transitive_gid, evt_markov_transitions, window_rank_fractions,
# setops_except_all, agg_boolean_family, dedup_minhash_est_error,
# pipeline_drop_to_cleanse_orchestrated, evt_top_types_per_window,
# docs_pii_scan)
# + 4 family
# representatives.  The post-freeze additions now number ~61 — fill the
# r5 window with 50 of them and the small remainder rotates in r6; after
# r6, every registered query has a driver-green row at some round.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- never driver-checked: text analysis / dedup / docs (SURVEY §2 + LLM ops)
    "text_quality_score",
    "text_langid",
    "doc_fingerprint",
    "dedup_minhash_signature",
    "text_stratified_sample",
    "text_tfidf_top_terms",
    "text_bpe_token_stats",
    "text_winnowing_stats",
    "text_top_tokens",
    "text_gopher_repetition",
    "text_contamination",
    "docs_pack_shards",
    "docs_split_assign",
    "dedup_cluster_star",
    "dedup_incremental_lsh",
    "dedup_keep_list",
    # -- never driver-checked: embeddings
    "emb_label_norm_stats",
    "emb_label_centroids",
    "emb_int8_quantize",
    # -- never driver-checked: events / streaming / windows / transforms
    "evt_json_props",
    "evt_salted_hotkey_agg",
    "evt_lag_delta",
    "evt_gap_fill_daily",
    "evt_multi_grain_rollup",
    "evt_rolling_7d_avg",
    "evt_zorder_codes",
    "evt_signup_funnel",
    "evt_cohort_retention",
    "evt_sessionize",
    "stream_stream_join",
    "window_deciles_scalable",
    "tr_pii_scan_redact",
    "q12_priority_lines",
    # -- r3 errs fixed this round (schema-aware read_events)
    "tr_json_structured",
    "tr_jsonexpandmap",
    "stream_windowed_counts",
    "stream_session_windows",
    "evt_asof_last_purchase",
    "evt_range_join_bands",
    # -- events-touching, last driver-checked on the old nanos fixture
    "window_filldown",
    "kv_pivot_map_agg",
    # -- new this round (never driver-checked)
    "dedup_containment_pairs",
    "text_unigram_entropy",
    "ann_recall_eval",
    "ann_ivf_kmeans_topk",
    "docs_curated_corpus",
    # -- family representatives (window must cover every operator family)
    "pipeline_collect_to_cleanse",
    "dq_quarantine_split",
    "em_fuzzy_blocked",
    "mm_media_metadata",
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
