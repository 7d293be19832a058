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
# queries.  Round 1's window covered the relational/TPC-H prefix (all green,
# CORRECTNESS_r01.json), so this round front-loads one gate per remaining
# operator family — every declarative transform, DQ, entity-match,
# pipeline/streaming/multimodal, embedding-similarity, dedup, and
# time-series representative — ahead of the already-driver-verified
# relational shapes.  Rotate this list each round until every registered
# query has a driver-green row.
#
# Round-3 rotation candidates (never driver-checked after r1+r2): the two
# swapped-out embedding aggregates (emb_label_norm_stats,
# emb_label_centroids), the remaining text/events variants
# (text_quality_score, text_langid, doc_fingerprint,
# dedup_minhash_signature, text_stratified_sample, text_tfidf_top_terms,
# text_bpe_token_stats, text_winnowing_stats, text_top_tokens,
# evt_json_props, evt_salted_hotkey_agg, evt_lag_delta, evt_gap_fill_daily,
# evt_multi_grain_rollup, evt_rolling_7d_avg), and the round-2 additions
# outside this window (text_gopher_repetition, text_contamination,
# docs_pack_shards, docs_split_assign, stream_stream_join,
# dedup_cluster_star, dedup_incremental_lsh, dedup_keep_list,
# emb_int8_quantize, evt_zorder_codes, tr_pii_scan_redact,
# window_deciles_scalable) — 29 names; fill the remaining 21 slots with
# already-green representatives.
DRIVER_WINDOW: tuple[str, ...] = (
    # declarative transform library + DQ + audit (SURVEY §2.3/2.10/2.12/2.5)
    "tr_currency_parse",
    "tr_titlecase",
    "tr_regex_extract_replace",
    "tr_combine_literal",
    "tr_hash_redact",
    "tr_merge_coalesce",
    "tr_enddate_policymonths",
    "tr_earnedpremium",
    "tr_math_family",
    "tr_filterrows",
    "tr_lookup_join",
    "tr_multilookup_join",
    "tr_json_structured",
    "tr_jsonexpandmap",
    "tr_fixedwidth_slice",
    "dq_profile_orders",
    "agg_numeric_audit",
    # entity matching (SURVEY §2.4)
    "em_exact_match",
    "em_fuzzy_blocked",
    "em_jaro_winkler_scores",
    "em_full_flow",
    "em_token_sort_scores",
    "em_partial_ratio_scores",
    "em_token_set_scores",
    # pipeline machinery, streaming, multimodal
    "pipeline_collect_to_cleanse",
    "pipeline_cleanse_to_consume",
    "dq_quarantine_split",
    "stream_windowed_counts",
    "stream_stateful_user_totals",
    "stream_dedup_replay",
    "stream_session_windows",
    "mm_media_metadata",
    "mm_frame_sample",
    # embedding similarity / ANN
    "ann_cosine_topk",
    "ann_ivf_label_topk",
    "emb_near_dup_pairs",
    "emb_kmeans_clusters",
    "sketch_kmv_distinct",
    "emb_rp_lsh_signatures",
    # dedup + text analysis representatives
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_lsh_verified",
    "dedup_cluster_components",
    "dedup_winnowing_pairs",
    "text_token_stats",
    # time-series custom operators
    "evt_asof_last_purchase",
    "evt_sessionize",
    "evt_range_join_bands",
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
