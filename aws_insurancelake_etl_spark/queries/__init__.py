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
# queries.  Round-8 window (computed by ``tools/driver_window.py`` —
# VERDICT r7 item 3: weight by IMPLEMENTATION CHURN, not only row
# staleness): the 6 round-8 gates with no driver row yet, then the 44
# stalest gates whose implementation files changed since the round-7
# marker (963368b) — entity/fuzzy, pipeline_ops, delta_lite,
# iceberg_lite, pyds consumers.  Re-run the tool each round; once the
# churned backlog drains, it degrades to pure staleness refresh
# (standing item: no driver row older than 3 rounds).
DRIVER_WINDOW: tuple[str, ...] = (
    "em_fuzzy_skew_stress",  # never
    "sink_iceberg_eq_upsert",  # never
    "sink_iceberg_compaction",  # never
    "src_delta_deletion_vectors",  # never
    "src_delta_column_mapping",  # never
    "stream_delta_cdf_rows",  # never
    "sink_delta_dv_delete",  # never (added after the window was computed)
    "src_iceberg_bounds_pruning",  # never (added after the window was computed)
    "sink_delta_cm_roundtrip",  # never (added after the window was computed)
    "em_exact_match",  # impl churn; last green r3
    "em_full_flow",  # impl churn; last green r3
    "em_jaro_winkler_scores",  # impl churn; last green r3
    "em_partial_ratio_scores",  # impl churn; last green r3
    "em_token_set_scores",  # impl churn; last green r3
    "em_token_sort_scores",  # impl churn; last green r3
    "mm_frame_sample",  # impl churn; last green r3
    "pipeline_cleanse_to_consume",  # impl churn; last green r3
    "stream_dedup_replay",  # impl churn; last green r3
    "stream_stateful_user_totals",  # impl churn; last green r3
    "dq_quarantine_split",  # impl churn; last green r4
    "em_fuzzy_blocked",  # impl churn; last green r4
    "mm_media_metadata",  # impl churn; last green r4
    "pipeline_collect_to_cleanse",  # impl churn; last green r4
    "stream_session_windows",  # impl churn; last green r4
    "stream_stream_join",  # impl churn; last green r4
    "stream_windowed_counts",  # impl churn; last green r4
    "dq_referential_integrity",  # impl churn; last green r5
    "dq_stats_rules",  # impl churn; last green r5
    "em_transitive_gid",  # impl churn; last green r5
    "mm_image_patches",  # impl churn; last green r5
    "pipeline_drop_to_cleanse_orchestrated",  # impl churn; last green r5
    "scd2_change_feed",  # impl churn; last green r5
    "stream_late_data_drop",  # impl churn; last green r5
    "stream_static_enrich",  # impl churn; last green r5
    "stream_upsert_totals",  # impl churn; last green r5
    "em_linkage_eval",  # impl churn; last green r6
    "sink_partition_clear",  # impl churn; last green r6
    "src_orc_roundtrip",  # impl churn; last green r6
    "src_xml_roundtrip",  # impl churn; last green r6
    "dq_match_rules",  # impl churn; last green r7
    "mm_audio_featurize",  # impl churn; last green r7
    "mm_decode_featurize",  # impl churn; last green r7
    "sink_avro_write_roundtrip",  # impl churn; last green r7
    "sink_delta_merge_upsert",  # impl churn; last green r7
    "sink_iceberg_merge_mor",  # impl churn; last green r7
    "src_avro_nested_roundtrip",  # impl churn; last green r7
    "src_delta_change_feed",  # impl churn; last green r7
    "src_delta_partition_prune",  # impl churn; last green r7
    "src_encrypted_xlsx_read",  # impl churn; last green r7
    "src_iceberg_equality_deletes",  # impl churn; last green r7
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
