"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the no-op sink (all operators execute,
nothing is collected to the driver).  A warmup run of the first query
absorbs JVM/codegen startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_insurancelake_etl_spark.queries import all_queries  # noqa: E402
from aws_insurancelake_etl_spark.session import build_session  # noqa: E402

# Versioned per-query CALIB-NORMALIZED baselines (seconds at calib_ref
# 0.0664).  The reference publishes no throughput numbers, so the
# baseline is self-referential: each query's baseline is its normalized
# time from the FIRST round it ran green (column "since").  Host speed
# drifts between rounds (CPU steal on a shared VM); dividing by the md5
# calibration normalizes that — see PERFORMANCE.md findings 17/20: the
# round-4 17.63 s @ calib 0.0668 matches the judge's 18.09 s @ 0.0664.
# The gate below fails the run when any query's normalized time exceeds
# 1.5× its baseline + 0.5 s absolute slack.
CALIB_REF = 0.0664
BASELINES = {
    # name: (baseline_normalized_sec, since_round)
    # r1-era rows re-baselined in round 8 (VERDICT r7 item 4): the r1
    # values were single-shot-calibration era (finding 45: +/-34%); each
    # row below tagged "re-baselined r8" is the MEDIAN of 3 full bench
    # runs on 2026-08-15 under median-of-3 interleaved calibration, with
    # the original r1 value preserved in the comment.
    "q1_pricing_summary": (1.006, 8),  # re-baselined r8 (median of 3; was 0.717 at r1)
    "q3_shipping_priority": (0.982, 8),  # re-baselined r8 (median of 3; was 0.569 at r1)
    "q5_region_supplier_revenue": (0.689, 8),  # re-baselined r8 (median of 3; was 0.547 at r1)
    "scan_filter_project": (0.22, 8),  # re-baselined r8 (median of 3; was 0.146 at r1)
    "agg_grouping_sets": (0.843, 8),  # re-baselined r8 (median of 3; was 0.544 at r1)
    "window_running_sum": (0.512, 8),  # re-baselined r8 (median of 3; was 0.32 at r1)
    "window_rank_orders": (0.526, 8),  # re-baselined r8 (median of 3; was 0.343 at r1)
    "kv_pivot_map_agg": (0.385, 8),  # re-baselined r8 (median of 3; was 0.253 at r1)
    "tr_earnedpremium": (0.647, 8),  # re-baselined r8 (median of 3; was 0.264 at r1)
    "tr_hash_redact": (0.162, 8),  # re-baselined r8 (median of 3; was 0.099 at r1)
    "em_fuzzy_blocked": (1.086, 8),  # re-baselined r8 (median of 3; was 0.889 at r1)
    "text_token_stats": (0.287, 8),  # re-baselined r8 (median of 3; was 0.202 at r1)
    "dedup_minhash_pairs": (1.702, 8),  # re-baselined r8 (median of 3; was 1.527 at r1)
    "dedup_ngram_jaccard": (0.032, 8),  # re-baselined r8 (median of 3; was 1.891 at r1)
    "ann_cosine_topk": (0.463, 8),  # re-baselined r8 (median of 3; was 0.398 at r1)
    "q18_top_large_orders": (1.033, 8),  # re-baselined r8 (median of 3; was 0.668 at r1)
    "evt_asof_last_purchase": (0.433, 8),  # re-baselined r8 (median of 3; was 0.329 at r1)
    "evt_sessionize": (0.675, 8),  # re-baselined r8 (median of 3; was 0.454 at r1)
    "q9_product_profit": (0.998, 8),  # re-baselined r8 (median of 3; was 0.651 at r1)
    "q13_customer_distribution": (0.63, 8),  # re-baselined r8 (median of 3; was 0.412 at r1)
    "q21_sole_failing_supplier": (1.168, 8),  # re-baselined r8 (median of 3; was 0.743 at r1)
    "dedup_cluster_components": (0.148, 8),  # re-baselined r8 (median of 3; was 3.104 at r1)
    # round-5 flagships, promoted to the gated set in round 6 with their
    # r5 normalized times (BENCH_r05.json queries_extended_normalized)
    "docs_quality_ensemble": (0.27, 5),
    "docs_curation_funnel": (0.896, 5),
    "evt_funnel_attribution": (0.758, 5),
    "ann_mips_norm_augment": (0.463, 5),
    "sketch_kmv_set_ops": (0.55, 5),
    # round-6 additions, promoted in round 7 with their r6 normalized
    # times (BENCH_r06.json queries_extended_normalized — VERDICT r6
    # item 3: unbaselined queries are invisible to the regression gate)
    "dedup_cap_skew_stress": (1.318, 6),
    "sketch_kmv_merge_tables": (1.244, 6),
    "mm_decode_featurize": (0.832, 6),
    "mm_audio_featurize": (0.838, 6),
    "dedup_keep_best": (4.991, 6),
    "docs_unimax_allocation": (0.721, 6),
    "sink_avro_write_roundtrip": (1.65, 6),
    "sink_delta_merge_upsert": (1.723, 6),
    "src_delta_partition_prune": (1.074, 6),
    "sketch_hll_cardinality": (0.967, 6),
    "dedup_cosine_prefix_pairs": (5.734, 6),
    "text_bpe_learn_merges": (2.244, 6),
    "layout_zorder_cells": (0.808, 6),
    "docs_leakage_free_split": (0.991, 6),
    # round-7 additions, promoted in round 8 with their r7 normalized
    # times (BENCH_r07.json queries_extended_normalized — VERDICT r7
    # item 4)
    "src_iceberg_position_deletes": (1.679, 7),
    "sink_iceberg_merge_mor": (1.956, 7),
    # round-8 additions, promoted in round 9 (VERDICT r8 item 2) with a
    # full quiet-host bench run measured 2026-08-15 at the start of r9
    "sink_iceberg_eq_upsert": (1.937, 8),
    "sink_iceberg_compaction": (4.242, 8),
    "src_delta_deletion_vectors": (1.559, 8),
    "src_delta_column_mapping": (0.562, 8),
    "stream_delta_cdf_rows": (2.713, 8),
    "em_fuzzy_skew_stress": (2.491, 8),
    "sink_delta_dv_delete": (2.493, 8),
    "src_iceberg_bounds_pruning": (0.598, 8),
    "sink_delta_cm_roundtrip": (1.786, 8),
    # round-9 additions, promoted in round 10 (VERDICT r9 item 4) with
    # the judge's quiet-run normalized times (calib 0.0665 ≈ the 0.0664
    # reference — healthy host during that run)
    "src_iceberg_day_partition": (0.801, 9),
    "sink_iceberg_bucket_upsert": (3.534, 9),
    "src_delta_type_widening": (0.539, 9),
    "src_delta_variant": (0.398, 9),
    "src_iceberg_ref_read": (0.69, 9),
    "src_standard_encrypted_xlsx": (0.342, 9),
    "sink_iceberg_spec_evolution": (1.133, 9),
    "src_delta_ict_travel": (0.757, 9),
    "src_iceberg_incremental": (0.737, 9),
    "src_iceberg_partitions_meta": (0.914, 9),
    "sink_iceberg_schema_evolution": (0.619, 9),
    "stream_iceberg_source_totals": (3.731, 9),
    "sink_iceberg_rollback": (0.648, 9),
    "sink_iceberg_wap_publish": (0.787, 9),
    "sink_delta_shallow_clone": (1.205, 9),
    "src_convert_to_delta": (0.868, 9),
    "sink_iceberg_add_files": (1.349, 9),
    "sink_iceberg_manifest_rewrite": (2.662, 9),
    "sink_delta_identity_generated": (0.748, 9),
    "src_uniform_iceberg_over_delta": (1.801, 9),
    "sink_delta_check_constraint": (0.888, 9),
    "stream_iceberg_upsert_sink": (2.755, 9),
    "sink_iceberg_delete_where": (2.344, 9),
    "sink_lakehouse_update": (2.766, 9),
    # round-10 promotions (quiet run 2026-08-16, normalized by
    # md5 calibration 0.099 vs 0.0664 ref)
    "src_iceberg_v3_dv_read": (1.336, 10),
    # RE-BASELINED in the fifth-session quiet run (2026-08-16 14:23):
    # v3 MERGE now carries _row_id for updated rows per spec §Row
    # Lineage — an A/B against the prior commit measured the carry at
    # ~+25% warm (3.8 -> 4.7 s raw); the rest of the gap vs the old
    # 2.011 is baseline-day calibration.  Keeping the old number would
    # flag the spec fix as a regression forever.
    "sink_iceberg_v3_dv_merge": (3.58, 10),
    "src_iceberg_v3_row_lineage": (0.759, 10),
    "sink_delta_dv_merge": (1.4, 10),
    "sink_delta_dv_update": (1.612, 10),
    "src_delta_nested_mapping": (0.404, 10),
    "sink_delta_row_tracking": (3.452, 10),
    "src_delta_row_tracking_read": (0.948, 10),
    "sink_delta_column_ddl": (0.39, 10),
    "sink_iceberg_column_ddl": (0.416, 10),
    "sink_delta_nested_mapped_write": (0.584, 10),
    "src_uniform_mapped_export": (0.752, 10),
    # round-10 fourth-session promotions (quiet run 2026-08-16,
    # regressions: {}; md5 calibration 0.0589 vs 0.0664 ref)
    "src_iceberg_nested_types": (1.844, 10),
    "src_convert_iceberg_to_delta": (0.894, 10),
    "sink_delta_ddl_lifecycle": (2.223, 10),
    "src_iceberg_changelog": (3.627, 10),
    "src_iceberg_changelog_upsert": (1.744, 10),
    "src_uniform_nested_partitioned": (1.995, 10),
    "sink_iceberg_nested_ddl": (2.264, 10),
    "sink_iceberg_write_default": (0.849, 10),
    # fifth-session promotions (quiet run 2026-08-16 14:23, md5 calib
    # 0.0752 vs the 0.0664 ref, shuffle probe 0.52 s — healthy host):
    # the SQL text front-end gates + the timestamp_ntz holdover
    "sink_delta_timestamp_ntz": (0.289, 10),
    "sql_merge_canonical": (2.705, 10),
    "sql_merge_general_clauses": (2.422, 10),
    "sql_ctas_ddl_lifecycle": (0.967, 10),
    "sql_merge_sync_by_source": (2.607, 10),
    # close-out quiet run (2026-08-16 16:07, md5 calib 0.0984, shuffle
    # probe 0.59 s — slow-but-consistent host, regressions {}):
    "sql_wap_branch_lifecycle": (0.994, 10),
    # final close-out quiet run (2026-08-16 17:03, md5 calib 0.0727,
    # shuffle probe 0.50 s, regressions {}):
    "pipeline_cleanse_lakehouse": (2.176, 10),
    # round-11 gates, first quiet run 2026-08-16 (md5 calib 0.0696,
    # shuffle probe 0.467 s; regressions: {})
    "sink_delta_nested_mapped_evolve": (1.957, 11),
    "sink_iceberg_nested_default": (0.656, 11),
    "sql_analyze_broadcast_stats": (1.89, 11),
    # round-11 late gate, quiet run 2026-08-16 21:4x (md5 0.0750,
    # shuffle 0.456 s; regressions: {})
    "sink_delta_nested_add_column": (0.426, 11),
    # round-11 final gate, quiet run (md5 0.083, shuffle 0.389 s;
    # regressions: {})
    "sink_iceberg_sort_order": (0.474, 11),
}
HEADLINE = list(BASELINES)
REGRESSION_FACTOR = 1.5
# Sub-second queries are dominated by fixed scheduling overhead (~0.2-0.6 s
# per job on a noisy shared host), which calibration cannot normalize away;
# give them an absolute allowance on top of the ratio gate.
ABS_SLACK_SEC = 0.5

# RAW-seconds baselines (r13 re-baseline, VERDICT r12 item 1): the
# calibration-normalized gate alone proved untrustworthy — the md5 probe
# swung 2.7x within single runs, so a host whose single-thread speed
# drifted between the baseline era and today inflates/deflates EVERY
# normalized time uniformly and flags unchanged code.  The fix is a dual
# gate: a query is flagged only when BOTH its normalized time exceeds
# its normalized baseline AND its raw time exceeds its raw baseline (by
# the same factor+slack).  A uniformly faster/slower host moves raw and
# calibration together, so only one of the two thresholds trips; a real
# plan regression trips both.  Raw baselines recorded from the same
# quiet median-of-3 re-baseline run as the normalized values above
# (values filled by tools/rebaseline.py; a gate absent here falls back
# to the normalized-only rule so the gate never silently weakens).
BASELINES_RAW: dict[str, float] = {}


def compute_regressions(
    timings: dict[str, float], normalized: dict[str, float]
) -> dict[str, dict]:
    """Dual-threshold regression flags (pure function so the decision
    rule is unit-testable without Spark): flag a gate only when its
    normalized time exceeds 1.5x its normalized baseline + 0.5 s slack
    AND (when a raw baseline exists) its raw time exceeds the same
    bound against the raw baseline.  Calibration drift moves all
    normalized values while raw stays flat (or vice versa on a
    uniformly slower host), so requiring agreement suppresses the
    false flags that plagued rounds 9-12; a genuine 2x plan regression
    moves both and still fires."""
    out = {}
    for name, (base, since) in BASELINES.items():
        if name not in normalized:
            continue
        if normalized[name] <= base * REGRESSION_FACTOR + ABS_SLACK_SEC:
            continue
        raw_base = BASELINES_RAW.get(name)
        if raw_base is not None and timings[name] <= (
            raw_base * REGRESSION_FACTOR + ABS_SLACK_SEC
        ):
            continue  # normalized flag is calibration drift: raw is flat
        entry = {
            "normalized_sec": normalized[name],
            "baseline_sec": base,
            "baseline_round": since,
            "ratio": round(normalized[name] / base, 2),
        }
        if raw_base is not None:
            entry["raw_sec"] = timings[name]
            entry["raw_baseline_sec"] = raw_base
            entry["raw_ratio"] = round(timings[name] / raw_base, 2)
        out[name] = entry
    return out


# New-in-round queries, reported (queries_extended) but NOT yet gated: no
# baseline exists for them until their first green bench round, after
# which they move into BASELINES with that round's normalized time.
# r13 (VERDICT r12 item 2): 64 additional gates promoted into the bench —
# the stream/sql/docs batteries, the remaining Python-DataSource readers
# (avro/xlsx/xml/orc — the §4 Arrow-boundary work stays guarded), dq/scd2/
# pipeline families, and six heavy representatives that were invisible to
# the perf gate.  They are measured with the same warmup+min-of-2
# discipline and move into BASELINES with the r13 re-baseline run.
EXTENDED: list[str] = [
    "stream_dedup_replay",
    "stream_dedup_within_watermark",
    "stream_delta_merge_sink",
    "stream_delta_source_totals",
    "stream_late_data_drop",
    "stream_session_windows",
    "stream_stateful_user_totals",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_upsert_totals",
    "stream_windowed_counts",
    "sql_array_functions",
    "sql_conditional_functions",
    "sql_datetime_functions",
    "sql_json_functions",
    "sql_lateral_top2",
    "sql_map_functions",
    "sql_math_functions",
    "sql_recursive_reachability",
    "sql_regex_functions",
    "sql_string_functions",
    "sql_timestamp_functions",
    "sql_try_cast_functions",
    "sql_variant_type",
    "docs_ccnet_buckets",
    "docs_curated_corpus",
    "docs_doremi_weights",
    "docs_lang_rebalance",
    "docs_mix_epochs",
    "docs_pack_shards",
    "docs_pii_scan",
    "docs_source_cap",
    "docs_split_assign",
    "docs_temperature_mix",
    "docs_token_budget_fill",
    "docs_token_chunks",
    "docs_weighted_sample",
    "src_avro_nested_roundtrip",
    "src_delta_change_feed",
    "src_delta_time_travel",
    "src_encrypted_xlsx_read",
    "src_iceberg_equality_deletes",
    "src_iceberg_snapshot_read",
    "src_orc_roundtrip",
    "src_xlsx_date_styles",
    "src_xml_roundtrip",
    "dq_match_rules",
    "dq_profile_orders",
    "dq_quarantine_split",
    "dq_referential_integrity",
    "dq_stats_rules",
    "scd2_change_feed",
    "scd2_customer_history",
    "scd2_point_in_time_join",
    "pipeline_cleanse_to_consume",
    "pipeline_collect_to_cleanse",
    "pipeline_drop_to_cleanse_orchestrated",
    "em_full_flow",
    "graph_pagerank_trade",
    "text_bm25_topk",
    "mm_image_patches",
    "evt_native_session_window",
    "emb_kmeans_clusters",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="insurancelake-bench",
                          extra_confs={"spark.ui.enabled": "false"})
    queries = all_queries()

    # Single-thread calibration (md5 of 10^5 short strings): absolute query
    # seconds on a shared VM drift with host load / CPU steal between rounds;
    # dividing by this figure normalizes cross-round comparisons.  One
    # sample is itself too noisy (finding 45: 0.0663-0.0887 s between runs
    # minutes apart = 34%, the same magnitude as the drift it corrects), so
    # three samples are INTERLEAVED through the run and the MEDIAN used —
    # an estimate of host speed during the measured window, not at one
    # instant.
    import hashlib  # noqa: PLC0415

    def calib_sample() -> float:
        start = time.time()
        for i in range(100_000):
            hashlib.md5(str(i).encode()).hexdigest()
        return round(time.time() - start, 4)

    calib_samples = []

    # SPARK-SHAPED calibration probe (finding 47's documented blind
    # spot): the md5 probe measures single-thread Python CPU, but in
    # round 9 Spark paths ran ~1.7× slower on UNCHANGED code while md5
    # read FASTER — contention can hit the JVM/shuffle machinery and
    # the Python interpreter differently.  This fixed 32-partition
    # groupBy over a generated range exercises scheduler + exchange +
    # codegen; it is REPORTED for deconfounding (diverging
    # shuffle-vs-md5 samples ⇒ suspect host contention, not code), but
    # normalization stays md5-based so every baseline in BASELINES
    # remains comparable.
    from pyspark.sql import functions as _F  # noqa: PLC0415

    def calib_shuffle_sample() -> float:
        start = time.time()
        (
            spark.range(0, 2_000_000, 1, 32)
            .groupBy((_F.col("id") % 1000).alias("k"))
            .agg(_F.count("*").alias("n"), _F.sum("id").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )
        return round(time.time() - start, 4)

    calib_shuffle_samples = []
    calib_shuffle_sample()  # warm the probe's codegen path once

    # Warmup: one full pass materializes every query once so the timed pass
    # measures steady state (JIT-compiled codegen, parquet footer caches,
    # broadcast relations) instead of first-run JVM noise.
    for name in HEADLINE:
        materialize(queries[name](spark, sf_dir))

    calib_samples.append(calib_sample())
    calib_shuffle_samples.append(calib_shuffle_sample())

    # Two timed passes, min per query: steady-state cost, robust to
    # transient scheduler/GC noise on a shared box.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            start = time.time()
            materialize(queries[name](spark, sf_dir))
            elapsed = round(time.time() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    calib_samples.append(calib_sample())
    calib_shuffle_samples.append(calib_shuffle_sample())

    # Extended set gets the same measurement discipline as the headline
    # (warmup + min of 2) so the numbers are comparable across rounds.
    extended: dict[str, float] = {}
    for name in EXTENDED:
        materialize(queries[name](spark, sf_dir))
    for _ in range(2):
        for name in EXTENDED:
            start = time.time()
            materialize(queries[name](spark, sf_dir))
            elapsed = round(time.time() - start, 3)
            if name not in extended or elapsed < extended[name]:
                extended[name] = elapsed

    calib_samples.append(calib_sample())
    calib_shuffle_samples.append(calib_shuffle_sample())
    calib_sec = sorted(calib_samples)[1]
    calib_shuffle_sec = sorted(calib_shuffle_samples)[1]

    scale = CALIB_REF / calib_sec if calib_sec > 0 else 1.0
    normalized = {name: round(sec * scale, 3) for name, sec in timings.items()}
    regressions = compute_regressions(timings, normalized)

    payload = {
        "metric": "headline-query wall clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib_md5_100k_sec": calib_sec,
        "calib_samples": calib_samples,
        "calib_shuffle_sec": calib_shuffle_sec,
        "calib_shuffle_samples": calib_shuffle_samples,
        "calib_ref": CALIB_REF,
        "value_normalized": round(sum(normalized.values()), 3),
        "queries_normalized": normalized,
        "regressions": regressions,
        "queries_extended": extended,
        "queries_extended_normalized": {
            name: round(sec * scale, 3) for name, sec in extended.items()
        },
    }
    line = json.dumps(payload)
    # The driver captures only the tail of stdout, which truncated the
    # per-query map in BENCH_r10 (VERDICT r10 "What's wrong" #3).  Persist
    # the full payload to a file so every round's complete per-query
    # history survives regardless of capture limits.
    try:
        (Path(__file__).resolve().parent / "bench_last.json").write_text(
            line + "\n"
        )
    except OSError:
        pass  # read-only checkout: the printed line is still authoritative
    print(line)
    spark.stop()
    if regressions:
        print(f"PERF REGRESSION vs r1 baseline (>1.5x normalized + "
              f"{ABS_SLACK_SEC}s slack): {regressions}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
