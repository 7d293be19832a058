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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_insurancelake_etl_spark.queries import all_queries  # noqa: E402
from aws_insurancelake_etl_spark.session import build_session  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_supplier_revenue",
    "scan_filter_project",
    "agg_grouping_sets",
    "window_running_sum",
    "window_rank_orders",
    "kv_pivot_map_agg",
    "tr_earnedpremium",
    "tr_hash_redact",
    "em_fuzzy_blocked",
    "text_token_stats",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "q18_top_large_orders",
    "evt_asof_last_purchase",
    "evt_sessionize",
    "q9_product_profit",
    "q13_customer_distribution",
    "q21_sole_failing_supplier",
    "dedup_cluster_components",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="insurancelake-bench",
                          extra_confs={"spark.ui.enabled": "false"})
    queries = all_queries()

    # Warmup: one full pass materializes every query once so the timed pass
    # measures steady state (JIT-compiled codegen, parquet footer caches,
    # broadcast relations) instead of first-run JVM noise.
    for name in HEADLINE:
        materialize(queries[name](spark, sf_dir))

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

    # Single-thread calibration (md5 of 10^5 short strings): absolute query
    # seconds on a shared VM drift with host load / CPU steal between rounds;
    # dividing by this figure normalizes cross-round comparisons.
    import hashlib  # noqa: PLC0415

    calib_start = time.time()
    for i in range(100_000):
        hashlib.md5(str(i).encode()).hexdigest()
    calib_sec = round(time.time() - calib_start, 4)

    print(
        json.dumps(
            {
                "metric": "headline-query wall clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "calib_md5_100k_sec": calib_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
