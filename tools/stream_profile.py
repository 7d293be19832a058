"""Break a streaming gate's wall clock into phases.

Usage: python tools/stream_profile.py <sf_dir> <gate> [--runs N]

Monkey-patches pipeline_ops._drain_stream to time (a) writer.start()
— which includes the driver-side PythonStreamingSourceRunner spawn and
initial offset planning — (b) awaitTermination, and to dump each
micro-batch's durationMs map from recentProgress (triggerExecution,
addBatch, getBatch, latestOffset, queryPlanning, walCommit,
stateCommit...).  The remainder of the gate's wall (fixture build,
result read-back) is reported as 'outside stream'.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_insurancelake_etl_spark.queries import all_queries  # noqa: E402
from aws_insurancelake_etl_spark.queries import pipeline_ops  # noqa: E402
from aws_insurancelake_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    sf_dir, names = args[0], args[1:]

    orig = pipeline_ops._drain_stream
    phases: list[dict] = []

    def traced(spark, writer, keyspace=None):
        with pipeline_ops._stream_state_conf(spark, keyspace):
            t0 = time.time()
            query = writer.trigger(availableNow=True).start()
            t1 = time.time()
            query.awaitTermination()
            t2 = time.time()
            phases.append(
                {
                    "start_sec": round(t1 - t0, 3),
                    "drain_sec": round(t2 - t1, 3),
                    "batches": [
                        {
                            "durationMs": p.durationMs,
                            "numInputRows": p.numInputRows,
                        }
                        for p in query.recentProgress
                    ],
                }
            )
            return query

    pipeline_ops._drain_stream = traced
    try:
        spark = build_session(
            app_name="stream-profile",
            extra_confs={"spark.ui.enabled": "false"},
        )
        queries = all_queries()
        for name in names:
            fn = queries[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            phases.clear()
            best = None
            best_phases = None
            for _ in range(runs):
                phases.clear()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = time.time() - t0
                if best is None or wall < best:
                    best, best_phases = wall, [dict(p) for p in phases]
            stream_total = sum(
                p["start_sec"] + p["drain_sec"] for p in best_phases
            )
            print(f"\n=== {name}: wall {best:.3f}s  "
                  f"(streams {stream_total:.3f}s, "
                  f"outside {best - stream_total:.3f}s)")
            for i, p in enumerate(best_phases):
                print(f"  stream[{i}] start={p['start_sec']}s "
                      f"drain={p['drain_sec']}s")
                for b in p["batches"]:
                    print(f"    batch rows={b['numInputRows']} "
                          f"durationMs={b['durationMs']}")
    finally:
        pipeline_ops._drain_stream = orig


if __name__ == "__main__":
    main()
