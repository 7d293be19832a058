"""Profile one or more registered gate queries in a warm session.

Usage:
    python tools/profile_gate.py <sf_dir> <query> [query...] [--runs N] [--profile]

For each query: one warmup materialization, then N timed runs (min
reported).  With --profile, the last run is wrapped in cProfile and the
top cumulative-time Python functions are printed — this splits wall
time into (a) Python-side work (delta_lite/iceberg_lite metadata, footer
stats, planning) vs (b) time blocked in py4j awaiting Spark jobs
(``socket.recv`` under ``java_gateway``).
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_insurancelake_etl_spark.queries import all_queries  # noqa: E402
from aws_insurancelake_etl_spark.session import build_session  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calib_sample() -> float:
    """Single-thread md5 probe matching bench.py's calibration."""
    import hashlib

    start = time.time()
    for i in range(100_000):
        hashlib.md5(str(i).encode()).hexdigest()
    return round(time.time() - start, 4)


CALIB_REF = 0.0664


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    do_profile = "--profile" in sys.argv
    sf_dir, names = args[0], args[1:]

    spark = build_session(app_name="profile-gate",
                          extra_confs={"spark.ui.enabled": "false"})
    queries = all_queries()
    for name in names:
        fn = queries[name]
        sc = spark.sparkContext
        sc.setJobGroup(f"profile-{name}", name)
        materialize(fn(spark, sf_dir))  # warmup
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(f"profile-{name}"))
        sc.setJobGroup(None, None)
        print(f"JOBS {name}: {n_jobs} Spark jobs per run", flush=True)
        best = None
        calibs = []
        for _ in range(runs):
            calibs.append(calib_sample())
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        calibs.append(calib_sample())
        med = sorted(calibs)[len(calibs) // 2]
        norm = best * CALIB_REF / med
        print(f"WALL {name}: min of {runs} = {best:.3f}s  "
              f"norm = {norm:.3f}s  (calib med {med:.4f}, {calibs})",
              flush=True)
        if do_profile:
            pr = cProfile.Profile()
            pr.enable()
            materialize(fn(spark, sf_dir))
            pr.disable()
            buf = io.StringIO()
            st = pstats.Stats(pr, stream=buf)
            st.sort_stats("cumulative").print_stats(45)
            print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
