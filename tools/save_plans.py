"""Save .explain('formatted') output for named queries to plans/<round>/.

Usage: python tools/save_plans.py <suffix> <sf_dir> <query> [query...]

The round directory defaults to r13; override with SPARK_GRAFT_PLAN_DIR.
Writes plans/<round>/<query>_<suffix>.txt for each query.  The formatted
plan is captured via the internal explainString API (no execution for
plannable gates; side-effecting gates execute their setup, which is
what it costs to obtain their final-read plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_insurancelake_etl_spark.queries import all_queries  # noqa: E402
from aws_insurancelake_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="save-plans",
                          extra_confs={"spark.ui.enabled": "false"})
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
