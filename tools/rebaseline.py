"""Emit bench.py BASELINES / BASELINES_RAW dict bodies from bench runs.

Usage: python tools/rebaseline.py <bench_json> [<bench_json> ...]

Each input is a bench_last.json-style payload (the one-line JSON the
bench prints).  For every query seen in any run, the MEDIAN raw and
median normalized seconds across the runs are printed as two dict
bodies ready to paste into bench.py, plus the median calibration of the
runs (provenance for the baseline block's comment).  Queries measured
in ``queries_extended`` (new gates not yet in HEADLINE) are included
the same way.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        raise SystemExit("usage: rebaseline.py <bench_json> ...")
    raw: dict[str, list[float]] = {}
    norm: dict[str, list[float]] = {}
    for run in runs:
        for src_raw, src_norm in (
            ("queries", "queries_normalized"),
            ("queries_extended", "queries_extended_normalized"),
        ):
            for name, sec in (run.get(src_raw) or {}).items():
                raw.setdefault(name, []).append(sec)
            for name, sec in (run.get(src_norm) or {}).items():
                norm.setdefault(name, []).append(sec)
    calibs = [r["calib_md5_100k_sec"] for r in runs if "calib_md5_100k_sec" in r]
    print(f"# median calib of {len(runs)} run(s): "
          f"{statistics.median(calibs):.4f} (ref 0.0664)")
    print(f"# per-query medians over {len(runs)} run(s)")
    print("BASELINES = {")
    for name in raw:
        if name in norm:
            print(f'    "{name}": ({statistics.median(norm[name]):.3f}, 13),')
    print("}")
    print("BASELINES_RAW = {")
    for name in raw:
        print(f'    "{name}": {statistics.median(raw[name]):.3f},')
    print("}")


if __name__ == "__main__":
    main()
