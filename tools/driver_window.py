#!/usr/bin/env python
"""Compute the next round's DRIVER_WINDOW from driver evidence.

The round driver checks the FIRST 50 registered gates
(``queries.DRIVER_WINDOW``) against their DuckDB oracles and records the
result in ``CORRECTNESS_r{N}.json``.  This tool reads every CORRECTNESS
file in the repo root plus the query registry and prints:

1. gates that have NEVER had a driver row (front-load these),
2. the staleness ranking for the rest (oldest green row first), and
3. a ready-to-paste 50-gate window: never-checked + red-last-round
   first, then the stalest re-checks.

Usage: python tools/driver_window.py [--limit 50]

VERDICT r6 item 10: replaces the hand-maintained never-checked comment
in ``queries/__init__.py`` with a computed artifact.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_rows() -> dict[str, dict[int, bool]]:
    """gate -> {round: green?} across every CORRECTNESS_r*.json."""
    rows: dict[str, dict[int, bool]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        match = re.search(r"r(\d+)", path.name)
        if not match:
            continue
        rnd = int(match.group(1))
        data = json.loads(path.read_text())
        for gate, result in data.items():
            green = bool(
                result.get("rows_match")
                and result.get("schema_match")
                and result.get("hash_match")
            )
            rows.setdefault(gate, {})[rnd] = green
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--limit", type=int, default=50)
    args = parser.parse_args()

    import sys

    sys.path.insert(0, str(REPO))
    from aws_insurancelake_etl_spark import queries

    registered = list(queries.all_queries().keys())
    rows = load_rows()
    last_round = max((r for by in rows.values() for r in by), default=0)

    never = [g for g in registered if g not in rows]
    red_last = [
        g
        for g in registered
        if g in rows and last_round in rows[g] and not rows[g][last_round]
    ]
    checked = [g for g in registered if g in rows and g not in red_last]
    # stalest first: by most-recent GREEN round (never-green sorts first)
    checked.sort(
        key=lambda g: (
            max((r for r, ok in rows[g].items() if ok), default=-1),
            g,
        )
    )

    window = (never + red_last + checked)[: args.limit]

    print(f"# registered gates: {len(registered)}")
    print(f"# driver evidence through round {last_round}")
    print(f"# never driver-checked ({len(never)}):")
    for g in never:
        print(f"#   {g}")
    print(f"# red in round {last_round} ({len(red_last)}): "
          + ", ".join(red_last))
    print(f"# stalest re-checks filling the window:")
    print("DRIVER_WINDOW = (")
    for g in window:
        last_green = max(
            (r for r, ok in rows.get(g, {}).items() if ok), default=None
        )
        tag = "never" if g in never else f"last green r{last_green}"
        print(f'    "{g}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
