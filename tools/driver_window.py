#!/usr/bin/env python
"""Compute the next round's DRIVER_WINDOW from driver evidence AND
implementation churn.

The round driver checks the FIRST 50 registered gates
(``queries.DRIVER_WINDOW``) against their DuckDB oracles and records the
result in ``CORRECTNESS_r{N}.json``.  This tool reads every CORRECTNESS
file in the repo root plus the query registry and prints a ready-to-
paste 50-gate window ordered:

1. gates that have NEVER had a driver row,
2. gates RED in the latest round,
3. gates whose IMPLEMENTATION changed since the last round marker while
   their driver row predates the change (VERDICT r7 item 3: a green row
   for code that has since been rewritten is weaker evidence than its
   age suggests) — a gate's implementation set is its query module plus
   every engine module its function source names,
4. the stalest remaining re-checks (oldest green row first).

Usage: python tools/driver_window.py [--limit 50] [--since REV]

``--since`` defaults to the newest commit whose subject matches
``round N:`` (the driver's round marker).
"""

from __future__ import annotations

import argparse
import inspect
import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "aws_insurancelake_etl_spark"


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


def last_round_rev() -> str | None:
    """Newest commit whose subject is the driver's round marker."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+:", subject):
            return sha
    return None


def changed_since(rev: str) -> set[str]:
    """Repo-relative paths changed since ``rev`` (committed + worktree)."""
    out = subprocess.run(
        ["git", "diff", "--name-only", rev, "--"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return {line.strip() for line in out.splitlines() if line.strip()}


def engine_modules() -> dict[str, str]:
    """module stem -> repo-relative path for every engine module."""
    out = {}
    for sub in ("sources", "operators", "plans", "streaming", "functions"):
        for path in sorted((PKG / sub).glob("*.py")):
            if path.stem != "__init__":
                out[path.stem] = str(path.relative_to(REPO))
    return out


def gate_impl_files(fn, engines: dict[str, str]) -> set[str]:
    """The implementation files a gate's evidence rests on: its query
    module plus every engine module its function source names (imports
    inside query functions are the convention here, so the stems show
    up in the source)."""
    files = set()
    try:
        mod_file = inspect.getsourcefile(inspect.getmodule(fn))
        if mod_file:
            files.add(str(Path(mod_file).resolve().relative_to(REPO)))
        src = inspect.getsource(fn)
    except (TypeError, OSError):
        return files
    for stem, rel in engines.items():
        if re.search(rf"\b{re.escape(stem)}\b", src):
            files.add(rel)
    return files


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--limit", type=int, default=50)
    parser.add_argument("--since", default=None,
                        help="rev to diff for impl churn (default: last "
                             "'round N:' commit)")
    parser.add_argument(
        "--mode", choices=("default", "staleness"), default="default",
        help="'staleness' (VERDICT r9 item 3): after never/red, fill "
             "with the OLDEST green rows regardless of churn — the "
             "rotation that retires r1/r3-era evidence; churn-ranked "
             "gates are covered by the judge's full sweep instead")
    args = parser.parse_args()

    import sys

    sys.path.insert(0, str(REPO))
    from aws_insurancelake_etl_spark import queries

    registry = queries.all_queries()
    registered = list(registry.keys())
    rows = load_rows()
    last_round = max((r for by in rows.values() for r in by), default=0)

    rev = args.since or last_round_rev()
    changed = changed_since(rev) if rev else set()
    engines = engine_modules()

    never = [g for g in registered if g not in rows]
    red_last = [
        g
        for g in registered
        if g in rows and last_round in rows[g] and not rows[g][last_round]
    ]
    rest = [g for g in registered if g in rows and g not in red_last]
    churned = [
        g
        for g in rest
        if gate_impl_files(registry[g], engines) & changed
    ]
    stale = [g for g in rest if g not in churned]

    def last_green(g):
        return max((r for r, ok in rows.get(g, {}).items() if ok), default=-1)

    churned.sort(key=lambda g: (last_green(g), g))
    stale.sort(key=lambda g: (last_green(g), g))

    if args.mode == "staleness":
        oldest = sorted(rest, key=lambda g: (last_green(g), g))
        window = (never + red_last + oldest)[: args.limit]
    else:
        window = (never + red_last + churned + stale)[: args.limit]

    print(f"# registered gates: {len(registered)}")
    print(f"# driver evidence through round {last_round}")
    print(f"# churn rev: {rev[:12] if rev else 'none'} "
          f"({len(changed)} files changed)")
    print(f"# never driver-checked ({len(never)}):")
    for g in never:
        print(f"#   {g}")
    print(f"# red in round {last_round} ({len(red_last)}): "
          + ", ".join(red_last))
    print(f"# impl changed since last round ({len(churned)} gates)")
    print("# stalest re-checks fill the remainder")
    print("DRIVER_WINDOW = (")
    for g in window:
        if g in never:
            tag = "never"
        elif g in red_last:
            tag = f"red r{last_round}"
        elif g in churned:
            tag = f"impl churn; last green r{last_green(g)}"
        else:
            tag = f"last green r{last_green(g)}"
        print(f'    "{g}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
