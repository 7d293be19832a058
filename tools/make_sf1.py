"""Synthesize an sf1-scale smoke dataset from sf0.1 (VERDICT r12 item 7).

Usage: python tools/make_sf1.py [out_dir] [copies]

Fact tables are unioned ``copies`` times (default 10) with every key
column shifted by ``copy * stride`` so referential joins stay intact
(o_orderkey/l_orderkey, c_custkey/o_custkey, s_suppkey/l_suppkey,
p_partkey/l_partkey, event/user ids, doc/vec ids); dimension tables
(nation, region) keep a single copy.  Each fact table is written as
multiple parquet part files under ``<out>/<table>.parquet/`` so scans
actually parallelize — sf0.1's single-file-per-table layout cannot
measure scan parallelism (the r12 scaling block's finding).

DuckDB does the generation (no Spark session; ~seconds for 6M lineitem
rows).  Strides are powers of ten far above each key's sf0.1 max, so
derived fixtures keyed on ``key % k`` keep the same selectivity.
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFTS = {
    # table: {column: stride}
    "orders": {"o_orderkey": 10**7, "o_custkey": 10**6},
    "lineitem": {
        "l_orderkey": 10**7, "l_partkey": 10**6, "l_suppkey": 10**5,
    },
    "customer": {"c_custkey": 10**6},
    "supplier": {"s_suppkey": 10**5},
    "part": {"p_partkey": 10**6},
    "events": {"event_id": 10**7, "user_id": 10**5},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
}
DIMS = ("nation", "region")
PARTS_PER_TABLE = 16


def main() -> None:
    # default OUTSIDE /root/testdata so driver-side sf* globbing can
    # never pick the smoke set up as a correctness scale factor
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_smoke"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for table, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            exprs = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            selects.append(
                f"SELECT {exprs} FROM read_parquet('{src}/{table}.parquet')"
            )
        union = " UNION ALL ".join(selects)
        dest = f"{out}/{table}.parquet"
        if table == "events":
            # stream gates shutil.copy this path as ONE file (the
            # drop-directory fixture) — keep the single-file layout
            con.execute(
                f"COPY ({union}) TO '{dest}' "
                f"(FORMAT parquet, COMPRESSION zstd)"
            )
            n = con.sql(
                f"SELECT count(*) FROM read_parquet('{dest}')"
            ).fetchone()[0]
            print(f"{table}: {n} rows in 1 file")
            continue
        os.makedirs(dest, exist_ok=True)
        con.execute(
            f"COPY ({union}) TO '{dest}' "
            f"(FORMAT parquet, PER_THREAD_OUTPUT true, "
            f"FILENAME_PATTERN 'part-{{i}}', COMPRESSION zstd)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dest}/*.parquet')"
        ).fetchone()[0]
        files = len(os.listdir(dest))
        print(f"{table}: {n} rows in {files} files")
    for table in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        print(f"{table}: single-copy dim")


if __name__ == "__main__":
    main()
