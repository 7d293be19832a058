"""Meta-test: no oracle SQL may produce a DuckDB HUGEINT (or unsigned)
column.

Root cause of every driver ``hash_match: false`` in rounds 2-4
(CORRECTNESS_r02..r04): DuckDB types ``SUM(<int>)`` — including
``SUM(CASE ...)`` and windowed ``SUM(...) OVER`` — as HUGEINT (int128).
pandas has no int128, so ``fetchdf()`` materializes the column as
**float64** (``1175.0``), while the Spark twin returns int64 (``1175``).
The driver's value-hasher does not normalize ``1175.0 == 1175``, so the
row hashes diverge even though the values are numerically identical.

Fix pattern: wrap every aliased integer aggregate in the oracle text with
``CAST(... AS BIGINT)``.  This test resolves every registered oracle's
output types against the sf0.001 parquet (lazy relation — no execution)
and fails on any HUGEINT/UHUGEINT/unsigned column, naming the query and
column so the fix is mechanical.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} missing")
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{SF_DIR}/{table}.parquet'"
        )
    yield con
    con.close()


def test_no_oracle_column_is_hugeint_or_unsigned(duck):
    import __spark_entry__ as entry_mod

    offenders: dict[str, dict[str, str]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = duck.sql(sql)  # lazy: resolves types without executing
        bad = {
            col: str(typ)
            for col, typ in zip(rel.columns, rel.types)
            if "HUGEINT" in str(typ) or str(typ).startswith("U")
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "Oracle columns that pandas will widen to float64 (driver hash "
        f"mismatch): {offenders} — wrap each in CAST(... AS BIGINT)"
    )


# Gates whose double columns are DELIBERATELY unrounded because both
# engines provably run the identical IEEE operation sequence (see each
# gate's docstring) — a final ROUND there could land a ulp on either
# side of a rounding boundary and HURT agreement:
#   emb_label_centroids: exact-decimal sums, then one identical divide
#   evt_ewma_applyinpandas: same scalar recurrence replayed in order
_UNROUNDED_BY_DESIGN = {
    ("emb_label_centroids", "centroid"),
    ("evt_ewma_applyinpandas", "ewma"),
}


def test_every_float_oracle_column_is_rounded(duck):
    """Symmetric insurance to the BIGINT sweep (VERDICT r5 item 7):
    double-valued oracle columns must carry a ROUND(..., k<=9) so engine
    ULP noise cannot produce representation-dependent driver hashes.
    Detection is by value, not text: execute each oracle at sf0.001 and
    flag any double column containing a value with more than 9 decimal
    digits — exactly the fingerprint of un-rounded float arithmetic."""
    import math

    import __spark_entry__ as entry_mod

    offenders: dict[str, dict[str, str]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = duck.sql(sql)
        dbl_cols = [
            col for col, typ in zip(rel.columns, rel.types)
            if str(typ) in ("DOUBLE", "FLOAT")
            and (name, col) not in _UNROUNDED_BY_DESIGN
        ]
        if not dbl_cols:
            continue
        pdf = rel.fetchdf()
        for col in dbl_cols:
            for v in pdf[col]:
                if v is None or (isinstance(v, float)
                                 and (math.isnan(v) or math.isinf(v))):
                    continue
                if round(float(v), 9) != float(v):
                    offenders.setdefault(name, {})[col] = repr(v)
                    break
    assert not offenders, (
        "Unrounded double oracle columns (representation-dependent driver "
        f"hash risk): {offenders} — wrap in CAST(ROUND(..., k) AS DOUBLE) "
        "in BOTH the oracle and the Spark query, or add to "
        "_UNROUNDED_BY_DESIGN with a bit-identity argument"
    )
