"""String-similarity column functions.

``levenshtein_similarity`` is pure JVM (native ``levenshtein``) — prefer it
in hot paths.  ``jaro_winkler`` implements the standard Jaro-Winkler
algorithm (prefix scale 0.1, max prefix 4) as an Arrow-batched pandas UDF —
Spark has no native JW; the reference gets it from the ``recordlinkage``
package driver-side (``etl_consume_entity_match.py:232-241``), which this
replaces with a distributed equivalent.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def levenshtein_similarity(a: Column | str, b: Column | str) -> Column:
    """1 - levenshtein/max(len) — fully native, stays in codegen."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return 1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))


def jaro_winkler_py(s1: str | None, s2: str | None) -> float:
    """Standard Jaro-Winkler similarity (prefix scale 0.1, prefix cap 4)."""
    if s1 is None or s2 is None:
        return 0.0
    len1, len2 = len(s1), len(s2)
    # Empty = missing value: no match evidence, score 0 (rapidfuzz/DuckDB
    # convention — and the safe choice for record linkage, where an empty
    # field must never count as a perfect match).
    if not len1 or not len2:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    matches1 = [False] * len1
    matches2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        start = max(0, i - match_window)
        end = min(i + match_window + 1, len2)
        for j in range(start, end):
            if not matches2[j] and s2[j] == ch:
                matches1[i] = matches2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if matches1[i]:
            while not matches2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    # Mismatched-position count can be odd (a 3-cycle); the rapidfuzz /
    # jellyfish family floors the half-count — match that variant so scores
    # are bit-identical to common engines (incl. the DuckDB oracle).
    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions // 2) / matches
    ) / 3
    # Winkler prefix boost applies only above the classic 0.7 threshold
    # (rapidfuzz/jellyfish/DuckDB behavior).
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


@pandas_udf(DoubleType())
def _jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler_py(x, y) for x, y in zip(a.astype(object), b.astype(object))]
    )


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _jaro_winkler_udf(a, b)


def token_sort_key(col: Column | str) -> Column:
    """Canonical token order: lowercase, split on whitespace, sort, rejoin.
    Word-order-insensitive string comparison reduces to comparing these
    keys — fully native (split/array_sort/concat_ws stay in codegen)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(" ", F.array_sort(F.split(F.lower(F.trim(col)), r"\s+")))


def token_sort_similarity(a: Column | str, b: Column | str) -> Column:
    """rapidfuzz-style ``token_sort_ratio`` (scaled 0-1): levenshtein
    similarity of the token-sorted forms, so "MARY JANE DOE" matches
    "Doe Mary Jane" at 1.0 — the reorder-robust scorer record linkage
    wants for name fields."""
    return levenshtein_similarity(token_sort_key(a), token_sort_key(b))
