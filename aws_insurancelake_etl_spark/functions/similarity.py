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


def partial_ratio_similarity(a: Column | str, b: Column | str) -> Column:
    """rapidfuzz-style ``partial_ratio`` (scaled 0-1): best similarity of the
    shorter string against every same-length window of the longer, so a
    substring scores 1.0 regardless of where it appears — the scorer for
    fields where one side carries extra tokens (suite numbers, suffixes).

    Fully native: windows enumerate via ``sequence``/``transform`` and each
    scores with the JVM ``levenshtein`` — no Python, and the window count is
    bounded by the longer string's length.  Deviation from rapidfuzz,
    documented: the per-window ratio is levenshtein/max-len, not the Indel
    (LCS-based) ratio — the 1.0 cases coincide and both are metrics on the
    same alignment; levenshtein keeps the whole expression in the JVM and
    lets the DuckDB oracle reproduce it bit-for-bit.  Empty/null inputs
    score 0.0 (missing value ≠ perfect match — record-linkage convention,
    same as :func:`jaro_winkler`)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a_shorter = F.length(a) <= F.length(b)
    shorter = F.when(a_shorter, a).otherwise(b)
    longer = F.when(a_shorter, b).otherwise(a)
    ls = F.length(shorter)
    window_sims = F.transform(
        F.sequence(F.lit(1), F.length(longer) - ls + 1),
        lambda p: F.lit(1.0) - F.levenshtein(shorter, F.substring(longer, p, ls)) / ls,
    )
    return F.when(
        a.isNull() | b.isNull() | (ls == 0), F.lit(0.0)
    ).otherwise(F.array_max(window_sims))


def _token_set(col: Column) -> Column:
    return F.array_sort(
        F.array_distinct(F.split(F.lower(F.trim(col)), r"\s+"))
    )


def token_set_similarity(a: Column | str, b: Column | str) -> Column:
    """rapidfuzz-style ``token_set_ratio`` (scaled 0-1): compare the sorted
    token intersection against each side's intersection+difference form and
    take the best of the three ratios — so "mary jane doe" vs
    "doe mary jane smith jr" scores 1.0 (one token set contains the other),
    the scorer for fields with both reordering AND extra tokens.

    Fully native (split/array_intersect/array_except/concat_ws stay in
    codegen; ratios are JVM ``levenshtein``).  Same documented deviation as
    :func:`partial_ratio_similarity`: levenshtein ratio instead of Indel
    ratio per comparison; the containment-scores-1.0 property — the reason
    to pick token_set — is preserved exactly.  Empty/null inputs score
    0.0."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    ta, tb = _token_set(a), _token_set(b)
    inter = F.array_sort(F.array_intersect(ta, tb))
    s0 = F.concat_ws(" ", inter)
    s1 = F.trim(F.concat_ws(" ", F.concat(inter, F.array_sort(F.array_except(ta, tb)))))
    s2 = F.trim(F.concat_ws(" ", F.concat(inter, F.array_sort(F.array_except(tb, ta)))))

    def ratio(x: Column, y: Column) -> Column:
        return F.when(
            (F.length(x) == 0) & (F.length(y) == 0), F.lit(0.0)
        ).otherwise(
            F.lit(1.0) - F.levenshtein(x, y) / F.greatest(F.length(x), F.length(y))
        )

    best = F.greatest(ratio(s0, s1), ratio(s0, s2), ratio(s1, s2))
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(best)
