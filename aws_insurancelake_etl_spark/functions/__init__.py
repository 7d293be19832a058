"""Reusable column-level functions."""

from .similarity import (  # noqa: F401
    jaro_winkler,
    jaro_winkler_py,
    levenshtein_similarity,
)
