"""Text-analysis operators: token statistics, quality scoring, language ID,
document fingerprinting.

All single-pass groupBy aggregations over the tokenized corpus (see
:mod:`.dedup` for the tokenizer) — one shuffle keyed on doc_id each, with
map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize

DEFAULT_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

DEFAULT_LANG_LISTS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "y"),
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, avg_token_len)."""
    toks = tokenize(df, id_col, text_col)
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").alias("n_distinct"),
        F.round(F.sum(F.length("token")) * 1.0 / F.count(F.lit(1)), 4).alias("avg_token_len"),
    )


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """(doc_id, diversity, stopword_ratio, quality) — lexical diversity and
    stopword balance folded into a [0,1] quality score."""
    toks = tokenize(df, id_col, text_col)
    is_stop = F.col("token").isin(*stopwords).cast("int")
    return toks.groupBy("doc_id").agg(
        F.round(F.count_distinct("token") * 1.0 / F.count(F.lit(1)), 4).alias("diversity"),
        F.round(F.sum(is_stop) * 1.0 / F.count(F.lit(1)), 4).alias("stopword_ratio"),
        F.round(
            F.count_distinct("token") * 0.5 / F.count(F.lit(1))
            + (1 - F.sum(is_stop) * 1.0 / F.count(F.lit(1))) * 0.5,
            4,
        ).alias("quality"),
    )


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_lists: dict[str, tuple[str, ...]] = DEFAULT_LANG_LISTS,
) -> DataFrame:
    """Stopword-list language scores + argmax prediction with a
    deterministic tie-break (declaration order of ``lang_lists``)."""
    toks = tokenize(df, id_col, text_col)
    langs = list(lang_lists)
    agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.col("token").isin(*words).cast("int")).alias(f"score_{lang}")
            for lang, words in lang_lists.items()
        ]
    )
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            clause = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = clause if cond is None else (cond & clause)
        branch = F.lit(lang)
        if pred is None:
            pred = F.when(cond, branch) if cond is not None else branch
        elif cond is not None:
            pred = pred.when(cond, branch)
        else:
            pred = pred.otherwise(branch)
    return agg.select("doc_id", *[f"score_{lang}" for lang in langs], pred.alias("lang_pred"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 over whitespace-normalized lowercased
    text; stable under reflow/indentation changes."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))).alias(
            "fingerprint"
        ),
    )
