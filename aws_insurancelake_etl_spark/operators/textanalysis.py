"""Text-analysis operators: token statistics, quality scoring, language ID,
document fingerprinting.

All single-pass groupBy aggregations over the tokenized corpus (see
:mod:`.dedup` for the tokenizer) — one shuffle keyed on doc_id each, with
map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def unigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, entropy, entropy_ratio) — per-document unigram
    Shannon entropy in nats, the classic perplexity-proxy quality signal
    (CCNet-style): repetitive/templated text scores low, diverse text
    scores near ``ln(n_distinct)``.  ``entropy_ratio`` normalizes by the
    max achievable for the doc's distinct-token count so short and long
    docs are comparable.

    Two shuffles, both with map-side partial aggregation: (doc, token)
    counts, then one per-doc aggregate using the identity
    ``-Σ p·ln p  =  ln n − (Σ c·ln c)/n`` — no window, no join, no UDF;
    entirely whole-stage-codegen arithmetic."""
    toks = tokenize(df, id_col, text_col)
    tok_counts = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c").cast("double")
    sum_clnc = F.sum(F.col("c") * F.log(F.col("c").cast("double")))
    n_distinct = F.count(F.lit(1))
    entropy = F.log(n) - sum_clnc / n
    return tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(entropy, 4).alias("entropy"),
        F.round(
            F.when(n_distinct > 1, entropy / F.log(n_distinct.cast("double")))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("entropy_ratio"),
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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    seed: str = "sample",
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic per-stratum sampling: each row hashes to one of
    ``buckets`` via md5(seed:id) and survives iff its bucket falls below
    the stratum's rate.  Unlike ``df.sample`` this is REPRODUCIBLE across
    runs, engines, and partitionings (no RNG state, no partition-order
    dependence) — the property a training-data pipeline needs so a corpus
    re-sample is stable under repartition/backfill, and an oracle can
    replay it.  Fully narrow: zero shuffles, the rate map compiles to a
    CASE expression (no join for small maps)."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    rate = F.lit(default_rate)
    for key, r in rates.items():
        rate = F.when(F.col(strata_col) == key, F.lit(r)).otherwise(rate)
    return df.where(bucket < (rate * buckets).cast("bigint"))


def lang_rebalance(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "rebal",
    buckets: int = 10000,
    alpha: float = 1.0,
) -> DataFrame:
    """Down-sample strata toward the size of the SMALLEST one — the
    data-mixing step that turns a skewed multilingual crawl into a
    balanced training corpus.  ``alpha`` is the mT5/XLM-R sampling
    temperature: keep rates scale with ``(n_min/n_stratum)^alpha``, so
    alpha=1 rebalances fully to the smallest stratum, alpha=0 keeps the
    raw crawl distribution, and alpha=0.5 is the sqrt-damped middle
    ground the multilingual-pretraining literature uses.  Rates are
    computed from the corpus itself (floor'd basis points), then applied
    as the same deterministic md5-bucket predicate as
    :func:`stratified_sample`, so the selection is reproducible across
    runs, engines, and partitionings, and STABLE under growth of other
    strata (a kept document only drops if its own stratum's rate falls).
    alpha 1 and 0.5 use the plain-division and ``sqrt`` expressions
    respectively (not ``pow``) so a differential oracle stating the same
    arithmetic agrees bit-for-bit.

    Plan: one map-side-combined count per stratum (driver state = one
    rate per stratum), rates broadcast back via a broadcast join keyed on
    the stratum, then a narrow row predicate.  No shuffle ever touches
    the full corpus — at 100 TB the count aggregation is the only wide
    stage and it moves |strata| rows."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    n_min = counts.agg(F.min("n_stratum").alias("n_min"))
    if alpha == 1.0:
        bps = F.floor(F.col("n_min") * buckets / F.col("n_stratum"))
    elif alpha == 0.5:
        bps = F.floor(buckets * F.sqrt(F.col("n_min") * 1.0 / F.col("n_stratum")))
    else:
        bps = F.floor(
            buckets * F.pow(F.col("n_min") * 1.0 / F.col("n_stratum"), F.lit(alpha))
        )
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        strata_col, bps.alias("keep_bps")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(bucket < F.col("keep_bps"))
        .drop("keep_bps")
    )


def token_chunks(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window sequence chunking: split each document's token
    stream into windows of ``size`` tokens advancing by ``stride``
    (overlap = size - stride), the layout step that turns variable-length
    documents into fixed-budget training sequences with context overlap.
    Emits (doc_id, chunk_id, start_pos, n_chunk_tokens, chunk_hash) —
    the hash stands in for the materialized chunk text so the gate's
    payload stays narrow; callers wanting the text swap the md5 for the
    ``concat_ws`` it wraps.

    Plan: one narrow split per document, then a generator over the
    per-document start sequence — the fan-out is |tokens|/stride rows per
    doc and never shuffles; every expression is JVM-side.  At 100 TB this
    is a pure map stage that scales with input partitioning."""
    from .dedup import token_array

    starts = F.explode(F.expr(f"sequence(1, size(toks), {stride})")).alias("start")
    return (
        token_array(df, id_col, text_col)
        .select("doc_id", "toks", starts)
        .select(
            "doc_id",
            F.expr(f"CAST((start - 1) DIV {stride} AS INT) + 1").alias("chunk_id"),
            F.col("start").cast("bigint").alias("start_pos"),
            F.least(F.lit(size), F.size("toks") - F.col("start") + 1)
            .cast("int")
            .alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("start"), size)))
            .alias("chunk_hash"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most characteristic terms per document by tf-idf with a
    RATIO idf (n_docs / doc_freq) instead of the log variant: every score
    is then exact integer arithmetic in doubles — identical across
    engines, so rankings (and their ties, broken by term asc) are fully
    deterministic for differential checking.  Plan: one shuffle keyed on
    token (doc-frequency aggregate, broadcast back), one keyed on doc_id
    (tf + the top-k window) — document-frequency counts are tiny relative
    to the corpus, exactly the shape that scales."""
    toks = tokenize(df, id_col, text_col)
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf already holds exactly one row per (doc, token): document frequency
    # is a COUNT window over tf partitioned by token — one exchange on
    # token, and the tokenize/explode pipeline runs exactly once (a
    # groupBy-and-rejoin formulation re-runs the whole explode, because
    # column pruning turns the second branch into a distinct whose
    # exchange Catalyst cannot reuse).
    w_tok = Window.partitionBy("token")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        tf.withColumn("doc_freq", F.count(F.lit(1)).over(w_tok))
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.col("n_docs") / F.col("doc_freq"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "tf",
            "doc_freq",
            F.round("score", 4).alias("score"),
            "rank",
        )
    )


# GPT-2-ish pre-tokenizer classes, restricted to a regex subset whose
# semantics are identical in every RE2/Java-regex engine (no lookarounds,
# no \p classes): letter runs, digit runs, single non-alnum marks.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_BPE_WORD = r"[A-Za-z]+"
_BPE_NUMBER = r"[0-9]+"
_BPE_MARK = r"[^A-Za-z0-9\s]"


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sub-word-style token accounting with a BPE-ish pre-tokenizer split
    (letter runs / digit runs / punctuation marks — the GPT-2 pattern
    minus engine-specific \\p classes).  The per-class counts and the
    chars-per-token ratio are the standard corpus-budget statistics a
    training pipeline reports.  Fully narrow: four ``regexp_extract_all``
    + ``size`` expressions per row, zero shuffles, codegen'd."""
    n_tokens = F.size(F.regexp_extract_all(text_col, F.lit(BPE_SPLIT_PATTERN), 0))
    n_words = F.size(F.regexp_extract_all(text_col, F.lit(_BPE_WORD), 0))
    n_numbers = F.size(F.regexp_extract_all(text_col, F.lit(_BPE_NUMBER), 0))
    n_marks = F.size(F.regexp_extract_all(text_col, F.lit(_BPE_MARK), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("bigint").alias("n_bpe_tokens"),
        n_words.cast("bigint").alias("n_word_tokens"),
        n_numbers.cast("bigint").alias("n_number_tokens"),
        n_marks.cast("bigint").alias("n_punct_tokens"),
        F.when(n_tokens > 0,
               F.round(F.length(text_col) * 1.0 / n_tokens, 4)).alias(
            "chars_per_token"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every character k-gram, slide a
    window of ``w`` consecutive hashes, keep each window's minimum; the
    distinct minima are the fingerprint set.  Guarantees any shared
    substring of length >= k+w-1 contributes a shared fingerprint —
    position-robust overlap detection that plain shingle sets lose.

    Plan: positions explode from a ``sequence`` (no UDF), one shuffle on
    doc_id for the ordered min-window, distinct reuses the same
    partitioning.  Hashes are 60-bit md5 prefixes (see
    ``dedup.shingle_hash60``) so DuckDB replays them exactly.
    """
    from .dedup import shingle_hash60

    n_grams = F.length(text_col) - k + 1
    grams = (
        df.where(F.length(text_col) >= k + w - 1)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text"),
            F.posexplode(F.expr(f"sequence(1, length({text_col}) - {k} + 1)"))
            .alias("__i", "pos"),
            n_grams.alias("__n"),
        )
        .select(
            "doc_id", "pos", "__n",
            shingle_hash60(F.col("__text").substr(F.col("pos"), F.lit(k))).alias("h"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .where(F.col("pos") <= F.col("__n") - (w - 1))  # full windows only
        .select("doc_id", "fp")
        .distinct()
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality signals per document:
    (doc_id, n_tokens, dup_token_frac, mean_word_len, top_bigram_frac).

    The repetition filters of Rae et al., "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher" (arXiv:2112.11446,
    Table A1) re-expressed for Spark: token-level stats are NARROW array
    expressions (split → size/array_distinct/aggregate, zero shuffles);
    only the top-bigram fraction needs a shuffle — (doc_id, bigram) counts
    then a per-doc max/sum, both keyed on doc_id so the second aggregate
    reuses the first's partitioning."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks")).select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("__toks")) * 1.0 / F.size("__toks"), 4
        ).alias("dup_token_frac"),
        F.round(
            F.expr("aggregate(transform(__toks, t -> length(t)), 0, (a, x) -> a + x)")
            * 1.0
            / F.size("__toks"),
            4,
        ).alias("mean_word_len"),
    )
    gram_count = F.greatest(F.size(toks) - 1, F.lit(0))
    zipped = F.arrays_zip(F.slice(toks, 1, gram_count), F.slice(toks, 2, gram_count))
    bigram_counts = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(zipped).alias("__g"))
        .select("doc_id", F.concat_ws(" ", F.col("__g.0"), F.col("__g.1")).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") * 1.0 / F.sum("c"), 4).alias("top_bigram_frac"))
    )
    return base.join(bigram_counts, "doc_id", "left").withColumn(
        "top_bigram_frac", F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_shingles: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a document's
    distinct word n-gram shingles that appear in ANY benchmark document —
    (doc_id, set_size, n_matched, contamination).

    The standard train/test overlap check (GPT-3 appendix C / PaLM
    contamination analysis): before training, every corpus document is
    scored against the union of benchmark n-grams and high-contamination
    documents are dropped.  Scale shape: the benchmark side dedups to one
    row per distinct shingle and broadcasts (eval sets are tiny next to
    the corpus); the corpus side streams through one semi-join + one
    groupBy on doc_id — no pairwise structure anywhere.  Set
    ``broadcast_benchmark=False`` for a giant benchmark union (falls back
    to a shuffle hash join keyed on the 60-bit shingle hash)."""
    from .dedup import shingle_hash60, shingles  # noqa: PLC0415

    doc_sh = shingles(docs, id_col, text_col, n)
    bench_sh = shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    if hash_shingles:
        doc_sh = doc_sh.withColumn("shingle", shingle_hash60("shingle"))
        bench_sh = bench_sh.select(shingle_hash60("shingle").alias("shingle"))
    right = F.broadcast(bench_sh) if broadcast_benchmark else bench_sh
    matched = (
        doc_sh.join(right, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    sizes = doc_sh.select("doc_id", "set_size").distinct()
    return (
        sizes.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "set_size",
            F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
            F.round(
                F.coalesce(F.col("n_matched"), F.lit(0)) * 1.0 / F.col("set_size"), 4
            ).alias("contamination"),
        )
    )


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: int,
    partition_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-budget training shards: documents are laid
    out in deterministic ``id_col`` order and a shard boundary falls every
    ``budget`` weight units (token counts, bytes); a document straddling a
    boundary belongs to the shard its first unit lands in, so every shard
    except the last holds ≥ budget-minus-one-document of weight.  Adds
    ``shard_id``.

    The deterministic layout step of training-shard writing (each shard →
    one output file/task).  Scale: with ``partition_col`` (language, day,
    source) the running sum windows PER PARTITION — the shape to use at
    100 TB, since a global ordering funnels through a single reducer.  The
    unpartitioned form is kept for small curated sets and says so here
    rather than failing silently."""
    keys = [partition_col] if partition_col else []
    w = Window.partitionBy(*keys).orderBy(id_col)
    start_offset = F.sum(weight_col).over(w) - F.col(weight_col)
    return df.withColumn("shard_id", F.floor(start_offset / budget))


def split_assign(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row hashes to one of
    ``buckets`` via md5(seed:id) and lands in the split whose cumulative
    rate range covers its bucket — adds a ``split`` column.

    The same reproducibility contract as :func:`stratified_sample`
    (pure row predicate: no RNG state, no partition-order dependence), so
    the split survives repartitions, backfills, and engine changes — the
    property that keeps eval sets leak-free as the corpus grows: a
    document's split NEVER changes when other documents arrive.  Rates
    must sum to ≤ 1; any remainder falls in split ``None`` (excluded
    rows).  Fully narrow."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split rates sum to {total} > 1")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    expr = F.lit(None).cast("string")
    upper = 0.0
    cases = []
    for name, rate in splits.items():
        lower, upper = upper, upper + rate
        cases.append((name, int(round(lower * buckets)), int(round(upper * buckets))))
    for name, lo, hi in reversed(cases):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def corpus_cross_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(doc_id, n_tokens, xent) — per-document cross-entropy under the
    CORPUS unigram language model: xent = sum_t c_t * -ln(cf_t / N) / len,
    where cf_t is the token's corpus frequency and N the corpus token
    count.  This is the CCNet/KenLM perplexity-filter proxy: documents
    whose tokens are corpus-typical score LOW (fluent/common), documents
    full of corpus-rare tokens score HIGH — a cross-corpus signal, unlike
    :func:`unigram_entropy` which only sees the document's own
    distribution.

    Plan: per-(doc, token) counts (one shuffle, high-cardinality key);
    the vocabulary aggregates FROM those counts (second shuffle, but on
    the much smaller (token) key set) and joins back broadcast — the
    vocabulary is Zipf-bounded (tens of millions of rows at web scale,
    ~8 bytes/token hashed), so it fits the 64 MB broadcast budget long
    after the corpus doesn't; set ``broadcast_vocab=False`` to fall back
    to a shuffle join keyed on token.  Corpus N rides a broadcast 1-row
    cross join, never a driver collect."""
    toks = tokenize(df, id_col, text_col)
    doc_tok = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    vocab = doc_tok.groupBy("token").agg(F.sum("c").alias("cf"))
    totals = vocab.agg(F.sum("cf").alias("corpus_n"))
    joined = doc_tok.join(
        F.broadcast(vocab) if broadcast_vocab else vocab, "token"
    ).crossJoin(F.broadcast(totals))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * -F.log(F.col("cf") * 1.0 / F.col("corpus_n")))
                / F.sum("c"),
                4,
            ).alias("xent"),
        )
    )


def weighted_sample_topk(
    df: DataFrame, weight_col: str, k: int, strata_col: str | None = None,
    id_col: str = "doc_id", seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row gets key = ln(u) / w with u an
    md5-derived uniform in (0,1); the k LARGEST keys per stratum are an
    exact weighted sample without replacement (equivalent to u^(1/w),
    log-form for numeric stability).  Like :func:`stratified_sample` this
    is reproducible across runs, engines, and partitionings — no RNG
    state — which is what lets a training-data pipeline re-draw the same
    quality-weighted corpus sample after a backfill, and an oracle replay
    it.  The key build is narrow; the only exchange is the per-stratum
    top-k window, which Spark executes as two-phase WindowGroupLimit
    (each map task pre-limits to k before the shuffle), so shuffled rows
    are tasks x strata x k, not the corpus."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    key = F.log(u) / F.col(weight_col)
    part = Window.partitionBy(strata_col) if strata_col else Window.partitionBy()
    rk = F.row_number().over(part.orderBy(key.desc(), F.col(id_col)))
    return df.withColumn("rk", rk).where(F.col("rk") <= k)


def token_budget_fill(
    df: DataFrame, budget: int, order_col: str, strata_col: str = "source",
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget selection: within each stratum, walk documents
    in ``order_col``-descending order (ties on id) and keep each doc whose
    CUMULATIVE token count before it is still under ``budget`` — "fill a
    per-source token budget with the best documents first", the
    allocation step between corpus scoring and shard packing in a
    training-data pipeline.  One window over (stratum, quality desc)
    computes the running total; the keep decision is a row predicate on
    the 1-preceding cumulative sum, so the whole operator is one exchange
    keyed on the stratum.  At 100 TB the stratum key must be the
    partition grain anyway (budgets are per-source); a skewed mega-source
    bounds this the same way it bounds any per-source scan."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.col(order_col).alias("__ord"),
    )
    w = Window.partitionBy("stratum").orderBy(F.desc("__ord"), "doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        base.withColumn("cum_before", cum_before)
        .where(F.col("cum_before") < budget)
        .drop("__ord")
    )


def mix_epochs(
    df: DataFrame,
    weights_permille: dict[str, int],
    budget_docs: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Training-mix epoch assignment: up-sample each stratum to its
    target share of a document budget by REPEATING documents across
    epochs — the data-mixing step that lets a small high-quality source
    contribute 30% of training while being 3% of the corpus.  For
    stratum s with n_s documents and target ``weights_permille[s]``,
    need_s = (permille * budget) // 1000 documents are drawn as
    ``need_s // n_s`` full epochs plus a partial epoch of exactly
    ``need_s % n_s`` documents, chosen by md5-rank — all integer
    arithmetic, so the draw is exact and engine-replayable (no
    floating-point rates).  Output: one (stratum, doc, epoch) row per
    scheduled repetition.

    Plan: one map-side-combined count per stratum joins the weight
    table broadcast; the partial-epoch draw is a per-stratum md5-rank
    window (two-phase WindowGroupLimit does NOT apply — every row needs
    its rank — but the window key is the stratum, the same grain any
    per-source budget already forces); the epoch fan-out is a narrow
    ``sequence`` explode.  Strata absent from the weight table drop."""
    spark = df.sparkSession
    weights = spark.createDataFrame(
        [(k, int(v)) for k, v in weights_permille.items()], [strata_col, "pm"]
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    plan = counts.join(F.broadcast(weights), strata_col).select(
        strata_col,
        F.expr(f"(pm * {int(budget_docs)}) DIV 1000 DIV n_stratum").alias("epochs"),
        F.expr(f"(pm * {int(budget_docs)}) DIV 1000 % n_stratum").alias("partial"),
    )
    rk = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )
    ranked = df.select(strata_col, id_col).withColumn("rk", rk)
    rep = ranked.join(F.broadcast(plan), strata_col).select(
        strata_col,
        id_col,
        (
            F.col("epochs") + F.when(F.col("rk") <= F.col("partial"), 1).otherwise(0)
        ).alias("n_rep"),
    )
    return rep.where(F.col("n_rep") >= 1).select(
        strata_col,
        id_col,
        F.explode(F.expr("sequence(1, n_rep)")).alias("epoch"),
    )


def unimax_allocation(
    df: DataFrame,
    budget_fraction: float,
    max_epochs: float = 1.0,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split a token budget as UNIFORMLY as possible across
    strata, except no stratum may exceed ``max_epochs`` passes over its
    own data.  The closed-form water-filling: sort strata by cap
    ascending; a stratum whose cap fits under the uniform share of the
    remaining budget is fully allocated (capped); the rest share the
    remainder equally at level theta = (budget - sum(capped)) / n_rest.

    Everything is one grouped count plus windows over the per-stratum
    table (one row per language — tiny by construction, so the global
    sort/aggregate hops cost k rows, not corpus rows; the corpus-sized
    work is the single token-count aggregation).

    Output per stratum: total_tokens, cap_tokens, alloc_tokens, epochs
    (= alloc / total — UniMax's defining output, never above
    ``max_epochs``)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    totals = (
        df.select(F.col(strata_col).alias("stratum"), toks.alias("n"))
        .groupBy("stratum")
        .agg(
            F.sum("n").alias("total_tokens"),
            # cap computed INSIDE the aggregate so the k-row global-sort
            # exchange sits directly on the HashAggregate (the plan-audit
            # shape for a post-aggregate scalar hop)
            (F.sum("n") * F.lit(float(max_epochs))).alias("cap"),
        )
    )
    w = Window.orderBy("cap", "stratum")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    budget = F.lit(float(budget_fraction)) * F.sum("total_tokens").over(wall)
    k = F.count(F.lit(1)).over(wall)
    rk = F.row_number().over(w)
    cum_before = F.coalesce(F.sum("cap").over(wprev), F.lit(0.0))
    staged = totals.select(
        "stratum",
        "total_tokens",
        "cap",
        budget.alias("budget"),
        k.alias("k"),
        rk.alias("rk"),
        cum_before.alias("cum_before"),
    ).withColumn(
        # cap fits under the uniform share of what remains at its rank
        "capped",
        F.col("cum_before") + F.col("cap") * (F.col("k") - F.col("rk") + 1)
        <= F.col("budget"),
    )
    m = F.sum(F.col("capped").cast("long")).over(wall)
    cum_capped = F.coalesce(
        F.sum(F.when(F.col("capped"), F.col("cap"))).over(wall), F.lit(0.0)
    )
    theta = F.when(
        F.col("k") > m, (F.col("budget") - cum_capped) / (F.col("k") - m)
    )
    alloc = F.when(F.col("capped"), F.col("cap")).otherwise(
        F.least(F.col("cap"), theta)
    )
    return staged.select(
        "stratum",
        "total_tokens",
        F.round("cap", 4).alias("cap_tokens"),
        F.round(alloc, 4).alias("alloc_tokens"),
        F.round(alloc / F.col("total_tokens"), 4).alias("epochs"),
    )


def linear_text_classifier(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "feat",
    threshold: float = 0.5,
) -> DataFrame:
    """FastText-style linear text classifier scoring: hash each token
    into ``len(weights)`` buckets (feature hashing), average the bucket
    weights over the document's tokens, add bias, squash with a sigmoid —
    (doc_id, score, keep).  This is the classifier-quality-filter step of
    modern corpus pipelines (FineWeb-Edu, DCLM): in production the
    weight vector comes from a trained model file; here the PLUMBING is
    the operator and the weights are an input.

    Scale design: the model is a broadcast literal array (d floats — a
    hashed linear model stays small by construction), feature hashing is
    the md5 expression every sampler here uses, and the whole score is
    ONE narrow pass over the token array (aggregate lambda — no explode,
    no shuffle, no Python).  Mean pooling (not sum) keeps scores
    length-invariant, matching fastText."""
    d = len(weights)
    # Weights are 6-decimal DECIMALS and the fold accumulates in decimal,
    # so the per-document weight sum is EXACT and summation-order-free;
    # only the final mean + sigmoid run in (identical) double arithmetic —
    # the rounding-portability policy of PERFORMANCE.md finding 26.
    warr = ", ".join(f"cast({w!r} as decimal(9,6))" for w in weights)
    bucket = (
        f"cast(conv(substring(md5(concat('{seed}:', t)), 1, 8), 16, 10)"
        f" % {d} as int) + 1"
    )
    score_expr = (
        f"1.0D / (1.0D + exp(-(cast({bias!r} as double) + "
        f"cast(aggregate(toks, cast(0 as decimal(20,6)), (acc, t) -> "
        f"cast(acc + element_at(array({warr}), {bucket}) as decimal(20,6)))"
        f" as double)"
        f" / size(toks))))"
    )
    from .dedup import token_array

    return token_array(df, id_col, text_col).select(
        "doc_id",
        F.round(F.expr(score_expr), 6).alias("score"),
    ).withColumn("keep", F.col("score") >= threshold)


def _bpe_apply_merge(syms: Column, left: str, right: str) -> Column:
    """One BPE merge applied to a symbol array: left-to-right,
    non-overlapping — a single ``aggregate`` fold (if the accumulated
    tail is ``left`` and the next symbol is ``right``, replace the tail
    with the concatenation).  Column-lambda form, so arbitrary symbol
    text never touches SQL string literals."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        tail_matches = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(left)
        ) & (x == F.lit(right))
        return F.when(
            tail_matches,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts ``(l, r, cnt)`` over a symbolized
    word-frequency table — the per-iteration aggregation of the BPE
    trainer (explode of zipped slices, map-side partial sum)."""
    lefts = F.slice("syms", 1, F.size("syms") - 1)
    rights = F.slice("syms", 2, F.size("syms") - 1)
    return (
        words.select(
            "freq",
            F.explode(
                F.zip_with(
                    lefts,
                    rights,
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    end_of_word: str = "</w>",
):
    """Distributed BPE vocabulary learning (Sennrich, Haddow & Birch,
    "Neural Machine Translation of Rare Words with Subword Units",
    ACL'16): returns ``(words, merges)`` where ``merges`` is a DataFrame
    ``(rank, left, right, pair_count)`` of the learned merge rules and
    ``words`` the final symbolized word-frequency table.

    Scale shape: the corpus is touched ONCE (whitespace words →
    frequency table); every iteration then runs on the VOCABULARY —
    adjacent-pair explode + one (left,right)-keyed aggregation with
    map-side partials, arg-max via ``orderBy().limit(1)``
    (TakeOrderedAndProject, no global sort), one scalar row to the
    driver per iteration (same driver-state discipline as k-means /
    connected components), then a narrow fold rewrite of the symbol
    arrays, ``localCheckpoint``-materialized so the next iteration's
    aggregation never re-executes it.  The per-merge checkpoint is a
    measured trade (guide §5): un-materialized, iteration i re-runs all
    i prior folds inside its aggregation — quadratic total fold work
    over ever-deeper nested ``aggregate`` lambdas (sf0.1 n=6: 7.2 s at
    a 6-merge cadence, 2.6 s at per-pass, best per-merge), versus one
    tiny vocab-sized materialization per merge.  Ties break on (count
    DESC, left, right) so the learned vocabulary is deterministic
    across engines and partitionings."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.trim(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(F.split("word", ""), F.array(F.lit(end_of_word))),
        )
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for rank in range(n_merges):
        top = (
            _bpe_pair_counts(words)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        words = words.withColumn(
            "syms", _bpe_apply_merge(F.col("syms"), left, right)
        ).localCheckpoint()
    schema = "rank int, left string, right string, pair_count bigint"
    return words, spark.createDataFrame(merges, schema)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize with a LEARNED merge list (``(left, right)`` tuples in
    rank order): per word, start from characters + the end-of-word
    marker and apply each merge as one narrow fold — the encoder is a
    chain of ``len(merges)`` projections, zero shuffles, so it composes
    into any ingest pipeline as a map stage."""
    words = F.split(F.trim(text_col), r"\s+")
    per_word = F.transform(
        words,
        lambda w: F.concat(F.split(w, ""), F.array(F.lit(end_of_word))),
    )
    out = df.withColumn(out_col, per_word)
    for left, right in merges:
        out = out.withColumn(
            out_col,
            F.transform(out_col, lambda s: _bpe_apply_merge(s, left, right)),
        )
    return out.withColumn(out_col, F.flatten(out_col))


def html_extract(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """HTML → text extraction (the CommonCrawl/C4 boilerplate stage):
    drop ``<script>``/``<style>`` blocks and comments, strip tags,
    decode the common entities (``&amp;`` LAST so ``&amp;lt;`` cannot
    double-decode), collapse whitespace.  Adds ``out_col`` and
    ``html_text_ratio`` (extracted/raw length — the classic boilerplate
    signal: markup-heavy pages score low).  Pure codegen'd
    ``regexp_replace``/``replace`` chain, zero shuffles; the patterns
    avoid backreferences so RE2-based engines (DuckDB, Hyperscan
    prefilters) run them identically to Java regex."""
    c = F.col(html_col)
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c).withColumn(
        "html_text_ratio",
        F.when(
            F.length(html_col) > 0,
            F.round(
                F.length(out_col).cast("double") / F.length(html_col), 4
            ),
        ),
    )
