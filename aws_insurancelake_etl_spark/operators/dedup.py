"""Deduplication operators for large-scale text corpora: exact hashing,
word-shingle Jaccard, MinHash + LSH banding, SimHash.

All operators are ``DataFrame -> DataFrame`` over a ``(id_col, text_col)``
corpus and compose into dedup pipelines.  Hash functions are md5-derived
32-bit integers (``conv(substring(md5(x),1,8),16,10)``) — portable,
seedable, and reproducible by any engine for differential checking.

Scale design (every choice below is benched, not assumed):
- per-document SCALAR stages (token stats, SimHash bit votes) are narrow
  array expressions — zero shuffles;
- shingle sets and MinHash signatures use the explode + window/groupBy
  formulation instead: Spark evaluates higher-order array lambdas
  interpreted (outside whole-stage codegen) and a generator argument is
  re-evaluated per output row, so the "narrow" array version benches
  3–6× SLOWER than the codegen'd explode path — see the notes on
  ``minhash_signatures`` / ``shingle_array_expr``;
- LSH candidates: signatures melt to (doc, band_id, band_key) rows,
  bucket members group per band key, pairs expand in-bucket — shuffle
  volume is 4 small rows per doc, never the shingle sets, never |D|²;
- exact-verify (Jaccard on candidate pairs only) bounds false positives
  at candidate-volume cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_int32(col: Column, seed: str | None = None) -> Column:
    """Deterministic 32-bit integer hash via md5 hex prefix."""
    value = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("bigint")


def tokenize(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, token) rows; pos is 1-based; whitespace tokenizer."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "token"),
        )
        .withColumn("pos", F.col("pos") + 1)
    )


def token_array(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, toks array<string>) — narrow (no shuffle, no explode)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    )


def shingle_array_expr(n: int = 3) -> Column:
    """Distinct word n-gram shingle set of a ``toks`` array column as a
    pure array expression.  NOTE: higher-order lambdas are interpreted
    (no codegen) and a Generate argument re-evaluates per output row, so
    exploding this expression benches ~6× slower than the explode+window
    ``shingles()`` path — use this form only for per-row consumption
    (size checks, array aggregates), never under an explode."""
    parts = ["x"] + [f"toks[i + {k}]" for k in range(1, n)]
    gram = f"concat_ws(' ', {', '.join(parts)})"
    return F.expr(
        f"CASE WHEN size(toks) >= {n} THEN"
        f" array_distinct(transform(slice(toks, 1, size(toks) - {n - 1}),"
        f" (x, i) -> {gram}))"
        " ELSE array() END"
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """Distinct word n-gram shingle set per document:
    (doc_id, set_size, shingle).

    The n-gram build is fully NARROW: ``arrays_zip`` of n offset
    ``slice``s of the token array (both codegen'd functions, not
    higher-order lambdas) yields the gram structs with zero shuffles —
    measured ~40% faster than the earlier lead-window form, which paid a
    shuffle+sort on doc_id before producing a single gram.  The only
    exchange is the ``collect_set`` groupBy that dedups the set, and the
    set size rides along for free, sparing downstream Jaccard a size
    join."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    gram_count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, gram_count) for i in range(n)])
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(zipped).alias("__g"))
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"__g.{i}") for i in range(n)]).alias("shingle"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shset"))
        .select(
            "doc_id", F.size("shset").alias("set_size"), F.explode("shset").alias("shingle")
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, keeper_doc_id, n_copies) — keep lowest id per hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(F.col(id_col)).alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(df: DataFrame, n_hashes: int = 8, id_col: str = "doc_id",
                       text_col: str = "text", shingle_n: int = 3) -> DataFrame:
    """(doc_id, h0..h{K-1}) — K seeded min-hashes in ONE groupBy over the
    shingle rows (map-side partial mins).

    Note on the rejected design: computing the K mins as
    ``array_min(transform(shset, ...))`` narrow expressions benches 3×
    slower — Spark evaluates higher-order array lambdas interpreted (no
    whole-stage codegen), while the explode + grouped ``min`` path is
    fully codegen'd; the groupBy reuses the shingle stage's partitioning,
    so the "extra" shuffle is cheap.  Measured, not guessed."""
    shingle_df = shingles(df, id_col, text_col, shingle_n)
    # K hash functions from ceil(K/4) md5 calls: each 128-bit digest yields
    # four disjoint 32-bit windows (uniform, independent-enough for MinHash)
    # — measured ~25% faster than one seeded md5 per hash function, since
    # md5 dominates the signature stage's CPU.
    mins = []
    for seed in range(n_hashes):
        digest = F.md5(F.concat(F.lit(f"{seed // 4}:"), F.col("shingle")))
        window = F.substring(digest, 1 + 8 * (seed % 4), 8)
        mins.append(
            F.min(F.conv(window, 16, 10).cast("bigint")).alias(f"h{seed}")
        )
    return shingle_df.groupBy("doc_id").agg(*mins)


# Default stop-bucket / stop-shingle cap for the posting-list pair
# expanders.  A bucket (or shingle) with K members expands K² pairs; 1,000
# keeps any single bucket's expansion under 10^6 pairs, which is the
# 100 TB-safe behavior — adversarial boilerplate buckets cost a bounded
# amount instead of a quadratic blowup.  Pass ``max_posting_len=None`` to
# opt out (exact small-corpus runs); capping only ever REMOVES pairs, and
# a surviving pair's score can only DECREASE (dropped hot shingles leave
# the overlap but still count in the set-size denominators) — both
# directions property-tested.
DEFAULT_POSTING_CAP = 1_000


def _observe_truncation(postings: DataFrame, list_col: str,
                        max_posting_len: int | None,
                        observation) -> DataFrame:
    """Attach a truncation observation to a postings DataFrame so capped
    recall loss is observable, not silent (ADVICE r5): after the caller's
    next action, ``observation.get`` holds ``truncated_postings`` (number
    of posting lists the cap dropped) and ``max_posting_seen``.  Runs as
    aggregate metrics inside the existing job — no extra pass.

    Caveat: if the query's FINAL result is empty, AQE's empty-relation
    propagation can prune the CollectMetrics node and ``observation.get``
    fails — an upstream Spark quirk.  In that case every pair was either
    absent or truncated anyway; read the metric only after a non-empty
    action, or compare row counts capped-vs-uncapped."""
    if observation is None or max_posting_len is None:
        return postings
    return postings.observe(
        observation,
        F.coalesce(
            F.sum((F.size(list_col) > max_posting_len).cast("long")), F.lit(0)
        ).alias("truncated_postings"),
        F.coalesce(F.max(F.size(list_col)), F.lit(0)).alias("max_posting_seen"),
    )


def lsh_candidate_pairs(signatures: DataFrame, n_hashes: int = 8,
                        band_size: int = 2,
                        max_posting_len: int | None = DEFAULT_POSTING_CAP,
                        truncation_observation=None,
                        ) -> DataFrame:
    """Candidate near-dup pairs from banded signatures: melt to
    (doc_id, band_id, band_key), group the doc ids per band bucket, and
    expand pairs inside each bucket.

    A self-equi-join on the band key would evaluate the signature pipeline
    twice; grouping evaluates it once and replaces the join shuffle with a
    single groupBy on the (uniformly hash-distributed) band key.  Bucket
    membership lists stay small by construction — a bucket collision IS the
    near-dup signal — so per-bucket pair expansion is bounded.

    ``max_posting_len`` drops adversarial buckets outright: a bucket with
    more than K members (boilerplate bands, empty-ish documents) would
    expand K² pairs; at open-web scale set K so K²·bucket_count stays
    inside the verify stage's budget.  Pairs whose every shared bucket is
    hot are lost — the standard stop-shingle recall trade.  Capped at
    ``DEFAULT_POSTING_CAP`` by default (pass None for exact behavior)."""
    bands = [tuple(range(i, i + band_size)) for i in range(0, n_hashes, band_size)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(n).alias("band_id"),
                F.concat_ws("_", *[F.col(f"h{i}") for i in members]).alias("band_key"),
            )
            for n, members in enumerate(bands)
        ]
    )
    melted = signatures.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )
    keep = F.size("ds") >= 2
    if max_posting_len is not None:
        keep = keep & (F.size("ds") <= max_posting_len)
    buckets = melted.groupBy("band_id", "band_key").agg(
        F.collect_list("doc_id").alias("ds")
    )
    buckets = _observe_truncation(
        buckets, "ds", max_posting_len, truncation_observation
    ).where(keep)
    return (
        buckets.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )


def shingle_hash60(col: Column | str) -> Column:
    """60-bit md5-prefix hash of a shingle string (15 hex digits — safely
    inside int64 in every engine).  Grouping/joining on the hash instead of
    the string shrinks shuffle payloads to 8 bytes/row and replaces string
    comparison with long comparison — measured 40%+ faster on the pair
    stage at sf0.1.  Collision odds at 2^60 are ~3e-8 for a quarter-million
    distinct shingles; the DuckDB oracles apply the SAME hash, so engine
    agreement never depends on collision absence."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def jaccard_pairs(
    shingle_df: DataFrame, threshold: float = 0.5, hash_shingles: bool = True,
    max_posting_len: int | None = DEFAULT_POSTING_CAP,
    truncation_observation=None,
) -> DataFrame:
    """Exact shingle-set Jaccard over pairs sharing ≥1 shingle.

    One evaluation of the shingle pipeline: set sizes ride along via a
    per-doc window, doc ids group per shingle (shuffle key = the 60-bit
    shingle hash, well-distributed, 8 bytes/row), and pairs expand inside
    each posting list — no self-join, so no second evaluation of the
    upstream explode/distinct, and the pair aggregate carries both set
    sizes, avoiding two more size joins.

    ``max_posting_len`` caps the quadratic in-list expansion at open-web
    scale: a shingle appearing in more than K documents ("stop shingle" —
    boilerplate, license headers) is dropped before pair expansion, so a
    hot shingle costs 0 pairs instead of K².  Dropped shingles still count
    in each document's set size (denominator), so surviving pairs' Jaccard
    only UNDER-estimates — precision is kept, recall is traded exactly
    where the pairs were uninformative.  Capped at ``DEFAULT_POSTING_CAP``
    by default (far above the driver corpus's 25 docs/shingle maximum, so
    test-scale results are identical to uncapped); pass None to opt out.
    Pass an ``Observation`` as ``truncation_observation`` to count the
    lists the cap dropped (see ``_observe_truncation``)."""
    pairs = _posting_pair_counts(shingle_df, hash_shingles, max_posting_len,
                                 truncation_observation)
    jaccard = F.col("overlap") * 1.0 / (F.col("na") + F.col("nb") - F.col("overlap"))
    return (
        pairs.where(jaccard >= threshold)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


def _posting_pair_counts(
    shingle_df: DataFrame, hash_shingles: bool = True,
    max_posting_len: int | None = None,
    truncation_observation=None,
) -> DataFrame:
    """(doc_a, doc_b, na, nb, overlap) for every doc pair sharing ≥1
    shingle — the shared pair-expansion stage behind every set-overlap
    scorer (Jaccard, containment).  See ``jaccard_pairs`` for the
    posting-list design rationale."""
    if "set_size" in shingle_df.columns:
        sized = shingle_df.withColumnRenamed("set_size", "n")
    else:
        sized = shingle_df.withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
    if hash_shingles:
        sized = sized.withColumn("shingle", shingle_hash60("shingle"))
    keep = F.size("ds") >= 2
    if max_posting_len is not None:
        keep = keep & (F.size("ds") <= max_posting_len)
    postings = sized.groupBy("shingle").agg(
        F.collect_list(F.struct("doc_id", "n")).alias("ds")
    )
    postings = _observe_truncation(
        postings, "ds", max_posting_len, truncation_observation
    ).where(keep)
    return (
        postings.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )


def containment_pairs(
    shingle_df: DataFrame, threshold: float = 0.6, hash_shingles: bool = True,
    max_posting_len: int | None = DEFAULT_POSTING_CAP,
    truncation_observation=None,
) -> DataFrame:
    """Shingle-set CONTAINMENT (overlap coefficient, |A∩B| / min(|A|,|B|))
    over pairs sharing ≥1 shingle.

    Containment catches the near-dup shape Jaccard structurally misses: a
    short document embedded in a much longer one (quote, excerpt, template
    expansion).  If |A|=50 and A⊂B with |B|=500, Jaccard is 0.1 — far
    below any sane threshold — while containment is 1.0.  Corpus dedup
    pipelines (e.g. article/feed dedup) run BOTH scorers over the same
    posting-list pair expansion, which this shares with ``jaccard_pairs``
    (one evaluation of the shingle pipeline, no self-join, pair counts
    bounded by posting-list collisions — not |D|²)."""
    pairs = _posting_pair_counts(shingle_df, hash_shingles, max_posting_len,
                                 truncation_observation)
    containment = F.col("overlap") * 1.0 / F.least(F.col("na"), F.col("nb"))
    return (
        pairs.where(containment >= threshold)
        .select("doc_a", "doc_b", F.round(containment, 4).alias("containment"))
    )


def dup_shingle_coverage(
    shingle_df: DataFrame, hash_shingles: bool = True
) -> DataFrame:
    """(doc_id, n_shingles, n_dup_shingles, dup_frac) — the fraction of a
    document's distinct shingles that also appear in at least one OTHER
    document ("duplicate n-gram coverage", the span-level dedup signal
    corpus pipelines threshold on: a doc that is 80% shared 3-grams is
    boilerplate even when no single pair-level scorer fires).

    Plan: shingles hash to 60-bit longs, a count window keyed on the
    shingle hash attaches each shingle's corpus document-frequency
    without a join (one exchange on a well-distributed 8-byte key), then
    one doc-keyed aggregation folds the per-shingle flags.  Two shuffles
    total, both on high-cardinality keys; no posting-list pair expansion
    at all, so cost is linear in shingle volume — this signal stays cheap
    at 100 TB even when pairwise scorers need stop-shingle caps."""
    hashed = (
        shingle_df.withColumn("shingle", shingle_hash60("shingle"))
        if hash_shingles
        else shingle_df
    )
    doc_freq = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    return (
        hashed.withColumn("doc_freq", doc_freq)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("doc_freq") >= 2).cast("long")).alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_shingles") * 1.0 / F.col("n_shingles"), 4),
        )
    )


def positioned_grams(df: DataFrame, k: int = 4, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, pos, gram) — every (non-distinct) word k-gram with its
    1-based start position.  Same narrow ``arrays_zip``-of-offset-``slice``s
    build as :func:`shingles` (codegen'd, zero shuffles); ``posexplode``
    carries the position that run detection needs."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    gram_count = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, gram_count) for i in range(k)])
    return (
        df.select(F.col(id_col).alias("doc_id"), F.posexplode(zipped).alias("__i", "__g"))
        .select(
            "doc_id",
            (F.col("__i") + 1).alias("pos"),
            F.concat_ws(" ", *[F.col(f"__g.{i}") for i in range(k)]).alias("gram"),
        )
    )


def substring_run_pairs(
    df: DataFrame, k: int = 4, min_run_tokens: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
    max_posting_len: int | None = DEFAULT_POSTING_CAP,
    truncation_observation=None,
) -> DataFrame:
    """Exact-substring duplication between documents (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for every
    document pair sharing a run of >= ``min_run_tokens`` CONSECUTIVE
    tokens, emit (doc_a, doc_b, max_run_tokens).  Verbatim-copy spans are
    the dedup signal MinHash/Jaccard structurally miss: a 50-token
    license header shared by two otherwise-unrelated documents moves set
    Jaccard by ~1% but is exactly the memorization-risk span an LLM
    corpus pipeline must find.

    Plan (suffix arrays don't distribute; diagonal islands do):
    1. positioned k-grams per doc — narrow (no shuffle);
    2. posting list per 60-bit gram hash; (doc,pos) match points expand
       IN-LIST, so there is no grams-vs-grams self-join and no second
       evaluation of the gram pipeline — the same shape as
       ``_posting_pair_counts``;
    3. a run of matching k-grams lies on one DIAGONAL (pa - pb constant)
       at consecutive pa: gaps-and-islands (pa - row_number) groups each
       island, its gram count + k - 1 is the shared-token run length.
    Shuffle keys: gram hash (8-byte, well-distributed), then
    (doc_a, doc_b, diagonal) — match points only, a set that is tiny
    relative to the corpus unless the corpus IS mostly duplicated.
    ``max_posting_len`` is the stop-gram cap (drop grams appearing in
    > K docs before pair expansion) for boilerplate-heavy corpora; runs
    through a dropped gram split into two shorter islands, so capped
    results only UNDER-report run length — precision kept."""
    grams = positioned_grams(df, k=k, id_col=id_col, text_col=text_col)
    hashed = grams.select("doc_id", "pos", shingle_hash60("gram").alias("h"))
    keep = F.size("ps") >= 2
    if max_posting_len is not None:
        keep = keep & (F.size("ps") <= max_posting_len)
    postings = hashed.groupBy("h").agg(
        F.collect_list(F.struct("doc_id", "pos")).alias("ps")
    )
    postings = _observe_truncation(
        postings, "ps", max_posting_len, truncation_observation
    ).where(keep)
    matches = (
        postings.select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    island = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        matches.withColumn("diag", F.col("pa") - F.col("pb"))
        .withColumn("grp", F.col("pa") - F.row_number().over(island))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_grams"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg((F.max("run_grams") + (k - 1)).alias("max_run_tokens"))
        .where(F.col("max_run_tokens") >= min_run_tokens)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — per-bit majority vote over distinct-token
    hashes, computed narrowly: one md5 pass maps the distinct-token array
    to an int array, then each bit folds that array with ``aggregate`` —
    no explode, no groupBy, no shuffle anywhere."""
    hashes = F.expr(
        "transform(array_distinct(toks),"
        " t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    )
    bit_terms = [
        F.expr(
            f"CASE WHEN aggregate(hs, 0, (acc, h) ->"
            f" acc + (CASE WHEN (h div {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0"
            f" THEN {1 << b} ELSE 0 END"
        )
        for b in range(bits)
    ]
    total = bit_terms[0]
    for term in bit_terms[1:]:
        total = total + term
    return (
        token_array(df, id_col, text_col)
        .select("doc_id", hashes.alias("hs"))
        .select("doc_id", total.cast("bigint").alias("simhash"))
    )


def jaccard_for_pairs(
    shingle_df: DataFrame, pairs: DataFrame, threshold: float = 0.5,
    hash_shingles: bool = True,
) -> DataFrame:
    """Exact Jaccard evaluated ONLY for the given (doc_a, doc_b) pairs.

    Each pair pulls its two shingle sets by doc-id join and counts the
    intersection — cost is bounded by the candidate pairs' shingle volume,
    never the corpus's pairwise structure.  This is the verify stage of
    candidate-generation pipelines (LSH, blocking, ANN).  Shingle equality
    is checked on the 60-bit hash (see ``shingle_hash60``)."""
    if hash_shingles:
        shingle_df = shingle_df.withColumn("shingle", shingle_hash60("shingle"))
    a = shingle_df.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("na"),
        F.col("shingle").alias("sh_a"),
    )
    b = shingle_df.select(
        F.col("doc_id").alias("__b_id"), F.col("set_size").alias("nb"),
        F.col("shingle").alias("sh_b"),
    )
    jaccard = F.col("overlap") * 1.0 / (F.col("na") + F.col("nb") - F.col("overlap"))
    return (
        pairs.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("__b_id")) & (F.col("sh_a") == F.col("sh_b")))
        .drop("__b_id")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .where(jaccard >= threshold)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


def near_dup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    max_posting_len: int | None = DEFAULT_POSTING_CAP,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact Jaccard — the standard
    two-stage near-dup pipeline (approximate recall, exact precision).
    The verify stage computes Jaccard only for candidate pairs, so total
    cost is signatures + bucket collisions — independent of |D|²."""
    sh = shingles(df, id_col, text_col, shingle_n)
    signatures = minhash_signatures(df, n_hashes, id_col, text_col, shingle_n)
    candidates = lsh_candidate_pairs(signatures, n_hashes, band_size,
                                     max_posting_len=max_posting_len)
    return jaccard_for_pairs(sh, candidates, jaccard_threshold)


def keep_best_per_cluster(
    scored: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    src: str = "doc_a",
    dst: str = "doc_b",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """The standard corpus-dedup COMPOSITION (SlimPajama/RefinedWeb
    shape): near-dup pairs → transitive duplicate clusters → keep the
    single best-scoring document per cluster.  Input ``scored`` is one
    row per document with a score column (e.g. ``quality_score``);
    ``pairs`` is any pair producer's output (Jaccard, LSH-verified,
    SimHash).  Documents in no pair are singleton clusters of
    themselves and always kept.  Pass ``clusters`` (a
    ``connected_components`` result: node, cluster_id) to reuse an
    already-computed closure instead of re-running the fixpoint — the
    normal pipeline shape when clustering feeds several consumers.

    Returns (id, cluster_id, score, keep): ``keep`` marks the
    cluster's argmax score, ties broken on the lowest id —
    deterministic, so reruns keep the same documents.

    Scale shape: clusters come from :func:`connected_components`
    (bounded driver state); the cluster assignment joins back on the
    document id (well-distributed shuffle key), and the argmax is one
    window over ``cluster_id`` — duplicate clusters are tiny compared
    to the corpus, so no skew; the full corpus is never re-shuffled
    beyond that one id-keyed join."""
    cc = clusters if clusters is not None else connected_components(
        pairs, src=src, dst=dst
    )
    labeled = (
        scored.join(cc, scored[id_col] == cc["node"], "left")
        .select(
            scored[id_col],
            F.coalesce(cc["cluster_id"], scored[id_col]).alias("cluster_id"),
            scored[score_col],
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return labeled.withColumn(
        "keep", F.row_number().over(w) == 1
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Group duplicate PAIRS into duplicate CLUSTERS: (node, cluster_id)
    where cluster_id is the minimum node id reachable through the pair
    graph.  This is the step after every pair generator (Jaccard, LSH,
    SimHash, embedding near-dup) — "keep one doc per cluster" needs the
    transitive closure, since near-duplicate pairs chain (a~b, b~c with
    a,c never compared).

    Algorithm: min-label propagation on the symmetrized edge list, with
    ADAPTIVE pointer jumping.  Each round takes the min over (own label,
    neighbors' labels); from round ``jump_after`` on, also
    label-of-own-label — the pointer-doubling term that collapses chains
    geometrically (O(log diameter) rounds).  The hybrid is measured, not
    guessed: near-dup graphs are almost always shallow (diameter ≤ 3), and
    the extra labels⋈labels join per round costs MORE than the rounds it
    saves there, so the cheap path runs first and doubling only engages on
    graphs deep enough to still be unconverged.  The driver checks a
    one-row convergence flag and stops when no label changed.
    ``localCheckpoint`` truncates the lineage each round so the plan does
    not grow with the iteration count — the standard Spark
    iterative-algorithm discipline.

    At 100 TB scale the same loop holds: state is one (node, label) row
    per document and both joins shuffle on node/label ids; for adversarial
    graphs, the large-star/small-star edge-rewriting variant (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) also
    shrinks the EDGE set per round — the per-round Spark primitives
    (join + groupBy.min) are identical.
    """
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # No distinct: duplicate edges cannot change a min-aggregation, and
    # deduping them would cost a full shuffle of the edge list.
    edges = fwd.union(
        pairs.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    jump_after = 3
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        joined = labels.join(neighbor_min, "node", "left")
        candidates = [
            F.col("label"),
            F.coalesce(F.col("nbr_label"), F.col("label")),
        ]
        changed = F.col("nbr_label") < F.col("label")
        if i >= jump_after:
            parent = labels.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            joined = joined.join(parent, labels.label == F.col("p_node"), "left")
            candidates.append(F.coalesce(F.col("p_label"), F.col("label")))
            changed = changed | (F.col("p_label") < F.col("label"))
        updated = joined.select(
            "node",
            F.least(*candidates).alias("label"),
            changed.alias("__changed"),
        ).localCheckpoint()
        any_changed = updated.where(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if any_changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the adversarial-graph alternative to
    :func:`connected_components`.

    Label propagation keeps the edge set fixed and needs O(diameter)
    rounds (pointer jumping helps, but every round still joins the FULL
    edge list).  Star rewriting instead mutates the edge set itself:

    - large-star: for each node u with neighborhood Γ(u), connect every
      strictly-larger neighbor to m = min(Γ(u) ∪ {u});
    - small-star: edges now all point downward; for each u, connect u and
      its remaining smaller neighbors to their minimum.

    High-degree hubs and long chains collapse geometrically — O(log² n)
    rounds with per-round cost proportional to the CURRENT edge count,
    which shrinks as stars form.  Converged state is a star per
    component: every edge is (node, component-min).  Convergence is a
    fixed point of both rewrites, detected when the (count, Σsrc, Σdst)
    checksum repeats; ``localCheckpoint`` per round keeps plans flat.
    Returns (node, cluster_id), identical to ``connected_components``."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_sig: tuple | None = None
    for _ in range(max_iter):
        # large-star over the symmetrized neighborhood
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        with_min = sym.join(mins, "u").withColumn("m", F.least("mv", F.col("u")))
        ls = (
            with_min.where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges all point downward now; group by the large end
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        joined = ls.join(mins2, "u")
        ss = (
            joined.select(F.col("u"), F.col("m").alias("v"))
            .union(
                joined.where(F.col("v") != F.col("m")).select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig_row = ss.agg(
            F.count(F.lit(1)).alias("c"), F.sum("u").alias("su"), F.sum("v").alias("sv")
        ).collect()[0]
        edges = ss
        sig = (sig_row["c"], sig_row["su"], sig_row["sv"])
        if sig == prev_sig:
            break
        prev_sig = sig
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    )
    return edges.select(
        F.col("u").alias("node"), F.col("v").alias("cluster_id")
    ).unionByName(roots)


def melt_bands(signatures: DataFrame, n_hashes: int = 8,
               band_size: int = 2) -> DataFrame:
    """(doc_id, band_id, band_key) rows from MinHash signatures — the
    storable form of the LSH index: persist these per ingest batch and
    incremental dedup becomes a band-key join against the store, never a
    recompute of the corpus."""
    bands = [tuple(range(i, i + band_size)) for i in range(0, n_hashes, band_size)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(n).alias("band_id"),
                F.concat_ws("_", *[F.col(f"h{i}") for i in members]).alias("band_key"),
            )
            for n, members in enumerate(bands)
        ]
    )
    return signatures.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )


def incremental_lsh_pairs(
    new_signatures: DataFrame,
    stored_bands: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    max_posting_len: int | None = DEFAULT_POSTING_CAP,
) -> DataFrame:
    """Candidate near-dup pairs for a NEW ingest batch against the
    historical corpus WITHOUT re-processing the corpus: the new batch's
    bands (tiny) broadcast against the stored band index
    (:func:`melt_bands` rows persisted per batch), plus in-batch pairs
    among the new documents themselves — (doc_new, doc_matched).

    This is the daily-ingest shape at 100 TB: per-day cost is
    |new|·bands index lookups + the new batch's own signature pipeline;
    the historical shingle sets are never touched.  The verify stage
    (``jaccard_for_pairs``) then needs shingles only for the matched
    candidates' documents."""
    new_bands = melt_bands(new_signatures, n_hashes, band_size)
    vs_store = (
        F.broadcast(new_bands.alias("n"))
        .join(
            stored_bands.alias("s"),
            (F.col("n.band_id") == F.col("s.band_id"))
            & (F.col("n.band_key") == F.col("s.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("doc_new"), F.col("s.doc_id").alias("doc_matched")
        )
    )
    in_batch = lsh_candidate_pairs(new_signatures, n_hashes, band_size,
                                   max_posting_len=max_posting_len).select(
        F.col("doc_a").alias("doc_new"), F.col("doc_b").alias("doc_matched")
    )
    return vs_store.union(in_batch).distinct()


def simhash_hamming_pairs(
    df: DataFrame, bits: int = 16, chunks: int = 4, max_hamming: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup PAIRS: (doc_a, doc_b, hamming) for pairs whose
    16-bit SimHashes differ in at most ``max_hamming`` bits — the
    completion of the SimHash family (:func:`simhash` computes the
    fingerprints; this finds the duplicates).

    Candidate generation is the classic pigeonhole blocking: split the
    hash into ``chunks`` equal bit-chunks; any pair within hamming
    distance ``chunks - 1`` (or less) must agree on at least one whole
    chunk, so candidates are exactly the pairs sharing a (chunk index,
    chunk value) key — a posting-list expansion on a small int key, never
    an all-pairs scan.  Exact hamming (bit_count of XOR) verifies
    candidates; duplicate candidate pairs from multiple agreeing chunks
    collapse with one distinct.  Requires ``max_hamming < chunks`` for
    completeness (3 < 4 here), the standard Manku/Google dedup setting."""
    if bits % chunks != 0:
        raise ValueError(
            f"chunks ({chunks}) must divide bits ({bits}) so every "
            "pigeonhole chunk covers the same number of bits"
        )
    if max_hamming >= chunks:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < chunks ({chunks}): a "
            "pair may differ in every chunk otherwise and pigeonhole "
            "blocking silently loses recall"
        )
    if bits > 62:
        raise ValueError(f"bits ({bits}) must fit a signed 64-bit simhash")
    chunk_bits = bits // chunks
    sh = simhash(df, id_col=id_col, text_col=text_col, bits=bits)
    # Chunk extraction is pure bit arithmetic (shiftright + mask): the
    # former double division breaks above ~52 bits.
    mask = F.lit((1 << chunk_bits) - 1).cast("long")
    melted = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    F.shiftright(F.col("simhash"), i * chunk_bits)
                    .bitwiseAND(mask)
                    .alias("cv"),
                )
                for i in range(chunks)
            ])
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    posts = (
        melted.groupBy("ci", "cv")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    pairs = (
        posts.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def cosine_prefix_pairs(
    tf: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs cosine similarity join with LOSSLESS prefix filtering
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW'07) over term-frequency vectors ``(id, token, cnt)``.

    Returns every pair with ``cos(a, b) >= threshold`` as
    ``(id_lo, id_hi, cosine)`` — EXACTLY the brute-force result, but the
    quadratic posting-list expansion only happens on each document's
    *indexed prefix*:

    1. Normalized weights ``w = cnt / ||cnt||`` and per-token stats
       (document frequency, max weight over the corpus).
    2. Canonical feature order = (df magnitude DESC, token): within each
       document, features are scanned in that order accumulating
       ``cum = sum(w_j * maxw_j)``; a feature is INDEXED only once
       ``cum >= threshold`` (minus a 1e-9 float-safety margin).  For any
       pair sharing only unindexed features of doc x,
       ``cos(x,y) = sum w_x w_y <= sum_{unindexed j} w_xj * maxw_j <
       threshold`` — so such pairs are provably below threshold and the
       candidate join may skip them.  The order puts FREQUENT tokens
       first, which leaves them unindexed: hot posting lists never
       self-expand.  (The df bucket is ``floor(log2(df))``, computed
       per-token — a total order good enough for pruning without the
       global rank a df-sorted dense_rank would need.)
    3. Candidates = indexed postings ⋈ full postings on token (either
       orientation), then EXACT verification: integer dot product
       ``sum(cnt_a * cnt_b)`` over the pair's shared tokens and integer
       norms, one float division at the end — deterministic across
       engines, no float accumulation anywhere.

    At 100 TB: every stage is a key-partitioned join/aggregation (token
    or doc keys); the prefix rule bounds the candidate blow-up the same
    way ``DEFAULT_POSTING_CAP`` bounds LSH buckets, but WITHOUT losing
    pairs.  Window state is per-document (vocabulary of one doc).

    EXACT-duplicate class collapse (r13): documents with identical
    ``(token, cnt)`` multisets have identical vectors, so the all-pairs
    join runs on one REPRESENTATIVE per class and the pair set expands
    afterwards — cross-class pairs copy the representatives' cosine
    (same dot, same norms, bit-identical), within-class pairs are
    exactly 1.0.  Classes are keyed by the full sorted (token, cnt)
    array (set semantics, no hashing — a hash collision would merge
    distinct classes), one corpus-sized shuffle.  Exact-dedup before
    near-dedup is the standard LLM-curation ordering; on corpora with
    duplicate classes of size k the candidate join shrinks by k², which
    is exactly where the 10x scale smoke showed the verify join
    saturating memory bandwidth (PERFORMANCE.md r13).
    """
    sig = tf.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("token", "cnt"))
        ).alias("__sig")
    )
    classes = sig.groupBy("__sig").agg(
        F.min(id_col).alias("__rep"),
        F.collect_list(id_col).alias("__members"),
        F.count(F.lit(1)).alias("__csize"),
    )
    # one narrow row per class, consumed by four joins (rep semi-filter,
    # two expansion sides, within-class pairs): materialize WITHOUT the
    # heavy signature array so the signature shuffle runs once
    members = (
        classes.select(
            "__rep", F.explode("__members").alias(id_col), "__csize"
        )
        .localCheckpoint()
    )
    tf = tf.join(
        members.where(F.col(id_col) == F.col("__rep")).select(id_col),
        id_col,
        "left_semi",
    )
    n2 = tf.groupBy(id_col).agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("n2")
    )
    weighted = tf.join(n2, id_col).withColumn(
        "w", F.col("cnt") / F.sqrt(F.col("n2").cast("double"))
    )
    stats = weighted.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"), F.max("w").alias("maxw")
    ).withColumn("df_bucket", F.floor(F.log2("df")))
    marked = weighted.join(stats, "token")
    scan = Window.partitionBy(id_col).orderBy(
        F.desc("df_bucket"), "token"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    indexed = (
        marked.withColumn("cum", F.sum(F.col("w") * F.col("maxw")).over(scan))
        .where(F.col("cum") >= threshold - 1e-9)
        .select(F.col(id_col).alias("ida"), "token")
    )
    # Candidates = indexed ⋈ INDEXED, not indexed ⋈ all postings
    # (PPJoin's prefix-intersect formulation; r13, VERDICT item 8).
    # LOSSLESS: the scan order (df_bucket DESC, token) is GLOBAL, so for
    # any pair with cos(x,y) >= t the LAST shared token j* in that order
    # satisfies, for BOTH docs, cum(j*) >= Σ_{k∈shared} w·maxw >=
    # Σ_{k∈shared} w_x·w_y = cos >= t — j* is indexed in x AND in y, and
    # the pair is generated via j*.  A doc none of whose shared tokens
    # is indexed proves cos < t - 1e-9 < t (the old one-sided rule);
    # requiring BOTH prefixes to contain the token only removes pairs
    # that rule already proves sub-threshold.  The probe side shrinks
    # from every posting to the indexed tail — hot (high-df) tokens sit
    # at the front of the scan order, so their postings drop out of the
    # candidate join on both sides, not just one.
    probes = indexed.select(F.col("ida").alias("idb"), "token")
    cand = (
        indexed.join(probes, "token")
        .where(F.col("ida") != F.col("idb"))
        .select(
            F.least("ida", "idb").alias("id_lo"),
            F.greatest("ida", "idb").alias("id_hi"),
        )
        .distinct()
    )
    ta = tf.select(
        F.col(id_col).alias("id_lo"), "token", F.col("cnt").alias("cnt_a")
    )
    tb = tf.select(
        F.col(id_col).alias("id_hi"), "token", F.col("cnt").alias("cnt_b")
    )
    dots = (
        cand.join(ta, "id_lo")
        .join(tb, ["id_hi", "token"])
        .groupBy("id_lo", "id_hi")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    na = n2.select(F.col(id_col).alias("id_lo"), F.col("n2").alias("n2a"))
    nb = n2.select(F.col(id_col).alias("id_hi"), F.col("n2").alias("n2b"))
    # cast each norm to double BEFORE multiplying: the BIGINT product
    # n2a*n2b overflows int64 for ~1e5-token documents and Spark's
    # non-ANSI wrap would make sqrt(negative)=NaN silently drop pairs
    cosine = F.col("dot") / F.sqrt(
        F.col("n2a").cast("double") * F.col("n2b").cast("double")
    )
    rep_pairs = (
        dots.join(na, "id_lo")
        .join(nb, "id_hi")
        .where(cosine >= threshold)
        .select("id_lo", "id_hi", F.round(cosine, 4).alias("cosine"))
    )
    # expand representative pairs back to member pairs: every member of
    # class(lo) x every member of class(hi) shares the reps' EXACT
    # cosine (identical vectors -> identical integer dot and norms)
    mlo = members.select(
        F.col("__rep").alias("id_lo"), F.col(id_col).alias("__a")
    )
    mhi = members.select(
        F.col("__rep").alias("id_hi"), F.col(id_col).alias("__b")
    )
    cross = (
        rep_pairs.join(mlo, "id_lo")
        .join(mhi, "id_hi")
        .select(
            F.least("__a", "__b").alias("id_lo"),
            F.greatest("__a", "__b").alias("id_hi"),
            "cosine",
        )
    )
    if threshold > 1.0:
        return cross  # identical vectors (cos = 1.0) cannot reach t
    within = (
        members.where(F.col("__csize") > 1)
        .select("__rep", F.col(id_col).alias("__a"))
        .join(
            members.select("__rep", F.col(id_col).alias("__b")), "__rep"
        )
        .where(F.col("__a") < F.col("__b"))
        .select(
            F.col("__a").alias("id_lo"),
            F.col("__b").alias("id_hi"),
            F.lit(1.0).alias("cosine"),
        )
    )
    return cross.unionByName(within)
