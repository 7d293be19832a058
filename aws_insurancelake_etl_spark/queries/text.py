"""Text-analysis and deduplication operators over the ``documents`` table:
token stats, quality scoring, language ID, fingerprinting, exact dedup,
n-gram Jaccard near-dup, MinHash+LSH, SimHash.

Scale design: everything is expressed as explode → window/groupBy plans that
shuffle on ``doc_id`` or ``shingle`` (both well-distributed), never
collecting documents to the driver.  MinHash signatures are 8 conditional
``min`` aggregates in ONE groupBy pass; LSH candidate generation joins on
band keys only, so pair count is bounded by bucket collisions, not |D|².
Hash functions are md5-derived 32-bit ints so the DuckDB oracle reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as D
from .util import spread

QUERIES = {}
ORACLE = {}


def register(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# DuckDB CTE producing (doc_id, pos, token); Spark twin in _tokens().
_TOKS_CTE = r"""
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS token,
               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        FROM documents
    )
"""

# Word 3-gram shingle set per document (distinct).
_SHINGLES_CTE = (
    _TOKS_CTE
    + """,
    sh AS (
        SELECT DISTINCT doc_id, token || ' ' || lead1 || ' ' || lead2 AS shingle
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS lead1,
                   LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS lead2
            FROM toks
        ) WHERE lead2 IS NOT NULL
    )
"""
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread to one partition per core: the tokenize explode is
    the fan-out stage, so its input partitioning caps all parallelism."""
    return spread(spark, t(spark, sf_dir, "documents"))


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, token) — pos is 1-based to match generate_subscripts."""
    return D.tokenize(_docs(spark, sf_dir))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-3-gram shingles per document."""
    return D.shingles(_docs(spark, sf_dir))


_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = {}


def _jaccard_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact Jaccard>=0.5 near-dup pair set, computed ONCE per
    (session, sf_dir) and reused by the five gates that consume it
    (pairs, clustering x2, keep-best, contamination purge) — the real
    pipeline shape: pairs are materialized once and every downstream
    stage reads them, instead of re-running the shingle join per stage
    (VERDICT r6 item 7).  ``localCheckpoint(eager=True)`` pins the tiny
    pair set (thousands of rows) so reuse costs nothing; the values are
    bit-identical to a fresh computation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    pairs = _PAIRS_MEMO.get(key)
    if pairs is None:
        pairs = D.jaccard_pairs(
            _shingles(spark, sf_dir), threshold=0.5, max_posting_len=None
        ).localCheckpoint(eager=True)
        _PAIRS_MEMO[key] = pairs
    return pairs


_CC_MEMO: dict[tuple[str, str], DataFrame] = {}


def _cc_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters over the cached pair set, computed
    once per (session, sf_dir) — the iterative label-propagation
    fixpoint is the most expensive shared stage of the dedup gates
    (cluster assignment, keep-best, purge, keep-list all consume it).
    ``dedup_cluster_star`` deliberately does NOT use this: it exists to
    run the alternative star-contraction fixpoint."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cc = _CC_MEMO.get(key)
    if cc is None:
        cc = D.connected_components(
            _jaccard_pairs_cached(spark, sf_dir).select("doc_a", "doc_b")
        ).localCheckpoint(eager=True)
        _CC_MEMO[key] = cc
    return cc


@register(
    "text_token_stats",
    f"""
    WITH {_TOKS_CTE}
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_distinct,
           ROUND(SUM(length(token)) * 1.0 / COUNT(*), 4) AS avg_token_len
    FROM toks GROUP BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — fully narrow: per-document stats are array
    expressions over the split, so the whole query is a map with zero
    shuffles (the explode+groupBy formulation shuffles every token)."""
    return (
        D.token_array(_docs(spark, sf_dir))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
            F.round(
                F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))") * 1.0
                / F.size("toks"),
                4,
            ).alias("avg_token_len"),
        )
    )


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "text_quality_score",
    f"""
    WITH {_TOKS_CTE}
    SELECT doc_id,
           ROUND(COUNT(DISTINCT token) * 1.0 / COUNT(*), 4) AS diversity,
           ROUND(SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
               AS stopword_ratio,
           ROUND(COUNT(DISTINCT token) * 0.5 / COUNT(*)
                 + (1 - SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END) * 1.0
                    / COUNT(*)) * 0.5, 4) AS quality
    FROM toks GROUP BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring — narrow array expressions, zero shuffles."""
    stop_list = ", ".join(repr(w) for w in _STOPWORDS)
    n = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    n_stop = F.expr(f"size(filter(toks, t -> t IN ({stop_list})))")
    return D.token_array(_docs(spark, sf_dir)).select(
        "doc_id",
        F.round(n_distinct * 1.0 / n, 4).alias("diversity"),
        F.round(n_stop * 1.0 / n, 4).alias("stopword_ratio"),
        F.round(n_distinct * 0.5 / n + (1 - n_stop * 1.0 / n) * 0.5, 4).alias("quality"),
    )


_LANG_LISTS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "y"),
}


def _lang_case_sql() -> str:
    counts = {
        lang: f"SUM(CASE WHEN token IN ({', '.join(repr(w) for w in words)}) THEN 1 ELSE 0 END)"
        for lang, words in _LANG_LISTS.items()
    }
    return f"""
    SELECT doc_id,
           CAST({counts['en']} AS BIGINT) AS score_en,
           CAST({counts['de']} AS BIGINT) AS score_de,
           CAST({counts['es']} AS BIGINT) AS score_es,
           CASE WHEN {counts['en']} >= {counts['de']} AND {counts['en']} >= {counts['es']}
                    THEN 'en'
                WHEN {counts['de']} >= {counts['es']} THEN 'de'
                ELSE 'es' END AS lang_pred
    FROM toks GROUP BY doc_id
    """


@register("text_langid", f"WITH {_TOKS_CTE} {_lang_case_sql()}")
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID heuristic — per-language stopword hits as narrow array
    filters (zero shuffles), argmax with deterministic tie-break
    (en > de > es)."""
    scores = {
        lang: F.expr(
            f"size(filter(toks, t -> t IN ({', '.join(repr(w) for w in words)})))"
        ).cast("long")
        for lang, words in _LANG_LISTS.items()
    }
    agg = D.token_array(_docs(spark, sf_dir)).select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["es"].alias("score_es"),
    )
    return agg.select(
        "doc_id",
        "score_en",
        "score_de",
        "score_es",
        F.when(
            (F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")),
            F.lit("en"),
        )
        .when(F.col("score_de") >= F.col("score_es"), F.lit("de"))
        .otherwise(F.lit("es"))
        .alias("lang_pred"),
    )


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fingerprint"),
    )


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep the lowest doc_id per content hash."""
    return D.exact_dedup(_docs(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(overlap * 1.0 / (sa.n + sb.n - overlap), 4) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE overlap * 1.0 / (sa.n + sb.n - overlap) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs: shingle-join intersection counts
    (shuffle key = shingle) ÷ union sizes; ≥ 0.5 are near-dups.  At scale the
    shingle join IS the LSH-free exact path; MinHash below is the approximate
    path with bounded candidates."""
    return _jaccard_pairs_cached(spark, sf_dir)


@register(
    "dedup_containment_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(overlap * 1.0 / LEAST(sa.n, sb.n), 4) AS containment
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE overlap * 1.0 / LEAST(sa.n, sb.n) >= 0.6
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set containment (overlap coefficient) near-dup pairs — the
    scorer that catches a short document embedded in a long one, which
    Jaccard structurally misses (|A∩B|/min vs |A∩B|/union).  Shares the
    single-evaluation posting-list pair expansion with the Jaccard path
    (``operators/dedup._posting_pair_counts``): one shingle pipeline run,
    no self-join, pair count bounded by posting collisions."""
    return D.containment_pairs(_shingles(spark, sf_dir), threshold=0.6, max_posting_len=None)


@register(
    "dedup_cap_skew_stress",
    r"""
    WITH adv AS (
        SELECT doc_id,
               'the quick brown fox jumps over lazy dogs pair'
               || CAST((doc_id // 2) AS VARCHAR)
               || ' alpha beta gamma delta uniq'
               || CAST(doc_id AS VARCHAR) || ' omega' AS text
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS token,
               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        FROM adv
    ),
    sh AS (
        SELECT DISTINCT doc_id, token || ' ' || lead1 || ' ' || lead2 AS shingle
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS lead1,
                   LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS lead2
            FROM toks
        ) WHERE lead2 IS NOT NULL
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    posting AS (SELECT h, COUNT(*) AS plen FROM shh GROUP BY h),
    kept AS (
        SELECT s.doc_id, s.h FROM shh s JOIN posting p ON s.h = p.h
        WHERE p.plen BETWEEN 2 AND 25
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(overlap * 1.0 / (sa.n + sb.n - overlap), 4) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE overlap * 1.0 / (sa.n + sb.n - overlap) >= 0.1
    """,
)
def dedup_cap_skew_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-stress for the posting cap (VERDICT r5 item 3): an adversarial
    corpus where the cap DEMONSTRABLY binds, oracled on the survivors.

    Every document is 'boilerplate + pair tail + unique tail', so 8 hot
    shingles appear in ALL |D| documents (posting length 500 at sf0.01 /
    5000 at sf0.1 — far over the cap of 25), while each even/odd doc pair
    shares exactly 3 pair-local shingles (posting length 2, survives).
    Uncapped, the 8 hot lists would expand |D|²/2 pairs (12.5M at sf0.1)
    before any threshold could prune; capped, expansion is |D|/2 pairs.
    The oracle replicates the cap rule exactly (drop whole posting lists
    with >25 members; set-size denominators keep the full sets), so the
    gate proves survivors are COMPUTED RIGHT while the cap is truncating —
    previously the cap was property-tested but never bound on gate data.
    Timings with/without the cap: PERFORMANCE.md (round 6)."""
    base = _docs(spark, sf_dir).select("doc_id")
    text = F.concat(
        F.lit("the quick brown fox jumps over lazy dogs pair"),
        F.floor(F.col("doc_id") / 2).cast("bigint").cast("string"),
        F.lit(" alpha beta gamma delta uniq"),
        F.col("doc_id").cast("string"),
        F.lit(" omega"),
    )
    adv = base.select("doc_id", text.alias("text"))
    return D.jaccard_pairs(D.shingles(adv), threshold=0.1, max_posting_len=25)


def _entropy_ratio_cte() -> str:
    return """
    tc AS (
        SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token
    ),
    ent AS (
        SELECT doc_id,
               ROUND(CASE WHEN COUNT(*) > 1 THEN
                       (ln(CAST(SUM(c) AS DOUBLE))
                        - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE))
                       / ln(CAST(COUNT(*) AS DOUBLE))
                     ELSE 0.0 END, 4) AS entropy_ratio
        FROM tc GROUP BY doc_id
    )"""


@register(
    "text_quality_buckets",
    f"""
    WITH {_TOKS_CTE},
    {_entropy_ratio_cte()},
    b AS (
        SELECT quantile_cont(entropy_ratio, 0.3333333333333333) AS b1,
               quantile_cont(entropy_ratio, 0.6666666666666666) AS b2
        FROM ent
    )
    SELECT doc_id, entropy_ratio,
           CASE WHEN entropy_ratio < b1 THEN 'tail'
                WHEN entropy_ratio < b2 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM ent, b
    """,
)
def text_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus partition by quality tercile:
    exact tercile BOUNDARIES of the entropy-ratio signal come from one
    ``percentile`` aggregation (an aggregate, not a sort), return to the
    driver as two scalars, and broadcast back as literals so the bucket
    assignment is a fully narrow pass — the same no-global-sort pattern
    as ``window_deciles_scalable``, applied to a derived quality signal.
    At 100 TB: one aggregation + one narrow pass; driver state is two
    floats."""
    from ..operators.textanalysis import unigram_entropy

    ent = unigram_entropy(_docs(spark, sf_dir)).select("doc_id", "entropy_ratio")
    b1, b2 = ent.agg(
        F.expr(
            "percentile(entropy_ratio,"
            " array(0.3333333333333333, 0.6666666666666666))"
        ).alias("b")
    ).collect()[0]["b"]
    return ent.select(
        "doc_id", "entropy_ratio",
        F.when(F.col("entropy_ratio") < float(b1), "tail")
        .when(F.col("entropy_ratio") < float(b2), "middle")
        .otherwise("head")
        .alias("bucket"),
    )



@register(
    "text_unigram_entropy",
    f"""
    WITH {_TOKS_CTE},
    tc AS (
        SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE),
                 4) AS entropy,
           ROUND(CASE WHEN COUNT(*) > 1 THEN
                   (ln(CAST(SUM(c) AS DOUBLE))
                    - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE))
                   / ln(CAST(COUNT(*) AS DOUBLE))
                 ELSE 0.0 END, 4) AS entropy_ratio
    FROM tc GROUP BY doc_id
    """,
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) — the perplexity-proxy
    quality signal: templated/repetitive docs score low, lexically diverse
    docs approach ``ln(n_distinct)``.  Uses the no-window identity
    ``H = ln n − (Σ c·ln c)/n`` so the plan is two map-side-combining
    aggregations and nothing else (see
    ``operators/textanalysis.unigram_entropy``)."""
    from ..operators import textanalysis as T

    return T.unigram_entropy(_docs(spark, sf_dir))


_N_HASHES = 8


def _minhash_agg_sql() -> str:
    # Mirrors minhash_signatures: 4 disjoint 32-bit windows per md5 digest.
    mins = ", ".join(
        f"MIN(('0x' || substr(md5('{seed // 4}:' || shingle),"
        f" {1 + 8 * (seed % 4)}, 8))::BIGINT) AS h{seed}"
        for seed in range(_N_HASHES)
    )
    return f"SELECT doc_id, {mins} FROM sh GROUP BY doc_id"


@register("dedup_minhash_signature", f"WITH {_SHINGLES_CTE} {_minhash_agg_sql()}")
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: 8 md5-seeded 32-bit min-hashes per document,
    computed as 8 ``min`` aggregates in ONE groupBy pass over the shingle
    set (no per-hash shuffles)."""
    return D.minhash_signatures(_docs(spark, sf_dir), n_hashes=_N_HASHES)


def _minhash_pairs_sql() -> str:
    bands = [(0, 1), (2, 3), (4, 5), (6, 7)]
    band_rows = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {n} AS band_id,"
        f" CAST(h{i} AS VARCHAR) || '_' || CAST(h{j} AS VARCHAR) AS band_key FROM sig"
        for n, (i, j) in enumerate(bands)
    )
    return f"""
    WITH {_SHINGLES_CTE}, sig AS ({_minhash_agg_sql()}),
    bands AS (
{band_rows}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


@register("dedup_minhash_pairs", _minhash_pairs_sql())
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: 4 bands × 2 rows, melted to (doc, band_id, band_key)
    rows so ONE self-join on the band key yields all candidate pairs — the
    signature pipeline runs once, and the shuffle key (band_key) is
    uniformly hash-distributed.  This is the shape that survives scale: the
    join input is 4 small rows per document, never the shingle sets."""
    sig = dedup_minhash_signature(spark, sf_dir)
    return D.lsh_candidate_pairs(sig, n_hashes=_N_HASHES, band_size=2, max_posting_len=None)


_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    token_hash = "('0x' || substr(md5(token), 1, 8))::BIGINT"
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN ({token_hash} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH {_TOKS_CTE},
    dtoks AS (SELECT DISTINCT doc_id, token FROM toks)
    SELECT doc_id, {bit_terms} AS simhash
    FROM dtoks GROUP BY doc_id
    """


@register("dedup_simhash", _simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the distinct token set: per-bit majority vote of
    md5-derived token hashes, folded into one integer — all 16 bit-votes are
    aggregates in a single groupBy."""
    return D.simhash(_docs(spark, sf_dir), bits=_SIMHASH_BITS)


@register(
    "dedup_lsh_verified",
    f"""
    WITH {_SHINGLES_CTE}, sig AS ({_minhash_agg_sql()}),
    bands AS (
        SELECT doc_id, 0 AS band_id,
               CAST(h0 AS VARCHAR) || '_' || CAST(h1 AS VARCHAR) AS band_key FROM sig
        UNION ALL
        SELECT doc_id, 1, CAST(h2 AS VARCHAR) || '_' || CAST(h3 AS VARCHAR) FROM sig
        UNION ALL
        SELECT doc_id, 2, CAST(h4 AS VARCHAR) || '_' || CAST(h5 AS VARCHAR) FROM sig
        UNION ALL
        SELECT doc_id, 3, CAST(h6 AS VARCHAR) || '_' || CAST(h7 AS VARCHAR) FROM sig
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    exact AS (
        SELECT i.doc_a, i.doc_b,
               ROUND(i.overlap * 1.0 / (sa.n + sb.n - i.overlap), 4) AS jaccard
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
            FROM (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
                  FROM sh) a
            JOIN (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
                  FROM sh) b
              ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) i JOIN sizes sa ON i.doc_a = sa.doc_id
            JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE i.overlap * 1.0 / (sa.n + sb.n - i.overlap) >= 0.5
    )
    SELECT c.doc_a, c.doc_b, e.jaccard
    FROM cands c JOIN exact e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
    """,
)
def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard two-stage near-dup pipeline as ONE gate query: MinHash
    LSH proposes candidate pairs (bounded by band-bucket collisions), exact
    shingle Jaccard verifies them (approximate recall, exact precision).
    At scale the verify stage touches only the candidate pairs' shingle
    sets, never all pairs."""
    return D.near_dup_pipeline(_docs(spark, sf_dir), jaccard_threshold=0.5,
                               max_posting_len=None)


@register(
    "dedup_cluster_components",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
        WHERE overlap * 1.0 / (sa.n + sb.n - overlap) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node),
    szs AS (SELECT cluster_id AS sz_cluster, COUNT(*) AS cluster_size
            FROM cc GROUP BY cluster_id)
    SELECT cc.doc_id, cc.cluster_id, szs.cluster_size
    FROM cc JOIN szs ON cc.cluster_id = szs.sz_cluster
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate CLUSTERS via distributed connected
    components (iterative min-label propagation; see
    ``operators/dedup.connected_components``).  The transitive closure is
    what "keep one per cluster" actually needs — pairs alone under-merge
    when duplicates chain (a~b, b~c with a,c never directly compared); the
    sf corpus genuinely has 3- and 4-document chains.  The DuckDB oracle
    computes the same closure with a recursive CTE — two completely
    different fixpoint engines agreeing on every cluster assignment."""
    cc = _cc_cached(spark, sf_dir)
    sizes = cc.groupBy(F.col("cluster_id").alias("sz_cluster")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cc.join(F.broadcast(sizes), cc.cluster_id == sizes.sz_cluster)
        .select(F.col("node").alias("doc_id"), "cluster_id", "cluster_size")
    )


@register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
        WHERE overlap * 1.0 / (sa.n + sb.n - overlap) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node),
    q AS (
        SELECT doc_id,
               ROUND(COUNT(DISTINCT token) * 0.5 / COUNT(*)
                     + (1 - SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0
                                END) * 1.0 / COUNT(*)) * 0.5, 4) AS quality
        FROM toks GROUP BY doc_id
    ),
    labeled AS (
        SELECT q.doc_id, COALESCE(cc.cluster_id, q.doc_id) AS cluster_id,
               q.quality
        FROM q LEFT JOIN cc ON q.doc_id = cc.doc_id
    )
    SELECT doc_id, cluster_id, quality,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC, doc_id) = 1 AS keep
    FROM labeled
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup COMPOSITION as one gate (SlimPajama shape): exact
    Jaccard near-dup pairs → transitive clusters (distributed CC) →
    keep the best-quality document per cluster, singletons kept.  The
    oracle rebuilds the same closure with a recursive CTE and the same
    argmax window, so a wrong cluster merge, quality formula, or
    tie-break flips at least one ``keep`` flag.  See
    ``operators/dedup.keep_best_per_cluster`` for the 100 TB shape."""
    from ..operators import textanalysis as TA

    docs = _docs(spark, sf_dir)
    pairs = _jaccard_pairs_cached(spark, sf_dir)
    scored = TA.quality_score(docs).select("doc_id", "quality")
    return D.keep_best_per_cluster(
        scored, pairs.select("doc_a", "doc_b"),
        clusters=_cc_cached(spark, sf_dir),
    )


@register(
    "docs_unimax_allocation",
    r"""
    WITH t AS (
        SELECT lang AS stratum,
               SUM(len(string_split_regex(trim(text), '\s+'))) AS tt
        FROM documents GROUP BY lang
    ),
    c AS (
        SELECT stratum, CAST(tt AS BIGINT) AS total_tokens,
               tt * 1.0 AS cap,
               0.9 * SUM(tt) OVER () AS budget,
               COUNT(*) OVER () AS k,
               ROW_NUMBER() OVER (ORDER BY tt * 1.0, stratum) AS rk,
               COALESCE(SUM(tt * 1.0) OVER (
                   ORDER BY tt * 1.0, stratum
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM t
    ),
    s AS (
        SELECT *, (cum_before + cap * (k - rk + 1)) <= budget AS capped
        FROM c
    ),
    agg AS (
        SELECT *,
               SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS m,
               COALESCE(SUM(CASE WHEN capped THEN cap END) OVER (), 0)
                   AS cum_capped
        FROM s
    ),
    final AS (
        SELECT *, CASE WHEN capped THEN cap
                       ELSE LEAST(cap, (budget - cum_capped) / (k - m))
                  END AS alloc
        FROM agg
    )
    SELECT stratum, total_tokens,
           ROUND(cap, 4) AS cap_tokens,
           ROUND(alloc, 4) AS alloc_tokens,
           ROUND(alloc / total_tokens, 4) AS epochs
    FROM final
    """,
)
def docs_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023) — the third
    published mixing strategy alongside temperature sampling and DoReMi:
    the token budget spreads as uniformly as possible across languages,
    but no language exceeds ``max_epochs`` passes (here 1.0, budget =
    90% of corpus tokens — the four smaller languages hit their epoch
    cap, English absorbs the remainder at theta).  The oracle replays
    the closed-form water-filling with the same sorted windows; a wrong
    sort order, off-by-one in the remaining-share count, or a stratum
    crossing its cap diverges.  See
    ``operators/textanalysis.unimax_allocation`` for the scale shape
    (corpus-sized work is one token-count aggregation; the water-fill
    runs over one row per language)."""
    from ..operators import textanalysis as TA

    return TA.unimax_allocation(
        _docs(spark, sf_dir), budget_fraction=0.9, max_epochs=1.0
    )


@register(
    "text_stratified_sample",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 10000
        < CAST((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END)
               * 10000 AS BIGINT)
    """,
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (50% en / 25% de / 10% rest) via
    md5 bucketing — reproducible across runs, engines, and partitionings
    (no RNG, no partition-order dependence), which is what makes corpus
    re-samples stable under backfill.  Fully narrow: zero shuffles."""
    from ..operators import textanalysis as T

    return T.stratified_sample(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        strata_col="lang",
        rates={"en": 0.5, "de": 0.25},
        default_rate=0.1,
    )


@register(
    "text_tfidf_top_terms",
    f"""
    WITH {_TOKS_CTE},
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    dfreq AS (
        SELECT token, COUNT(*) AS doc_freq
        FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token AS term, tf.tf, dfreq.doc_freq,
               tf.tf * n.n_docs * 1.0 / dfreq.doc_freq AS score
        FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
    )
    SELECT doc_id, term, tf, doc_freq, ROUND(score, 4) AS score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf (ratio idf:
    n_docs/doc_freq — exact in doubles, so cross-engine rankings and
    tie-breaks are deterministic).  Two shuffles total: one on token for
    document frequencies, one on doc_id for tf + the top-k window."""
    from ..operators import textanalysis as T

    return T.tfidf_top_terms(_docs(spark, sf_dir), k=3)


@register(
    "text_bpe_token_stats",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS n_bpe_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct_tokens,
           CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) > 0
                THEN ROUND(length(text) * 1.0
                     / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 4)
           END AS chars_per_token
    FROM documents
    """,
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-word token accounting (letter runs / digit runs /
    punctuation marks — the GPT-2 pre-tokenizer classes in an
    engine-portable regex subset).  Narrow: four regexp_extract_all +
    size expressions, zero shuffles."""
    from ..operators.textanalysis import bpe_token_stats

    return bpe_token_stats(_docs(spark, sf_dir))


@register(
    "text_winnowing_stats",
    """
    WITH grams AS (
        SELECT doc_id, i AS pos, length(text) - 8 + 1 AS n,
               ('0x' || substr(md5(substring(text, CAST(i AS BIGINT), 8)), 1, 15))::BIGINT
                   AS h
        FROM documents,
             UNNEST(generate_series(1, length(text) - 8 + 1)) AS t(i)
        WHERE length(text) >= 8 + 4 - 1
    ),
    mins AS (
        SELECT doc_id, pos, n,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM grams
    ),
    fps AS (
        SELECT DISTINCT doc_id, fp FROM mins WHERE pos <= n - 3
    )
    SELECT doc_id, COUNT(*) AS n_fingerprints, MIN(fp) AS min_fp, MAX(fp) AS max_fp
    FROM fps GROUP BY doc_id
    """,
)
def text_winnowing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint sets per document: char-8-gram rolling
    hashes, min of each 4-hash window, distinct — any shared substring of
    length >= 11 yields a shared fingerprint.  Surfaced as per-doc
    (count, min, max) so the gate result stays compact while every
    fingerprint still influences the hash check.  DuckDB replays the
    identical k-gram/window/hash pipeline."""
    from ..operators.textanalysis import winnowing_fingerprints

    fps = winnowing_fingerprints(_docs(spark, sf_dir), k=8, w=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


@register(
    "dedup_winnowing_pairs",
    """
    WITH grams AS (
        SELECT doc_id, i AS pos, length(text) - 16 + 1 AS n,
               ('0x' || substr(md5(substring(text, CAST(i AS BIGINT), 16)), 1, 15))::BIGINT
                   AS h
        FROM documents,
             UNNEST(generate_series(1, length(text) - 16 + 1)) AS t(i)
        WHERE length(text) >= 16 + 8 - 1
    ),
    mins AS (
        SELECT doc_id, pos, n,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
        FROM grams
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM mins WHERE pos <= n - 7)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap candidates: documents sharing >= 3 winnowing
    fingerprints — position-robust plagiarism/copy detection that catches
    shared PASSAGES (k=16, w=8: any shared run >= 23 chars leaves a shared
    fingerprint; 8-char grams of natural English are near-universal and
    pair almost everything — measured 98k pairs vs 175 selective ones)
    where whole-document shingle Jaccard dilutes below threshold.  Same
    posting-list shape as the Jaccard pair stage: group by fingerprint,
    expand pairs in-bucket, count per pair — shuffle volume is fingerprint
    postings, never |D|^2."""
    from ..operators.textanalysis import winnowing_fingerprints

    fps = winnowing_fingerprints(_docs(spark, sf_dir), k=16, w=8)
    postings = (
        fps.groupBy("fp")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where(F.size("ds") >= 2)
    )
    return (
        postings.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= 3)
    )


@register(
    "text_top_tokens",
    f"""
    WITH {_TOKS_CTE}
    SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM toks GROUP BY token
    ORDER BY freq DESC, token LIMIT 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 tokens by frequency with document
    frequency — the vocabulary statistic behind stop-word lists and
    BPE merges.  Map-side partial counts shrink the token shuffle to one
    row per (token, partition); the final top-k is a TakeOrdered, no
    global sort.  (At open-web scale the approximate path is a count-min
    sketch; exact stays gate-checkable.)"""
    toks = _tokens(spark, sf_dir)
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


@register(
    "text_gopher_repetition",
    f"""
    WITH {_TOKS_CTE},
    tstats AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(1.0 - COUNT(DISTINCT token) * 1.0 / COUNT(*), 4) AS dup_token_frac,
               ROUND(SUM(length(token)) * 1.0 / COUNT(*), 4) AS mean_word_len
        FROM toks GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, token || ' ' || lead1 AS gram
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS lead1
            FROM toks
        ) WHERE lead1 IS NOT NULL
    ),
    bgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY doc_id, gram),
    top AS (
        SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 4) AS top_bigram_frac
        FROM bgc GROUP BY doc_id
    )
    SELECT t.doc_id, n_tokens, dup_token_frac, mean_word_len,
           COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac
    FROM tstats t LEFT JOIN top USING (doc_id)
    """,
)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al., arXiv:2112.11446 Table A1):
    duplicate-token fraction, mean word length, top-bigram fraction.  The
    token stats are fully narrow array expressions; only the bigram mode
    shuffles, keyed on doc_id."""
    from ..operators.textanalysis import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


_CONTAM_TOKS = r"""
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS token,
               generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        FROM documents
"""


@register(
    "text_contamination",
    f"""
    WITH ctoks AS ({_CONTAM_TOKS} WHERE doc_id % 97 <> 0),
    csh AS (
        SELECT DISTINCT doc_id, token || ' ' || lead1 || ' ' || lead2 AS shingle
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS lead1,
                   LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS lead2
            FROM ctoks
        ) WHERE lead2 IS NOT NULL
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM csh GROUP BY doc_id),
    btoks AS ({_CONTAM_TOKS} WHERE doc_id % 97 = 0),
    bsh AS (
        SELECT DISTINCT token || ' ' || lead1 || ' ' || lead2 AS shingle
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS lead1,
                   LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS lead2
            FROM btoks
        ) WHERE lead2 IS NOT NULL
    ),
    m AS (
        SELECT c.doc_id, COUNT(*) AS n_matched
        FROM csh c JOIN bsh b ON c.shingle = b.shingle
        GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.set_size, COALESCE(m.n_matched, 0) AS n_matched,
           ROUND(COALESCE(m.n_matched, 0) * 1.0 / s.set_size, 4) AS contamination
    FROM sizes s LEFT JOIN m USING (doc_id)
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scoring (GPT-3 appendix C shape): every
    corpus document scored by the fraction of its distinct 3-gram shingles
    that appear in ANY benchmark document (here: doc_id % 97 == 0 plays
    the benchmark).  The benchmark shingle union dedups and broadcasts;
    the corpus side is one join + one groupBy on doc_id.  Raw shingle
    strings join here so the oracle is readable — production would pass
    hash_shingles=True for 8-byte join keys."""
    from ..operators.textanalysis import benchmark_contamination

    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = benchmark_contamination(corpus, bench, hash_shingles=False)
    return out.select(
        "doc_id",
        F.col("set_size").cast("long").alias("set_size"),
        F.col("n_matched").cast("long").alias("n_matched"),
        "contamination",
    )


@register(
    "docs_pack_shards",
    """
    WITH laid AS (
        SELECT lang, doc_id, n_chars,
               SUM(n_chars) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_chars AS start_offset
        FROM documents
    )
    SELECT lang, CAST(FLOOR(start_offset / 20000.0) AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS shard_chars
    FROM laid GROUP BY lang, shard_id
    """,
)
def docs_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout: per-language running sum of
    document weight (n_chars) in doc_id order, shard boundary every 20k
    units — the write-side step that turns a curated corpus into
    fixed-size training shards.  Windows partition BY LANGUAGE (the scale
    path; a global ordering would funnel one reducer), then shard stats
    aggregate on the same key."""
    from ..operators.textanalysis import pack_shards

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    packed = pack_shards(docs, "n_chars", budget=20000, partition_col="lang")
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
    )


@register("dedup_cluster_star", ORACLE["dedup_cluster_components"])
def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster closure as ``dedup_cluster_components`` but
    via Kiveris large-star/small-star EDGE REWRITING
    (``operators/dedup.connected_components_star``) — the variant whose
    per-round cost tracks the shrinking edge set, built for adversarial
    graphs (hubs, long chains) where label propagation's fixed edge list
    is the bottleneck.  Both algorithms must agree with the recursive-CTE
    oracle on every assignment, so the two Spark fixpoint engines and
    DuckDB's recursion all triangulate."""
    pairs = _jaccard_pairs_cached(spark, sf_dir)
    cc = D.connected_components_star(pairs.select("doc_a", "doc_b"))
    sizes = cc.groupBy(F.col("cluster_id").alias("sz_cluster")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cc.join(sizes, cc.cluster_id == sizes.sz_cluster)
        .select(F.col("node").alias("doc_id"), "cluster_id", "cluster_size")
    )


def _incremental_lsh_sql() -> str:
    bands = [(0, 1), (2, 3), (4, 5), (6, 7)]
    band_rows = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {n} AS band_id,"
        f" CAST(h{i} AS VARCHAR) || '_' || CAST(h{j} AS VARCHAR) AS band_key FROM sig"
        for n, (i, j) in enumerate(bands)
    )
    return f"""
    WITH {_SHINGLES_CTE}, sig AS ({_minhash_agg_sql()}),
    bands AS (
{band_rows}
    )
    SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_matched
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id % 5 = 4
     AND (b.doc_id % 5 <> 4 OR a.doc_id < b.doc_id)
    """


@register("dedup_incremental_lsh", _incremental_lsh_sql())
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup for a daily ingest batch (doc_id % 5 == 4 plays
    "today"): the batch's MinHash bands broadcast against the stored band
    index of the historical corpus (``melt_bands`` rows — persisted, not
    recomputed), plus in-batch LSH pairs.  Per-day cost is the new
    batch's signature pipeline + index lookups; historical shingle sets
    are never re-read.  The oracle derives the identical signatures for
    both sides and applies the same new-vs-store/new-vs-new pairing
    rule."""
    docs = _docs(spark, sf_dir)
    is_new = F.col("doc_id") % 5 == 4
    new_sigs = D.minhash_signatures(docs.where(is_new), n_hashes=_N_HASHES)
    stored = D.melt_bands(
        D.minhash_signatures(docs.where(~is_new), n_hashes=_N_HASHES),
        n_hashes=_N_HASHES,
    )
    return D.incremental_lsh_pairs(new_sigs, stored, n_hashes=_N_HASHES,
                                   max_posting_len=None)


@register(
    "docs_split_assign",
    """
    WITH b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000 AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket >= 0 AND bucket < 9000 THEN 'train'
                WHEN bucket >= 9000 AND bucket < 9500 THEN 'val'
                WHEN bucket >= 9500 AND bucket < 10000 THEN 'test'
           END AS split,
           lang, COUNT(*) AS n_docs
    FROM b GROUP BY split, lang
    """,
)
def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment: md5-bucket row
    predicate, so a document's split never changes as the corpus grows or
    repartitions (leak-free eval sets).  Fully narrow + one aggregation;
    DuckDB reproduces every bucket from the same hash."""
    from ..operators.textanalysis import split_assign

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = split_assign(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    return out.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "docs_curated_corpus",
    ORACLE["dedup_cluster_components"].replace(
        """    SELECT cc.doc_id, cc.cluster_id, szs.cluster_size
    FROM cc JOIN szs ON cc.cluster_id = szs.sz_cluster
    """,
        f"""    , q AS (
        SELECT doc_id,
               ROUND(COUNT(DISTINCT token) * 0.5 / COUNT(*)
                     + (1 - SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
                        * 1.0 / COUNT(*)) * 0.5, 4) AS quality
        FROM toks GROUP BY doc_id
    ),
    losers AS (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
    SELECT d.doc_id, d.lang,
           CASE WHEN bucket >= 0 AND bucket < 9000 THEN 'train'
                WHEN bucket >= 9000 AND bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           q.quality
    FROM (
        SELECT doc_id, lang,
               ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000 AS bucket
        FROM documents
    ) d
    JOIN q ON d.doc_id = q.doc_id
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
      AND q.quality >= 0.7
    """,
    ),
)
def docs_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus curation — the flagship LLM-training-data
    pipeline composed from the individual gates: near-dup clustering drops
    every non-keeper document (min-id per transitive cluster), a narrow
    quality score filters the survivors, and the deterministic md5-bucket
    rule assigns leak-free train/val/test splits.  Plan shape at scale:
    quality + split are narrow expressions over one documents scan; the
    only joins are the anti-join against the (tiny, broadcast) loser list
    and the pair pipeline feeding connected components — each piece
    individually audited scale-sound by its own gate."""
    from ..operators.textanalysis import split_assign

    stop_list = ", ".join(repr(w) for w in _STOPWORDS)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    n = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    n_stop = F.expr(f"size(filter(toks, t -> t IN ({stop_list})))")
    scored = docs.select(
        "doc_id", "lang",
        F.round(n_distinct * 0.5 / n + (1 - n_stop * 1.0 / n) * 0.5, 4)
        .alias("quality"),
    ).where(F.col("quality") >= 0.7)

    cc = _cc_cached(spark, sf_dir)
    losers = cc.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    curated = scored.join(F.broadcast(losers), "doc_id", "left_anti")
    return split_assign(curated, {"train": 0.9, "val": 0.05, "test": 0.05}).select(
        "doc_id", "lang", "split", "quality"
    )


@register(
    "dedup_keep_list",
    ORACLE["dedup_cluster_components"].replace(
        """    SELECT cc.doc_id, cc.cluster_id, szs.cluster_size
    FROM cc JOIN szs ON cc.cluster_id = szs.sz_cluster
    """,
        """    SELECT d.doc_id,
           COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
           CASE WHEN cc.doc_id IS NULL OR cc.doc_id = cc.cluster_id
                THEN TRUE ELSE FALSE END AS keep
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN cc ON cc.doc_id = d.doc_id
    """,
    ),
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's actual deliverable: a keep/drop decision for
    EVERY corpus document — near-dup pairs → transitive clusters → keep
    the minimum doc id per cluster; documents in no cluster keep
    themselves.  One left join of the corpus against the cluster map
    (clusters are a tiny fraction of the corpus, broadcast); the oracle
    extends the recursive-CTE closure with the same keeper rule."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    cc = _cc_cached(spark, sf_dir)
    cluster_map = cc.select(F.col("node").alias("doc_id"), "cluster_id")
    return (
        docs.join(F.broadcast(cluster_map), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            (
                F.col("cluster_id").isNull()
                | (F.col("doc_id") == F.col("cluster_id"))
            ).alias("keep"),
        )
    )


@register(
    "text_dup_ngram_coverage",
    f"""
    WITH {_SHINGLES_CTE},
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
        FROM sh
    ),
    freq AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS doc_freq FROM shh
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN doc_freq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_shingles,
           ROUND(SUM(CASE WHEN doc_freq >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
               AS dup_frac
    FROM freq GROUP BY doc_id
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate n-gram coverage (RefinedWeb-style span-dedup signal): for
    each document, the fraction of its distinct 3-gram shingles that occur
    in at least one OTHER document.  Catches boilerplate-heavy documents
    no pair-level scorer flags (80% shared shingles spread across hundreds
    of partners).  Plan: a count window keyed on the 60-bit shingle hash
    attaches corpus document-frequency with ONE exchange and no join, then
    one doc-keyed aggregation — linear in shingle volume, so this signal
    stays cheap at 100 TB even where pairwise scorers need stop-shingle
    caps (see ``operators/dedup.dup_shingle_coverage``)."""
    return D.dup_shingle_coverage(_shingles(spark, sf_dir))


@register(
    "docs_lang_rebalance",
    """
    WITH counts AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_stratum) AS n_min FROM counts),
    rates AS (
        SELECT lang, CAST(FLOOR(n_min * 10000 / n_stratum) AS BIGINT) AS keep_bps
        FROM counts, m
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE ('0x' || substr(md5('rebal:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 10000 < r.keep_bps
    """,
)
def docs_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced corpus mix: every language down-sampled to the
    size of the smallest one, with per-language keep rates computed FROM
    the corpus (floor(n_min/n_lang) in basis points) and applied as the
    deterministic md5-bucket predicate shared with
    ``text_stratified_sample`` — reproducible across engines and stable
    under growth of other languages.  Plan: one map-side-combined count
    per language (driver/broadcast state = |langs| rates), a broadcast
    join to attach rates, then a narrow row predicate; the full corpus is
    never shuffled."""
    from ..operators.textanalysis import lang_rebalance

    return lang_rebalance(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        strata_col="lang",
    )


@register(
    "docs_token_chunks",
    r"""
    WITH arr AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    st AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start
        FROM arr
    )
    SELECT doc_id,
           CAST((start - 1) // 24 AS INT) + 1 AS chunk_id,
           CAST(start AS BIGINT) AS start_pos,
           CAST(LEAST(32, len(toks) - start + 1) AS INT) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, start, LEAST(start + 31, len(toks))), ' '))
               AS chunk_hash
    FROM st
    """,
)
def docs_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window training-sequence chunking: each document's token
    stream split into 32-token windows advancing by 24 (8-token context
    overlap), the layout step between a curated corpus and fixed-budget
    training sequences.  Emits the chunk's position, length, and content
    hash (the hash stands in for materialized text, keeping the gate
    payload narrow).  Plan: narrow split + per-document start-sequence
    generator — a pure map stage, zero shuffles, every expression
    JVM-side (see ``operators/textanalysis.token_chunks``)."""
    from ..operators.textanalysis import token_chunks

    return token_chunks(_docs(spark, sf_dir), size=32, stride=24)


@register(
    "docs_source_cap",
    """
    SELECT doc_id, source, rank FROM (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id) AS INT) AS rank
        FROM documents
    ) WHERE rank <= 10
    """,
)
def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the C4/Gopher curation rule that stops a
    single site dominating the corpus): keep the top 10 documents per
    source, ranked by length with doc-id tie-breaks.  The rank window is
    bounded (rn <= k), which Spark plans as WindowGroupLimit — each map
    task keeps only its local top-k per source BEFORE the exchange, so
    shuffle volume is |sources| * k per task, not the corpus.  At 100 TB
    with millions of domains the partition key is well-distributed; a
    single hot domain still moves only k rows per task thanks to the
    group-limit pushdown."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("doc_id", "source", "rank")
    )


@register(
    "docs_temperature_mix",
    """
    WITH counts AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_stratum) AS n_min FROM counts),
    rates AS (
        SELECT lang,
               CAST(FLOOR(10000 * sqrt(n_min * 1.0 / n_stratum)) AS BIGINT)
                   AS keep_bps
        FROM counts, m
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE ('0x' || substr(md5('tempmix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 10000 < r.keep_bps
    """,
)
def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed language mixing (the mT5/XLM-R sampling rule
    with alpha = 0.5): keep rates scale with sqrt(n_min/n_lang), half-way
    between full rebalance-to-smallest (``docs_lang_rebalance``,
    alpha = 1) and the raw crawl distribution (alpha = 0) — high-resource
    languages are damped, low-resource ones kept whole, without the
    all-or-nothing cliff.  sqrt is bit-deterministic IEEE-754 in both
    engines, so the floor'd basis-point rates agree exactly.  Same plan
    as the rebalance gate: tiny count aggregation, broadcast rates,
    narrow md5-bucket predicate — the corpus is never shuffled."""
    from ..operators.textanalysis import lang_rebalance

    return lang_rebalance(
        t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        strata_col="lang",
        seed="tempmix",
        alpha=0.5,
    )


@register(
    "text_inverted_index",
    f"""
    WITH {_TOKS_CTE},
    bg AS (
        SELECT doc_id, pos,
               token || ' ' || LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS bigram
        FROM toks
    ),
    postings AS (
        SELECT bigram, doc_id, COUNT(*) AS n_occurrences, MIN(pos) AS first_pos
        FROM bg WHERE bigram IS NOT NULL GROUP BY bigram, doc_id
    ),
    df_tbl AS (
        SELECT bigram, COUNT(*) AS doc_freq FROM postings GROUP BY bigram
    )
    SELECT p.bigram, p.doc_id, p.n_occurrences, CAST(p.first_pos AS BIGINT)
               AS first_pos, d.doc_freq
    FROM postings p JOIN df_tbl d ON p.bigram = d.bigram
    WHERE d.doc_freq BETWEEN 2 AND 30
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase-level inverted-index construction (the retrieval structure a
    corpus pipeline materializes for search/RAG): per-(bigram, doc)
    posting rows with occurrence count and first position, annotated with
    corpus document frequency and restricted to discriminative phrases
    (df 2-30 — the same predicate that drops stopword-class postings at
    build time, where an index's volume hides; the driver corpus's
    unigram vocabulary is all stopword-class, which is exactly why real
    indexes go to phrases).  Plan: one explode, a per-doc LEAD window for
    bigrams, one (bigram, doc)-keyed aggregation, then doc_freq attached
    by a count window over the bigram key — join-free; at 100 TB the
    bigram key would be the 60-bit hash as in ``dup_shingle_coverage``
    (string-keyed here so the oracle's grouping is literally identical).
    """
    from pyspark.sql import Window as W

    toks = _tokens(spark, sf_dir)
    lead_w = W.partitionBy("doc_id").orderBy("pos")
    bg = toks.select(
        "doc_id",
        "pos",
        F.concat_ws(" ", F.col("token"), F.lead("token").over(lead_w)).alias("bigram"),
        F.lead("token").over(lead_w).alias("__next"),
    ).where(F.col("__next").isNotNull())
    postings = bg.groupBy("bigram", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )
    doc_freq = F.count(F.lit(1)).over(W.partitionBy("bigram"))
    return (
        postings.withColumn("doc_freq", doc_freq)
        .where(F.col("doc_freq").between(2, 30))
        .select("bigram", "doc_id", "n_occurrences", "first_pos", "doc_freq")
    )


_BM25_TERMS = ("stream", "window", "merge", "sort")
_BM25_TERMS_SQL = ", ".join(f"'{w}'" for w in _BM25_TERMS)


@register(
    "text_bm25_topk",
    f"""
    WITH {_TOKS_CTE},
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM doclen
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.dl / s.avgdl)))
                   AS score
        FROM tf
        JOIN dfreq ON tf.token = dfreq.token
        JOIN doclen ON tf.doc_id = doclen.doc_id
        CROSS JOIN stats s
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25 FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed conjunctive query (k1=1.2, b=0.75) — the
    ranking half of the retrieval pair with ``text_inverted_index``.
    Term frequencies restrict to the query terms BEFORE any aggregation
    (at 100 TB the tf scan is an index lookup, not a corpus pass);
    corpus-level scalars (N, avgdl) come from one aggregate and broadcast
    via a 1-row cross join; the final top-10 is orderBy+limit, which
    Spark plans as TakeOrdered (per-partition top-k + merge, no global
    sort).  Identical double arithmetic on both engines; ties break on
    doc_id."""
    toks = _tokens(spark, sf_dir)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


@register(
    "dedup_substring_runs",
    f"""
    WITH {_TOKS_CTE},
    g AS (
        SELECT doc_id, pos,
               ('0x' || substr(md5(token || ' ' || l1 || ' ' || l2 || ' ' || l3),
                               1, 15))::BIGINT AS h
        FROM (
            SELECT doc_id, pos, token,
                   LEAD(token, 1) OVER w AS l1,
                   LEAD(token, 2) OVER w AS l2,
                   LEAD(token, 3) OVER w AS l3
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ) WHERE l3 IS NOT NULL
    ),
    m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
        FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    r AS (
        SELECT doc_a, doc_b, pa - pb AS diag,
               pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                       ORDER BY pa) AS grp
        FROM m
    ),
    runs AS (
        SELECT doc_a, doc_b, COUNT(*) AS run_grams
        FROM r GROUP BY doc_a, doc_b, diag, grp
    )
    SELECT doc_a, doc_b, MAX(run_grams) + 3 AS max_run_tokens
    FROM runs GROUP BY doc_a, doc_b
    HAVING MAX(run_grams) + 3 >= 8
    """,
)
def dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022): document pairs sharing a
    run of >= 8 CONSECUTIVE tokens, with the longest shared run length —
    the verbatim-copy signal set-based scorers miss (a 50-token license
    header barely moves Jaccard).  Suffix arrays don't distribute;
    diagonal islands do: positioned 4-grams (narrow build), posting-list
    match-point expansion on the 60-bit gram hash (no self-join), then
    gaps-and-islands on (pair, pa - pb) diagonals.  See
    ``operators/dedup.substring_run_pairs``."""
    return D.substring_run_pairs(
        _docs(spark, sf_dir), k=4, min_run_tokens=8, max_posting_len=None
    )


@register(
    "text_corpus_xent",
    f"""
    WITH {_TOKS_CTE},
    dt AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token),
    v AS (SELECT token, SUM(c) AS cf FROM dt GROUP BY token),
    n AS (SELECT SUM(cf) AS corpus_n FROM v)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(SUM(c * -ln(cf * 1.0 / corpus_n)) / SUM(c), 4) AS xent
    FROM dt JOIN v USING (token) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def text_corpus_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-filter proxy: per-document cross-entropy
    under the corpus unigram LM (low = corpus-typical, high = rare-token
    soup).  Vocabulary joins back broadcast (Zipf-bounded), corpus N
    rides a 1-row broadcast cross join.  See
    ``operators/textanalysis.corpus_cross_entropy``."""
    from ..operators.textanalysis import corpus_cross_entropy

    return corpus_cross_entropy(_docs(spark, sf_dir))


@register(
    "docs_weighted_sample",
    """
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               ln((('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)),
                                   1, 8))::BIGINT + 1) / 4294967297.0)
                   / n_chars AS k
        FROM documents
    )
    SELECT lang, doc_id, n_chars, rk FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rk
        FROM keyed
    ) WHERE rk <= 25
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, 25 docs per language with
    probability proportional to length (Efraimidis-Spirakis keys over
    md5 uniforms — deterministic, engine-replayable).  Rides the
    two-phase WindowGroupLimit rewrite, so pre-shuffle rows are
    tasks x |langs| x 25.  See
    ``operators/textanalysis.weighted_sample_topk``."""
    from ..operators.textanalysis import weighted_sample_topk

    return weighted_sample_topk(
        t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars"),
        weight_col="n_chars", k=25, strata_col="lang",
    )


@register(
    "docs_token_budget_fill",
    r"""
    WITH d AS (
        SELECT source, doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\s+'))) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS diversity
        FROM documents
    ),
    c AS (
        SELECT source AS stratum, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY diversity DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM d
    )
    SELECT stratum, doc_id, n_tokens, cum_before
    FROM c WHERE cum_before < 600
    """,
)
def docs_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget fill: highest-diversity documents first
    until 600 tokens per source — the budget-allocation step between
    corpus scoring and shard packing.  Keep decision is a predicate on
    the 1-preceding running token total; one exchange keyed on source.
    Diversity ratios are exact integer-division doubles, so the ordering
    is bit-identical across engines.  See
    ``operators/textanalysis.token_budget_fill``."""
    from ..operators.textanalysis import token_budget_fill

    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    scored = docs.withColumn(
        "diversity", F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)
    )
    return token_budget_fill(
        scored, budget=600, order_col="diversity", strata_col="source"
    ).withColumnRenamed("stratum", "stratum")


@register(
    "docs_mix_epochs",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    cfg(lang, pm) AS (VALUES ('en', 500), ('de', 300), ('es', 200)),
    plan AS (
        SELECT c.lang,
               ((pm * 1000) // 1000) // n AS epochs,
               ((pm * 1000) // 1000) % n AS partial
        FROM c JOIN cfg USING (lang)
    ),
    ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ),
    rep AS (
        SELECT r.lang, doc_id,
               epochs + CASE WHEN rk <= partial THEN 1 ELSE 0 END AS n_rep
        FROM ranked r JOIN plan USING (lang)
    )
    SELECT lang, doc_id, unnest(generate_series(1, CAST(n_rep AS INT))) AS epoch
    FROM rep WHERE n_rep >= 1
    """,
)
def docs_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix epoch assignment against a 1000-document budget at
    weights en 50% / de 30% / es 20%: full epochs per stratum plus an
    exact md5-rank partial epoch, all integer arithmetic — the
    up-sampling-by-repetition step of LLM data mixing.  See
    ``operators/textanalysis.mix_epochs``."""
    from ..operators.textanalysis import mix_epochs

    return mix_epochs(
        t(spark, sf_dir, "documents").select("lang", "doc_id"),
        weights_permille={"en": 500, "de": 300, "es": 200},
        budget_docs=1000,
    )


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_TOKS_CTE},
    dt AS (SELECT DISTINCT doc_id, token FROM toks WHERE doc_id % 4 = 0),
    th AS (
        SELECT doc_id, token,
               ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
        FROM dt
    ),
    bits AS (
        SELECT doc_id, b.bit,
               CASE WHEN SUM(CASE WHEN (h // (1 << b.bit)) % 2 = 1
                                  THEN 1 ELSE -1 END) > 0
                    THEN (1 << b.bit) ELSE 0 END AS v
        FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
        GROUP BY doc_id, b.bit
    ),
    sh AS (SELECT doc_id, SUM(v) AS simhash FROM bits GROUP BY doc_id),
    m AS (
        SELECT doc_id, simhash, c.ci,
               (simhash // (1 << (c.ci * 4))) % 16 AS cv
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS ci) c
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM m a JOIN m b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 3 via pigeonhole chunk
    blocking (4 x 4-bit chunks: any such pair shares a whole chunk), then
    exact bit_count verification on candidates only (gate: a quarter of
    the corpus at hamming <= 1 — the driver fixture's 30-word vocabulary
    clusters SimHashes far more than a real corpus, and the differential
    comparator collects both sides; the operator default stays at the
    Manku setting hamming <= 3).  See
    ``operators/dedup.simhash_hamming_pairs``."""
    return D.simhash_hamming_pairs(
        _docs(spark, sf_dir).where(F.col("doc_id") % 4 == 0), max_hamming=1
    )


_CLF_WEIGHTS = [-0.042852, -0.476763, -0.169057, -0.159427, -0.814394, 0.122015, 0.067962, -0.580092, -0.418791, -0.86611, 0.651028, -0.544904, 0.101742, 0.278057, -0.48217, -0.939627, -0.573591, 0.960289, -0.713629, 0.629661, 0.024129, -0.131079, 0.248421, 0.629942, -0.478372, 0.720779, -0.888127, 0.028489, 0.913434, 0.266148, 0.004129, -0.590539]


@register(
    "text_classifier_filter",
    f"""
    WITH {_TOKS_CTE}
    , w(idx, wt) AS (VALUES
        (0, -0.042852),
        (1, -0.476763),
        (2, -0.169057),
        (3, -0.159427),
        (4, -0.814394),
        (5, 0.122015),
        (6, 0.067962),
        (7, -0.580092),
        (8, -0.418791),
        (9, -0.86611),
        (10, 0.651028),
        (11, -0.544904),
        (12, 0.101742),
        (13, 0.278057),
        (14, -0.48217),
        (15, -0.939627),
        (16, -0.573591),
        (17, 0.960289),
        (18, -0.713629),
        (19, 0.629661),
        (20, 0.024129),
        (21, -0.131079),
        (22, 0.248421),
        (23, 0.629942),
        (24, -0.478372),
        (25, 0.720779),
        (26, -0.888127),
        (27, 0.028489),
        (28, 0.913434),
        (29, 0.266148),
        (30, 0.004129),
        (31, -0.590539)
    ),
    feat AS (
        SELECT doc_id,
               ('0x' || substr(md5('feat:' || token), 1, 8))::BIGINT % 32 AS idx
        FROM toks
    ),
    agg AS (
        SELECT f.doc_id,
               SUM(CAST(w.wt AS DECIMAL(9,6))) AS s,
               COUNT(*) AS n
        FROM feat f JOIN w ON f.idx = w.idx
        GROUP BY f.doc_id
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(0.0 + CAST(s AS DOUBLE) / n))), 6) AS score,
           (1.0 / (1.0 + exp(-(0.0 + CAST(s AS DOUBLE) / n))))
               >= 0.5 AS keep
    FROM agg
    """,
)
def text_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (FineWeb-Edu / DCLM style): a
    hashed linear model scores every document in ONE narrow pass — token
    -> md5 feature bucket -> broadcast-literal weight, decimal-exact
    fold, mean-pooled, sigmoid — and the keep flag thresholds at 0.5.
    The 32-float weight vector here is a deterministic stub standing in
    for a trained model file; the operator surface
    (``textanalysis.linear_text_classifier``) is exactly what a real
    fastText-export plugs into.  Zero shuffles, no Python."""
    from ..operators.textanalysis import linear_text_classifier

    return linear_text_classifier(_docs(spark, sf_dir), _CLF_WEIGHTS)


_BLOCKLIST = ("merge", "spill")
_BLOCK_SQL = ", ".join(f"'{w}'" for w in _BLOCKLIST)


@register(
    "text_blocklist_filter",
    f"""
    WITH {_TOKS_CTE},
    flagged AS (
        SELECT doc_id,
               MAX(CASE WHEN token IN ({_BLOCK_SQL}) THEN 1 ELSE 0 END) AS hit
        FROM toks GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang, d.source, CAST(f.hit AS BOOLEAN) AS blocked
    FROM documents d JOIN flagged f USING (doc_id)
    """,
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering (the C4 badwords stage): flag documents
    containing any blocklisted token.  Fully narrow —
    ``arrays_overlap`` between the token array and a literal blocklist
    array, zero shuffles, no explode; at 100 TB this is a map-only pass
    whose cost is the scan itself.  (Real blocklists are thousands of
    terms — still a literal array or broadcast set; the plan shape is
    unchanged.)"""
    docs = t(spark, sf_dir, "documents")
    block = F.array(*[F.lit(w) for w in _BLOCKLIST])
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id", "lang", "source",
        F.arrays_overlap(toks, block).alias("blocked"),
    )


@register(
    "dedup_lsh_recall_eval",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT doc_a, doc_b
        FROM inter JOIN sizes sa ON inter.doc_a = sa.doc_id
                   JOIN sizes sb ON inter.doc_b = sb.doc_id
        WHERE overlap * 1.0 / (sa.n + sb.n - overlap) >= 0.5
    ),
    sigs AS (
        SELECT doc_id,
               {", ".join(
                   f"MIN(('0x' || substr(md5('{s // 4}:' || shingle),"
                   f" {1 + 8 * (s % 4)}, 8))::BIGINT) AS h{s}"
                   for s in range(8)
               )}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, b.band_id,
               CASE b.band_id
                    WHEN 0 THEN CAST(h0 AS VARCHAR) || '_' || CAST(h1 AS VARCHAR)
                    WHEN 1 THEN CAST(h2 AS VARCHAR) || '_' || CAST(h3 AS VARCHAR)
                    WHEN 2 THEN CAST(h4 AS VARCHAR) || '_' || CAST(h5 AS VARCHAR)
                    ELSE CAST(h6 AS VARCHAR) || '_' || CAST(h7 AS VARCHAR)
               END AS band_key
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT COUNT(*) AS n_truth,
           CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_found,
           ROUND(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS recall
    FROM truth t LEFT JOIN cand c
      ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    """,
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall evaluation — the dedup twin of ``ann_recall_eval``: how
    many TRUE near-dup pairs (exact shingle Jaccard >= 0.5) does the
    banded MinHash candidate generation recover?  This is the harness
    that turns the band/row tradeoff (4 bands x 2 rows here) from a
    formula into a measured number before committing an index to a 100 TB
    corpus.  Truth and candidates share one shingle-pipeline evaluation
    shape; the recall join touches only pair keys."""
    docs = _docs(spark, sf_dir)
    truth = _jaccard_pairs_cached(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    cand = D.lsh_candidate_pairs(D.minhash_signatures(docs), max_posting_len=None).select(
        "doc_a", "doc_b"
    ).distinct()
    marked = cand.withColumn("__hit", F.lit(1))
    return (
        truth.join(marked, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_found"),
        )
        .select(
            "n_truth", "n_found",
            F.round(F.col("n_found") * 1.0 / F.col("n_truth"), 4).alias("recall"),
        )
    )


@register(
    "dedup_minhash_est_error",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    shh AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
        FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    exact AS (
        SELECT doc_a, doc_b,
               ROUND(overlap * 1.0 / (sa.n + sb.n - overlap), 4) AS jac
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
    ),
    sigs AS (
        SELECT doc_id,
               {", ".join(
                   f"MIN(('0x' || substr(md5('{s // 4}:' || shingle),"
                   f" {1 + 8 * (s % 4)}, 8))::BIGINT) AS h{s}"
                   for s in range(8)
               )}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, b.band_id,
               CASE b.band_id
                    WHEN 0 THEN CAST(h0 AS VARCHAR) || '_' || CAST(h1 AS VARCHAR)
                    WHEN 1 THEN CAST(h2 AS VARCHAR) || '_' || CAST(h3 AS VARCHAR)
                    WHEN 2 THEN CAST(h4 AS VARCHAR) || '_' || CAST(h5 AS VARCHAR)
                    ELSE CAST(h6 AS VARCHAR) || '_' || CAST(h7 AS VARCHAR)
               END AS band_key
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    est AS (
        SELECT c.doc_a, c.doc_b,
               ({" + ".join(
                   f"CASE WHEN sa.h{s} = sb.h{s} THEN 1 ELSE 0 END"
                   for s in range(8)
               )}) / 8.0 AS mh_est
        FROM cand c JOIN sigs sa ON c.doc_a = sa.doc_id
                    JOIN sigs sb ON c.doc_b = sb.doc_id
    )
    SELECT COUNT(*) AS n_pairs,
           ROUND(AVG(abs(e.mh_est - x.jac)), 4) AS avg_abs_err,
           ROUND(MAX(abs(e.mh_est - x.jac)), 4) AS max_abs_err
    FROM est e JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
    """,
)
def dedup_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimation-error measurement over the LSH candidates: the
    8-hash signature agreement fraction vs exact shingle Jaccard, as
    (n_pairs, avg |err|, max |err|) — with ``dedup_lsh_recall_eval``
    this completes the approximation's report card (recall AND accuracy)
    before a band/row/hash-count setting indexes a 100 TB corpus.  All
    inputs are exact small-integer ratios; the error aggregate runs on
    candidate pairs only."""
    docs = _docs(spark, sf_dir)
    shingle_df = _shingles(spark, sf_dir)
    sigs = D.minhash_signatures(docs)
    cand = D.lsh_candidate_pairs(sigs, max_posting_len=None).select("doc_a", "doc_b").distinct()
    exact = D.jaccard_for_pairs(shingle_df, cand, threshold=0.0)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(8)
    )
    est = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", (agree / 8.0).alias("mh_est"))
    )
    return (
        est.join(exact, ["doc_a", "doc_b"])
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("mh_est") - F.col("jaccard"))), 4)
            .alias("avg_abs_err"),
            F.round(F.max(F.abs(F.col("mh_est") - F.col("jaccard"))), 4)
            .alias("max_abs_err"),
        )
    )


@register(
    "docs_pii_scan",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 10 = 0
                            THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                            ELSE '' END
                    || CASE WHEN doc_id % 15 = 0
                            THEN ' ' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
                                 || '-' || '12' || '-' || '3456'
                            ELSE '' END AS text
        FROM documents
    ),
    kinds(kind, pattern) AS (VALUES
        ('email', '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'),
        ('ssn', '\b\d{3}-\d{2}-\d{4}\b')
    )
    SELECT 'text' AS "column", k.kind,
           CAST(SUM(CASE WHEN regexp_matches(s.text, k.pattern)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_matched,
           CAST(SUM(len(regexp_extract_all(s.text, k.pattern))) AS BIGINT)
               AS n_matches
    FROM seeded s CROSS JOIN kinds k
    GROUP BY k.kind
    """,
)
def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII audit over documents with INJECTED synthetic PII (every
    10th doc gains an email, every 15th an SSN-shaped string — the
    fixture text is clean, so the injection is what makes the scan's
    counts non-trivial and the oracle decisive): the real
    ``dataprotection.pii_scan`` runs one narrow regexp_count pass and
    reports (column, kind, rows, matches) — the audit step a
    training-data pipeline runs before deciding redaction policy."""
    from ..operators.dataprotection import PII_PATTERNS, pii_scan

    docs = t(spark, sf_dir, "documents")
    email = F.concat(
        F.lit(" user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    ssn = F.concat(
        F.lpad((F.col("doc_id") % 900 + 100).cast("string"), 3, "0"),
        F.lit("-12-3456"),
    )
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 10 == 0, email).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 15 == 0, F.concat(F.lit(" "), ssn))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    pats = {k: PII_PATTERNS[k] for k in ("email", "ssn")}
    return pii_scan(seeded, ["text"], pats)


@register(
    "docs_quality_ensemble",
    f"""
    WITH {_TOKS_CTE},
    feats AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(SUM(len(token)) * 1.0 / COUNT(*), 4) AS avg_word_len,
               ROUND(COUNT(DISTINCT token) * 1.0 / COUNT(*), 4) AS diversity,
               CAST(SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_stop,
               ROUND(SUM(CASE WHEN regexp_matches(token, '^[0-9]+$')
                         THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
                   AS numeric_frac
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, avg_word_len, diversity, numeric_frac,
           CAST(CASE WHEN n_tokens BETWEEN 5 AND 100000
                      AND avg_word_len BETWEEN 2 AND 12
                      AND n_stop >= 1
                      AND diversity >= 0.2
                      AND numeric_frac <= 0.3 THEN 1 ELSE 0 END AS INT)
               AS keep,
           concat_ws(',',
               CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN NULL
                    ELSE 'len' END,
               CASE WHEN avg_word_len BETWEEN 2 AND 12 THEN NULL
                    ELSE 'word_len' END,
               CASE WHEN n_stop >= 1 THEN NULL ELSE 'stopword' END,
               CASE WHEN diversity >= 0.2 THEN NULL ELSE 'diversity' END,
               CASE WHEN numeric_frac <= 0.3 THEN NULL ELSE 'numeric' END)
               AS reasons
    FROM feats
    """,
)
def docs_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style filter CASCADE: five expression-level quality
    rules (token count bounds, mean word length, >=1 stopword, lexical
    diversity, numeric-token fraction) evaluated in ONE narrow pass, with
    a per-document keep verdict AND the list of failed rule names — the
    audit trail a corpus pipeline needs to tune thresholds (what fraction
    failed WHICH rule), not just a filtered table.  All five signals are
    array expressions over the same tokenization (zero shuffles, zero
    UDFs); at 100 TB this runs at scan speed and the reasons column
    aggregates cheaply downstream.  Rule order in ``reasons`` is fixed so
    the string is deterministic."""
    toks = D.token_array(_docs(spark, sf_dir))
    stop_list = ", ".join(repr(w) for w in _STOPWORDS)
    n = F.size("toks")
    feats = toks.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(
            F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))") * 1.0 / n, 4
        ).alias("avg_word_len"),
        F.round(F.size(F.array_distinct("toks")) * 1.0 / n, 4).alias("diversity"),
        F.expr(f"size(filter(toks, t -> t IN ({stop_list})))")
        .cast("long")
        .alias("n_stop"),
        F.round(
            F.expr("size(filter(toks, t -> t rlike '^[0-9]+$'))") * 1.0 / n, 4
        ).alias("numeric_frac"),
    )
    r_len = F.col("n_tokens").between(5, 100000)
    r_wl = F.col("avg_word_len").between(2, 12)
    r_stop = F.col("n_stop") >= 1
    r_div = F.col("diversity") >= 0.2
    r_num = F.col("numeric_frac") <= 0.3
    return feats.select(
        "doc_id", "n_tokens", "avg_word_len", "diversity", "numeric_frac",
        (r_len & r_wl & r_stop & r_div & r_num).cast("int").alias("keep"),
        F.concat_ws(
            ",",
            F.when(~r_len, F.lit("len")),
            F.when(~r_wl, F.lit("word_len")),
            F.when(~r_stop, F.lit("stopword")),
            F.when(~r_div, F.lit("diversity")),
            F.when(~r_num, F.lit("numeric")),
        ).alias("reasons"),
    )


# Shared oracle CTE: per-document corpus cross-entropy (rounded) joined
# back to each document's source/lang — reused by the DoReMi and CCNet
# gates below.
_XENT_DOC_CTE = f"""
    {_TOKS_CTE},
    dt AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token),
    v AS (SELECT token, SUM(c) AS cf FROM dt GROUP BY token),
    n AS (SELECT SUM(cf) AS corpus_n FROM v),
    xent AS (
        SELECT doc_id,
               ROUND(SUM(c * -ln(cf * 1.0 / corpus_n)) / SUM(c), 4) AS xent
        FROM dt JOIN v USING (token) CROSS JOIN n
        GROUP BY doc_id
    ),
    docmeta AS (
        SELECT x.doc_id, x.xent, d.source, d.lang
        FROM xent x JOIN documents d USING (doc_id)
    )
"""


def _xent_with_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, xent, source, lang) — Spark twin of ``_XENT_DOC_CTE``."""
    from ..operators.textanalysis import corpus_cross_entropy

    docs = _docs(spark, sf_dir)
    xent = corpus_cross_entropy(docs).select("doc_id", "xent")
    return xent.join(docs.select("doc_id", "source", "lang"), "doc_id")


@register(
    "docs_doremi_weights",
    f"""
    WITH {_XENT_DOC_CTE},
    per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(xent), 4) AS avg_xent
        FROM docmeta GROUP BY source
    ),
    excess AS (
        SELECT source, n_docs, avg_xent,
               avg_xent - MIN(avg_xent) OVER () + 0.05 AS e
        FROM per_source
    )
    SELECT source, n_docs, avg_xent,
           ROUND(e / SUM(e) OVER (), 4) AS weight
    FROM excess
    """,
)
def docs_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting PROXY (Xie et al. 2023 uses a
    trained reference model; the deterministic stand-in here is the
    corpus-unigram cross-entropy): domains whose documents are harder
    under the reference distribution (higher excess xent) get
    proportionally more sampling weight.  Per-source average xent minus
    the best source's average (+0.05 floor so no domain zeroes out),
    normalized to sum 1.  The per-source aggregate is tiny (one row per
    domain), so the normalizing window runs over a handful of rows on one
    partition — the corpus-sized work is all in the xent pass, which
    shuffles twice (doc-token counts, then the Zipf-bounded vocabulary)
    and joins the vocab back broadcast."""
    per_source = (
        _xent_with_meta(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("xent"), 4).alias("avg_xent"),
        )
    )
    w_all = Window.partitionBy()
    e = F.col("avg_xent") - F.min("avg_xent").over(w_all) + F.lit(0.05)
    return per_source.select(
        "source", "n_docs", "avg_xent",
        F.round(e / F.sum(e).over(w_all), 4).alias("weight"),
    )


@register(
    "docs_ccnet_buckets",
    f"""
    WITH {_XENT_DOC_CTE},
    bucketed AS (
        SELECT lang, xent,
               NTILE(3) OVER (PARTITION BY lang ORDER BY xent, doc_id) AS b
        FROM docmeta
    )
    SELECT lang,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(xent), 4) AS avg_xent
    FROM bucketed GROUP BY lang, b
    """,
)
def docs_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per language,
    rank documents by LM perplexity proxy (corpus-unigram xent, low =
    fluent) and cut into terciles — 'head' is the high-quality slice
    pipelines keep, 'tail' the discard candidate.  NTILE over
    (lang, xent) is the only corpus-wide shuffle beyond the xent pass
    itself, keyed per language; ties break on doc_id so tercile
    boundaries are deterministic in both engines."""
    meta = _xent_with_meta(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("xent", "doc_id")
    bucketed = meta.withColumn("b", F.ntile(3).over(w))
    return (
        bucketed.groupBy("lang", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("xent"), 4).alias("avg_xent"),
        )
        .select(
            "lang",
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "avg_xent",
        )
    )


@register(
    "docs_curation_funnel",
    f"""
    WITH {_TOKS_CTE},
    feats AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(COUNT(DISTINCT token) * 1.0 / COUNT(*), 4) AS diversity,
               CAST(SUM(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_stop,
               CAST(SUM(CASE WHEN token IN ('the', 'a', 'and', 'of', 'to')
                        THEN 1 ELSE 0 END) AS BIGINT) AS score_en,
               CAST(SUM(CASE WHEN token IN ('der', 'die', 'und', 'das', 'ein')
                        THEN 1 ELSE 0 END) AS BIGINT) AS score_de,
               CAST(SUM(CASE WHEN token IN ('el', 'la', 'los', 'que', 'y')
                        THEN 1 ELSE 0 END) AS BIGINT) AS score_es
        FROM toks GROUP BY doc_id
    ),
    staged AS (
        SELECT f.doc_id,
               (n_tokens BETWEEN 5 AND 100000 AND diversity >= 0.2
                AND n_stop >= 1) AS pass_quality,
               (score_en >= score_de AND score_en >= score_es) AS pass_lang,
               (d.doc_id = MIN(d.doc_id) OVER (PARTITION BY md5(d.text)))
                   AS pass_dedup
        FROM feats f JOIN documents d ON d.doc_id = f.doc_id
    ),
    cum AS (
        SELECT doc_id,
               pass_quality,
               pass_quality AND pass_lang AS s2,
               pass_quality AND pass_lang AND pass_dedup AS s3
        FROM staged
    ),
    counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        FROM cum
    )
    SELECT stage, stage_idx, n_in, n_out, n_in - n_out AS n_dropped,
           ROUND(n_out * 1.0 / n_in, 4) AS survival
    FROM (
        SELECT 'quality' AS stage, 1 AS stage_idx, n0 AS n_in, n1 AS n_out FROM counts
        UNION ALL
        SELECT 'langid_en', 2, n1, n2 FROM counts
        UNION ALL
        SELECT 'exact_dedup', 3, n2, n3 FROM counts
    )
    """,
)
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation FUNNEL REPORT: how many documents survive each
    sequential filter stage (quality rules → keep-English langid →
    exact dedup keeper), with per-stage drop counts and survival rates —
    the first chart in every dataset paper (C4, RefinedWeb, Dolma all
    report exactly this table) and the monitoring artifact a production
    curation pipeline alerts on.  One tokenization pass computes every
    per-doc signal; the only other corpus-wide work is the
    content-hash min-window for dedup; the funnel algebra itself runs
    on a single aggregated row."""
    toks = D.token_array(_docs(spark, sf_dir))
    stop_list = ", ".join(repr(w) for w in _STOPWORDS)
    n = F.size("toks")

    def lang_score(words: tuple[str, ...]) -> Column:
        lst = ", ".join(repr(w) for w in words)
        return F.expr(f"size(filter(toks, t -> t IN ({lst})))").cast("long")

    feats = toks.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(F.size(F.array_distinct("toks")) * 1.0 / n, 4).alias("diversity"),
        F.expr(f"size(filter(toks, t -> t IN ({stop_list})))")
        .cast("long")
        .alias("n_stop"),
        lang_score(_LANG_LISTS["en"]).alias("score_en"),
        lang_score(_LANG_LISTS["de"]).alias("score_de"),
        lang_score(_LANG_LISTS["es"]).alias("score_es"),
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(
            Window.partitionBy(F.md5("text"))
        )).alias("pass_dedup"),
    )
    staged = feats.join(docs, "doc_id").select(
        (
            F.col("n_tokens").between(5, 100000)
            & (F.col("diversity") >= 0.2)
            & (F.col("n_stop") >= 1)
        ).alias("pass_quality"),
        (
            (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_es"))
        ).alias("pass_lang"),
        "pass_dedup",
    )
    counts = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.col("pass_quality").cast("int")).cast("long").alias("n1"),
        F.sum((F.col("pass_quality") & F.col("pass_lang")).cast("int"))
        .cast("long")
        .alias("n2"),
        F.sum(
            (F.col("pass_quality") & F.col("pass_lang") & F.col("pass_dedup"))
            .cast("int")
        )
        .cast("long")
        .alias("n3"),
    )
    stages = (
        counts.select(
            F.lit("quality").alias("stage"), F.lit(1).alias("stage_idx"),
            F.col("n0").alias("n_in"), F.col("n1").alias("n_out"),
        )
        .unionByName(
            counts.select(
                F.lit("langid_en").alias("stage"), F.lit(2).alias("stage_idx"),
                F.col("n1").alias("n_in"), F.col("n2").alias("n_out"),
            )
        )
        .unionByName(
            counts.select(
                F.lit("exact_dedup").alias("stage"), F.lit(3).alias("stage_idx"),
                F.col("n2").alias("n_in"), F.col("n3").alias("n_out"),
            )
        )
    )
    return stages.select(
        "stage", "stage_idx", "n_in", "n_out",
        (F.col("n_in") - F.col("n_out")).alias("n_dropped"),
        F.round(F.col("n_out") * 1.0 / F.col("n_in"), 4).alias("survival"),
    )


@register(
    "text_line_dedup",
    f"""
    WITH {_TOKS_CTE},
    lines AS (
        SELECT doc_id, (pos - 1) // 5 AS chunk,
               string_agg(token, ' ' ORDER BY pos) AS line_text
        FROM toks GROUP BY doc_id, (pos - 1) // 5
    ),
    freq AS (
        SELECT line_text, COUNT(DISTINCT doc_id) AS n_docs
        FROM lines GROUP BY line_text
    )
    SELECT l.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN f.n_docs > 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
           ROUND(1.0 - SUM(CASE WHEN f.n_docs > 5 THEN 1 ELSE 0 END) * 1.0
                       / COUNT(*), 4) AS kept_ratio
    FROM lines l JOIN freq f ON l.line_text = f.line_text
    GROUP BY l.doc_id
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level LINE dedup — the boilerplate-removal step RefinedWeb
    and Dolma run between document dedup and quality filtering: segment
    every document into lines (5-token chunks here — the fixture has no
    newlines, and fixed-width segmentation is the deterministic stand-in
    with identical plan shape), count each exact line's document
    frequency corpus-wide, and flag lines appearing in more than 5
    documents (navigation chrome, license headers, disclaimers at web
    scale).  Per-doc output: line counts, boilerplate counts, kept
    ratio — the signal pipelines threshold on before rebuilding text.

    Plan: segment (one doc-keyed shuffle with map-side combine since
    chunks group by (doc, chunk)), line-frequency aggregate on the line
    hash-distributed text (Zipf-bounded like a vocabulary), broadcast-
    scale join back.  Spark's in-group order is made deterministic by
    sorting (pos, token) structs INSIDE the aggregate — collect_list
    order under parallelism is undefined."""
    toks = _tokens(spark, sf_dir)
    lines = (
        toks.withColumn("chunk", ((F.col("pos") - 1) / 5).cast("long"))
        .groupBy("doc_id", "chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda x: x["token"],
                ),
                " ",
            ).alias("line_text")
        )
    )
    freq = lines.groupBy("line_text").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    hot = F.col("n_docs") > 5
    return (
        lines.join(freq, "line_text")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(hot.cast("int")).cast("long").alias("n_boilerplate"),
            F.round(
                1.0 - F.sum(hot.cast("int")) * 1.0 / F.count(F.lit(1)), 4
            ).alias("kept_ratio"),
        )
    )


@register(
    "dedup_cosine_prefix_pairs",
    f"""
    WITH {_TOKS_CTE},
    sh2 AS (
        SELECT doc_id, token || ' ' || lead1 || ' ' || lead2 AS tk
        FROM (
            SELECT doc_id, token,
                   LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS lead1,
                   LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS lead2
            FROM toks
        ) WHERE lead2 IS NOT NULL AND doc_id % 2 = 0
    ),
    tf AS (
        SELECT doc_id, tk AS token, COUNT(*) AS cnt FROM sh2 GROUP BY 1, 2
    ),
    n2 AS (SELECT doc_id, SUM(cnt * cnt) AS n2 FROM tf GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
               SUM(a.cnt * b.cnt) AS dot
        FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_lo, id_hi,
           CAST(ROUND(dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS DOUBLE)
               AS cosine
    FROM dots
    JOIN n2 na ON na.doc_id = id_lo
    JOIN n2 nb ON nb.doc_id = id_hi
    WHERE dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) >= 0.8
    """,
)
def dedup_cosine_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine similarity join (Bayardo et al. WWW'07) at
    t=0.8 over word-3-gram COUNT vectors — the EXACT near-dup family
    member (vs the probabilistic MinHash/SimHash gates): the prefix
    filter indexes only each document's low-frequency tail, so hot
    posting lists never self-expand, yet the result is provably
    identical to the brute force the DuckDB oracle runs.  Features are
    3-gram counts rather than unigrams deliberately: the fixture's
    31-word vocabulary makes every unigram a stop word (every doc pair
    co-occurs — 342M candidate rows at sf0.1, the degenerate case), while
    the 27k-shingle space is the realistic sparse regime.  Integer dot
    products and norms; one float division at the end keeps both
    engines bit-identical.  Non-distinct shingle counts come from the
    narrow ``arrays_zip``-of-slices build (zero shuffles before the
    count aggregation).  The fixture is the even-id half of the corpus
    (mirrored in the oracle): finding 43's knob — the algorithm's
    stages are identical, the gate's wall clock is ~halved, and 67
    true pairs still verify at sf0.1 (VERDICT r6 item 7).  The tf
    vector build is memoized per session (checkpointed once) because
    the operator's plan branches over tf five ways (norms, weights,
    postings x2, verification) and an unmaterialized lineage would
    recompute the explode+aggregate per branch — the same
    materialize-the-shared-input discipline a real pipeline applies
    before an all-pairs stage."""
    from ..operators.dedup import cosine_prefix_pairs

    key = (spark.sparkContext.applicationId, sf_dir, "cosine_tf")
    tf = _PAIRS_MEMO.get(key)
    if tf is None:
        toks = F.split(F.trim(F.col("text")), r"\s+")
        gram_count = F.greatest(F.size(toks) - 2, F.lit(0))
        zipped = F.arrays_zip(
            *[F.slice(toks, i + 1, gram_count) for i in range(3)]
        )
        tf = (
            _docs(spark, sf_dir)
            .where(F.col("doc_id") % 2 == 0)
            .select(F.col("doc_id"), F.explode(zipped).alias("__g"))
            .select(
                "doc_id",
                F.concat_ws(" ", *[F.col(f"__g.{i}") for i in range(3)]).alias(
                    "token"
                ),
            )
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        _PAIRS_MEMO[key] = tf
    return cosine_prefix_pairs(tf, 0.8)


@register(
    "docs_leakage_free_split",
    """
    WITH g AS (
        SELECT doc_id, md5(text) AS fp FROM documents
    ),
    asg AS (
        SELECT doc_id, fp,
               CASE WHEN ('0x' || substr(md5('holdout:' || fp), 1, 8))::BIGINT
                         % 10000 < 9000
                    THEN 'train' ELSE 'test' END AS split
        FROM g
    ),
    spans AS (
        SELECT fp, COUNT(DISTINCT split) AS n_sides FROM asg GROUP BY fp
    )
    SELECT CAST(COUNT(*) FILTER (split = 'train') AS BIGINT) AS n_train,
           CAST(COUNT(*) FILTER (split = 'test') AS BIGINT) AS n_test,
           CAST(COUNT(DISTINCT CASE WHEN split = 'train' THEN fp END)
                AS BIGINT) AS train_groups,
           CAST(COUNT(DISTINCT CASE WHEN split = 'test' THEN fp END)
                AS BIGINT) AS test_groups,
           (SELECT CAST(COUNT(*) FILTER (n_sides > 1) AS BIGINT) FROM spans)
               AS leaky_groups
    FROM asg
    """,
)
def docs_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE train/test split: the holdout hash is keyed on the
    duplicate-cluster fingerprint (md5 of the text), not the document id,
    so every copy of a duplicated document lands on the SAME side — the
    property that keeps eval sets honest when the corpus contains near-
    and exact duplicates (a doc_id-keyed split would put one copy in
    train and its twin in test).  ``leaky_groups`` (clusters spanning
    both sides) is computed FROM THE DATA and must be 0 — the oracle
    proves the property, not just the counts.  Composition of
    ``doc_fingerprint`` + ``split_assign(id_col=fp)``; fully narrow up
    to the final scalar aggregate."""
    from ..operators.textanalysis import split_assign

    docs = _docs(spark, sf_dir).withColumn("fp", F.md5("text"))
    asg = split_assign(
        docs, {"train": 0.9, "test": 0.1}, id_col="fp", seed="holdout"
    )
    spans = asg.groupBy("fp").agg(
        F.count_distinct("split").alias("n_sides")
    )
    leaky = spans.agg(
        F.sum(F.when(F.col("n_sides") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leaky_groups")
    )
    counts = asg.agg(
        F.count(F.when(F.col("split") == "train", 1)).cast("bigint").alias("n_train"),
        F.count(F.when(F.col("split") == "test", 1)).cast("bigint").alias("n_test"),
        F.count_distinct(F.when(F.col("split") == "train", F.col("fp")))
        .cast("bigint")
        .alias("train_groups"),
        F.count_distinct(F.when(F.col("split") == "test", F.col("fp")))
        .cast("bigint")
        .alias("test_groups"),
    )
    return counts.crossJoin(leaky)


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled-iteration DuckDB oracle for BPE merge learning: words as
    chr(1)-delimited symbol strings (the sentinel makes ``replace()``'s
    left-to-right non-overlapping scan EXACTLY the trainer's fold
    semantics, and keeps matches aligned to symbol starts), one CTE
    block per iteration: re-split → adjacent pairs via LEAD over pos
    (the shingle idiom) → arg-max with the (cnt DESC, l, r) tiebreak →
    apply the merge.  Built programmatically because SQL has no loops —
    the structure is the proof that the iterative trainer is still a
    deterministic function of the corpus."""
    sep = "chr(1)"
    parts = [f"""
    btoks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    wf AS (
        SELECT token AS word, COUNT(*) AS freq FROM btoks WHERE token != ''
        GROUP BY token
    ),
    it0 AS (
        SELECT word, freq,
               {sep} || array_to_string(string_split(word, ''), {sep})
                   || {sep} || '</w>' AS s
        FROM wf
    )"""]
    for i in range(n_merges):
        parts.append(f""",
    tk{i} AS (
        SELECT word, freq,
               unnest(string_split(s, {sep})) AS sym,
               generate_subscripts(string_split(s, {sep}), 1) AS pos
        FROM it{i}
    ),
    pr{i} AS (
        SELECT word, freq, pos, sym AS l,
               LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS r
        FROM tk{i}
    ),
    bs{i} AS (
        SELECT l, r, SUM(freq) AS cnt
        FROM pr{i} WHERE pos >= 2 AND r IS NOT NULL
        GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 1
    ),
    it{i + 1} AS (
        SELECT word, freq,
               replace(s, {sep} || l || {sep} || r, {sep} || l || r) AS s
        FROM it{i} CROSS JOIN bs{i}
    )""")
    union = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS rank, l AS merge_left, r AS merge_right,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM bs{i}"
        for i in range(n_merges)
    )
    return "WITH " + "".join(parts) + "\n" + union


@register("text_bpe_learn_merges", _bpe_oracle(6))
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning (Sennrich et al. ACL'16) over
    the documents corpus: six merge rules learned by the iterative
    pair-count → arg-max → fold-rewrite trainer
    (``textanalysis.bpe_learn_merges``).  The corpus is scanned ONCE
    (word frequencies); each iteration runs on the vocabulary with one
    TakeOrderedAndProject arg-max and one scalar driver row — the same
    iterative-state discipline as connected components.  The oracle
    unrolls the SAME six iterations in SQL (sentinel-string fold), so
    the whole training trajectory — counts, tiebreaks, merge
    applications — is differentially checked, not just the final
    vocabulary."""
    from ..operators.textanalysis import bpe_learn_merges

    _words, merges = bpe_learn_merges(_docs(spark, sf_dir), n_merges=6)
    return merges.select(
        "rank",
        F.col("left").alias("merge_left"),
        F.col("right").alias("merge_right"),
        "pair_count",
    )


@register(
    "text_html_extract",
    r"""
    WITH page AS (
        SELECT doc_id,
               '<html><head><title>' || source ||
               '</title><style type="text/css">p { color: red; }</style>' ||
               '<script>var x = 1; if (x < 2) { x = 3; }</script></head>' ||
               '<!-- generated ' || lang || ' -->' ||
               '<body><h1>Doc &#39;' || CAST(doc_id AS VARCHAR) ||
               '&#39;</h1><p>' || text || '</p><div>R&amp;D &lt;tags&gt;' ||
               '&nbsp;rock</div></body></html>' AS html
        FROM documents
    ),
    stripped AS (
        SELECT doc_id, html,
               trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(
                                   regexp_replace(html,
                                       '(?is)<script[^>]*>.*?</script>',
                                       ' ', 'g'),
                                   '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                               '(?s)<!--.*?-->', ' ', 'g'),
                           '<[^>]+>', ' ', 'g'),
                       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                       chr(38) || chr(35) || '39;', chr(39)),
                       '&nbsp;', ' '), '&amp;', '&'),
                   '\s+', ' ', 'g')) AS extracted
        FROM page
    )
    SELECT doc_id, md5(extracted) AS extract_md5,
           CAST((length(extracted) * 10000) // length(html) AS BIGINT)
               AS text_ratio_bp
    FROM stripped
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate extraction (CommonCrawl/C4 ingest stage): each
    document is wrapped into a deterministic page — title, CSS, a
    script whose body contains a '<' that must NOT terminate tag
    stripping, an HTML comment, headings, and entity escapes — then
    ``textanalysis.html_extract`` strips it back to text.  The oracle
    performs the identical wrap+strip in DuckDB (RE2), so the gate pins
    cross-engine regex semantics (dotall blocks, non-greedy spans,
    no backreferences) and the entity-decode order (&amp; last).
    Output compares md5 of the full extracted text plus the
    text-to-markup ratio, the classic boilerplate-quality signal.
    Fully narrow: a codegen'd expression chain, zero shuffles."""
    from ..operators.textanalysis import html_extract

    page = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>"),
            F.col("source"),
            F.lit('</title><style type="text/css">p { color: red; }</style>'),
            F.lit("<script>var x = 1; if (x < 2) { x = 3; }</script></head>"),
            F.lit("<!-- generated "),
            F.col("lang"),
            F.lit(" -->"),
            F.lit("<body><h1>Doc &#39;"),
            F.col("doc_id").cast("string"),
            F.lit("&#39;</h1><p>"),
            F.col("text"),
            F.lit("</p><div>R&amp;D &lt;tags&gt;&nbsp;rock</div></body></html>"),
        ).alias("html"),
    )
    out = html_extract(page, "html", "extracted")
    return out.select(
        "doc_id",
        F.md5("extracted").alias("extract_md5"),
        # exact integer basis points, not ROUND(double, 4): 581/800 =
        # 0.72625 hit a representational rounding tie where Spark said
        # .7263 and DuckDB .7262 — integer DIV has no ties
        F.expr("(length(extracted) * 10000) DIV length(html)")
        .cast("bigint")
        .alias("text_ratio_bp"),
    )
