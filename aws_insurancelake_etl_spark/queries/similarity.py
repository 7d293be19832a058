"""Embedding similarity search over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

Brute-force cosine top-k is the exactness baseline; the IVF-style variant
prunes the candidate set with a coarse partition (here the ``label`` column
stands in for a centroid assignment) — at 100 TB you'd precompute centroid
ids the same way and partition the table by them, so the search touches one
partition instead of the full corpus.

All dot products are explicit double-precision ``aggregate(zip_with(...))``
expressions — JVM-side, no UDF — and the DuckDB oracle computes the same
sequential sum via ``list_zip``/``list_sum`` with explicit casts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import spread

QUERIES = {}
ORACLE = {}


_KMEANS_MEMO: dict = {}


def _kmeans_fit_cached(spark, sf_dir, lo_len=None):
    """Deterministic Lloyd's fit (k=4, 2 iters) over the embedding corpus
    (or the ``(lo, len)`` PQ sub-slice), computed ONCE per (session,
    sf_dir, slice) and reused by every IVF/PQ/SemDeDup gate that trains
    the same quantizer — the real index-build shape: one training job
    feeds coarse assignment, PQ codes, and search gates alike (VERDICT
    r6 item 7).  The assignment is localCheckpointed (rows = corpus ids,
    tiny); centroids are k x dim driver floats.  Values are identical
    to a fresh fit because kmeans_fit is deterministic by construction."""
    from ..operators.similarity import kmeans_fit

    key = (spark.sparkContext.applicationId, sf_dir, lo_len)
    hit = _KMEANS_MEMO.get(key)
    if hit is None:
        emb = spread(spark, t(spark, sf_dir, "embeddings"))
        if lo_len is not None:
            emb = emb.select(
                "vec_id",
                F.slice("embedding", lo_len[0], lo_len[1]).alias("embedding"),
            )
        assigned, centroids = kmeans_fit(emb, k=4, n_iter=2)
        hit = (assigned.localCheckpoint(eager=True), centroids)
        _KMEANS_MEMO[key] = hit
    return hit



def register(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dot(a: str, b: str) -> Column:
    """Double-precision dot product of two float-array columns (native)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


_COSINE_SQL = (
    f"{_dot_sql('q.embedding', 'c.embedding')}"
    f" / (sqrt({_dot_sql('q.embedding', 'q.embedding')})"
    f" * sqrt({_dot_sql('c.embedding', 'c.embedding')}))"
)


def _cosine_col() -> Column:
    return dot("q_emb", "c_emb") / (
        F.sqrt(dot("q_emb", "q_emb")) * F.sqrt(dot("c_emb", "c_emb"))
    )


@register(
    "ann_cosine_topk",
    f"""
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ) WHERE rn <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors: broadcast the tiny
    query set against the corpus, rank per query.  This is the exact
    baseline every ANN variant is measured against."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = spread(spark, emb).select("vec_id", F.col("embedding").alias("c_emb"))
    cosine = _cosine_col()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@register(
    "ann_ivf_label_topk",
    f"""
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
        FROM embeddings q
        JOIN embeddings c ON q.label = c.label AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ) WHERE rn <= 5
    """,
)
def ann_ivf_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style pruned search: candidates restricted to the query's coarse
    partition (label = centroid assignment), then exact cosine rank inside
    it.  The equi-join on label is the partition prune."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    corpus = spread(spark, emb).select("vec_id", F.col("embedding").alias("c_emb"), "label")
    cosine = _cosine_col()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        corpus.join(
            F.broadcast(queries),
            (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@register(
    "ann_recall_eval",
    f"""
    WITH exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < 5 AND c.vec_id <> q.vec_id
        ) WHERE rn <= 10
    ),
    approx AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
            FROM embeddings q JOIN embeddings c
              ON q.label = c.label AND c.vec_id <> q.vec_id
            WHERE q.vec_id < 5
        ) WHERE rn <= 10
    )
    SELECT e.query_id,
           COUNT(a.vec_id) AS n_hits,
           ROUND(COUNT(a.vec_id) * 1.0 / 10, 4) AS recall_at_10
    FROM exact e LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id
    """,
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF-pruned search against the exact brute-force
    baseline — THE quality metric for any approximate-nearest-neighbor
    index, computed distributed: both top-k sets come from the same
    broadcast-queries-vs-corpus scoring shape, and the recall join touches
    only k rows per query.  At 100 TB this is how you validate an IVF
    nprobe / LSH band setting before committing to it: run on a sampled
    query set, read the recall distribution, tune, re-run."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    corpus = spread(spark, emb).select(
        "vec_id", F.col("embedding").alias("c_emb"), "label"
    )
    cosine = _cosine_col()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")

    def topk(restrict_label: bool) -> DataFrame:
        cond = F.col("vec_id") != F.col("query_id")
        if restrict_label:
            cond = cond & (F.col("label") == F.col("q_label"))
        return (
            corpus.join(F.broadcast(queries), cond)
            .select("query_id", "vec_id", cosine.alias("cosine_raw"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 10)
            .select("query_id", "vec_id")
        )

    exact = topk(restrict_label=False)
    approx = topk(restrict_label=True).withColumn("hit", F.lit(1))
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) * 1.0 / 10, 4
            ).alias("recall_at_10"),
        )
    )


@register(
    "emb_near_dup_pairs",
    f"""
    SELECT label, vec_a, vec_b, cosine FROM (
        SELECT q.label AS label, q.vec_id AS vec_a, c.vec_id AS vec_b,
               ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.label
                                  ORDER BY {_COSINE_SQL} DESC, q.vec_id, c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c
          ON q.label = c.label AND q.vec_id < c.vec_id
    ) WHERE rn <= 3
    """,
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate candidates, blocked by label so the
    pairwise comparison stays within partitions: the top-3 most-similar
    pairs per block.  In a production dedup run the rank filter becomes a
    ``cosine >= threshold`` predicate (e.g. 0.95) on the same plan; the
    driver's synthetic embeddings are random, so a fixed threshold would
    select zero rows and verify nothing."""
    emb = t(spark, sf_dir, "embeddings")
    # label is ~10 distinct values: a shuffle join would hash every candidate
    # pair into 10 hot partitions.  Spread the probe side for parallelism and
    # broadcast the candidate side; past the broadcast threshold, salt the
    # block key instead.
    a = spread(spark, emb).select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("q_emb"), "label")
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("c_emb"),
                   F.col("label").alias("label_b"))
    cosine = _cosine_col()
    w = Window.partitionBy("label").orderBy(F.desc("cosine_raw"), "vec_a", "vec_b")
    return (
        a.join(F.broadcast(b),
               (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("label", "vec_a", "vec_b", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("label", "vec_a", "vec_b", F.round("cosine_raw", 4).alias("cosine"))
    )


@register(
    "emb_label_norm_stats",
    f"""
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(sqrt({_dot_sql('e.embedding', 'e.embedding')}), 6)
               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
    FROM embeddings e GROUP BY label
    """,
)
def emb_label_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-norm statistics per label; per-row norms are rounded into
    decimals before averaging so the distributed sum is order-independent."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label",
        F.round(F.sqrt(dot("embedding", "embedding")), 6)
        .cast("decimal(18,6)")
        .alias("norm"),
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum("norm").cast("double") / F.count(F.lit(1)), 6).alias("avg_norm"),
    )


@register(
    "emb_label_centroids",
    """
    SELECT label, dim,
           CAST(SUM(CAST(ROUND(comp, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS centroid
    FROM (
        SELECT label,
               generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS comp
        FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors — the 'train the coarse quantizer' step
    of an IVF index (one k-means averaging pass with labels as the
    assignment).  Melt to (label, dim, component) rows and aggregate per
    (label, dim): one shuffle keyed on a perfectly distributed composite
    key, partial aggregation map-side — at 100 TB this is the canonical
    way to average vectors without collecting them.  Components are
    rounded into decimals pre-sum so the distributed total is
    order-independent and matches DuckDB exactly; the final quotient is
    emitted unrounded (identical division of identical inputs)."""
    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding")).alias("dim0", "component"),
        )
        .select(
            "label",
            (F.col("dim0") + 1).cast("bigint").alias("dim"),
            F.round(F.col("component").cast("double"), 6)
            .cast("decimal(18,6)")
            .alias("comp_dec"),
        )
        .groupBy("label", "dim")
        .agg(
            # The quotient double is emitted UNROUNDED: the decimal sums are
            # bit-identical across engines, so exact-decimal -> double ->
            # IEEE divide yields the same bits on both sides, while a final
            # ROUND(x, 6) can land a ulp on either side of a 5e-7 boundary
            # and flip the last digit differently per engine (caught by the
            # sf0.1 differential sweep).
            (F.sum("comp_dec").cast("double") / F.count(F.lit(1))).alias("centroid")
        )
    )


_RP_PLANES = 8


# Shared CTE chain producing (vec_id, label, signature) — the RP-LSH
# bucket key; composed into both the signatures gate and the bucketed
# pair-generation gate.
_RP_SIGS_CTES = f"""comps AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS DECIMAL(18,6))
                   AS comp
        FROM embeddings
    ),
    weights AS (
        SELECT p.plane, d.dim,
               (('0x' || substr(md5('rp:' || p.plane || ':' || d.dim), 1, 8))::BIGINT
                % 1001) - 500 AS w
        FROM (SELECT unnest(generate_series(0, {_RP_PLANES - 1})) AS plane) p,
             (SELECT DISTINCT dim FROM comps) d
    ),
    dots AS (
        SELECT c.vec_id, c.label, w.plane, SUM(c.comp * w.w) AS dot
        FROM comps c JOIN weights w ON c.dim = w.dim
        GROUP BY c.vec_id, c.label, w.plane
    ),
    sigs AS (
        SELECT vec_id, label,
               string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                          ORDER BY plane) AS signature
        FROM dots GROUP BY vec_id, label
    )"""


@register(
    "emb_rp_lsh_signatures",
    f"""
    WITH {_RP_SIGS_CTES}
    SELECT s.vec_id, s.label, s.signature,
           COUNT(*) OVER (PARTITION BY s.signature) AS bucket_size
    FROM sigs s
    """,
)
def emb_rp_lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH for embeddings (SimHash for vectors): each
    vector's sign pattern against {_RP_PLANES} md5-derived integer
    hyperplanes is its bucket key — cosine-similar vectors collide with
    high probability, so candidate generation is a bucket self-join, never
    |V|².  This is the third ANN path next to brute-force top-k and
    IVF-style pruning: no training step, works on inserts.  Components are
    rounded into decimals before the weighted sum so the SIGN of each dot
    is exact and identical across engines (a float sum near zero could
    flip between distributed and sequential accumulation).  Plan: melt to
    (vec, dim, comp), broadcast the (dim, plane, weight) table, one
    shuffle on (vec, plane), one on vec — both well-distributed."""
    sigs = _rp_sigs(spark, sf_dir)
    return sigs.select(
        "vec_id", "label", "signature",
        F.count(F.lit(1)).over(Window.partitionBy("signature")).alias("bucket_size"),
    )


def _rp_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, signature) — the RP-LSH bucket key; Spark twin of
    ``_RP_SIGS_CTES``."""
    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    comps = emb.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("dim0", "comp_f"),
    ).select(
        "vec_id", "label",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("comp_f").cast("double"), 6).cast("decimal(18,6)").alias("comp"),
    )
    planes = spark.range(_RP_PLANES).select(F.col("id").alias("plane"))
    dims = comps.select("dim").distinct()  # no driver-side collect; stays lazy
    weights = planes.crossJoin(dims).select(
        "plane", "dim",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit("rp"), "plane", "dim")), 1, 8
                ),
                16, 10,
            ).cast("bigint") % 1001 - 500
        ).alias("w"),
    )
    dots = (
        comps.join(F.broadcast(weights), "dim")
        .groupBy("vec_id", "label", "plane")
        .agg(F.sum(F.col("comp") * F.col("w")).alias("dot"))
    )
    return (
        dots.withColumn("bit", F.when(F.col("dot") >= 0, "1").otherwise("0"))
        .groupBy("vec_id", "label")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(
                    F.collect_list(F.struct("plane", "bit"))
                ), lambda s: s["bit"])
            ).alias("signature")
        )
    )


@register(
    "emb_rp_lsh_pairs",
    f"""
    WITH {_RP_SIGS_CTES},
    cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sigs a JOIN sigs b
          ON a.signature = b.signature AND a.vec_id < b.vec_id
    ),
    ver AS (
        SELECT vec_a, vec_b,
               {_dot_sql('x.embedding', 'y.embedding')}
               / (sqrt({_dot_sql('x.embedding', 'x.embedding')})
                  * sqrt({_dot_sql('y.embedding', 'y.embedding')})) AS cos
        FROM cand JOIN embeddings x ON vec_a = x.vec_id
                  JOIN embeddings y ON vec_b = y.vec_id
    )
    SELECT vec_a, vec_b, ROUND(cos, 4) AS cosine
    FROM ver WHERE ROUND(cos, 4) >= 0.35
    """,
)
def emb_rp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-FREE embedding near-dup pairs at scale: RP-LSH signature
    buckets generate candidates (posting-list in-bucket expansion — the
    same no-self-join shape as the MinHash path), then exact cosine
    verifies only those candidates.  This is the path that holds when no
    blocking column exists — at 100 TB the corpus has no labels, and the
    bucket key bounds pair count by bucket collisions instead of |V|².
    The verify joins key on vec_id (hash-distributed); candidates are a
    tiny fraction of the corpus so the per-pair embedding fetch is the
    classic verify-on-candidates cost (PERFORMANCE.md finding 5)."""
    sigs = _rp_sigs(spark, sf_dir)
    cand = (
        sigs.groupBy("signature")
        .agg(F.collect_list("vec_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"))
    )
    emb = t(spark, sf_dir, "embeddings")
    x = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("x_emb"))
    y = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("y_emb"))
    cos = dot("x_emb", "y_emb") / (
        F.sqrt(dot("x_emb", "x_emb")) * F.sqrt(dot("y_emb", "y_emb"))
    )
    return (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
        .where(F.col("cosine") >= 0.35)
    )


def _kmeans_sql(k: int = 4, n_iter: int = 2, final_select: str | None = None) -> str:
    """Unrolled Lloyd's iterations as chained CTEs — the SQL twin of
    ``kmeans_fit``'s loop, one (assign, update) CTE pair per iteration.
    ``final_select`` replaces the default (vec_id, cluster) projection to
    build downstream consumers (e.g. IVF pruned search) over the ``asg``
    assignment CTE."""
    parts = [
        f"""
    WITH base AS (SELECT vec_id, embedding FROM embeddings),
    init AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                   AS cid,
               embedding
        FROM base ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    ),
    bd AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS e
        FROM base
    ),
    c0 AS (
        SELECT cid, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM init
    )"""
    ]
    for i in range(n_iter):
        parts.append(f""",
    d{i} AS (
        SELECT bd.vec_id, c.cid, SUM((bd.e - c.val) * (bd.e - c.val)) AS dist
        FROM bd JOIN c{i} c ON bd.dim = c.dim
        GROUP BY bd.vec_id, c.cid
    ),
    a{i} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d{i}
        ) WHERE rn = 1
    ),
    c{i + 1} AS (
        SELECT a.cid, bd.dim,
               ROUND(CAST(SUM(CAST(bd.e AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 9)
                   AS val
        FROM a{i} a JOIN bd ON a.vec_id = bd.vec_id
        GROUP BY a.cid, bd.dim
    )""")
    parts.append(f""",
    dfin AS (
        SELECT bd.vec_id, c.cid, SUM((bd.e - c.val) * (bd.e - c.val)) AS dist
        FROM bd JOIN c{n_iter} c ON bd.dim = c.dim
        GROUP BY bd.vec_id, c.cid
    ),
    asg AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM dfin
        ) WHERE rn = 1
    )
    """)
    parts.append(
        final_select
        if final_select is not None
        else "SELECT vec_id, cluster FROM asg"
    )
    return "".join(parts)


@register("emb_kmeans_clusters", _kmeans_sql(k=4, n_iter=2))
def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer training: 2 Lloyd's iterations (k=4) over the
    embedding corpus, returning the final (vec_id, cluster) assignment.
    Every step is deterministic — md5-order init, decimal-exact centroid
    means, argmin tie-broken on cluster id — so the DuckDB oracle replays
    the identical iterations as unrolled CTEs.  Each iteration is one
    narrow literal-centroid assignment pass plus one (cluster, dim)-keyed
    aggregation; driver state is k×dim floats (the MLlib pattern — data
    never collected).  The learned clusters are the partition column for
    ``ann_ivf_label_topk``-style pruned search."""
    from ..operators.similarity import kmeans_fit

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    assigned, _ = _kmeans_fit_cached(spark, sf_dir)
    return assigned.select("vec_id", F.col("cluster").cast("long").alias("cluster"))


@register(
    "ann_ivf_kmeans_topk",
    _kmeans_sql(
        k=4,
        n_iter=2,
        final_select=f"""
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
        FROM embeddings q
        JOIN asg qa ON q.vec_id = qa.vec_id
        JOIN asg ca ON qa.cluster = ca.cluster AND ca.vec_id <> q.vec_id
        JOIN embeddings c ON c.vec_id = ca.vec_id
        WHERE q.vec_id < 5
    ) WHERE rn <= 5
    """,
    ),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE IVF pruned search: train the coarse quantizer with
    deterministic Lloyd's (k=4, 2 iterations — same trainer as
    ``emb_kmeans_clusters``), assign the corpus to learned centroids in
    one narrow literal-centroid pass, then search only the query's own
    cell (nprobe=1) with exact cosine rank inside it.  This is the full
    IVF lifecycle — train → assign → prune → rank — as one gate;
    ``ann_recall_eval`` is the recall harness for tuning it.  At scale
    the assignment column becomes the table's partition key, so the
    search is a partition-pruned scan."""
    from ..operators.similarity import kmeans_fit

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    assigned, _ = _kmeans_fit_cached(spark, sf_dir)
    queries = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cluster").alias("q_cluster"),
    )
    corpus = assigned.select(
        "vec_id", F.col("embedding").alias("c_emb"), "cluster"
    )
    cosine = _cosine_col()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        corpus.join(
            F.broadcast(queries),
            (F.col("cluster") == F.col("q_cluster"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


def _pq_subspace_sql(sfx: str, lo: int, length: int, k: int, n_iter: int) -> str:
    """One deterministic-Lloyd's chain over a dimension slice of the
    embedding (the per-subspace codebook of product quantization); CTE
    names are suffixed so two chains compose in one WITH list."""
    parts = [f"""
    base{sfx} AS (
        SELECT vec_id, list_slice(embedding, {lo}, {lo + length - 1}) AS emb
        FROM embeddings
    ),
    init{sfx} AS (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                   AS cid,
               emb
        FROM base{sfx} ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    ),
    bd{sfx} AS (
        SELECT vec_id, generate_subscripts(emb, 1) - 1 AS dim,
               CAST(unnest(emb) AS DOUBLE) AS e
        FROM base{sfx}
    ),
    c0{sfx} AS (
        SELECT cid, generate_subscripts(emb, 1) - 1 AS dim,
               CAST(unnest(emb) AS DOUBLE) AS val
        FROM init{sfx}
    )"""]
    for i in range(n_iter):
        parts.append(f""",
    d{i}{sfx} AS (
        SELECT bd.vec_id, c.cid, SUM((bd.e - c.val) * (bd.e - c.val)) AS dist
        FROM bd{sfx} bd JOIN c{i}{sfx} c ON bd.dim = c.dim
        GROUP BY bd.vec_id, c.cid
    ),
    a{i}{sfx} AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d{i}{sfx}
        ) WHERE rn = 1
    ),
    c{i + 1}{sfx} AS (
        SELECT a.cid, bd.dim,
               ROUND(CAST(SUM(CAST(bd.e AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 9)
                   AS val
        FROM a{i}{sfx} a JOIN bd{sfx} bd ON a.vec_id = bd.vec_id
        GROUP BY a.cid, bd.dim
    )""")
    parts.append(f""",
    dfin{sfx} AS (
        SELECT bd.vec_id, c.cid, SUM((bd.e - c.val) * (bd.e - c.val)) AS dist
        FROM bd{sfx} bd JOIN c{n_iter}{sfx} c ON bd.dim = c.dim
        GROUP BY bd.vec_id, c.cid
    ),
    asg{sfx} AS (
        SELECT vec_id, cid AS code FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM dfin{sfx}
        ) WHERE rn = 1
    )""")
    return "".join(parts)


@register(
    "emb_pq_codes",
    f"""
    WITH {_pq_subspace_sql('s0', 1, 32, 4, 2)},
    {_pq_subspace_sql('s1', 33, 32, 4, 2)}
    SELECT a0.vec_id, a0.code AS code0, a1.code AS code1
    FROM asgs0 a0 JOIN asgs1 a1 ON a0.vec_id = a1.vec_id
    """,
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization codebook training + encoding: the 64-dim
    embedding splits into two 32-dim subspaces, each gets its own
    deterministic-Lloyd's codebook (k=4, 2 iterations), and every vector
    is encoded as its per-subspace nearest-centroid ids — the FAISS-style
    IVF+PQ compression pair (``ann_ivf_kmeans_topk`` is the IVF half).
    2 codes × 2 bits ≈ 32× compression here; production shapes (m=8..64,
    k=256) follow the identical plan.  Each subspace chain is a narrow
    slice + the same train/assign shape as ``emb_kmeans_clusters``; the
    final code join keys on vec_id."""
    from ..operators.similarity import kmeans_fit

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    codes = []
    for i, (lo, length) in enumerate(((1, 32), (33, 32))):
        assigned, _ = _kmeans_fit_cached(spark, sf_dir, (lo, length))
        codes.append(
            assigned.select("vec_id", F.col("cluster").alias(f"code{i}"))
        )
    return codes[0].join(codes[1], "vec_id")


@register(
    "emb_int8_quantize",
    """
    WITH q AS (
        SELECT vec_id,
               GREATEST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0,
                        1e-12) AS qscale,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    rec AS (
        SELECT vec_id, qscale,
               list_transform(v, x -> FLOOR(x / qscale + 0.5) * qscale) AS r,
               v
        FROM q
    )
    SELECT vec_id,
           ROUND(qscale, 8) AS qscale,
           ROUND(sqrt(list_aggregate(
               list_transform(list_zip(v, r),
                              p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum')), 6)
               AS l2_err
    FROM rec
    """,
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding corpus — the
    4x memory cut that makes billion-vector ANN fit executor RAM (used as
    the in-memory representation; full-precision re-rank happens on the
    top-k only).  Per-vector scale = max|x|/127; quantize via
    floor(x/scale + 0.5) (deterministic, no round-half ambiguity),
    reported as per-vector reconstruction L2 error.  Fully narrow — one
    pass of array lambdas, zero shuffles; DuckDB reproduces every double
    bit-for-bit via the same list lambdas."""
    v = "transform(embedding, x -> cast(x as double))"
    qscale = f"greatest(array_max(transform({v}, x -> abs(x))) / 127.0D, 1e-12D)"
    recon = f"transform({v}, x -> floor(x / {qscale} + 0.5D) * {qscale})"
    l2 = (
        f"sqrt(aggregate(zip_with({v}, {recon}, (a, b) -> (a - b) * (a - b)),"
        " 0D, (acc, e) -> acc + e))"
    )
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(F.expr(qscale), 8).alias("qscale"),
        F.round(F.expr(l2), 6).alias("l2_err"),
    )


@register(
    "emb_semdedup_keep",
    _kmeans_sql(
        k=4,
        n_iter=2,
        final_select=f"""
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           (d.vec_b IS NULL) AS keep
    FROM asg a LEFT JOIN (
        SELECT DISTINCT vec_b FROM (
            SELECT pairs.cluster, vec_a, vec_b,
                   ROW_NUMBER() OVER (PARTITION BY pairs.cluster
                                      ORDER BY cosine_raw DESC, vec_a, vec_b) AS rn
            FROM (
                SELECT qa.cluster, q.vec_id AS vec_a, c.vec_id AS vec_b,
                       {_COSINE_SQL} AS cosine_raw
                FROM embeddings q
                JOIN asg qa ON q.vec_id = qa.vec_id
                JOIN asg ca ON ca.cluster = qa.cluster AND ca.vec_id > q.vec_id
                JOIN embeddings c ON c.vec_id = ca.vec_id
            ) AS pairs
        ) ranked WHERE rn <= 3
    ) d ON a.vec_id = d.vec_b
    """,
    ),
)
def emb_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end: train the coarse quantizer with deterministic
    Lloyd's (k=4, 2 iterations — the same trainer as
    ``emb_kmeans_clusters``), then within each learned cluster drop the
    higher-id member of the 3 most-similar cosine pairs, returning every
    vector with a keep/drop decision — semantic deduplication as one
    gate (train → assign → in-cluster pairwise → prune → keep list).
    Production thresholds on cosine instead of ranking (random driver
    embeddings make a fixed threshold vacuous); the rank form exercises
    the identical plan and the swap only shrinks the pairwise stage.  At
    100 TB k grows ~ sqrt(N) so in-cluster candidate sets stay
    broadcastable; the drop set is ≤ 3k rows, broadcast on the way back
    (see ``operators/similarity.semdedup_keep``)."""
    from ..operators.similarity import kmeans_fit, semdedup_keep

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    assigned, _ = _kmeans_fit_cached(spark, sf_dir)
    return semdedup_keep(assigned, per_cluster_drop=3)


_GRAM_CTE = """
    m AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS x
        FROM embeddings
    ),
    g AS (
        SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS gram_dec
        FROM m a JOIN m b USING (vec_id)
        GROUP BY a.i, b.i
    )
"""


@register(
    "emb_gram_matrix",
    f"""
    WITH {_GRAM_CTE}
    SELECT i, j, ROUND(CAST(gram_dec AS DOUBLE), 8) AS gram
    FROM g
    """,
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed X^T X: the corpus reduces to dims² decimal-exact
    scalars via a narrow double-posexplode + one (i,j)-keyed aggregation
    (map-side partials collapse each task to dims² rows before the
    exchange).  The PCA/OPQ/whitening building block — see
    ``operators/similarity.gram_matrix``.  The oracle's self-join
    formulation is a deliberately DIFFERENT plan that must agree
    bit-for-bit because both sum identical decimals."""
    from ..operators.similarity import gram_matrix

    return gram_matrix(spread(spark, t(spark, sf_dir, "embeddings"))).select(
        "i", "j", F.round(F.col("gram_dec").cast("double"), 8).alias("gram")
    )


_PC1_ITERS = 8


def _pc1_oracle() -> str:
    """Unrolled power iteration: one (mv, n, v) CTE triple per round,
    generated by the same loop parameters the Spark/driver side uses."""
    parts = [f"""
    WITH {_GRAM_CTE},
    gd AS (SELECT i, j, CAST(gram_dec AS DOUBLE) AS gram FROM g),
    dims AS (SELECT COUNT(DISTINCT i) AS d FROM gd),
    v0 AS (SELECT i, 1.0 / sqrt(d) AS v
           FROM (SELECT DISTINCT i FROM gd) CROSS JOIN dims)"""]
    for it in range(_PC1_ITERS):
        parts.append(f""",
    mv{it} AS (SELECT gd.i, SUM(gd.gram * v{it}.v) AS mv
               FROM gd JOIN v{it} ON gd.j = v{it}.i GROUP BY gd.i),
    n{it} AS (SELECT sqrt(SUM(mv * mv)) AS nrm FROM mv{it}),
    v{it + 1} AS (SELECT i, mv / nrm AS v FROM mv{it} CROSS JOIN n{it})""")
    parts.append(f""",
    sgn AS (SELECT CASE WHEN (SELECT v FROM v{_PC1_ITERS}
                              ORDER BY abs(v) DESC, i LIMIT 1) < 0
                        THEN -1.0 ELSE 1.0 END AS s),
    mm AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings)
    SELECT mm.vec_id,
           ROUND(SUM(mm.x * vf.v) * (SELECT s FROM sgn), 4) AS pc1_score
    FROM mm JOIN v{_PC1_ITERS} vf ON mm.i = vf.i
    GROUP BY mm.vec_id""")
    import re

    # Each iteration references its predecessor twice (mv and the norm);
    # without MATERIALIZED DuckDB inlines CTEs and the plan grows 2^iters.
    return re.sub(r"AS \(", "AS MATERIALIZED (", "".join(parts))


@register("emb_pc1_scores", _pc1_oracle())
def emb_pc1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA top-component projection: power-iterate the decimal-exact gram
    matrix (driver state = dims² doubles, corpus never collected), then
    project every vector onto PC1 with a NARROW literal-weight
    ``aggregate(zip_with(...))`` expression — zero shuffles after the
    gram aggregation, the same broadcast-literal pattern as the IVF
    centroid assignment.  The oracle unrolls the identical iteration into
    generated CTEs (same start vector, normalization, and sign rule)."""
    from ..operators.similarity import pc1_power_iteration

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    v = pc1_power_iteration(emb, iterations=_PC1_ITERS)
    weights = ", ".join(f"cast({x!r} as double)" for x in v)
    score = F.expr(
        f"aggregate(zip_with(embedding, array({weights}),"
        " (x, w) -> cast(x as double) * w), 0D, (acc, t) -> acc + t)"
    )
    return emb.select("vec_id", F.round(score, 4).alias("pc1_score"))


def _pq_adc_oracle() -> str:
    """ADC search oracle: the two PQ subspace chains (shared generator
    with ``emb_pq_codes``) plus per-query lookup tables against the final
    codebooks, ADC candidate ranking, and exact-cosine re-rank."""
    luts = []
    for sfx, lo, length in (("s0", 1, 32), ("s1", 33, 32)):
        luts.append(f"""
    qs{sfx} AS (
        SELECT vec_id AS query_id,
               generate_subscripts(list_slice(embedding, {lo}, {lo + length - 1}), 1) - 1 AS dim,
               CAST(unnest(list_slice(embedding, {lo}, {lo + length - 1})) AS DOUBLE) AS e
        FROM embeddings WHERE vec_id < 5
    ),
    lut{sfx} AS (
        SELECT q.query_id, c.cid AS code, SUM((q.e - c.val) * (q.e - c.val)) AS pd
        FROM qs{sfx} q JOIN c2{sfx} c ON q.dim = c.dim
        GROUP BY q.query_id, c.cid
    )""")
    return f"""
    WITH {_pq_subspace_sql('s0', 1, 32, 4, 2)},
    {_pq_subspace_sql('s1', 33, 32, 4, 2)},{luts[0]},{luts[1]},
    codes AS (
        SELECT a0.vec_id, a0.code AS code0, a1.code AS code1
        FROM asgs0 a0 JOIN asgs1 a1 USING (vec_id)
    ),
    adc AS (
        SELECT l0.query_id, c.vec_id, l0.pd + l1.pd AS adc
        FROM codes c
        JOIN luts0 l0 ON c.code0 = l0.code
        JOIN luts1 l1 ON c.code1 = l1.code AND l1.query_id = l0.query_id
        WHERE c.vec_id <> l0.query_id
    ),
    cand AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc, vec_id) AS rn
            FROM adc
        ) WHERE rn <= 10
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT cand.query_id, cand.vec_id, ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                  ORDER BY {_COSINE_SQL} DESC, cand.vec_id) AS rn
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.vec_id
    ) WHERE rn <= 5
    """


@register("ann_pq_adc_rerank", _pq_adc_oracle())
def ann_pq_adc_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-style PQ search path: train per-subspace codebooks,
    encode the corpus once (8-byte codes), then answer queries by
    ASYMMETRIC DISTANCE — each query precomputes a (subspace, code) ->
    partial-distance lookup table against the codebooks (k x m doubles,
    broadcast), so scoring a corpus vector is two table lookups + an add,
    never touching the original 64 floats — and exact-cosine re-rank the
    top-10 ADC candidates down to 5.  At 100 TB the codes table is ~30x
    smaller than the embeddings; the scan cost drops proportionally and
    the full-precision vectors are read only for the re-rank candidate
    set (a semi-join against ~k rows per query)."""
    from ..operators.similarity import kmeans_fit

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 5)
    code_dfs = []
    lut_dfs = []
    for i, (lo, length) in enumerate(((1, 32), (33, 32))):
        assigned, centroids = _kmeans_fit_cached(spark, sf_dir, (lo, length))
        code_dfs.append(
            assigned.select("vec_id", F.col("cluster").alias(f"code{i}"))
        )
        structs = []
        for cid, cvec in enumerate(centroids):
            weights = ", ".join(f"cast({x!r} as double)" for x in cvec)
            pd_expr = (
                f"aggregate(zip_with(slice(embedding, {lo}, {length}),"
                f" array({weights}),"
                " (x, w) -> (cast(x as double) - w) * (cast(x as double) - w)),"
                " 0D, (acc, t) -> acc + t)"
            )
            structs.append(
                F.struct(
                    F.lit(cid).alias("code"), F.expr(pd_expr).alias("pd")
                )
            )
        lut_dfs.append(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.explode(F.array(*structs)).alias("s"),
            ).select(
                "query_id",
                F.col("s.code").alias(f"code{i}"),
                F.col("s.pd").alias(f"pd{i}"),
            )
        )
    codes = code_dfs[0].join(code_dfs[1], "vec_id")
    adc = (
        codes.join(F.broadcast(lut_dfs[0]), "code0")
        .join(F.broadcast(lut_dfs[1]), ["query_id", "code1"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", (F.col("pd0") + F.col("pd1")).alias("adc")
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    cand = adc.withColumn("rn", F.row_number().over(w_adc)).where(
        F.col("rn") <= 10
    ).select("query_id", "vec_id")
    q_side = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c_side = emb.select("vec_id", F.col("embedding").alias("c_emb"))
    cosine = _cosine_col()
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        cand.join(F.broadcast(q_side), "query_id")
        .join(c_side, "vec_id")
        .select("query_id", "vec_id", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w_cos))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@register(
    "ann_mips_norm_augment",
    f"""
    SELECT query_id, vec_id, inner_product FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_dot_sql('q.embedding', 'c.embedding')}, 4) AS inner_product,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_dot_sql('q.embedding', 'c.embedding')} DESC,
                            c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 5 AND c.vec_id <> q.vec_id
    ) WHERE rn <= 10
    """,
)
def ann_mips_norm_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search via the NORM-AUGMENTATION reduction
    (Bachrach et al. 2014, "Speeding up the Xbox recommender"): append
    sqrt(M² - ||x||²) to every corpus vector (M = max corpus norm) and a
    literal 0 to every query — every augmented corpus vector then has
    norm exactly M, so COSINE ranking on the augmented space equals
    inner-product ranking on the original space.  The oracle ranks by the
    plain inner product; matching it end-to-end proves the reduction, not
    just the arithmetic.

    Why it matters at scale: recommender/retrieval scores are inner
    products (not cosine), but every sublinear index here (IVF, RP-LSH,
    PQ) partitions by angle — this reduction lets ALL of them serve MIPS
    unchanged.  The max norm M is a one-scalar aggregate broadcast back
    via cross join (no driver collect); augmentation itself is a narrow
    ``concat(embedding, array(...))`` projection."""
    emb = t(spark, sf_dir, "embeddings")
    m = emb.agg(
        F.max(F.sqrt(dot("embedding", "embedding"))).alias("max_norm")
    )
    # Augment in DOUBLE: a float32 augmented component would perturb the
    # "every augmented norm is exactly M" invariant by ~1e-7 relative,
    # which is enough to flip near-tied rankings vs the plain-ip oracle.
    as_double = F.expr("transform(embedding, x -> cast(x as double))")
    corpus = (
        spread(spark, emb)
        .crossJoin(F.broadcast(m))
        .select(
            "vec_id",
            F.concat(
                as_double,
                F.array(
                    # greatest(0, ·): for the max-norm vector itself,
                    # M² − Σx² lands a few ulp NEGATIVE, and sqrt(<0) is
                    # NaN — which Spark's ordering ranks above every
                    # number, silently corrupting the top-k.
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            F.col("max_norm") * F.col("max_norm")
                            - dot("embedding", "embedding"),
                        )
                    )
                ),
            ).alias("c_emb"),
            F.col("embedding").alias("c_raw"),
        )
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.concat(as_double, F.array(F.lit(0.0))).alias("q_emb"),
        F.col("embedding").alias("q_raw"),
    )
    cos_aug = dot("q_emb", "c_emb") / (
        F.sqrt(dot("q_emb", "q_emb")) * F.sqrt(dot("c_emb", "c_emb"))
    )
    ip = F.expr(
        "aggregate(zip_with(q_raw, c_raw, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_aug"), "vec_id")
    return (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos_aug.alias("cos_aug"), ip.alias("ip"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("query_id", "vec_id", F.round("ip", 4).alias("inner_product"))
    )


def _prefix_cos_sql(pfx: int) -> str:
    a, b = f"q.embedding[1:{pfx}]", f"c.embedding[1:{pfx}]"
    return (
        f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


@register(
    "emb_matryoshka_prefix_recall",
    f"""
    WITH full_topk AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_COSINE_SQL} DESC, c.vec_id) AS rn
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < 5 AND c.vec_id <> q.vec_id
        ) WHERE rn <= 10
    ),
    prefix_topk AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_prefix_cos_sql(16)} DESC,
                                               c.vec_id) AS rn
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < 5 AND c.vec_id <> q.vec_id
        ) WHERE rn <= 10
    )
    SELECT f.query_id,
           CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits,
           ROUND(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 4)
               AS recall_at_10
    FROM full_topk f
    LEFT JOIN prefix_topk p
      ON f.query_id = p.query_id AND f.vec_id = p.vec_id
    GROUP BY f.query_id
    """,
)
def emb_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022): how
    much of the FULL-dimension cosine top-10 does ranking on only the
    FIRST 16 of 64 dimensions recover?  This is the measurement behind
    the standard retrieval cost lever — score with a prefix (4x less
    I/O and FLOPs at 100 TB), re-rank survivors with full vectors — and
    the eval every embedding pipeline should run before enabling it.
    Both rankings broadcast the 5-query set against the corpus; the
    recall join then runs on 50 rows."""
    emb = t(spark, sf_dir, "embeddings")
    corpus = spread(spark, emb).select(
        "vec_id", F.col("embedding").alias("c_emb")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )

    def topk(score_col: Column, tag: str) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(F.desc("__s"), "vec_id")
        return (
            corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", score_col.alias("__s"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 10)
            .select("query_id", F.col("vec_id").alias(f"{tag}_vec_id"))
        )

    full = topk(_cosine_col(), "full")
    q_pfx = F.slice("q_emb", 1, 16)
    c_pfx = F.slice("c_emb", 1, 16)

    def pdot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    prefix_cos = pdot(q_pfx, c_pfx) / (
        F.sqrt(pdot(q_pfx, q_pfx)) * F.sqrt(pdot(c_pfx, c_pfx))
    )
    prefix = topk(prefix_cos, "pfx").withColumnRenamed("query_id", "pfx_qid")
    return (
        full.join(
            prefix,
            (F.col("query_id") == F.col("pfx_qid"))
            & (F.col("full_vec_id") == F.col("pfx_vec_id")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("pfx_vec_id").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_hits"),
            F.round(
                F.sum(
                    F.when(F.col("pfx_vec_id").isNotNull(), 1).otherwise(0)
                ) / 10.0,
                4,
            ).alias("recall_at_10"),
        )
    )


def _ivfpq_oracle() -> str:
    """Composed IVF+PQ oracle: the full-embedding Lloyd's chain supplies
    the coarse cells (``asg``), the two PQ subspace chains + per-query
    LUTs supply ADC distances, and the candidate set is restricted to
    the query's own cell before the top-10 ADC cut and exact-cosine
    re-rank — the same composition the Spark gate runs."""
    luts = []
    for sfx, lo, length in (("s0", 1, 32), ("s1", 33, 32)):
        luts.append(f"""
    qs{sfx} AS (
        SELECT vec_id AS query_id,
               generate_subscripts(list_slice(embedding, {lo}, {lo + length - 1}), 1) - 1 AS dim,
               CAST(unnest(list_slice(embedding, {lo}, {lo + length - 1})) AS DOUBLE) AS e
        FROM embeddings WHERE vec_id < 5
    ),
    lut{sfx} AS (
        SELECT q.query_id, c.cid AS code, SUM((q.e - c.val) * (q.e - c.val)) AS pd
        FROM qs{sfx} q JOIN c2{sfx} c ON q.dim = c.dim
        GROUP BY q.query_id, c.cid
    )""")
    tail = f""",
    {_pq_subspace_sql('s0', 1, 32, 4, 2)},
    {_pq_subspace_sql('s1', 33, 32, 4, 2)},{luts[0]},{luts[1]},
    codes AS (
        SELECT a0.vec_id, a0.code AS code0, a1.code AS code1
        FROM asgs0 a0 JOIN asgs1 a1 USING (vec_id)
    ),
    adc AS (
        SELECT l0.query_id, cd.vec_id, l0.pd + l1.pd AS adc
        FROM codes cd
        JOIN asg ca ON ca.vec_id = cd.vec_id
        JOIN asg qa ON qa.cluster = ca.cluster
        JOIN luts0 l0 ON cd.code0 = l0.code AND l0.query_id = qa.vec_id
        JOIN luts1 l1 ON cd.code1 = l1.code AND l1.query_id = l0.query_id
        WHERE cd.vec_id <> l0.query_id
    ),
    cand AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc, vec_id) AS rn
            FROM adc
        ) WHERE rn <= 10
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT cand.query_id, cand.vec_id, ROUND({_COSINE_SQL}, 4) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                  ORDER BY {_COSINE_SQL} DESC, cand.vec_id) AS rn
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.vec_id
    ) WHERE rn <= 5
    """
    return _kmeans_sql(k=4, n_iter=2, final_select=tail)


@register("ann_ivfpq_search", _ivfpq_oracle())
def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production FAISS index shape, composed end-to-end (round 6):
    IVF coarse quantizer (full-embedding Lloyd's, k=4) prunes the corpus
    to the query's cell (nprobe=1), PQ codes + per-query ADC lookup
    tables score ONLY that cell without touching raw vectors, the top-10
    ADC candidates re-rank by exact cosine to top-5.  Relative to
    ``ann_ivf_kmeans_topk`` (exact scoring in-cell) and
    ``ann_pq_adc_rerank`` (ADC over the whole corpus) this is the
    two-level cost structure real indexes run: scan cost ~ cell size ×
    8-byte codes, full-precision reads ~ re-rank candidates only.  At
    100 TB: cells are the table's partition key (partition-pruned scan),
    codes are ~30× smaller than vectors, LUTs are k×m doubles per query
    broadcast to the cell scan."""
    from ..operators.similarity import kmeans_fit

    emb = spread(spark, t(spark, sf_dir, "embeddings"))
    cells, _ = _kmeans_fit_cached(spark, sf_dir)
    cells = cells.select("vec_id", F.col("cluster").alias("cell"))
    queries = emb.where(F.col("vec_id") < 5)
    code_dfs = []
    lut_dfs = []
    for i, (lo, length) in enumerate(((1, 32), (33, 32))):
        assigned, centroids = _kmeans_fit_cached(spark, sf_dir, (lo, length))
        code_dfs.append(
            assigned.select("vec_id", F.col("cluster").alias(f"code{i}"))
        )
        structs = []
        for cid, cvec in enumerate(centroids):
            weights = ", ".join(f"cast({x!r} as double)" for x in cvec)
            pd_expr = (
                f"aggregate(zip_with(slice(embedding, {lo}, {length}),"
                f" array({weights}),"
                " (x, w) -> (cast(x as double) - w) * (cast(x as double) - w)),"
                " 0D, (acc, t) -> acc + t)"
            )
            structs.append(
                F.struct(F.lit(cid).alias("code"), F.expr(pd_expr).alias("pd"))
            )
        lut_dfs.append(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.explode(F.array(*structs)).alias("s"),
            ).select(
                "query_id",
                F.col("s.code").alias(f"code{i}"),
                F.col("s.pd").alias(f"pd{i}"),
            )
        )
    codes = (
        code_dfs[0].join(code_dfs[1], "vec_id").join(cells, "vec_id")
    )
    q_cells = cells.select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("q_cell")
    ).join(queries.select(F.col("vec_id").alias("query_id")), "query_id")
    adc = (
        codes.join(F.broadcast(q_cells), F.col("cell") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut_dfs[0]), ["query_id", "code0"])
        .join(F.broadcast(lut_dfs[1]), ["query_id", "code1"])
        .select("query_id", "vec_id", (F.col("pd0") + F.col("pd1")).alias("adc"))
    )
    w_adc = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= 10)
        .select("query_id", "vec_id")
    )
    q_side = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c_side = emb.select("vec_id", F.col("embedding").alias("c_emb"))
    cosine = _cosine_col()
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        cand.join(F.broadcast(q_side), "query_id")
        .join(c_side, "vec_id")
        .select("query_id", "vec_id", cosine.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w_cos))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


@register(
    "emb_int8_quantize",
    """
    WITH e AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, MAX(abs(x)) / 127.0 AS scale
        FROM e GROUP BY vec_id
    ),
    q AS (
        SELECT e.vec_id, x, scale,
               GREATEST(LEAST(floor(x / scale + 0.5), 127), -127) AS qi
        FROM e JOIN s USING (vec_id) WHERE scale > 0
    ),
    err AS (
        SELECT vec_id, scale,
               MAX(abs(qi * scale - x)) AS vec_err,
               SUM(CAST(floor(abs(qi * scale - x) * 1e9) AS BIGINT))
                   AS vec_err_e9
        FROM q GROUP BY vec_id, scale
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(ROUND(MAX(vec_err), 6) AS DOUBLE) AS max_abs_err,
           CAST(SUM(vec_err_e9) AS BIGINT) AS sum_err_e9,
           CAST(COUNT(*) FILTER (vec_err > scale * 0.5000001) AS BIGINT)
               AS n_bound_violations
    FROM err
    """,
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 embedding quantization (round 6): per-vector symmetric
    scale ``max|x| / 127``, codes ``floor(x/scale + 0.5)`` clamped —
    the floor(+0.5) form instead of round() because engines disagree on
    half-even vs half-away ties, and the storage win (4x) only matters
    at 100 TB if the codes are REPRODUCIBLE.  The gate checks the
    quantizer end-to-end: vector count, worst reconstruction error,
    an exact-integer error mass (floor(err*1e9) summed as BIGINT — a
    float SUM would be order-dependent), and the analytic bound
    ``err <= scale/2`` violated ZERO times.  All narrow array
    expressions (transform/aggregate), zero shuffles before the final
    scalar aggregate."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    scale = (
        F.array_max(F.transform(as_double, F.abs)) / F.lit(127.0)
    ).alias("scale")
    df = emb.select("vec_id", as_double.alias("xs"), scale).where(
        F.col("scale") > 0
    )
    qi = lambda x: F.greatest(  # noqa: E731
        F.least(F.floor(x / F.col("scale") + 0.5), F.lit(127)), F.lit(-127)
    )
    errs = F.transform("xs", lambda x: F.abs(qi(x) * F.col("scale") - x))
    per_vec = df.select(
        "vec_id",
        "scale",
        F.array_max(errs).alias("vec_err"),
        F.aggregate(
            errs,
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + F.floor(e * 1e9).cast("bigint"),
        ).alias("vec_err_e9"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.max("vec_err"), 6).cast("double").alias("max_abs_err"),
        F.sum("vec_err_e9").cast("bigint").alias("sum_err_e9"),
        F.count(F.when(F.col("vec_err") > F.col("scale") * 0.5000001, 1))
        .cast("bigint")
        .alias("n_bound_violations"),
    )
