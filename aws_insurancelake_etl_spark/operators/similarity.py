"""Embedding-similarity operators: brute-force cosine top-k, coarse-
partition (IVF-style) pruned search, cosine near-dup pairs.

Dot products are native ``aggregate(zip_with(...))`` double expressions —
no UDFs, no Python round-trips.  The brute-force path broadcasts the query
set (assumed small) against the corpus; the pruned path equi-joins on a
coarse partition id so only one bucket of the corpus is scanned per query —
on a partitioned table that becomes real partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def cosine(a: str, b: str) -> Column:
    return dot_product(a, b) / (
        F.sqrt(dot_product(a, a)) * F.sqrt(dot_product(b, b))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query vector.

    ``partition_col`` switches brute-force to IVF-style pruning: candidates
    are restricted to the query's coarse partition."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        *([F.col(partition_col).alias("q_part")] if partition_col else []),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_emb"),
        *([F.col(partition_col).alias("c_part")] if partition_col else []),
    )
    condition = F.col("vec_id") != F.col("query_id")
    if partition_col:
        condition = condition & (F.col("c_part") == F.col("q_part"))
    sim = cosine("q_emb", "c_emb")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), "vec_id")
    return (
        c.join(F.broadcast(q), condition)
        .select("query_id", "vec_id", sim.alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cosine_raw", 4).alias("cosine"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_full_pairs: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, blocked by a
    coarse partition column.

    ``block_col`` is required: without it the plan is an O(n²) all-pairs
    cartesian-with-filter — a scale-killer on any real corpus.  Pass
    ``allow_full_pairs=True`` to explicitly opt into the unblocked shape
    (small corpora / ground-truth generation only)."""
    if block_col is None and not allow_full_pairs:
        raise ValueError(
            "cosine_near_dup_pairs without block_col compiles to an O(n^2) "
            "all-pairs join; pass block_col (e.g. an LSH bucket or label) or "
            "opt in explicitly with allow_full_pairs=True"
        )
    a = df.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("q_emb"),
        *([F.col(block_col).alias("block_a")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("c_emb"),
        *([F.col(block_col).alias("block_b")] if block_col else []),
    )
    condition = F.col("vec_a") < F.col("vec_b")
    if block_col:
        condition = condition & (F.col("block_a") == F.col("block_b"))
    sim = cosine("q_emb", "c_emb")
    return (
        a.join(b, condition)
        .select("vec_a", "vec_b", sim.alias("cosine_raw"))
        .where(F.col("cosine_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine_raw", 4).alias("cosine"))
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    labels: list[int] | None = None,
) -> DataFrame:
    """(id, cluster) — nearest centroid by squared L2, ties to the lowest
    cluster id.  Centroids are literal arrays (driver-side state, the MLlib
    pattern), so assignment is a fully NARROW pass: k zip_with/aggregate
    expressions per row, no join, no shuffle.  ``labels`` keeps original
    cluster ids stable when a centroid list has gaps (a cluster emptied
    during Lloyd's)."""
    if labels is None:
        labels = list(range(len(centroids)))
    dists = []
    for cid, c in zip(labels, centroids):
        arr = F.array(*[F.lit(float(v)) for v in c])
        d = F.expr(
            f"aggregate(zip_with({vec_col}, __c{cid}, (x, y) ->"
            " (cast(x as double) - y) * (cast(x as double) - y)),"
            " 0D, (acc, v) -> acc + v)"
        )
        dists.append((cid, arr, d))
    out = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col))
    for cid, arr, _ in dists:
        out = out.withColumn(f"__c{cid}", arr)
    best = F.array_min(
        F.array(*[F.struct(d.alias("dist"), F.lit(cid).alias("cid")) for cid, _, d in dists])
    )
    return out.select("vec_id", vec_col, best["cid"].alias("cluster"))


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    n_iter: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column, built to be exactly
    reproducible by any engine (the property that makes it differentially
    checkable — engine k-means like MLlib's is seed- and partitioning-
    dependent):

    - init: the k vectors whose ids sort first by md5 (deterministic
      pseudo-random pick, no RNG state);
    - assignment: narrow literal-centroid pass (:func:`assign_clusters`);
    - update: per-(cluster, dim) means with decimal(27,12) sums — exact
      and summation-order-independent, so distributed aggregation cannot
      produce run-to-run float drift — rounded to 9 decimals;
    - a cluster that loses all members drops out (both engines see the
      same aggregation), no respawn heuristic.

    Returns (assignments after the final update, centroid list).  Driver
    state is k×dim floats per iteration; each iteration is one narrow
    assignment pass + one (cluster, dim)-keyed aggregation — the standard
    scale shape for Lloyd's on Spark (centroids broadcast as literals,
    data never collected).  This is the training step for IVF coarse
    quantizers (ann_ivf_label_topk searches within one coarse partition).
    """
    init_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in row[1]] for row in init_rows]
    labels = list(range(k))
    for _ in range(n_iter):
        assigned = assign_clusters(df, centroids, vec_col, id_col, labels)
        stats = (
            assigned.select(
                "cluster", F.posexplode(vec_col).alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("v").cast("double").cast("decimal(27,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for row in stats:
            by_cluster.setdefault(row["cluster"], {})[row["dim"]] = round(
                float(row["s"]) / row["n"], 9
            )
        labels = sorted(by_cluster)
        centroids = [[by_cluster[cid][d] for d in sorted(by_cluster[cid])] for cid in labels]
    return assign_clusters(df, centroids, vec_col, id_col, labels), centroids


def semdedup_keep(
    assigned: DataFrame,
    per_cluster_drop: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over a clustered embedding
    corpus: within each k-means cluster, rank pairs by cosine similarity
    and drop the higher-id member of the top ``per_cluster_drop`` most
    similar pairs, returning every vector with its cluster and a ``keep``
    flag.  (Production SemDeDup thresholds on cosine — e.g. >= 0.95 —
    instead of ranking; the driver's embeddings are random, so a fixed
    threshold selects nothing and verifies nothing.  The rank form
    exercises the identical plan; swapping the row_number filter for a
    threshold predicate is a one-line change that only SHRINKS the
    pairwise stage.)

    Plan shape: the pairwise comparison happens strictly inside clusters
    (join keyed on the cluster id), so pair volume is sum-of-cluster-
    sizes-squared, never |corpus|².  At 100 TB the coarse quantizer is
    trained with k ~ sqrt(N) (the SemDeDup paper's regime), bounding each
    cluster to a broadcastable candidate set; the keep-list join back is
    an 8-byte-key left join against a drop set that is at most
    k * per_cluster_drop rows — broadcast."""
    a = assigned.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("q_emb"), "cluster"
    )
    b = assigned.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("c_emb"),
        F.col("cluster").alias("cluster_b"),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("cosine_raw"), "vec_a", "vec_b"
    )
    drops = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("cluster", "vec_a", "vec_b", cosine("q_emb", "c_emb").alias("cosine_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_cluster_drop)
        .select(F.col("vec_b").alias("drop_id"))
        .distinct()
    )
    return (
        assigned.select(id_col, "cluster")
        .join(F.broadcast(drops), F.col(id_col) == F.col("drop_id"), "left")
        .select(
            id_col,
            F.col("cluster").cast("long").alias("cluster"),
            F.col("drop_id").isNull().alias("keep"),
        )
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(i, j, gram_dec) — the X^T X gram/covariance-style matrix of an
    embedding column, decimal-exact: components round to 6 decimals and
    become DECIMAL(18,6), products are exact DECIMAL(37,12), sums are
    exact — so the distributed total is order-independent AND
    bit-reproducible by any engine.  This is THE building block for
    distributed PCA / OPQ / whitening: the corpus-sized side reduces to
    dims² scalars without any vector ever reaching the driver.

    Plan: a double ``posexplode`` fans each vector to dims² (i, j,
    xi*xj) products NARROWLY (no self-join — the second explode re-reads
    the row's own array), then one groupBy on (i, j); map-side partial
    aggregation collapses each task to at most dims² rows before the
    exchange, so shuffle volume is tasks x dims², independent of corpus
    size."""
    melted = df.select(
        F.col(vec_col).alias("__e"),
        F.posexplode(vec_col).alias("__i0", "__xi"),
    )
    pairs = melted.select(
        (F.col("__i0") + 1).cast("bigint").alias("i"),
        F.round(F.col("__xi").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("__xd"),
        F.posexplode("__e").alias("__j0", "__xj"),
    ).select(
        "i",
        (F.col("__j0") + 1).cast("bigint").alias("j"),
        (
            F.col("__xd")
            * F.round(F.col("__xj").cast("double"), 6).cast("decimal(18,6)")
        ).alias("__p"),
    )
    return pairs.groupBy("i", "j").agg(F.sum("__p").alias("gram_dec"))


def pc1_power_iteration(
    df: DataFrame, iterations: int = 8, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[float]:
    """Top principal direction of the (uncentered) embedding gram matrix
    via power iteration, returned as a python list of dims floats.

    The distributed work is exactly :func:`gram_matrix`; the iteration
    itself runs on the DRIVER over the collected dims x dims matrix —
    legitimate scalar state (64² doubles here), the same discipline as
    the k-means centroid loop: at 100 TB the gram aggregation is the only
    corpus-touching stage and the eigensolve cost is independent of
    corpus size.  Deterministic: uniform start vector, L2 normalization
    each round, final sign fixed so the largest-|component| (smallest
    index on ties) is positive."""
    import math

    rows = (
        gram_matrix(df, vec_col, id_col)
        .select("i", "j", F.col("gram_dec").cast("double").alias("gram"))
        .collect()
    )
    dims = max(r.i for r in rows)
    G = [[0.0] * dims for _ in range(dims)]
    for r in rows:
        G[r.i - 1][r.j - 1] = r.gram
    v = [1.0 / math.sqrt(dims)] * dims
    for _ in range(iterations):
        mv = [sum(G[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        nrm = math.sqrt(sum(x * x for x in mv))
        v = [x / nrm for x in mv]
    best = min(range(dims), key=lambda i: (-abs(v[i]), i))
    if v[best] < 0:
        v = [-x for x in v]
    return v
