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
