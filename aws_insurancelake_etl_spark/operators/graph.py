"""Distributed graph ranking: weighted PageRank as iterative join + agg.

Complements the dedup clustering operators (``dedup.connected_components``,
``connected_components_star``) with the other canonical iterative graph
workload.  Same scale discipline: per-iteration driver state is ONE scalar
(the dangling-mass sum); ranks and edges never collect; each round is one
shuffle join (edges x ranks on src) plus one aggregation (contributions by
dst); ``localCheckpoint`` truncates lineage per round so the DAG stays flat
across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node_col: str = "node",
) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst, weight) and a ``nodes``
    universe; returns (node, rank) after ``iterations`` synchronous
    rounds.

    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} p(u,v) r_t(u) + dangling_t/N)

    with p(u,v) = weight / total out-weight of u, and dangling_t the rank
    mass sitting on nodes with no out-edges (redistributed uniformly —
    the standard random-surfer completion, without which rank mass leaks
    and the result is not a distribution).

    Scale design: edge probabilities are computed ONCE (one groupBy +
    join) and checkpointed; each iteration is a join keyed on src (AQE
    broadcasts the rank side while it fits — |nodes| rows — and falls
    back to shuffle when it doesn't) followed by a sum keyed on dst.
    The dangling correction is a one-scalar aggregate per round — the
    only driver state, same discipline as the k-means / connected-
    components loops.  N is a driver-side count of the node table
    (a scalar an orchestrating driver must know anyway)."""
    n_nodes = nodes.count()
    node_ids = nodes.select(F.col(node_col).alias("node"))
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    probs = (
        edges.join(out_w, src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.col(weight) * 1.0 / F.col("__ow")).alias("__p"),
        )
        .localCheckpoint(eager=False)
    )
    src_nodes = probs.select(F.col("__src").alias("node")).distinct()
    ranks = node_ids.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(
        eager=False
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        # Dangling mass as a broadcast 1-row aggregate instead of a driver
        # collect: the whole multi-round recursion stays LAZY (one Spark
        # job at the final action, not one per round), and the scalar
        # still never materializes more than 8 bytes.  localCheckpoint
        # per round bounds plan depth when the action does arrive.
        dangling = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contrib = (
            probs.join(ranks, probs["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("__p") * F.col("rank")).alias("__c"))
        )
        ranks = (
            node_ids.join(contrib, node_ids["node"] == contrib["__dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + damping
                    * (F.coalesce("__c", F.lit(0.0)) + F.col("__dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
