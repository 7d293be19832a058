"""Entity-match queries: exact composite-key match and Spark-native blocked
fuzzy matching (SURVEY §2.4; reference ``etl_consume_entity_match.py``).

The reference's fuzzy path collects both sides to pandas
(``etl_consume_entity_match.py:244-245``) — a driver-memory cliff at scale.
Here the same level/blocking/threshold semantics run as a distributed plan:
equi-join on the blocking key → per-pair similarity scoring with native
expressions → best-match-per-incoming via a window.  Candidate-pair count is
bounded by the blocking key's selectivity, never |A|×|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@register(
    "em_exact_match",
    """
    SELECT i.c_custkey AS custkey, i.source_system,
           COALESCE(p.global_id,
                    md5('new-' || CAST(i.c_custkey AS VARCHAR) || '-' || i.source_system))
               AS global_id,
           (p.global_id IS NOT NULL) AS matched
    FROM (
        SELECT c_custkey, CAST(c_custkey % 3 AS VARCHAR) AS source_system FROM customer
    ) i
    LEFT JOIN (
        SELECT c_custkey, CAST(c_custkey % 3 AS VARCHAR) AS source_system,
               md5(CAST(c_custkey AS VARCHAR)) AS global_id
        FROM customer WHERE c_custkey % 2 = 0
    ) p ON i.c_custkey = p.c_custkey AND i.source_system = p.source_system
    """,
)
def em_exact_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact match: left-outer join on (source_primary_key, source_system_key)
    with coalesced global id — new entities get a deterministic id here so
    the oracle can reproduce it (production uses ``uuid()``)."""
    cust = t(spark, sf_dir, "customer")
    incoming = cust.select(
        "c_custkey", (F.col("c_custkey") % 3).cast("string").alias("source_system")
    )
    primary = (
        cust.filter(F.col("c_custkey") % 2 == 0)
        .select(
            F.col("c_custkey").alias("p_custkey"),
            (F.col("c_custkey") % 3).cast("string").alias("p_source_system"),
            F.md5(F.col("c_custkey").cast("string")).alias("p_global_id"),
        )
    )
    joined = incoming.join(
        primary,
        (incoming.c_custkey == primary.p_custkey)
        & (incoming.source_system == primary.p_source_system),
        "left",
    )
    return joined.select(
        F.col("c_custkey").alias("custkey"),
        "source_system",
        F.coalesce(
            F.col("p_global_id"),
            F.md5(F.concat(F.lit("new-"), F.col("c_custkey").cast("string"),
                           F.lit("-"), F.col("source_system"))),
        ).alias("global_id"),
        F.col("p_global_id").isNotNull().alias("matched"),
    )


@register(
    "em_fuzzy_blocked",
    """
    SELECT custkey, matched_custkey, similarity FROM (
        SELECT i.c_custkey AS custkey, p.c_custkey AS matched_custkey,
               ROUND(1.0 - levenshtein(i.c_name, p.c_name)
                   / GREATEST(length(i.c_name), length(p.c_name)), 4) AS similarity,
               ROW_NUMBER() OVER (
                   PARTITION BY i.c_custkey
                   ORDER BY 1.0 - levenshtein(i.c_name, p.c_name)
                       / GREATEST(length(i.c_name), length(p.c_name)) DESC,
                       p.c_custkey
               ) AS rn
        FROM (SELECT * FROM customer WHERE c_custkey % 2 = 1) i
        JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) p
          ON i.c_nationkey = p.c_nationkey
    ) WHERE rn = 1 AND similarity >= 0.85
    """,
)
def em_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage, fully distributed: block on nationkey,
    score candidate pairs with edit-distance similarity, keep each incoming
    row's best match over threshold.

    Plan notes (the 100 TB shape):

    - **Bounded edit distance**: ``sim >= 0.85`` implies
      ``lev <= 0.15 * max_len``, so the 3-arg ``levenshtein(l, r, thr)``
      computes a banded DP that early-exits past ``thr`` (returns -1) —
      O(n·thr) per pair instead of O(n²).  ``thr`` is derived from the
      corpus's max name length with a tiny column-pruned pre-agg.
    - **Broadcast the primary side**: the entity dimension is orders of
      magnitude smaller than the incoming feed, and the block key is
      low-cardinality (25 nations) — a shuffle join would hash 2.25M
      candidate pairs into 25 hot partitions.  Broadcasting keeps full
      scan parallelism; at a scale where primary outgrows the broadcast
      threshold, salt the block key instead.
    - **Best-match as ``max(struct(sim, -key))``** — a hash aggregate with
      map-side partial combine — instead of a row_number window, so the
      shuffle carries one candidate per (incoming × map-partition), not
      every scored pair."""
    cust = t(spark, sf_dir, "customer")
    max_name_len = cust.agg(F.max(F.length("c_name"))).first()[0] or 0
    lev_threshold = int(0.15 * max_name_len) + 1
    # The broadcast join fans each incoming row out to ~|block| candidate
    # pairs, so the scoring stage's parallelism is the *incoming* side's
    # partitioning.  A small single-file input scans as one partition —
    # spread it across the cluster before the fan-out (cheap: pre-join
    # cardinality).  At 100 TB the scan is already many partitions and
    # this repartition collapses into AQE's normal coalesce.
    n_slices = spark.sparkContext.defaultParallelism
    incoming = (
        cust.filter(F.col("c_custkey") % 2 == 1)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("i_name"),
            F.col("c_nationkey").alias("block"),
        )
        .repartition(n_slices)
    )
    primary = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("matched_custkey"),
        F.col("c_name").alias("p_name"),
        F.col("c_nationkey").alias("block"),
    )
    max_len = F.greatest(F.length("i_name"), F.length("p_name"))
    # Banded DP: returns -1 when the distance exceeds the threshold.
    lev = F.levenshtein(F.col("i_name"), F.col("p_name"), lev_threshold)
    similarity = 1.0 - lev / max_len
    best = F.max(
        F.struct(
            F.col("similarity").alias("sim"),
            (-F.col("matched_custkey")).alias("neg_key"),
            F.col("matched_custkey").alias("matched_custkey"),
        )
    ).alias("best")
    return (
        incoming.join(F.broadcast(primary), "block")
        .select("custkey", "matched_custkey", lev.alias("lev"), similarity.alias("similarity"))
        .where((F.col("lev") >= 0) & (F.col("similarity") >= 0.85))
        .groupBy("custkey")
        .agg(best)
        .select(
            "custkey",
            F.col("best.matched_custkey").alias("matched_custkey"),
            F.round("best.sim", 4).alias("similarity"),
        )
    )


@register(
    "em_jaro_winkler_scores",
    """
    SELECT custkey,
           COUNT(*) AS n_matches,
           MAX(ROUND(jw, 4)) AS best_score
    FROM (
        SELECT i.c_custkey AS custkey,
               jaro_winkler_similarity(i.c_name, p.c_name) AS jw
        FROM (SELECT * FROM customer WHERE c_custkey % 2 = 1) i
        JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) p
          ON i.c_nationkey = p.c_nationkey
    )
    WHERE ROUND(jw, 4) >= 0.97
    GROUP BY custkey
    """,
)
def em_jaro_winkler_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler scoring through the Arrow-batched pandas UDF — the
    distributed replacement for the reference's driver-side recordlinkage
    comparators (``etl_consume_entity_match.py:232-241``).  Blocked pairs
    score in parallel Python workers (Arrow transfer, no per-row pickling);
    the oracle is DuckDB's native jaro_winkler_similarity, which this
    implementation matches bit-for-bit (same prefix scale 0.1, cap 4)."""
    from ..functions.similarity import jaro_winkler
    from .util import spread

    cust = t(spark, sf_dir, "customer")
    incoming = spread(spark, cust.filter(F.col("c_custkey") % 2 == 1)).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("i_name"),
        F.col("c_nationkey").alias("block"),
    )
    primary = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_name").alias("p_name"), F.col("c_nationkey").alias("block")
    )
    jw = F.round(jaro_winkler("i_name", "p_name"), 4)
    return (
        incoming.join(F.broadcast(primary), "block")
        .select("custkey", jw.alias("jw"))
        .where(F.col("jw") >= 0.97)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n_matches"), F.max("jw").alias("best_score"))
    )


@register(
    "em_full_flow",
    """
    WITH incoming AS (
        SELECT c_custkey, c_name, CAST(c_nationkey AS VARCHAR) AS block_nk,
               CAST(c_custkey % 3 AS VARCHAR) AS src_system,
               CASE WHEN c_custkey % 7 = 0
                    THEN md5('pre-' || CAST(c_custkey AS VARCHAR)) END AS globalid
        FROM customer
    ),
    prim AS (
        SELECT c_custkey, c_name, CAST(c_nationkey AS VARCHAR) AS block_nk,
               CAST(c_custkey % 3 AS VARCHAR) AS src_system,
               md5(CAST(c_custkey AS VARCHAR)) AS globalid
        FROM customer WHERE c_custkey % 2 = 0
    ),
    pre AS (SELECT c_custkey, globalid FROM incoming WHERE globalid IS NOT NULL),
    exact AS (
        SELECT i.c_custkey, p.globalid
        FROM incoming i JOIN prim p
          ON i.c_custkey = p.c_custkey AND i.src_system = p.src_system
        WHERE i.globalid IS NULL
    ),
    fuzzy AS (
        SELECT c_custkey, globalid FROM (
            SELECT i.c_custkey, p.globalid,
                   ROW_NUMBER() OVER (PARTITION BY i.c_custkey ORDER BY p.globalid) AS rn
            FROM incoming i JOIN prim p ON i.block_nk = p.block_nk
            WHERE i.globalid IS NULL
              AND NOT EXISTS (SELECT 1 FROM exact e WHERE e.c_custkey = i.c_custkey)
              AND 1.0 - levenshtein(i.c_name, p.c_name) * 1.0
                  / GREATEST(length(i.c_name), length(p.c_name)) >= 0.85
        ) WHERE rn = 1
    )
    SELECT c_custkey AS custkey, globalid FROM pre
    UNION ALL SELECT c_custkey, globalid FROM exact
    UNION ALL SELECT c_custkey, globalid FROM fuzzy
    UNION ALL
    SELECT c_custkey, md5('new-' || CAST(c_custkey AS VARCHAR))
    FROM incoming i
    WHERE globalid IS NULL
      AND NOT EXISTS (SELECT 1 FROM exact e WHERE e.c_custkey = i.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM fuzzy f WHERE f.c_custkey = i.c_custkey)
    """,
)
def em_full_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete Consume-Entity-Match flow
    (``etl_consume_entity_match.py:404-431``) through the real
    ``entity_match`` operator: prematched pass-through → exact
    (pk, source-system) match → one blocked fuzzy level (levenshtein
    comparator, threshold-gated, best-match window, gid tie-break) →
    deterministic new-id fill → unionByName of the four streams.  The
    oracle restates all four streams in SQL; ids are md5-derived instead
    of uuid() so both engines agree."""
    from ..operators.entitymatch import entity_match

    cust = t(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("string").alias("block_nk"),
        (F.col("c_custkey") % 3).cast("string").alias("src_system"),
    )
    incoming = base.withColumn(
        "globalid",
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.md5(F.concat(F.lit("pre-"), F.col("c_custkey").cast("string"))),
        ),
    )
    primary = base.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "globalid", F.md5(F.col("c_custkey").cast("string"))
    )
    spec = {
        "global_id_field": "globalid",
        "exact_match_fields": {
            "source_primary_key": "c_custkey",
            "source_system_key": "src_system",
        },
        "levels": [
            {
                "blocks": ["block_nk"],
                "threshold": 0.9,
                "fields": [
                    {
                        "fieldname": "c_name",
                        "type": "string",
                        "method": "levenshtein",
                        "threshold": 0.85,
                        "weight": 1,
                    }
                ],
            }
        ],
    }
    out = entity_match(
        incoming,
        primary,
        spec,
        new_id_column=F.md5(F.concat(F.lit("new-"), F.col("c_custkey").cast("string"))),
    )
    return out.select(F.col("c_custkey").alias("custkey"), "globalid")


@register(
    "em_token_sort_scores",
    r"""
    SELECT custkey, matched_custkey, ROUND(sim, 4) AS similarity
    FROM (
        SELECT i.c_custkey AS custkey, p.c_custkey AS matched_custkey,
               1.0 - levenshtein(
                   array_to_string(list_sort(string_split_regex(lower(trim(i.c_name)), '\s+')), ' '),
                   array_to_string(list_sort(string_split_regex(lower(trim(p.c_name)), '\s+')), ' ')
               ) * 1.0 / GREATEST(
                   length(array_to_string(list_sort(string_split_regex(lower(trim(i.c_name)), '\s+')), ' ')),
                   length(array_to_string(list_sort(string_split_regex(lower(trim(p.c_name)), '\s+')), ' '))
               ) AS sim
        FROM (SELECT * FROM customer WHERE c_custkey % 2 = 1) i
        JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) p
          ON i.c_nationkey = p.c_nationkey AND i.c_mktsegment = p.c_mktsegment
    )
    WHERE sim >= 0.8
    """,
)
def em_token_sort_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rapidfuzz-style token_sort similarity as a NATIVE expression
    (lowercase → split → array_sort → rejoin → levenshtein ratio): the
    word-order-robust scorer for name fields, third comparator method of
    the fuzzy-match spec (``method: token_sort``).  Blocked on
    (nation, segment) so candidate pairs stay bounded; DuckDB rebuilds the
    identical canonical forms with list_sort."""
    from ..functions.similarity import token_sort_similarity

    cust = t(spark, sf_dir, "customer")
    inc = cust.where(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("i_name"),
        "c_nationkey", "c_mktsegment",
    )
    prim = cust.where(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("matched_custkey"),
        F.col("c_name").alias("p_name"),
        "c_nationkey", "c_mktsegment",
    )
    sim = token_sort_similarity(F.col("i_name"), F.col("p_name"))
    return (
        inc.join(F.broadcast(prim), ["c_nationkey", "c_mktsegment"])
        .select("custkey", "matched_custkey", sim.alias("sim"))
        .where(F.col("sim") >= 0.8)
        .select("custkey", "matched_custkey", F.round("sim", 4).alias("similarity"))
    )


@register(
    "em_partial_ratio_scores",
    r"""
    WITH pairs AS (
        SELECT i.p_partkey AS partkey,
               CASE WHEN length(i.p_name) <= length(p.p_name)
                    THEN i.p_name ELSE p.p_name END AS s,
               CASE WHEN length(i.p_name) <= length(p.p_name)
                    THEN p.p_name ELSE i.p_name END AS l
        FROM (SELECT * FROM part WHERE p_partkey % 2 = 1) i
        JOIN (SELECT * FROM part WHERE p_partkey % 2 = 0) p
          ON i.p_brand = p.p_brand AND i.p_size = p.p_size
    )
    SELECT partkey, COUNT(*) AS n_matches, MAX(ROUND(sim, 4)) AS best_score
    FROM (
        SELECT partkey,
               list_max([1.0 - levenshtein(s, substr(l, pos, length(s))) * 1.0
                         / length(s)
                         for pos in range(1, length(l) - length(s) + 2)]) AS sim
        FROM pairs
    )
    WHERE sim >= 0.55
    GROUP BY partkey
    """,
)
def em_partial_ratio_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rapidfuzz-style partial_ratio as a NATIVE expression: the shorter
    name slides over every same-length window of the longer, each window
    scores with JVM ``levenshtein``, and the best window wins — the scorer
    for fields where one side carries extra tokens (fourth comparator
    method of the fuzzy-match spec, ``method: partial_ratio``; the
    reference offers it via recordlinkage/rapidfuzz, driver-side at
    ``etl_consume_entity_match.py:232-241``).  Blocked on
    (brand, size) so candidate pairs stay bounded; window
    enumeration is sequence+transform (no explode — the array folds
    per-row), and DuckDB rebuilds identical windows with a list
    comprehension."""
    from ..functions.similarity import partial_ratio_similarity
    from .util import spread

    part = t(spark, sf_dir, "part")
    inc = spread(spark, part.where(F.col("p_partkey") % 2 == 1)).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("i_name"),
        "p_brand", "p_size",
    )
    prim = part.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_name").alias("p_name"), "p_brand", "p_size"
    )
    sim = partial_ratio_similarity(F.col("i_name"), F.col("p_name"))
    return (
        inc.join(F.broadcast(prim), ["p_brand", "p_size"])
        .select("partkey", sim.alias("sim"))
        .where(F.col("sim") >= 0.55)
        .groupBy("partkey")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max(F.round("sim", 4)).alias("best_score"),
        )
    )


@register(
    "em_token_set_scores",
    r"""
    WITH toks AS (
        SELECT i.p_partkey AS partkey, p.p_partkey AS matched_partkey,
               list_sort(list_distinct(string_split_regex(lower(trim(i.p_name)), '\s+'))) AS ta,
               list_sort(list_distinct(string_split_regex(lower(trim(p.p_name)), '\s+'))) AS tb
        FROM (SELECT * FROM part WHERE p_partkey % 2 = 1) i
        JOIN (SELECT * FROM part WHERE p_partkey % 2 = 0) p
          ON i.p_brand = p.p_brand AND i.p_size = p.p_size
    ),
    forms AS (
        SELECT partkey, matched_partkey,
               COALESCE(array_to_string(list_sort(list_intersect(ta, tb)), ' '), '') AS s0,
               trim(COALESCE(array_to_string(list_sort(list_intersect(ta, tb)), ' '), '') || ' ' ||
                    COALESCE(array_to_string(list_sort(list_filter(ta, x -> NOT list_contains(tb, x))), ' '), '')) AS s1,
               trim(COALESCE(array_to_string(list_sort(list_intersect(ta, tb)), ' '), '') || ' ' ||
                    COALESCE(array_to_string(list_sort(list_filter(tb, x -> NOT list_contains(ta, x))), ' '), '')) AS s2
        FROM toks
    )
    SELECT partkey, matched_partkey, ROUND(sim, 4) AS similarity
    FROM (
        SELECT partkey, matched_partkey,
               GREATEST(
                   CASE WHEN length(s0) = 0 AND length(s1) = 0 THEN 0.0
                        ELSE 1.0 - levenshtein(s0, s1) * 1.0 / GREATEST(length(s0), length(s1)) END,
                   CASE WHEN length(s0) = 0 AND length(s2) = 0 THEN 0.0
                        ELSE 1.0 - levenshtein(s0, s2) * 1.0 / GREATEST(length(s0), length(s2)) END,
                   CASE WHEN length(s1) = 0 AND length(s2) = 0 THEN 0.0
                        ELSE 1.0 - levenshtein(s1, s2) * 1.0 / GREATEST(length(s1), length(s2)) END
               ) AS sim
        FROM forms
    )
    WHERE sim >= 0.68
    """,
)
def em_token_set_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rapidfuzz-style token_set similarity as a NATIVE expression: best of
    the three ratios among (sorted token intersection, intersection+left
    difference, intersection+right difference), so containment of one
    token set in the other scores 1.0 — the scorer for fields with both
    reordering AND extra tokens (fifth comparator method of the
    fuzzy-match spec, ``method: token_set``).  Set algebra is
    array_intersect/array_except in codegen; ratios are JVM levenshtein;
    DuckDB rebuilds identical forms with list_intersect/list_filter."""
    from ..functions.similarity import token_set_similarity
    from .util import spread

    part = t(spark, sf_dir, "part")
    inc = spread(spark, part.where(F.col("p_partkey") % 2 == 1)).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("i_name"),
        "p_brand", "p_size",
    )
    prim = part.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("matched_partkey"),
        F.col("p_name").alias("p_name"),
        "p_brand", "p_size",
    )
    sim = token_set_similarity(F.col("i_name"), F.col("p_name"))
    return (
        inc.join(F.broadcast(prim), ["p_brand", "p_size"])
        .select("partkey", "matched_partkey", sim.alias("sim"))
        .where(F.col("sim") >= 0.68)
        .select("partkey", "matched_partkey", F.round("sim", 4).alias("similarity"))
    )


@register(
    "em_transitive_gid",
    """
    WITH RECURSIVE fpairs AS (
        SELECT i.c_custkey AS a, p.c_custkey AS b
        FROM (SELECT * FROM customer WHERE c_custkey % 2 = 1) i
        JOIN (SELECT * FROM customer WHERE c_custkey % 2 = 0) p
          ON i.c_nationkey = p.c_nationkey
        WHERE 1.0 - levenshtein(i.c_name, p.c_name)
              / GREATEST(length(i.c_name), length(p.c_name)) >= 0.85
    ),
    edges AS (SELECT a AS src, b AS dst FROM fpairs
              UNION ALL SELECT b, a FROM fpairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
        SELECT node, node AS label FROM nodes
        UNION
        SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, MIN(label) AS root FROM reach GROUP BY node),
    assigned AS (
        SELECT c.c_custkey,
               COALESCE(cc.root, c.c_custkey) AS root
        FROM customer c LEFT JOIN cc ON c.c_custkey = cc.node
    ),
    szs AS (SELECT root, COUNT(*) AS cluster_size FROM assigned GROUP BY root)
    SELECT a.c_custkey AS custkey,
           md5('gid-' || CAST(a.root AS VARCHAR)) AS global_id,
           s.cluster_size
    FROM assigned a JOIN szs s ON a.root = s.root
    """,
)
def em_transitive_gid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entity-resolution FINALE: transitive global-id assignment.
    Pairwise fuzzy matching only scores pairs it compared — but matches
    CHAIN (a~b from one feed, b~c from another), so production entity
    resolution closes the match graph and mints ONE id per connected
    component.  This gate composes the engine's real pieces end-to-end:
    the blocked fuzzy scorer (broadcast primary, banded levenshtein, ALL
    pairs over threshold — not just best-match, closure needs the full
    graph), ``dedup.connected_components`` (min-label propagation with
    pointer jumping), singleton fallback to the entity's own key, and a
    deterministic md5 global id per cluster root.  Cluster sizes ride
    along — the over-merge audit signal reviewers watch (a giant cluster
    means the threshold or blocking is too loose)."""
    from ..operators.dedup import connected_components
    from ..functions.similarity import levenshtein_similarity

    cust = t(spark, sf_dir, "customer")
    n_slices = spark.sparkContext.defaultParallelism
    incoming = cust.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("a"), F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("a_nat"),
    ).repartition(n_slices)
    primary = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("b"), F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
    )
    sim = levenshtein_similarity(F.col("a_name"), F.col("b_name"))
    pairs = (
        incoming.join(F.broadcast(primary), F.col("a_nat") == F.col("b_nat"))
        .where(sim >= 0.85)
        .select("a", "b")
    )
    cc = connected_components(pairs, src="a", dst="b").withColumnRenamed(
        "cluster_id", "root"
    )
    assigned = (
        cust.select("c_custkey")
        .join(cc, cust["c_custkey"] == cc["node"], "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("root"), F.col("c_custkey")).alias("root"),
        )
    )
    sizes = assigned.groupBy("root").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        assigned.join(sizes, "root")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.md5(F.concat(F.lit("gid-"), F.col("root").cast("string")))
            .alias("global_id"),
            "cluster_size",
        )
    )


@register(
    "em_linkage_eval",
    """
    WITH entities AS (
        SELECT c_custkey, c_nationkey,
               c_name || ' ' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                   AS full_name
        FROM customer
    ),
    dirty AS (
        -- light perturbation (edit distance 1): recoverable;
        -- heavy perturbation (whole 8-char tail replaced): deliberately
        -- beyond the 0.85 threshold -> designed false negatives
        SELECT c_custkey AS source_key, entities.c_nationkey,
               CASE WHEN c_custkey % 8 = 0
                    THEN substr(full_name, 1, length(full_name) - 8)
                         || 'z' || substr(full_name, length(full_name) - 6, 7)
                    ELSE substr(full_name, 1, length(full_name) - 8)
                         || substr(md5('x' || CAST(c_custkey AS VARCHAR)), 1, 8)
               END AS dirty_name,
               (c_custkey % 8 = 0) AS recoverable
        FROM entities JOIN customer USING (c_custkey)
        WHERE c_custkey % 4 = 0
    ),
    scored AS (
        SELECT d.source_key, d.recoverable, e.c_custkey AS matched_key,
               1.0 - levenshtein(d.dirty_name, e.full_name)
                   / GREATEST(length(d.dirty_name), length(e.full_name))
                   AS sim
        FROM dirty d JOIN entities e ON d.c_nationkey = e.c_nationkey
    ),
    best AS (
        SELECT source_key, recoverable, matched_key, sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source_key
                                         ORDER BY sim DESC, matched_key) AS rn
            FROM scored WHERE sim >= 0.85
        ) WHERE rn = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM dirty) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM dirty WHERE recoverable) AS BIGINT)
               AS n_recoverable,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN matched_key = source_key THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(SUM(CASE WHEN matched_key = source_key THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS precision,
           ROUND(SUM(CASE WHEN matched_key = source_key THEN 1 ELSE 0 END)
                 * 1.0 / (SELECT COUNT(*) FROM dirty), 4) AS recall
    FROM best
    """,
)
def em_linkage_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage EVALUATION — the eval-family completion for entity
    match (``ann_recall_eval`` and ``dedup_lsh_recall_eval`` are its ANN
    and LSH twins): synthesize duplicates with a KNOWN ground truth
    (entity names get an md5-entropy tail so similarity is informative;
    half the dirty records are perturbed one edit, half get their whole
    tail replaced — designed false negatives below the 0.85 threshold),
    run the SAME blocked fuzzy matcher shape as ``em_fuzzy_blocked``
    (broadcast entities, banded levenshtein, best-match aggregate), and
    report precision/recall against the truth.  At 100 TB this is how a
    linkage threshold is tuned: perturb a sample, measure, adjust."""
    cust = t(spark, sf_dir, "customer")
    entities = cust.select(
        F.col("c_custkey").alias("e_key"),
        F.col("c_nationkey").alias("block"),
        F.concat(
            "c_name", F.lit(" "),
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
        ).alias("full_name"),
    )
    base = entities.withColumnRenamed("e_key", "source_key")
    head = F.expr("substr(full_name, 1, length(full_name) - 8)")
    light = F.concat(
        head, F.lit("z"),
        F.expr("substr(full_name, length(full_name) - 6, 7)"),
    )
    heavy = F.concat(
        head,
        F.substring(
            F.md5(F.concat(F.lit("x"), F.col("source_key").cast("string"))),
            1, 8,
        ),
    )
    dirty = (
        base.where(F.col("source_key") % 4 == 0)
        .select(
            "source_key", "block",
            F.when(F.col("source_key") % 8 == 0, light)
            .otherwise(heavy)
            .alias("dirty_name"),
            (F.col("source_key") % 8 == 0).alias("recoverable"),
        )
    )
    max_len = entities.agg(F.max(F.length("full_name"))).first()[0] or 0
    lev_threshold = int(0.15 * max_len) + 1
    lev = F.levenshtein(F.col("dirty_name"), F.col("full_name"), lev_threshold)
    sim = 1.0 - lev / F.greatest(
        F.length("dirty_name"), F.length("full_name")
    )
    best = F.max(
        F.struct(
            F.col("sim").alias("sim"),
            (-F.col("e_key")).alias("neg_key"),
            F.col("e_key").alias("matched_key"),
        )
    ).alias("best")
    matched = (
        dirty.join(F.broadcast(entities), "block")
        .select("source_key", "e_key", lev.alias("lev"), sim.alias("sim"))
        .where((F.col("lev") >= 0) & (F.col("sim") >= 0.85))
        .groupBy("source_key")
        .agg(best)
        .select("source_key", F.col("best.matched_key").alias("matched_key"))
    )
    truth_counts = dirty.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.sum(F.col("recoverable").cast("int")).cast("long").alias("n_recoverable"),
    )
    match_counts = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum((F.col("matched_key") == F.col("source_key")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )
    return (
        truth_counts.crossJoin(match_counts)
        .select(
            "n_truth", "n_recoverable", "n_matched", "n_correct",
            F.round(F.col("n_correct") * 1.0 / F.col("n_matched"), 4)
            .alias("precision"),
            F.round(F.col("n_correct") * 1.0 / F.col("n_truth"), 4)
            .alias("recall"),
        )
    )


@register(
    "em_fuzzy_skew_stress",
    """
    WITH prim AS (
        SELECT c_custkey AS gid, c_name AS name, c_nationkey AS nat,
               c_acctbal AS bal,
               substr(c_name, 14, 2) AS blk,
               ROW_NUMBER() OVER (PARTITION BY substr(c_name, 14, 2)
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer WHERE c_custkey % 3 = 1
    ), capped AS (
        SELECT * FROM prim WHERE rn <= 40
    ), inc AS (
        SELECT c_custkey AS ikey, c_name AS name, c_nationkey AS nat,
               substr(c_name, 14, 2) AS blk
        FROM customer WHERE c_custkey % 3 = 0
    ), cand AS (
        SELECT i.ikey, p.gid, p.bal,
               ((CASE WHEN 1.0 - levenshtein(i.name, p.name)
                          / GREATEST(length(i.name), length(p.name)) >= 0.9
                      THEN 1.0 ELSE 0.0 END) * 2
                + (CASE WHEN i.nat = p.nat THEN 1.0 ELSE 0.0 END) * 1)
               / 3.0 AS score
        FROM inc i JOIN capped p ON i.blk = p.blk
    ), best AS (
        SELECT ikey, gid,
               ROW_NUMBER() OVER (PARTITION BY ikey
                                  ORDER BY score DESC, bal DESC, gid) AS brn
        FROM cand WHERE score >= 0.6
    )
    SELECT i.ikey, b.gid
    FROM inc i LEFT JOIN (SELECT ikey, gid FROM best WHERE brn = 1) b
      ON i.ikey = b.ikey
    """,
)
def em_fuzzy_skew_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-match HOT-BLOCK protection (round 8, VERDICT r7
    item 8): blocking keys are column slices
    (``operators/entitymatch.py``), so a corpus where most rows share
    one key — here ``c_name[13:15]``, two digit-prefix blocks with a
    ~2:1 skew, the "everyone's surname starts with S" shape —
    quadratically inflates one block's candidate pairs.
    ``level["block_cap"]`` keeps at most 40 DETERMINISTIC primary
    candidates per block (sort_field desc, then gid), bounding fan-out
    at O(|incoming| × cap); the gate asserts the cap actually BINDS
    (both blocks exceed it, and the truncation count — the engine's own
    Σ max(0, block_size − cap) definition, exact-value-tested against
    the Observation plumbing in ``tests/test_entitymatch.py`` — is
    positive) from the one block-size pass, so the match pipeline is
    executed once by the consumer, not twice; it returns every incoming
    row with its capped-match gid (NULL = unmatched).  The oracle
    recomputes the capped candidate set and best-match relationally;
    integer levenshtein keeps the threshold binarization engine-exact."""
    from ..operators.entitymatch import fuzzy_match_level

    cust = t(spark, sf_dir, "customer")
    primary = cust.where(F.col("c_custkey") % 3 == 1).select(
        F.col("c_custkey").alias("gid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("bal"),
    )
    incoming = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("ikey"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.lit(None).cast("bigint").alias("gid"),
    )
    cap = 40
    block_sizes = [
        r["n"]
        for r in primary.groupBy(
            F.expr("substring(name, 14, 2)")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    if not block_sizes or min(block_sizes) <= cap:
        raise RuntimeError(
            f"fixture must make the cap bind in EVERY block: {block_sizes}"
        )
    spec = {"global_id_field": "gid", "sort_field": "bal"}
    level = {
        "blocks": ["name[13:15]"],
        "threshold": 0.6,
        "block_cap": cap,
        "fields": [
            {
                "fieldname": "name",
                "type": "string",
                "method": "levenshtein",
                "threshold": 0.9,
                "weight": 2,
            },
            {"fieldname": "nat", "type": "exact", "weight": 1},
        ],
    }
    matched, unmatched = fuzzy_match_level(incoming, primary, level, spec)
    out = matched.unionByName(unmatched).select("ikey", "gid")
    # truncation count by the engine's definition (sum over primary rows
    # of rn > cap == Σ max(0, block_size − cap)), derived from the
    # block-size pass above — no second execution of the match pipeline;
    # the Observation plumbing itself is exact-value unit-tested
    truncated = sum(max(0, n - cap) for n in block_sizes)
    if truncated <= 0:
        raise RuntimeError(f"cap did not bind: truncated={truncated}")
    return out
