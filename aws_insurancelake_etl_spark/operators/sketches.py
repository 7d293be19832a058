"""Deterministic distinct-count sketches (KMV / k-minimum-values).

Spark's ``approx_count_distinct`` (HyperLogLog++) is the built-in answer,
but its estimates are engine-specific — no other engine reproduces them, so
they cannot sit behind a differential oracle, and its sketch state is not
exposed for incremental workflows.  KMV with an md5-derived hash fixes
both: the sketch is the k smallest normalized hashes of the distinct
values, the estimator is ``(k-1) / h_k`` (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM'02), and every step is
deterministic — DuckDB computes bit-identical sketches from the same rows.

Why a sketch at all, at 100 TB: the k-row summary is MERGEABLE.  Store one
sketch per partition (day, source) and the distinct count over any
partition union is re-ranking the unioned sketch rows — k·partitions rows,
no rescan of the data.  ``kmv_sketch`` → per-group sketch rows;
``kmv_estimate`` → estimates from sketch rows (works on a fresh sketch or
a union of stored ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit md5 prefix normalized to (0, 1]; +1 keeps 0 out of the domain so
# the estimator never divides by zero.
_TWO_60 = float(1 << 60)


def _hash01(col: Column) -> Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("double")
        + 1.0
    ) / F.lit(_TWO_60)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest (normalized md5) hashes of the
    group's distinct values — (group..., __h, __rn) rows, ≤ k per group.

    One distinct + one window rank, both keyed on the group columns; the
    second reuses the first's partitioning.  Ties (astronomically unlikely
    at 60 bits) break on the value itself, keeping the sketch
    deterministic."""
    distinct_vals = df.select(*group_cols, value_col).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h", value_col)
    return (
        distinct_vals.withColumn("__h", _hash01(F.col(value_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(*group_cols, "__h", "__rn")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimates from sketch rows: ``(k-1)/h_k`` when the
    group filled its sketch, else the exact count (a sketch with < k rows
    saw every distinct value).  Accepts a union of stored sketches — rows
    re-rank here, so merged estimates need no access to the raw data."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    reranked = sketch.withColumn("__merged_rn", F.row_number().over(w)).where(
        F.col("__merged_rn") <= k
    )
    return reranked.groupBy(*group_cols).agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise((k - 1) / F.max(F.when(F.col("__merged_rn") == k, F.col("__h"))))
        .alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Sketch + estimate in one call: (group..., est_distinct)."""
    return kmv_estimate(kmv_sketch(df, value_col, group_cols, k), group_cols, k)


def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Row-seeded md5 bucket for the count-min sketch (independent hash
    per row via the seed prefix; 32-bit prefix is ample for small widths)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}:"), value.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch of ``value_col`` occurrence counts as
    (row, bucket, c) cells — depth × width longs total.

    Like the KMV sketch above, this is deterministic (md5-derived row
    hashes, so any engine reproduces it bit-for-bit — HLL/DataSketches
    estimates are engine-private) and MERGEABLE: cells add, so per-day or
    per-source sketches stored at ingest answer frequency queries over
    any partition union without rescanning data.  Build cost is one
    explode to depth rows per input row plus one (row, bucket)-keyed
    aggregation with map-side partials — the shuffle moves at most
    depth × width rows per map task."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_bucket(F.col(value_col), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows of the key's cell
    — the classic one-sided guarantee (est ≥ true count, overestimate
    bounded by collisions).  The sketch is depth × width rows, so it
    broadcasts; per-key cost is ``depth`` broadcast-hash lookups and a
    min aggregate keyed on the probe key."""
    probes = keys.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_bucket(F.col(value_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(value_col, "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(value_col)
        .agg(F.min("c").alias("cms_est"))
    )


def _bloom_bit(value: Column, row: int, bits: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{row}:"), value.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % bits
    )


def bloom_build(
    df: DataFrame, value_col: str, depth: int = 3, bits: int = 256
) -> DataFrame:
    """Bloom membership filter as a DataFrame of DISTINCT set bit
    positions (≤ ``bits`` rows) — deterministic md5 row hashes, so any
    engine rebuilds it exactly, and MERGEABLE by plain union+distinct
    (bitwise OR).  The classic use at 100 TB is shuffle-side pruning: a
    bloom of the small side's join keys broadcast to the fact scan
    discards non-joining rows before the exchange (what Spark's runtime
    bloom join does internally — this is the storable, per-partition
    version)."""
    positions = F.explode(
        F.array(*[_bloom_bit(F.col(value_col), i, bits) for i in range(depth)])
    )
    return df.select(positions.alias("bit")).distinct()


def bloom_query(
    bloom: DataFrame,
    keys: DataFrame,
    value_col: str,
    depth: int = 3,
    bits: int = 256,
) -> DataFrame:
    """Probe: a key is ``in_bloom`` iff ALL its ``depth`` bit positions
    are set — no false negatives ever, false-positive rate set by the
    load factor.  The filter is ≤ ``bits`` rows, so it broadcasts; the
    probe is a broadcast left join + an all-bits-present aggregate keyed
    on the probe key."""
    probes = keys.select(
        value_col,
        F.explode(
            F.array(*[_bloom_bit(F.col(value_col), i, bits) for i in range(depth)])
        ).alias("bit"),
    )
    marked = probes.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy(value_col).agg(
        (F.sum(F.coalesce(F.col("__set"), F.lit(0))) == depth).alias("in_bloom")
    )


def _topk_hashes(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Ungrouped KMV sketch: the k smallest normalized hashes of the
    distinct values, as (``__h``) rows.  ``orderBy().limit(k)`` plans as
    TakeOrderedAndProject — a distributed per-partition top-k merged on
    the driver side of the exchange, NOT a global sort."""
    return (
        df.select(F.col(value_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .select(_hash01(F.col("__v")).alias("__h"))
        .orderBy("__h")
        .limit(k)
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge stored KMV sketch rows back into a valid ≤k-row sketch per
    group — the mergeability that justifies storing sketches at all: a
    union of per-partition (per-day, per-source) sketch tables re-ranks
    to the union's sketch without rescanning any input.  Correct because
    the union's k minima are a subset of the member sketches' minima.
    Input needs only (group..., __h) rows; __rn is recomputed."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        sketches.select(*group_cols, "__h").distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )


def kmv_set_estimates_from_sketches(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """The composable form of :func:`kmv_set_estimates`: identical
    estimates, computed FROM STORED SKETCH ROWS (``__h`` columns, ≤ k
    rows per side) with no rescan of the raw inputs and no driver-side
    set algebra — everything is DataFrame aggregation, so it runs
    wherever the sketch tables live.  This is the shape a 100 TB
    profiler actually uses: build per-slice sketches once
    (:func:`kmv_sketch`), persist them, and answer any cross-slice
    union/intersection/Jaccard question later at ≤ 2k-row cost.

    Plan shape: tag + union the two sketches' hashes, merge flags per
    hash (one tiny aggregation), take the union's k minima via
    ``orderBy().limit(k)`` (TakeOrderedAndProject — no global sort),
    then two scalar aggregations combined on one row.  The side
    estimates read each sketch's own count/threshold, so a sketch that
    never filled short-circuits to its exact count, matching
    ``kmv_set_estimates`` bit-for-bit."""
    a = sketch_a.select(F.col("__h").alias("hh"),
                        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b = sketch_b.select(F.col("__h").alias("hh"),
                        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        a.unionByName(b)
        .groupBy("hh")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    side = merged.agg(
        F.sum("in_a").alias("n_a"),
        F.max(F.when(F.col("in_a") == 1, F.col("hh"))).alias("max_a"),
        F.sum("in_b").alias("n_b"),
        F.max(F.when(F.col("in_b") == 1, F.col("hh"))).alias("max_b"),
    )
    union_topk = merged.orderBy("hh").limit(k)
    ustats = union_topk.agg(
        F.count(F.lit(1)).alias("n_union_rows"),
        F.max("hh").alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    def _est(n, mx):
        return F.when(n < k, n.cast("double")).otherwise(F.lit(float(k - 1)) / mx)

    filled = F.col("n_union_rows") >= k
    return side.crossJoin(ustats).select(
        _est(F.col("n_a"), F.col("max_a")).alias("est_a"),
        _est(F.col("n_b"), F.col("max_b")).alias("est_b"),
        F.when(~filled, F.col("n_union_rows").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("h_k"))
        .alias("est_union"),
        F.when(~filled, F.col("n_both").cast("double"))
        .otherwise(
            F.col("n_both") / F.col("n_union_rows")
            * (F.lit(float(k - 1)) / F.col("h_k"))
        )
        .alias("est_intersection"),
        F.coalesce(
            F.col("n_both") / F.col("n_union_rows"), F.lit(0.0)
        ).alias("jaccard_est"),
    )


def kmv_set_estimates(
    df_a: DataFrame, df_b: DataFrame, value_col: str, k: int = 64
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS from two KMV sketches: one row
    ``(est_a, est_b, est_union, est_intersection, jaccard_est)``.

    The union sketch is the k smallest of the two sketches' hash union
    (valid because the union's k minima are a subset of A's k minima ∪
    B's k minima); its threshold h_k estimates ``|A∪B| ≈ (k-1)/h_k``.
    Every union-sketch hash is below BOTH per-sketch thresholds (each
    sketch's own k-th minimum is ≥ the union's), so membership of a
    union-sketch hash in A or B is decidable from the sketches alone —
    the fraction ρ present in both estimates ``|A∩B| ≈ ρ·|A∪B|`` and
    ``J(A,B) ≈ ρ`` (Beyer et al., SIGMOD'07).  Sketches that never fill
    (fewer than k distinct values) short-circuit to exact counts.

    At scale: each side costs one distinct + one distributed top-k scan
    of its input — exactly once, because the ≤ k hash minima then come
    to the driver as scalar state (the same discipline as k-means
    centroids; 2k doubles, no cached DataFrames pinning executor
    storage) and the set algebra runs on those scalars.
    """
    ha = [r["__h"] for r in _topk_hashes(df_a, value_col, k).collect()]
    hb = [r["__h"] for r in _topk_hashes(df_b, value_col, k).collect()]

    def est(hashes: list[float]) -> float:
        if len(hashes) < k:
            return float(len(hashes))
        return (k - 1) / max(hashes)

    union = sorted(set(ha) | set(hb))[:k]
    set_a, set_b = set(ha), set(hb)
    n_union_rows = len(union)
    n_both = sum(1 for h in union if h in set_a and h in set_b)
    if n_union_rows < k:
        est_union = float(n_union_rows)
        est_inter = float(n_both)
    else:
        h_k = union[-1]
        est_union = (k - 1) / h_k
        est_inter = n_both / n_union_rows * ((k - 1) / h_k)
    jaccard = n_both / n_union_rows if n_union_rows else 0.0
    spark = df_a.sparkSession
    return spark.createDataFrame(
        [(est(ha), est(hb), est_union, est_inter, jaccard)],
        "est_a double, est_b double, est_union double, "
        "est_intersection double, jaccard_est double",
    )


# --------------------------------------------------------------- HLL

# HyperLogLog (Flajolet et al., AofA'07) with the SAME determinism
# discipline as KMV/CMS/Bloom above: the register function is md5-derived
# (any engine rebuilds the registers bit-for-bit — Spark's built-in
# approx_count_distinct is HLL++ but its estimate is engine-private), and
# the harmonic sum is computed as an EXACT INTEGER (sum of 2^(Q-rho) in
# BIGINT) so the estimate is identical regardless of aggregation order —
# a float sum of 2^-rho terms spans > 53 bits of exponent and would be
# order-dependent.  rho is derived from TRAILING zeros of the remaining
# hash bits (equivalent distribution to leading zeros; cross-engine
# computable as log2(x & -x), exact on powers of two).
_HLL_HASH_BITS = 60  # md5 15-hex-digit prefix


def _hll_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Per-group HLL registers: (group..., idx, rho) with ≤ 2^p rows per
    group.  idx = low p hash bits; rho = trailing-zero count of the
    remaining 60-p bits + 1 (capped when they are all zero).  Build cost
    is one aggregation keyed on (group, idx) with map-side partial MAX —
    the shuffle moves at most 2^p rows per group per map task, the
    property that makes HLL THE cardinality sketch at 100 TB."""
    m = 1 << p
    q = _HLL_HASH_BITS - p
    h = _hll_hash(F.col(value_col))
    rem = F.shiftright(h, p)
    rho = F.when(rem == 0, F.lit(q + 1)).otherwise(
        (F.floor(F.log2(rem.bitwiseAND(-rem))) + 1).cast("int")
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, (h % m).alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge stored register tables: registers combine by MAX per (group,
    idx) — per-slice sketches persisted at ingest answer any cross-slice
    cardinality question later without rescanning data."""
    return sketches.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Cardinality estimates from register rows: the classic HLL
    estimator ``alpha_m * m^2 / sum(2^-rho_j)`` with the small-range
    linear-counting correction (``m * ln(m/V)`` when raw ≤ 2.5m and V
    empty registers remain).  The harmonic sum is assembled as an exact
    BIGINT — ``sum(2^(Q+1-rho))`` plus ``2^(Q+1)`` per empty register —
    then divided once, so the result is order-independent and
    cross-engine reproducible."""
    m = 1 << p
    q = _HLL_HASH_BITS - p
    scale = float(1 << (q + 1))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.expr(f"shiftleft(1L, {q + 1} - rho)")).alias("s_nonempty"),
    )
    s_total = (
        F.col("s_nonempty") + (F.lit(m) - F.col("n_regs")) * F.lit(1 << (q + 1))
    ).cast("double")
    raw = F.lit(alpha * m * m * scale) / s_total
    v = (F.lit(m) - F.col("n_regs")).cast("double")
    est = F.when((raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(m / v)).otherwise(
        raw
    )
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


# ------------------------------------------------------- histogram

def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bin_width: float,
) -> DataFrame:
    """Fixed-width histogram sketch: (group..., bin, cnt) rows with
    ``bin = floor(value / bin_width)``.  The mergeable quantile
    counterpart of the KMV/HLL sketches above: per-slice histograms add
    (sum cnt per bin), so stored per-day sketches answer percentile
    questions over any slice union without rescanning — and unlike
    t-digest/GK the state is deterministic and engine-agnostic, so it
    sits behind a differential oracle.  Build = one (group, bin)-keyed
    aggregation with map-side partials; rows per group ≤ value range /
    bin_width (the caller's accuracy/space dial)."""
    binned = F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width)))
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, binned.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge stored histograms: counts add per (group, bin)."""
    return sketches.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    bin_width: float,
) -> DataFrame:
    """Quantile estimates from histogram rows: cumulative counts over
    the bin order (per-group window — state is the group's bin count),
    then linear interpolation inside the bin containing rank ``q * N``:
    ``est = bin*w + (t - cum_before) / cnt * w``.  Returns one row per
    (group, q).  Every step is exact integer/double arithmetic on the
    sketch — cross-engine deterministic, order-independent."""
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("cnt"))
        .withColumn("n_total", F.sum("cnt").over(Window.partitionBy(*group_cols)))
    )
    qdf = cum.select(
        *group_cols,
        "bin",
        "cnt",
        "cum",
        "cum_before",
        "n_total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        # clamp the target rank above zero: at q=0, t=0 satisfies no bin
        # (first bin has cum_before=0, and 0 < 0 is false) and the
        # requested quantile would silently vanish from the output; the
        # epsilon lands it in the first bin = the distribution minimum
    ).withColumn(
        "t", F.greatest(F.col("q") * F.col("n_total"), F.lit(1e-9))
    )
    hit = qdf.where(
        (F.col("cum") >= F.col("t")) & (F.col("cum_before") < F.col("t"))
    )
    est = (
        F.col("bin") * F.lit(float(bin_width))
        + (F.col("t") - F.col("cum_before"))
        / F.col("cnt")
        * F.lit(float(bin_width))
    )
    return hit.select(*group_cols, "q", est.alias("quantile_est"))
