"""Event-stream queries over the ``events`` table
(``event_id, ts, user_id, event_type, value, props``): as-of join,
gap-based sessionization, range join, and JSON property extraction —
the time-series operators a training-data / clickstream pipeline needs
that plain TPC-H shapes don't cover.

Scale design notes:

- **As-of join without a join**: the classic as-of (each probe row matched
  to the latest reference row at-or-before it) is expressed as a union of
  the two tagged streams + one ``last(ignorenulls)`` running window per
  user — a single shuffle on the (high-cardinality) user key, no
  candidate-pair blowup, no range-join quadratic.  The DuckDB oracle uses
  its native ``ASOF JOIN`` — two completely different implementations that
  must agree bit-for-bit.
- **Sessionization** is two windows + one groupBy, all partitioned by
  user_id; this is the batch twin of the Structured Streaming
  session-window operator in ``streaming/``.
- **Range join**: band tables are tiny by nature — broadcast them and let
  the non-equi predicate evaluate map-side; never shuffle the fact table
  for a 4-row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import read_events


def _orders(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    return spark.read.parquet(f"{sf_dir}/orders.parquet")

QUERIES = {}
ORACLE = {}


def register(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return wrap


@register(
    "evt_asof_last_purchase",
    """
    SELECT e.event_id, e.user_id,
           p.event_id AS purchase_event_id,
           (epoch_us(e.ts) - epoch_us(p.ts)) / 1000000 AS secs_since_purchase
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (
        SELECT user_id, event_id, ts FROM (
            SELECT user_id, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def evt_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the same user's most recent
    purchase at-or-before it.  Implemented join-free: tag the two streams,
    union, and run one ``last(ignorenulls)`` window ordered by (ts, tag) —
    purchases sort before errors on ts ties so equality matches, and
    same-timestamp purchases keep the max event_id (mirrored in the
    oracle's dedup subquery so both sides are deterministic)."""
    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("p_event_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("p_event_id"),
        "event_id",
    )
    merged = purchases.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "p_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("tag") == 0, F.struct("ts", "p_event_id")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("lp", last_purchase)
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("lp.p_event_id").alias("purchase_event_id"),
            (
                (F.unix_micros("ts") - F.unix_micros("lp.ts")) / F.lit(1000000)
            ).alias("secs_since_purchase"),
        )
    )


@register(
    "evt_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx, COUNT(*) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000 AS duration_secs,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
    FROM numbered GROUP BY user_id, session_idx
    """,
)
def evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity): lag to flag session
    starts, running sum to number sessions, one groupBy for per-session
    stats.  Everything partitions by user_id — the same key end-to-end, so
    Catalyst plans a single exchange for all three steps."""
    ev = read_events(spark, sf_dir)
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_sum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Microsecond-exact gap: casting timestamps to long would truncate to
    # seconds and disagree with the oracle on gaps straddling the boundary.
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_lag)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn("session_idx", F.sum("new_session").over(w_sum))
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1000000)
        ).alias("duration_secs"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("session_value"),
    )


_BANDS = [(0.0, 2.5, "low"), (2.5, 5.0, "mid"), (5.0, 7.5, "high"), (7.5, 1e9, "top")]
_BANDS_SQL = ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in _BANDS)


@register(
    "evt_range_join_bands",
    f"""
    SELECT b.band, e.event_type, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES {_BANDS_SQL}) b(lo, hi, band)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band, e.event_type
    """,
)
def evt_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a band dimension: broadcast the 4-row band table
    and evaluate the interval predicate map-side (BroadcastNestedLoopJoin
    over a tiny build side = a filtered cross of 4 rows — the correct plan;
    shuffling the fact table here would be the mistake)."""
    ev = read_events(spark, sf_dir)
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "evt_json_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(*), 4) AS DOUBLE) AS avg_value
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS INT) // 10
    """,
)
def evt_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a property out of the JSON string
    column with the native ``get_json_object`` (JVM-side, codegen'd — not a
    Python UDF) and aggregate by its bucket."""
    ev = read_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(F.floor(k / 10).cast("bigint").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")) / F.count(F.lit(1)), 4
            )
            .cast("double")
            .alias("avg_value"),
        )
    )


@register(
    "evt_salted_hotkey_agg",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MIN(user_id) AS min_user,
           MAX(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
)
def evt_salted_hotkey_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via salting: event_type has only 5 distinct
    values, so a direct groupBy funnels the whole table into 5 reducers.
    The salted two-stage plan splits each key across 16 sub-groups first;
    the oracle is the plain GROUP BY — salting must not change results."""
    from ..operators.skew import salted_agg

    ev = read_events(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", F.lit(1)),
            "total_value_dec": ("sum", F.col("value_dec")),
            "min_user": ("min", F.col("user_id")),
            "max_user": ("max", F.col("user_id")),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
        "min_user",
        "max_user",
    )


@register(
    "evt_lag_delta",
    """
    SELECT event_id, user_id,
           CAST(ROUND(CAST(value AS DECIMAL(18,2))
                - LAG(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS DOUBLE)
               AS value_delta
    FROM events
    """,
)
def evt_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag delta — the lag/lead analytic family over the event
    stream, partitioned by the high-cardinality user key (no global
    window), ties broken by event_id."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        F.round(v - F.lag(v).over(w), 2).cast("double").alias("value_delta"),
    )


@register(
    "evt_gap_fill_daily",
    """
    WITH bounds AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY user_id
    ),
    days AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
        FROM bounds
    ),
    counts AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
           COALESCE(c.n, 0) AS n_events,
           CAST(COALESCE(ROUND(c.v, 2), 0) AS DOUBLE) AS total_value
    FROM days d LEFT JOIN counts c ON d.user_id = c.user_id AND d.day = c.day
    """,
)
def evt_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense daily spine per user (sequence +
    explode between each user's first and last activity) left-joined
    against the real daily aggregates, zeros filled in — the densification
    every ML feature pipeline needs before rolling windows.  Both the spine
    and the aggregate shuffle on (user_id[, day]) so the join's exchanges
    align; spine size is users x span, never events x span."""
    ev = read_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    counts = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("v")
    )
    return (
        spine.join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce(F.round("v", 2), F.lit(0)).cast("double").alias("total_value"),
        )
    )


@register(
    "evt_multi_grain_rollup",
    """
    SELECT grain,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM (
        SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type, value
        FROM events
        UNION ALL
        SELECT 'day', date_trunc('day', ts), event_type, value FROM events
    )
    GROUP BY grain, bucket, event_type
    """,
)
def evt_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same event stream
    aggregated at BOTH hourly and daily grain in one job — the
    materialization a time-series store keeps per retention tier.  Spark
    side: one scan, a grain-tagged explode (2 rows/event), one shuffle on
    (grain, bucket, type) with map-side partials; at 100 TB you'd write
    each grain out partitioned by bucket date and serve queries from the
    coarsest grain that answers them.  Decimal partial sums keep the
    distributed totals exact."""
    ev = read_events(spark, sf_dir)
    tagged = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hour").alias("grain"),
                    F.date_trunc("hour", F.col("ts")).alias("bucket"),
                ),
                F.struct(
                    F.lit("day").alias("grain"),
                    F.date_trunc("day", F.col("ts")).alias("bucket"),
                ),
            )
        ).alias("g"),
        "event_type",
        "value",
    )
    return (
        tagged.select("g.grain", "g.bucket", "event_type", "value")
        .groupBy("grain", "bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "grain",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type", "n_events", "total_value",
        )
    )


@register(
    "evt_rolling_7d_avg",
    """
    WITH bounds AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY user_id
    ),
    days AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
        FROM bounds
    ),
    daily AS (
        SELECT d.user_id, d.day,
               COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))), 0) AS v
        FROM days d
        LEFT JOIN events e
          ON e.user_id = d.user_id AND CAST(e.ts AS DATE) = d.day
        GROUP BY d.user_id, d.day
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(ROUND(AVG(CAST(v AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
               AS avg_7d
    FROM daily
    """,
)
def evt_rolling_7d_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of per-user daily value — composed on the
    gap-filled dense spine, which is what makes the cheap ROWS frame
    equal a calendar window (on sparse data a ROWS frame spans variable
    time and a RANGE-interval frame costs more); zero-activity days pull
    the average down correctly instead of being skipped.  One shuffle on
    user_id serves the spine join, the daily aggregate, and the window."""
    ev = read_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = (
        spine.join(ev, ["user_id", "day"], "left")
        .groupBy("user_id", "day")
        .agg(F.coalesce(F.sum("v"), F.lit(0).cast("decimal(18,2)")).alias("v"))
    )
    w = (
        Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.avg(F.col("v").cast("double")).over(w), 4).alias("avg_7d"),
    )


def _morton_sql(a: str, b: str, bits: int) -> str:
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        # parenthesize the whole shift: DuckDB binds + tighter than <<
        terms.append(f"(((({a} & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "evt_zorder_codes",
    f"""
    SELECT event_id, {_morton_sql('user_id', 'event_id', 8)} AS zcode
    FROM events
    """,
)
def evt_zorder_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) codes over (user_id, event_id) — the interleaved
    sort key behind multi-dimensional data layout (``plans/writer.
    write_zorder_table``): sorting files by this code bounds every file's
    min/max on BOTH columns, so footer statistics prune scans filtered on
    either.  The bit interleave is a fixed shift/mask expression tree
    (codegen, no UDF) that DuckDB reproduces with identical integer
    arithmetic."""
    from ..functions.layout import morton_code

    return read_events(spark, sf_dir).select(
        "event_id", morton_code("user_id", "event_id", bits=8).alias("zcode")
    )


@register(
    "evt_signup_funnel",
    """
    WITH first_signup AS (
        SELECT user_id, MIN(ts) AS signup_ts
        FROM events WHERE event_type = 'signup'
        GROUP BY user_id
    ),
    converted AS (
        SELECT DISTINCT f.user_id
        FROM first_signup f JOIN events p
          ON p.user_id = f.user_id
         AND p.event_type = 'purchase'
         AND p.ts >  f.signup_ts
         AND p.ts <= f.signup_ts + INTERVAL 7 DAY
    )
    SELECT date_trunc('week', f.signup_ts) AS signup_week,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
           ROUND(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS conversion
    FROM first_signup f LEFT JOIN converted c ON c.user_id = f.user_id
    GROUP BY 1
    """,
)
def evt_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel: each user's FIRST signup, a
    7-day conversion window, weekly rollup.  First-signup is a pre-join
    aggregate (shrinks the fact before any join); the conversion check is
    an interval semi-join keyed on user_id — both shuffles share the
    user_id key so AQE coalesces them; no window over a global
    ordering."""
    ev = read_events(spark, sf_dir)
    first_signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        first_signup.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .select("user_id")
        .withColumn("__conv", F.lit(1))
    )
    return (
        first_signup.join(converted, "user_id", "left")
        .groupBy(F.date_trunc("week", "signup_ts").alias("signup_week"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.coalesce(F.col("__conv"), F.lit(0))).alias("n_converted"),
            F.round(
                F.sum(F.coalesce(F.col("__conv"), F.lit(0))) * 1.0 / F.count(F.lit(1)), 4
            ).alias("conversion"),
        )
    )


@register(
    "evt_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
               AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def evt_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity
    week, counted distinct in every later week offset.  Both inputs
    aggregate per user BEFORE the join (firsts is one row per user,
    activity one row per user-week), so the join never touches raw event
    volume — the shape that holds when events are 10^12 rows but users
    are 10^8."""
    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "evt_sliding_window_counts",
    """
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM (
        SELECT make_timestamp((epoch_us(ts) // 300000000 - j) * 300000000)
                   AS win_start,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS j)
    )
    GROUP BY win_start, event_type
    """,
)
def evt_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10-minute length, 5-minute slide) —
    the overlapping-window aggregation monitoring pipelines live on, where
    tumbling buckets miss bursts that straddle a boundary.  Spark's native
    ``window(ts, '10 minutes', '5 minutes')`` expands each event into its
    two containing windows before one (window, type)-keyed aggregation
    with map-side decimal partials — cost is slide-factor × events, not a
    self-join.  The oracle derives the same two window starts per event
    arithmetically (floor to the slide grid, minus one slide step), so
    both engines must agree on every overlapping bucket."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "evt_asof_tolerance",
    """
    SELECT event_id, user_id,
           CASE WHEN secs_since_purchase <= 86400 THEN purchase_event_id END
               AS purchase_event_id,
           CASE WHEN secs_since_purchase <= 86400 THEN secs_since_purchase END
               AS secs_since_purchase
    FROM (
        SELECT e.event_id, e.user_id,
               p.event_id AS purchase_event_id,
               (epoch_us(e.ts) - epoch_us(p.ts)) / 1000000 AS secs_since_purchase
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (
            SELECT user_id, event_id, ts FROM (
                SELECT user_id, event_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    )
    """,
)
def evt_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas ``merge_asof(tolerance=)``
    semantics): each error matches the same user's most recent purchase
    at-or-before it ONLY if that purchase is within 24 hours; staler
    matches null out.  The plan is the identical join-free tagged-union +
    one ``last(ignorenulls)`` window as ``evt_asof_last_purchase`` — the
    tolerance is a post-window predicate, so bounding the lookback costs
    ZERO extra shuffles (a naive range-join formulation would instead
    expand every error × in-window purchase pair).  The oracle applies
    the same bound on top of DuckDB's native ASOF JOIN."""
    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("p_event_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("p_event_id"),
        "event_id",
    )
    merged = purchases.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "p_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.last(
        F.when(F.col("tag") == 0, F.struct("ts", "p_event_id")), ignorenulls=True
    ).over(w)
    secs = (F.unix_micros("ts") - F.unix_micros("lp.ts")) / F.lit(1000000)
    within = secs <= 86400
    return (
        merged.withColumn("lp", last_purchase)
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.when(within, F.col("lp.p_event_id")).alias("purchase_event_id"),
            F.when(within, secs).alias("secs_since_purchase"),
        )
    )


@register(
    "join_salted_hotkey",
    """
    SELECT e.event_id, e.user_id % 25 AS nation_key, n.n_name AS nation_name
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    """,
)
def join_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew JOIN under the oracle (the agg twin is
    ``evt_salted_hotkey_agg``): every event joins a 25-row dimension on a
    deliberately hot key (user_id mod 25 — at 100 TB each key would land
    its whole fact volume on one reducer).  ``operators/skew.salted_join``
    replicates the dimension across 8 salts and spreads each fact row
    over them, so a hot key occupies 8 shuffle partitions instead of 1;
    the join OUTPUT is provably identical to the unsalted join, which is
    exactly what the DuckDB oracle states.  The salt draw uses
    monotonically_increasing_id — partition-order dependent, but the
    output is salt-invariant because the dimension carries every salt."""
    from ..operators.skew import salted_join

    from .util import t as t_

    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", (F.col("user_id") % 25).alias("nation_key")
    )
    nation = t_(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nation_key"),
        F.col("n_name").alias("nation_name"),
    )
    return salted_join(ev, nation, on=["nation_key"], n_salts=8).select(
        "event_id", "nation_key", "nation_name"
    )


@register(
    "evt_range_frame_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS trailing_7d_value
    FROM events
    """,
)
def evt_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each event's trailing-7-day value sum per
    user, frame bounded by event TIME, not row count — the windowing
    feature ROWS frames can't express on irregular event streams (a
    user's frame holds however many events fall in the week).  Spark's
    rangeBetween needs a numeric ordering key, so ts becomes epoch
    seconds with a [-604800, 0] frame — semantically identical to the
    oracle's native INTERVAL frame.  One exchange on user_id; decimal
    sums keep every frame order-independent.  Ties on ts are frame-
    equivalent by RANGE semantics (peers share the frame), so no
    tie-break is needed for determinism."""
    ev = read_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts") / 1_000_000)
        .rangeBetween(-604800, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_value"),
    )


@register(
    "evt_asof_next_purchase",
    """
    SELECT e.event_id, e.user_id,
           p.event_id AS next_purchase_event_id,
           (epoch_us(p.ts) - epoch_us(e.ts)) / 1000000 AS secs_until_purchase
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (
        SELECT user_id, event_id, ts FROM (
            SELECT user_id, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ) p ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
)
def evt_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each error event matched to the same user's
    earliest purchase at-or-after it (the "time-to-conversion" shape).
    Same join-free plan as the backward as-of — tagged union + ONE
    ``first(ignorenulls)`` window over [current, unbounded following] per
    user — errors sort before purchases on ts ties so equality matches,
    and same-timestamp purchases keep the MIN event_id (mirrored in the
    oracle's dedup subquery).  The oracle uses DuckDB's native forward
    ``ASOF JOIN ... ON e.ts <= p.ts`` — two different implementations
    that must agree bit-for-bit."""
    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("event_id").alias("p_event_id"),
        F.lit(None).cast("long").alias("event_id"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("p_event_id"),
        "event_id",
    )
    merged = purchases.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "p_event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    next_purchase = F.first(
        F.when(F.col("tag") == 1, F.struct("ts", "p_event_id")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("np", next_purchase)
        .where(F.col("tag") == 0)
        .select(
            "event_id",
            "user_id",
            F.col("np.p_event_id").alias("next_purchase_event_id"),
            (
                (F.unix_micros("np.ts") - F.unix_micros("ts")) / F.lit(1000000)
            ).alias("secs_until_purchase"),
        )
    )


@register(
    "evt_rate_limit_first_n",
    """
    SELECT event_id, user_id, day_bucket, rk FROM (
        SELECT event_id, user_id,
               date_trunc('day', ts) AS day_bucket,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id) AS rk
        FROM events
    ) WHERE rk <= 3
    """,
)
def evt_rate_limit_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate limiting: keep the FIRST 3 events per (user, day) —
    the batch twin of an ingest throttle / bot-traffic cap.  The bounded
    rank rides the two-phase WindowGroupLimit rewrite, so each map task
    pre-limits to 3 rows per (user, day) before the exchange: at 100 TB
    a hot key ships k rows per task, not its whole flood — the same
    anti-skew property as the salted aggregations, obtained purely from
    the plan shape."""
    ev = read_events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    rk = F.row_number().over(
        Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    )
    return (
        ev.select(
            "event_id", "user_id", day.alias("day_bucket"), rk.alias("rk")
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "evt_anomaly_mad",
    """
    WITH m AS (
        SELECT event_id, user_id, value,
               quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
        FROM events
    ),
    d AS (
        SELECT event_id, user_id, value, med,
               quantile_cont(abs(value - med), 0.5)
                   OVER (PARTITION BY user_id) AS mad
        FROM m
    )
    SELECT event_id, user_id, value,
           ROUND(med, 4) AS med, ROUND(mad, 4) AS mad
    FROM d
    WHERE mad > 0 AND abs(value - med) > 3 * mad
    """,
)
def evt_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly detection: flag events whose value deviates
    from the user's MEDIAN by more than 3x the median absolute deviation —
    the outlier rule that, unlike z-scores, is not itself dragged by the
    outliers.  Two exact-percentile window passes share the SAME user_id
    partitioning, so Catalyst plans a single exchange; at 100 TB this is
    one shuffle keyed on the high-cardinality user key, and the output is
    bounded by the anomalies.  Exact interpolated percentiles
    (``percentile`` == DuckDB ``quantile_cont``) keep both engines
    bit-identical."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    med = F.expr("percentile(value, 0.5)").over(w)
    step = ev.select("event_id", "user_id", "value", med.alias("med"))
    mad = F.expr("percentile(abs(value - med), 0.5)").over(w)
    return (
        step.withColumn("mad", mad)
        .where((F.col("mad") > 0) & (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")))
        .select(
            "event_id", "user_id", "value",
            F.round("med", 4).alias("med"), F.round("mad", 4).alias("mad"),
        )
    )


@register(
    "evt_ewma_applyinpandas",
    """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM events
    ),
    ew AS (
        SELECT user_id, event_id, value, rk, value AS ewma
        FROM seq WHERE rk = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.value, s.rk,
               0.3 * s.value + 0.7 * e.ewma
        FROM ew e JOIN seq s ON s.user_id = e.user_id AND s.rk = e.rk + 1
    )
    SELECT user_id, event_id, value, ewma FROM ew
    """,
)
def evt_ewma_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.3) via grouped-map ``applyInPandas`` — the
    one operator family where a Python loop is the RIGHT tool (see
    ``operators/misc.ewma_per_key``).  The DuckDB oracle replays the same
    recurrence as a recursive CTE; both run the identical IEEE double
    sequence in event order, so the match is bit-for-bit with no
    rounding."""
    from ..operators.misc import ewma_per_key

    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = ewma_per_key(
        ev, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value", alpha=0.3,
    )
    return out.select("user_id", "event_id", "value", "ewma")


@register(
    "evt_native_session_window",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS session_value
    FROM numbered GROUP BY user_id, session_idx
    """,
)
def evt_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN ``session_window(ts, '30 minutes')`` in batch mode,
    checked against the same gaps-and-islands oracle that gates the
    hand-rolled ``evt_sessionize`` — proving the native operator and the
    window formulation implement identical session semantics (same gap
    rule, same boundary inclusivity).  The native form is ONE aggregation
    (Spark merges overlapping session intervals internally) versus the
    two windows + groupBy of the manual twin; both shuffle once on
    user_id."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")), 2
            ).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "evt_window_distinct_users",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def evt_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count inside event-time windows (unique users per hour
    per type) — the cardinality-per-window shape dashboards run
    constantly.  Spark plans COUNT(DISTINCT) as the two-phase expand
    (partial dedup on (window, type, user) then count) — map-side
    combining bounds the exchange by distinct combinations, not events.
    The streaming twin needs dropDuplicates-then-count or an approx
    sketch (``sketch_kmv_distinct`` here); exact windowed distinct is a
    batch operator by nature."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "n_users",
        )
    )


@register(
    "evt_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead-pair counts row-normalized into transition
    probabilities — the behavioral-sequence summary (and feature
    extractor) clickstream pipelines compute constantly.  One user-keyed
    window builds the bigrams, one aggregation counts them (exchange
    bounded by |types|², not events), and the normalizing window runs on
    the tiny counts table.  The probability is an exact integer ratio in
    double — identical on both engines."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(norm), 6).alias("p"),
    )


@register(
    "evt_top_types_per_window",
    """
    SELECT window_start, event_type, n_events, rk FROM (
        SELECT window_start, event_type, n_events,
               ROW_NUMBER() OVER (PARTITION BY window_start
                                  ORDER BY n_events DESC, event_type) AS rk
        FROM (
            SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                   event_type, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        )
    ) WHERE rk <= 2
    """,
)
def evt_top_types_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending analysis: top-2 event types per 6-hour window — the
    "what's hot right now" query every activity dashboard runs.  The
    rank runs on the already-aggregated (window, type) counts, so the
    bounded rank's WindowGroupLimit pre-limit operates on a table whose
    size is windows x types — at 100 TB the expensive part (counting)
    is one map-side-combined aggregation and the ranking is free."""
    ev = read_events(spark, sf_dir)
    counts = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), "event_type"
        )
    )
    return counts.withColumn("rk", rk).where(F.col("rk") <= 2)


@register(
    "evt_funnel_attribution",
    """
    WITH purchases AS (
        SELECT user_id, event_id AS p_id, ts AS p_ts,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, event_id AS t_id, event_type AS touch_type, ts AS t_ts
        FROM events WHERE event_type IN ('click', 'view')
    ),
    joined AS (
        SELECT p.p_id, p.v, t.touch_type, t.t_ts, t.t_id,
               COUNT(*) OVER (PARTITION BY p.p_id) AS n_touches,
               ROW_NUMBER() OVER (PARTITION BY p.p_id
                                  ORDER BY t.t_ts, t.t_id) AS rk_first,
               ROW_NUMBER() OVER (PARTITION BY p.p_id
                                  ORDER BY t.t_ts DESC, t.t_id DESC) AS rk_last
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_ts <= p.p_ts
         AND t.t_ts >  p.p_ts - INTERVAL 7 DAY
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(ROUND(SUM(CASE WHEN rk_first = 1 THEN v ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                AS DOUBLE) AS first_touch_value,
           CAST(ROUND(SUM(CASE WHEN rk_last = 1 THEN v ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
                AS DOUBLE) AS last_touch_value,
           ROUND(SUM(CAST(v AS DOUBLE) / n_touches), 2) AS linear_value
    FROM joined
    GROUP BY touch_type
    """,
)
def evt_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution — every marketing/product analytics
    pipeline's credit-assignment query: each purchase's value is
    attributed to the click/view touchpoints in its preceding 7 days
    under THREE models at once (first-touch, last-touch, linear), per
    touch type.  One pass: the purchase-touch join is driven by the
    user_id equi key (the time window rides as a residual predicate),
    then one rank window + a count window per purchase decide each
    touch's role: because (t_ts, t_id) is a total order within each
    purchase (event ids are unique), the last touch is simply the row
    whose ascending rank equals the partition's touch count, so the
    descending-ordered second window (a full extra Sort pass over the
    joined rows) is never computed.  Exact-decimal sums for the
    winner-takes-all models; the linear split is double division (each
    purchase's value divides by its own touch count) rounded at the
    end."""
    ev = read_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user_id"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    )
    w_n = Window.partitionBy("p_id")
    w_first = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    # rk_last == 1 (row_number over the DESC ordering) is equivalent to
    # rk_first == n_touches: (t_ts, t_id) totally orders each partition
    # since t_id (event_id) is unique, so the descending window — and
    # its extra full Sort of the joined rows — is eliminated.
    ranked = joined.select(
        "p_id", "v", "touch_type",
        F.count(F.lit(1)).over(w_n).alias("n_touches"),
        F.row_number().over(w_first).alias("rk_first"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return ranked.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(F.sum(F.when(F.col("rk_first") == 1, F.col("v")).otherwise(zero)), 2)
        .cast("double")
        .alias("first_touch_value"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk_first") == F.col("n_touches"), F.col("v")
                ).otherwise(zero)
            ),
            2,
        )
        .cast("double")
        .alias("last_touch_value"),
        F.round(
            F.sum(F.col("v").cast("double") / F.col("n_touches")), 2
        ).alias("linear_value"),
    )


@register(
    "sql_json_functions",
    """
    WITH j AS (
        SELECT o_orderkey,
               '{"id": ' || o_orderkey || ', "tags": ["a","b","c"], '
               || '"meta": {"pri": "' || o_orderpriority || '", "n": '
               || (o_orderkey % 5) || '}}' AS doc
        FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           CAST(json_extract_string(doc, '$.id') AS BIGINT) AS id_val,
           json_extract_string(doc, '$.meta.pri') AS pri,
           CAST(json_extract_string(doc, '$.meta.n') AS INT) AS n_val,
           json_extract_string(doc, '$.tags[0]') AS tag0,
           json_extract_string(doc, '$.tags[2]') AS tag2,
           CAST(json_array_length(doc, '$.tags') AS INT) AS n_tags,
           json_extract_string(doc, '$.missing') IS NULL AS missing_is_null,
           json_extract_string(doc, '$.id') IS NOT NULL AS has_id
    FROM j
    """,
)
def sql_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-function battery over a synthesized nested document (object,
    nested object, array): scalar extraction at top level / nested path /
    array index (0-based JSONPath in BOTH engines), array length, the
    missing-path -> NULL convention, and validity probing — the §2.10
    semi-structured surface behind `jsonstructured`/`jsonexpand*`.  All
    extraction is native `get_json_object` (JVM codegen), no UDFs."""
    o = _orders(spark, sf_dir).where(F.col("o_orderkey") <= 300)
    doc = F.concat(
        F.lit('{"id": '), F.col("o_orderkey").cast("string"),
        F.lit(', "tags": ["a","b","c"], "meta": {"pri": "'),
        F.col("o_orderpriority"),
        F.lit('", "n": '), (F.col("o_orderkey") % 5).cast("string"),
        F.lit("}}"),
    )
    j = o.select("o_orderkey", doc.alias("doc"))
    return j.select(
        "o_orderkey",
        F.get_json_object("doc", "$.id").cast("bigint").alias("id_val"),
        F.get_json_object("doc", "$.meta.pri").alias("pri"),
        F.get_json_object("doc", "$.meta.n").cast("int").alias("n_val"),
        F.get_json_object("doc", "$.tags[0]").alias("tag0"),
        F.get_json_object("doc", "$.tags[2]").alias("tag2"),
        F.json_array_length(F.get_json_object("doc", "$.tags"))
        .cast("int")
        .alias("n_tags"),
        F.get_json_object("doc", "$.missing").isNull().alias("missing_is_null"),
        # Same predicate on both sides (ADVICE r5): key presence, not
        # document validity — Spark has no native json_valid and the two
        # notions diverge on id-less or lenient-parse documents.
        F.get_json_object("doc", "$.id").isNotNull().alias("has_id"),
    )


@register(
    "sql_timestamp_functions",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS formatted,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
           CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
           CAST(EXTRACT(second FROM ts) AS INT) AS sec,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start,
           CAST(epoch_us(ts) AS BIGINT) AS micros,
           CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS secs,
           CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
                AS BIGINT) AS secs_since,
           strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS plus90m
    FROM events WHERE event_id <= 300
    """,
)
def sql_timestamp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP battery at sub-day grain: time-part extraction,
    hour/day truncation, exact microsecond epochs (the portable epoch
    primitive — second-level casts truncate and diverge), second
    differences from a fixed origin, and minute-interval arithmetic —
    the §2.10 time surface sessionization and windowing build on."""
    ev = read_events(spark, sf_dir).where(F.col("event_id") <= 300)
    ts = F.col("ts")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.date_format(ts, fmt).alias("formatted"),
        F.hour(ts).cast("int").alias("hr"),
        F.minute(ts).cast("int").alias("mi"),
        F.second(ts).cast("int").alias("sec"),
        F.date_format(F.date_trunc("hour", ts), fmt).alias("hour_start"),
        F.date_format(F.date_trunc("day", ts), fmt).alias("day_start"),
        F.unix_micros(ts).alias("micros"),
        F.floor(F.unix_micros(ts) / 1000000).cast("long").alias("secs"),
        F.floor(
            (F.unix_micros(ts)
             - F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp")))
            / 1000000
        ).cast("long").alias("secs_since"),
        F.date_format(
            ts + F.expr("INTERVAL 90 MINUTE"), fmt
        ).alias("plus90m"),
    )


@register(
    "sql_variant_type",
    """
    WITH j AS (
        SELECT o_orderkey,
               '{"id": ' || o_orderkey || ', "pri": "' || o_orderpriority
               || '", "nums": [' || (o_orderkey % 3) || ', '
               || (o_orderkey % 4) || '], "nested": {"flag": '
               || CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END
               || '}}' AS doc
        FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           CAST(json_extract_string(doc, '$.id') AS BIGINT) AS id_val,
           json_extract_string(doc, '$.pri') AS pri,
           CAST(json_extract_string(doc, '$.nums[1]') AS INT) AS num1,
           CAST(json_extract_string(doc, '$.nested.flag') AS BOOLEAN) AS flag,
           json_extract_string(doc, '$.absent') IS NULL AS absent_null
    FROM j
    """,
)
def sql_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type end-to-end: ``parse_json`` ingests the
    document into the binary semi-structured VARIANT encoding once, and
    typed ``variant_get`` path reads serve every downstream access —
    the Spark-4-native answer to repeated ``get_json_object`` string
    re-parsing (the variant is decoded once per row, then each path
    read is a binary traversal).  The oracle reads the same paths with
    DuckDB's JSON functions, proving the VARIANT round-trip preserves
    values, types, array indexing, nested paths, and the missing-path
    NULL convention."""
    o = _orders(spark, sf_dir).where(F.col("o_orderkey") <= 300)
    k = F.col("o_orderkey")
    doc = F.concat(
        F.lit('{"id": '), k.cast("string"),
        F.lit(', "pri": "'), F.col("o_orderpriority"),
        F.lit('", "nums": ['), (k % 3).cast("string"),
        F.lit(", "), (k % 4).cast("string"),
        F.lit('], "nested": {"flag": '),
        F.when(k % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("}}"),
    )
    v = o.select("o_orderkey", F.parse_json(doc).alias("v"))
    return v.select(
        "o_orderkey",
        F.try_variant_get("v", "$.id", "bigint").alias("id_val"),
        F.try_variant_get("v", "$.pri", "string").alias("pri"),
        F.try_variant_get("v", "$.nums[1]", "int").alias("num1"),
        F.try_variant_get("v", "$.nested.flag", "boolean").alias("flag"),
        F.try_variant_get("v", "$.absent", "string").isNull()
        .alias("absent_null"),
    )


@register(
    "evt_tumbling_ohlc",
    """
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           CAST(arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                        || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                        || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                AS DOUBLE) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS volume
    FROM events
    GROUP BY 1
    """,
)
def evt_tumbling_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candles per 6-hour tumbling window — the canonical
    time-series downsample (metrics, market data, sensor rollups):
    open/close via the ``min_by``/``max_by`` positional aggregates
    (Spark) against ``arg_min``/``arg_max`` (DuckDB) — a genuinely
    distinct aggregate surface the rest of the registry doesn't touch —
    plus plain min/max/count and an exact-decimal volume.  One map-side-
    combined aggregation, shuffle keyed on the window bucket.

    Determinism: the ordering key is the COMPOSITE (ts, event_id),
    encoded as a zero-padded string so both engines compare it as ONE
    scalar (DuckDB's arg_min takes scalar keys only; lexicographic on
    fixed-width digits == numeric order) — timestamp ties cannot make
    the extremal row engine-dependent."""
    def _ohlc_key():
        return F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        )

    ev = read_events(spark, sf_dir)
    w = F.window("ts", "6 hours")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.min_by("value", _ohlc_key()).cast("double").alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.max_by("value", _ohlc_key()).cast("double").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "open", "high", "low", "close", "n_events", "volume",
        )
    )


@register(
    "evt_changepoint_cusum",
    """
    WITH stats AS (
        SELECT user_id, AVG(value) AS mu FROM events GROUP BY user_id
    ),
    walk AS (
        SELECT e.user_id,
               SUM(e.value - s.mu) OVER (
                   PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                   ROWS UNBOUNDED PRECEDING) AS cusum,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS step
        FROM events e JOIN stats s USING (user_id)
    )
    , peaked AS (
        SELECT user_id, cusum, step,
               MAX(abs(cusum)) OVER (PARTITION BY user_id) AS peak
        FROM walk
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(peak), 4) AS max_abs_cusum,
           CAST(MIN(CASE WHEN abs(cusum) = peak THEN step END) AS BIGINT)
               AS changepoint_step
    FROM peaked
    GROUP BY user_id
    """,
)
def evt_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user (Page 1954 — the classic
    sequential monitoring statistic): the cumulative sum of deviations
    from the user's own mean peaks at the most likely change point; its
    peak magnitude is the alarm statistic drift monitors threshold on.
    Everything partitions by user_id — mean, running walk, and peak all
    share one shuffle key, so the operator scales with users, never
    globally.  The peak step is tie-broken toward the EARLIEST
    occurrence: an unordered per-user max window finds the peak
    magnitude, and MIN(step) over the rows attaining it picks the step —
    equality against the peak is exact because both values come from
    the same deterministic running-sum sequence (DuckDB's arg_max takes
    scalar keys only, so the two-phase form is the portable one)."""
    ev = read_events(spark, sf_dir)
    mu = ev.groupBy("user_id").agg(F.avg("value").alias("mu"))
    w_walk = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    walk = (
        ev.join(mu, "user_id")
        .select(
            "user_id",
            F.sum(F.col("value") - F.col("mu")).over(w_walk).alias("cusum"),
            F.row_number().over(w_rank).alias("step"),
        )
    )
    w_user = Window.partitionBy("user_id")
    peaked = walk.withColumn("peak", F.max(F.abs("cusum")).over(w_user))
    return peaked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.max("peak"), 4).alias("max_abs_cusum"),
        F.min(F.when(F.abs("cusum") == F.col("peak"), F.col("step")))
        .cast("long")
        .alias("changepoint_step"),
    )
