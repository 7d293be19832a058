"""Relational core queries: scans, joins, aggregation, windows, set ops,
reshaping (SURVEY §2.1, §2.4-§2.9).

Decimal discipline: monetary math is cast to explicit decimal types before
aggregation in BOTH engines (exact, order-independent) and surfaced as
rounded doubles, so distributed Spark sums hash-match single-threaded DuckDB.

Plan notes per query are in docstrings; bench.py asserts the big ones keep
broadcast joins / pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import read_events

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


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS sum_disc_price,
           CAST(ROUND(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))
                * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
               AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, hash aggregate with map-side partials.
    The shipdate filter reaches the parquet scan (PushedFilters)."""
    line = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    disc_price = (price * (1 - _dec("l_discount", 18, 4))).cast("decimal(18,6)")
    charge = (disc_price * (1 + _dec("l_tax", 18, 4))).cast("decimal(18,6)")
    return (
        line.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_REVENUE_DEC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
    " AS DECIMAL(18,6))"
)


def _revenue_col():
    return (
        _dec("l_extendedprice") * (1 - _dec("l_discount", 18, 4))
    ).cast("decimal(18,6)")


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_REVENUE_DEC}), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension (customer) broadcasts into the
    orders⋈lineitem join; top-k via global sort of a tiny aggregate."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    line = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        line.join(orders, line.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_orderpriority")
        .agg(F.round(F.sum(_revenue_col()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_supplier_revenue",
    f"""
    SELECT n_name, CAST(ROUND(SUM({_REVENUE_DEC}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join: all three dimensions broadcast; lineitem never
    shuffles before the final (small) aggregation."""
    line = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        line.join(F.broadcast(supp), line.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue_col()), 2).cast("double").alias("revenue"))
    )


@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)), 2) AS DOUBLE)
               AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
      AND l_quantity > 45
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown + column pruning: the scan reads 5 columns and
    PushedFilters carries both range predicates."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-03-01")
            & (F.col("l_quantity") > 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(_revenue_col(), 2).cast("double").alias("net_price"),
        )
    )


@register(
    "join_broadcast_dims",
    """
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE c_acctbal > 5000
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension chain entirely via broadcast hash joins — zero shuffles."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(o_orderstatus, 'ALL') AS order_status,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
           COUNT(*) AS order_count
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level rollup in one pass (Spark expands grouping sets; partial
    aggregation still applies)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    joined.createOrReplaceTempView("__gs_joined")
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(o_orderstatus, 'ALL') AS order_status,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
               COUNT(*) AS order_count
        FROM __gs_joined
        GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
        """
    )


@register(
    "window_rank_orders",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL `transform_rownumber` operator (reference
    ``datatransform_misc.py`` rownumber) in its partitioned, scalable
    form — one shuffle on the partition key; the yyyy-MM-dd string sorts
    identically to the date it renders."""
    from ..context import RunContext
    from ..operators.misc import transform_rownumber

    df = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )
    df = transform_rownumber(
        df,
        [{"field": "rn", "partition": ["o_custkey"],
          "sort": ["orderdate", "o_orderkey"]}],
        RunContext(spark=spark, args={}),
    )
    return df.filter(F.col("rn") <= 3)


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(w), 2).cast("double").alias("running_spend"),
    )


@register(
    "window_filldown",
    """
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM events
    """,
)
def window_filldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL `transform_filldown` operator (reference
    ``datatransform_misc.py`` filldown) in its partitioned, scalable
    form: nulls (here: error events) take the last non-null value per
    user, one running window per entry."""
    from ..context import RunContext
    from ..operators.misc import transform_filldown

    masked = F.when(F.col("event_type") != "error", F.col("value"))
    df = read_events(spark, sf_dir).select(
        "event_id", "user_id", "ts", masked.alias("value_filled")
    )
    df = transform_filldown(
        df,
        [{"field": "value_filled", "partition": ["user_id"],
          "sort": ["ts", "event_id"]}],
        RunContext(spark=spark, args={}),
    )
    return df.select("event_id", "user_id", "value_filled")


@register(
    "setops_segments",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — re-expressed by Catalyst as a left-anti join."""
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey")
    )
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(big.distinct()).distinct()


@register(
    "setops_union_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setops_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    machinery = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return machinery.intersect(urgent)


@register(
    "explode_order_months",
    """
    SELECT o_orderkey,
           generate_subscripts(months, 1) AS month_index,
           strftime(unnest(months), '%Y-%m-%d') AS month_start
    FROM (
        SELECT o_orderkey,
               generate_series(date_trunc('month', o_orderdate),
                               o_orderdate + INTERVAL 2 MONTH,
                               INTERVAL 1 MONTH) AS months
        FROM orders WHERE o_orderkey % 10 = 0
    )
    """,
)
def explode_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTUAL `transform_expandpolicymonths` operator (reference
    ``datatransform_premium.py:116-159``) driven on order dates: one row
    per active month with a 1-based index, generated executor-side by
    ``sequence`` + ``posexplode_outer`` (no uniqueid field so the gate
    stays deterministic)."""
    from ..context import RunContext
    from ..operators.premium import transform_expandpolicymonths

    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("eff_date"),
            F.add_months(F.col("o_orderdate").cast("date"), 2).alias("exp_date"),
        )
    )
    df = transform_expandpolicymonths(
        orders,
        {
            "policy_effective_date": "eff_date",
            "policy_expiration_date": "exp_date",
            "policy_month_start_field": "month_start",
            "policy_month_end_field": "month_end",
            "policy_month_index": "month_index",
        },
        RunContext(spark=spark, args={}),
    )
    return df.select(
        "o_orderkey",
        F.col("month_index").cast("bigint").alias("month_index"),
        F.date_format("month_start", "yyyy-MM-dd").alias("month_start"),
    )


@register(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
        FROM lineitem WHERE l_orderkey % 100 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        FROM lineitem WHERE l_orderkey % 100 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 100 = 0
    )
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via the native `stack` generator (UNPIVOT)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "stack(3, 'quantity', cast(l_quantity as double),"
            " 'price', cast(l_extendedprice as double),"
            " 'discount', cast(l_discount as double)) as (measure, value)",
        )
    )


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS total_f,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS total_o,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS total_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit value list (no extra pass to discover
    pivot values; single shuffle)."""
    pivoted = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(_dec("o_totalprice")), 2).cast("double"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("total_f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("total_o"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("total_p"),
    )


@register(
    "distinct_flag_status",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INT) AS ship_year
    FROM lineitem
    """,
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a projection (`dropDuplicates` on a full row)."""
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .dropDuplicates()
    )


@register(
    "kv_pivot_map_agg",
    """
    SELECT user_id,
           string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS type_counts
    FROM (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    )
    GROUP BY user_id
    """,
)
def kv_pivot_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's key-value pivot pattern (GROUP BY + collect_list +
    map_from_arrays, ``docs/using_sql.md:499-532``), surfaced as a sorted
    string so the map content is oracle-comparable."""
    counts = (
        read_events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.sort_array(F.collect_list(F.concat_ws(":", "event_type", "cnt"))),
        ).alias("type_counts")
    )


@register(
    "q4_order_priority_semi",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_returnflag = 'R' AND l.l_quantity > 30
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — LEFT SEMI join (EXISTS): qualifying lineitems
    (large returned items; the synthetic table has no commit/receipt
    dates) select orders without duplicating them, so no post-join
    distinct and the probe side streams through the hash relation once."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = t(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "anti_customers_no_orders",
    """
    SELECT n.n_name AS nation, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY n.n_name
    """,
)
def anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent-priority
    order (every synthetic customer has *some* order), counted by nation.
    Anti join + broadcast nation dim — the quarantine/exclusion shape the
    reference's DQ engine uses, as a first-class operator.  The priority
    filter pushes into the orders scan before the anti join builds."""
    cust = t(spark, sf_dir, "customer")
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q18_top_large_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 250
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_top_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — top-k over a grouped HAVING: aggregate lineitem by
    orderkey FIRST (map-side combine shrinks the shuffle), filter on the
    aggregate, then a bounded TakeOrdered instead of a global sort."""
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .where(F.col("qty") > 250)
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_orderkey", "o_orderdate",
                F.round("qty", 2).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS yr,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
               OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — a 6-table join with a disjunctive nation-pair
    predicate.  Both nation dims broadcast; the OR condition evaluates
    post-join on the two broadcast attrs, but each nation dim is ALSO
    pre-filtered to the two relevant nations so the disjunction prunes the
    big-side rows at the earliest key-carrying join, not at the end."""
    # Pair chosen to have cross-trades even at the sf0.001 smoke scale
    # (an empty result verifies nothing and empty-frame compares are
    # dtype-brittle).
    pair = ("NATION_18", "NATION_19")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        lineitem.join(F.broadcast(supplier.join(F.broadcast(n1),
                                                F.col("s_nationkey") == F.col("n1_key"))),
                      F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.join(F.broadcast(n2),
                                        F.col("c_nationkey") == F.col("n2_key"))),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(volume), 2).cast("double").alias("revenue"))
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — disjunctive multi-table predicates.  The
    single-side conjuncts implied by the OR (brand ∈ {...}, size ≤ 30,
    quantity ≤ 30) are stated explicitly so they push into each parquet
    scan; the cross-table residual evaluates after the (broadcast) join.
    Catalyst cannot always infer these CNF factors from a raw OR — writing
    them is the difference between scanning 3 brands and scanning all."""
    part = t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 30)
    )
    lineitem = t(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE)
               AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN (
        SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated aggregate subquery decorrelated into a
    self-aggregation join: per-part average computed once (map-side partial
    over the same scan), then re-joined on partkey.  Both sides shuffle on
    the SAME key, so Catalyst aligns the exchanges; no per-row subquery
    execution ever happens."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pa_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 2
            ).cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "agg_rollup_priority",
    """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (priority → status → grand total) in one
    pass — grouping-set expansion happens map-side before the single
    exchange, same as plain grouping sets."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


@register(
    "setops_except_custkeys",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setops_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): building-segment customers who never
    placed an urgent order — ``subtract`` is EXCEPT DISTINCT (a multiset
    ``exceptAll`` + distinct would wrongly keep left-side elements whose
    duplicates outnumber right-side occurrences); Catalyst plans it as an
    aggregate + anti join."""
    building = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.subtract(urgent)


@register(
    "q8_market_share",
    """
    SELECT yr,
           CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_19' THEN volume ELSE 0 END)
                      / SUM(volume), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        WHERE r.r_name = 'EUROPE'
    )
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's market share inside a region per
    year: conditional decimal sums in a single aggregation over a 6-table
    join (all dims broadcast; lineitem⋈orders is the only big join).  The
    share division happens once per group, after exact decimal totals."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n2 = nation.select("n_nationkey", "n_regionkey")
    cust_in_region = (
        cust.join(F.broadcast(n2), cust.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    base = (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("yr"), volume.alias("volume"), "supp_nation")
    )
    share_num = F.sum(F.when(F.col("supp_nation") == "NATION_19",
                             F.col("volume")).otherwise(F.lit(0).cast("decimal(18,4)")))
    return base.groupBy("yr").agg(
        F.round(share_num / F.sum("volume"), 6).cast("double").alias("mkt_share")
    )


@register(
    "q22_wealthy_inactive",
    """
    SELECT c_nationkey AS nation_key, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar-subquery threshold + anti join: customers
    above the average positive balance with no urgent orders.  The scalar
    average is one tiny aggregate broadcast into the filter (no per-row
    subquery); the NOT EXISTS is a left-anti join against the
    priority-pruned orders scan."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    # Anti-join against urgent orders: a date-window variant is empty at
    # the smallest SF (every synthetic customer orders continuously), and
    # empty gate results verify nothing.
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "setops_union_aligned_feed",
    """
    SELECT 'order' AS record_type, o_orderkey AS record_key,
           strftime(o_orderdate, '%Y-%m-%d') AS record_date,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS amount,
           o_orderpriority AS detail, CAST(NULL AS BIGINT) AS line_number
    FROM orders WHERE o_orderkey % 50 = 0
    UNION ALL
    SELECT 'line', l_orderkey, strftime(l_shipdate, '%Y-%m-%d'),
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 2) AS DOUBLE),
           l_returnflag, CAST(l_linenumber AS BIGINT)
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def setops_union_aligned_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's documented UNION schema-alignment pattern
    (``docs/using_sql.md:330-371``): heterogeneous tables unify into one
    feed by tagging a record_type and padding missing columns with typed
    literal placeholders.  UNION ALL (no dedup shuffle — the aligned
    streams are disjoint by construction); both scans keep their
    pushed-down filters."""
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            F.lit("order").alias("record_type"),
            F.col("o_orderkey").alias("record_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("record_date"),
            F.round(_dec("o_totalprice"), 2).cast("double").alias("amount"),
            F.col("o_orderpriority").alias("detail"),
            F.lit(None).cast("bigint").alias("line_number"),
        )
    )
    lines = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 50 == 0)
        .select(
            F.lit("line").alias("record_type"),
            F.col("l_orderkey").alias("record_key"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("record_date"),
            F.round(_dec("l_extendedprice"), 2).cast("double").alias("amount"),
            F.col("l_returnflag").alias("detail"),
            F.col("l_linenumber").cast("bigint").alias("line_number"),
        )
    )
    return orders.unionByName(lines)


@register(
    "sketch_kmv_distinct",
    """
    WITH dv AS (SELECT DISTINCT o_orderpriority, o_custkey FROM orders),
    h AS (
        SELECT o_orderpriority, o_custkey,
               (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
                + 1.0) / 1152921504606846976.0 AS hh
        FROM dv
    ),
    r AS (
        SELECT o_orderpriority, hh,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority ORDER BY hh, o_custkey
               ) AS rn
        FROM h
    )
    SELECT o_orderpriority,
           ROUND(CASE WHEN COUNT(*) < 64 THEN COUNT(*) * 1.0
                      ELSE 63.0 / MAX(CASE WHEN rn = 64 THEN hh END) END, 4)
               AS est_distinct
    FROM r WHERE rn <= 64
    GROUP BY o_orderpriority
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64, per order
    priority: estimate = (k-1)/h_k over md5-normalized hashes — unlike
    HyperLogLog's engine-specific estimates, every step is deterministic,
    so DuckDB reproduces the sketch bit-for-bit AND stored per-partition
    sketches merge by re-ranking k rows each (see operators/sketches.py).
    """
    from ..operators.sketches import kmv_distinct

    orders = t(spark, sf_dir, "orders")
    est = kmv_distinct(orders, "o_custkey", ["o_orderpriority"], k=64)
    return est.select(
        "o_orderpriority", F.round("est_distinct", 4).alias("est_distinct")
    )


@register(
    "sketch_cms_user_counts",
    """
    WITH rows4 AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
        SELECT r.row,
               ('0x' || substr(md5('cms' || r.row || ':' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 64 AS bucket,
               COUNT(*) AS c
        FROM events, rows4 r
        GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
        SELECT k.user_id, r.row,
               ('0x' || substr(md5('cms' || r.row || ':' || CAST(k.user_id AS VARCHAR)),
                               1, 8))::BIGINT % 64 AS bucket
        FROM keys k, rows4 r
    ),
    est AS (
        SELECT p.user_id, MIN(c.c) AS cms_est
        FROM probes p JOIN cells c ON p.row = c.row AND p.bucket = c.bucket
        GROUP BY 1
    ),
    exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1)
    SELECT e.user_id, e.exact_n, CAST(est.cms_est AS BIGINT) AS cms_est
    FROM exact e JOIN est ON e.user_id = est.user_id
    """,
)
def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 64) over event user ids, probed
    for every distinct user next to the exact count — the mergeable
    frequency-sketch complement to the KMV distinct sketch, with the same
    design rationale: md5-derived row hashes make every cell
    deterministic, so DuckDB rebuilds the identical sketch (engine-private
    sketches like DataSketches can't sit behind a differential oracle),
    and cells ADD, so per-partition sketches stored at ingest answer
    frequency queries over any partition union without rescanning.  The
    overestimate guarantee (est ≥ exact) is visible in the output pairs.
    Build: one depth-way explode + (row, bucket) aggregation with map-side
    partials; probe: depth broadcast lookups per key
    (``operators/sketches.cms_build`` / ``cms_query``)."""
    from ..operators.sketches import cms_build, cms_query

    events = t(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(events, "user_id", depth=4, width=64)
    keys = events.distinct()
    est = cms_query(sketch, keys, "user_id", depth=4, width=64)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return exact.join(est, "user_id").select("user_id", "exact_n", "cms_est")


@register(
    "sketch_bloom_membership",
    """
    WITH rows3 AS (SELECT unnest([0, 1, 2]) AS row),
    members AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    bits AS (
        SELECT DISTINCT
               ('0x' || substr(md5('bloom' || r.row || ':' || CAST(m.user_id AS VARCHAR)),
                               1, 8))::BIGINT % 256 AS bit
        FROM members m, rows3 r
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    probes AS (
        SELECT k.user_id,
               ('0x' || substr(md5('bloom' || r.row || ':' || CAST(k.user_id AS VARCHAR)),
                               1, 8))::BIGINT % 256 AS bit
        FROM keys k, rows3 r
    )
    SELECT p.user_id,
           p.user_id IN (SELECT user_id FROM members) AS is_member,
           SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 3 AS in_bloom
    FROM probes p LEFT JOIN bits b ON p.bit = b.bit
    GROUP BY p.user_id
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership filter (depth 3 × 256 bits) over purchasing users,
    probed for EVERY user next to exact membership — the third mergeable
    sketch beside KMV (distinct) and count-min (frequency), same design
    rule: md5 row hashes make the filter engine-reproducible, union of
    per-partition filters is bitwise OR.  The no-false-negative guarantee
    is visible in the output (every is_member row has in_bloom true;
    false positives are the gap between the columns).  At 100 TB this is
    the storable version of runtime bloom-join pruning: broadcast the
    small side's filter to the fact scan and drop non-joining rows
    BEFORE the shuffle (``operators/sketches.bloom_build``/``bloom_query``)."""
    from ..operators.sketches import bloom_build, bloom_query

    events = t(spark, sf_dir, "events")
    members = events.where(F.col("event_type") == "purchase").select("user_id").distinct()
    bloom = bloom_build(members, "user_id", depth=3, bits=256)
    keys = events.select("user_id").distinct()
    probed = bloom_query(bloom, keys, "user_id", depth=3, bits=256)
    exact = keys.join(
        members.withColumn("__m", F.lit(1)), "user_id", "left"
    ).select("user_id", F.col("__m").isNotNull().alias("is_member"))
    return exact.join(probed, "user_id").select("user_id", "is_member", "in_bloom")


@register(
    "agg_cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all 2^k grouping combinations in ONE pass
    (Catalyst expands to an Expand node feeding a single hash aggregate
    with map-side partials, exactly like GROUPING SETS/ROLLUP; never k
    separate scans).  Decimal sums keep the distributed aggregation
    order-independent; NULL grouping markers coalesce to 'ALL' on both
    engines."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("order_priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "join_null_safe_keys",
    """
    WITH fact AS (
        SELECT o_orderkey,
               CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey % 50 END
                   AS bucket
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    dim AS (
        SELECT CASE WHEN d % 10 = 0 THEN NULL ELSE d END AS bucket,
               'seg_' || CAST(d AS VARCHAR) AS segment
        FROM (SELECT unnest(generate_series(0, 49)) AS d)
    )
    SELECT f.o_orderkey, f.bucket, d.segment
    FROM fact f JOIN dim d ON f.bucket IS NOT DISTINCT FROM d.bucket
    """,
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join semantics parity: Spark's ``<=>`` (eqNullSafe) must
    match ANSI ``IS NOT DISTINCT FROM`` exactly — including the
    null-key-matches-null-key rows a plain equi-join silently drops (a
    classic silent-data-loss trap when fact keys are nullable).  The
    null bucket is deliberately a hot key on both sides; Spark still
    plans a hash join on the null-safe comparison (coalesced key), not a
    nested loop."""
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    fact = orders.select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 50)
        .alias("bucket"),
    )
    spark_dim = spark.range(0, 50).select(
        F.when(F.col("id") % 10 == 0, F.lit(None)).otherwise(F.col("id"))
        .alias("bucket"),
        F.concat(F.lit("seg_"), F.col("id").cast("string")).alias("segment"),
    )
    return fact.join(
        F.broadcast(spark_dim), fact["bucket"].eqNullSafe(spark_dim["bucket"])
    ).select("o_orderkey", fact["bucket"].alias("bucket"), "segment")


_TRADE_EDGES_SQL = """
    SELECT DISTINCT s_nationkey AS src, c_nationkey AS dst
    FROM {li} li
    JOIN {orders} o ON li.l_orderkey = o.o_orderkey
    JOIN {cust} c ON o.o_custkey = c.c_custkey
    JOIN {supp} s ON li.l_suppkey = s.s_suppkey
"""


@register(
    "sql_recursive_reachability",
    f"""
    WITH RECURSIVE e AS (
        {_TRADE_EDGES_SQL.format(li="lineitem", orders="orders",
                                 cust="customer", supp="supplier")}
    ),
    r AS (
        SELECT dst, 1 AS hops FROM e WHERE src = 0
        UNION ALL
        SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.dst
        WHERE r.hops < 3
    )
    SELECT dst AS nation_key, MIN(hops) AS min_hops
    FROM r GROUP BY dst
    """,
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE surface: bounded-depth transitive closure
    over the nation trade graph (min hops from nation 0 within 3 steps) —
    the same SQL text runs on both engines.  Each recursion step is one
    join against the (distinct, dimension-sized) edge list; the hop bound
    caps path volume, and the outer MIN-GROUP BY collapses it.  For
    UNBOUNDED closures use the dedicated iterative operators
    (``dedup.connected_components``, ``graph.pagerank``), which
    checkpoint per round instead of unrolling."""
    for name in ("lineitem", "orders", "customer", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        f"""
        WITH RECURSIVE e AS (
            {_TRADE_EDGES_SQL.format(li="lineitem", orders="orders",
                                     cust="customer", supp="supplier")}
        ),
        r AS (
            SELECT dst, 1 AS hops FROM e WHERE src = 0
            UNION ALL
            SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.dst
            WHERE r.hops < 3
        )
        SELECT dst AS nation_key, MIN(hops) AS min_hops
        FROM r GROUP BY dst
        """
    )


@register(
    "sql_lateral_top2",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 50 = 0
    """,
)
def sql_lateral_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT — identical SQL text on both
    engines.  Catalyst decorrelates the per-customer top-2 into a
    window/rank over the join (no per-row re-execution), which is exactly
    the rewrite that makes lateral top-N usable at scale; the gate proves
    the decorrelation preserves ORDER BY ... LIMIT semantics including
    ties."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 50 = 0
        """
    )


@register(
    "stat_ols_price_on_qty",
    """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope,
           ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS pearson_r
    FROM m
    """,
)
def stat_ols_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed simple linear regression + Pearson correlation
    (extended price on quantity, per return flag) from DECIMAL-EXACT
    moment sums: the five sufficient statistics (Sx, Sy, Sxx, Sxy, Syy)
    accumulate exactly and order-independently — the property Spark's
    built-in ``corr``/``covar`` (double running sums) cannot give a
    differential gate — and slope/intercept/r evaluate in identical
    double arithmetic from identical moments.  One map-side-combined
    aggregation; this is how regression-per-segment runs at 100 TB (the
    moments are the shuffle payload, five decimals per group)."""
    li = t(spark, sf_dir, "lineitem")
    x = _dec("l_quantity")
    y = _dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("pearson_r"),
    )


@register(
    "window_rank_fractions",
    """
    SELECT c_mktsegment, c_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional rank functions (percent_rank, cume_dist, ntile) per
    segment — the remaining ranking-window surface.  All three are exact
    integer ratios of rank positions (identical doubles on any engine);
    the ORDER BY carries a unique tie-break so ntile edges are
    deterministic.  One segment-keyed exchange serves all three."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "setops_except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setops_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL bag semantics (multiset difference: each occurrence on
    the right cancels ONE on the left) — the set-operation surface a
    plain EXCEPT (distinct) silently changes.  Spark's ``exceptAll``
    plans as a counted anti-semantics aggregation, not a distinct."""
    orders = t(spark, sf_dir, "orders")
    left = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    right = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return left.exceptAll(right)


@register(
    "agg_boolean_family",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           GROUPING(o_orderpriority) AS grp
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), ())
    """,
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family (count_if, every, any) with a
    GROUPING() marker over grouping sets — the remaining aggregate
    surface: the marker disambiguates the grand-total row from a real
    NULL group, which downstream consumers of rollup output depend on.
    All four aggregates fold map-side in the single grouping-set
    exchange."""
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__bool_orders")
    return orders.sparkSession.sql(
        """
        SELECT o_orderpriority,
               count_if(o_totalprice > 150000) AS n_big,
               every(o_totalprice > 1000) AS all_over_1k,
               any(o_orderstatus = 'F') AS any_finished,
               grouping(o_orderpriority) AS grp
        FROM __bool_orders
        GROUP BY GROUPING SETS ((o_orderpriority), ())
        """
    )


@register(
    "sketch_kmv_set_ops",
    """
    WITH ha AS (
        SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
                + 1.0) / 1152921504606846976.0 AS hh
        FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderpriority = '1-URGENT')
        ORDER BY hh LIMIT 128
    ),
    hb AS (
        SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
                + 1.0) / 1152921504606846976.0 AS hh
        FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderpriority = '5-LOW')
        ORDER BY hh LIMIT 128
    ),
    u AS (
        SELECT DISTINCT hh FROM (SELECT hh FROM ha UNION ALL SELECT hh FROM hb)
        ORDER BY hh LIMIT 128
    ),
    flags AS (
        SELECT u.hh,
               CASE WHEN a.hh IS NOT NULL THEN 1 ELSE 0 END AS in_a,
               CASE WHEN b.hh IS NOT NULL THEN 1 ELSE 0 END AS in_b
        FROM u LEFT JOIN ha a ON u.hh = a.hh LEFT JOIN hb b ON u.hh = b.hh
    ),
    s AS (
        SELECT COUNT(*) AS n_union_rows, MAX(hh) AS h_k,
               SUM(in_a * in_b) AS n_both
        FROM flags
    ),
    ea AS (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                       ELSE 127 / MAX(hh) END AS est_a FROM ha),
    eb AS (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                       ELSE 127 / MAX(hh) END AS est_b FROM hb)
    SELECT ROUND(est_a, 4) AS est_a, ROUND(est_b, 4) AS est_b,
           ROUND(CASE WHEN n_union_rows < 128 THEN n_union_rows * 1.0
                      ELSE 127 / h_k END, 4) AS est_union,
           ROUND(CASE WHEN n_union_rows < 128 THEN n_both * 1.0
                      ELSE n_both / n_union_rows * (127 / h_k) END, 4)
               AS est_intersection,
           ROUND(n_both / n_union_rows, 4) AS jaccard_est
    FROM s CROSS JOIN ea CROSS JOIN eb
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS from two KMV sketches (Beyer et
    al., SIGMOD'07): distinct-customer estimates for two order-priority
    slices plus their union, intersection, and Jaccard — all computed
    from the two k=128 sketches alone, never from the raw data.  This is
    the capability Spark's built-in HLL++ cannot oracle-check
    (engine-private estimates; see ``sketch_hll_cardinality`` for the
    deterministic HLL) and plain distinct counts cannot merge: stored per-slice
    sketches answer cross-slice overlap questions at k-row cost.  Each
    side is one distinct + one distributed top-k
    (TakeOrderedAndProject); everything downstream runs on ≤ 2k rows."""
    from ..operators.sketches import kmv_set_estimates

    orders = t(spark, sf_dir, "orders")
    out = kmv_set_estimates(
        orders.where(F.col("o_orderpriority") == "1-URGENT"),
        orders.where(F.col("o_orderpriority") == "5-LOW"),
        "o_custkey",
        k=128,
    )
    return out.select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("est_intersection", 4).alias("est_intersection"),
        F.round("jaccard_est", 4).alias("jaccard_est"),
    )


@register(
    "sketch_kmv_merge_tables",
    """
    WITH ha AS (
        SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
                + 1.0) / 1152921504606846976.0 AS hh
        FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderpriority = '1-URGENT')
        ORDER BY hh LIMIT 128
    ),
    hb AS (
        SELECT (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
                + 1.0) / 1152921504606846976.0 AS hh
        FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderpriority = '5-LOW')
        ORDER BY hh LIMIT 128
    ),
    u AS (
        SELECT DISTINCT hh FROM (SELECT hh FROM ha UNION ALL SELECT hh FROM hb)
        ORDER BY hh LIMIT 128
    ),
    flags AS (
        SELECT u.hh,
               CASE WHEN a.hh IS NOT NULL THEN 1 ELSE 0 END AS in_a,
               CASE WHEN b.hh IS NOT NULL THEN 1 ELSE 0 END AS in_b
        FROM u LEFT JOIN ha a ON u.hh = a.hh LEFT JOIN hb b ON u.hh = b.hh
    ),
    s AS (
        SELECT COUNT(*) AS n_union_rows, MAX(hh) AS h_k,
               SUM(in_a * in_b) AS n_both
        FROM flags
    ),
    ea AS (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                       ELSE 127 / MAX(hh) END AS est_a FROM ha),
    eb AS (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                       ELSE 127 / MAX(hh) END AS est_b FROM hb)
    SELECT ROUND(est_a, 4) AS est_a, ROUND(est_b, 4) AS est_b,
           ROUND(CASE WHEN n_union_rows < 128 THEN n_union_rows * 1.0
                      ELSE 127 / h_k END, 4) AS est_union,
           ROUND(CASE WHEN n_union_rows < 128 THEN n_both * 1.0
                      ELSE n_both / n_union_rows * (127 / h_k) END, 4)
               AS est_intersection,
           ROUND(n_both / n_union_rows, 4) AS jaccard_est
    FROM s CROSS JOIN ea CROSS JOIN eb
    """,
)
def sketch_kmv_merge_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABLE form of ``sketch_kmv_set_ops`` (VERDICT r5 item 6):
    build the per-priority KMV sketch TABLE once (one grouped pass over
    orders), PERSIST it to parquet, then answer the same
    union/intersection/Jaccard questions purely from the stored sketch
    rows via ``kmv_set_estimates_from_sketches`` — no rescan of orders,
    no driver-side set algebra (all DataFrame aggregation; the union
    top-k is TakeOrderedAndProject).  The oracle is the identical SQL as
    the end-to-end gate, so this proves store→read-back→merge loses
    nothing.  At 100 TB the profiler stores one k-row sketch per slice
    per day and answers any cross-slice overlap question at ≤ 2k-row
    cost; raw-data passes happen once, here in ``kmv_sketch``."""
    import tempfile

    from ..operators.sketches import kmv_set_estimates_from_sketches, kmv_sketch

    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    sketch_table = kmv_sketch(
        orders, "o_custkey", ["o_orderpriority"], k=128
    )
    store = tempfile.mkdtemp(prefix="kmv_sketch_store_")
    sketch_table.write.mode("overwrite").parquet(store)
    stored = spark.read.parquet(store)
    out = kmv_set_estimates_from_sketches(
        stored.where(F.col("o_orderpriority") == "1-URGENT"),
        stored.where(F.col("o_orderpriority") == "5-LOW"),
        k=128,
    )
    return out.select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("est_intersection", 4).alias("est_intersection"),
        F.round("jaccard_est", 4).alias("jaccard_est"),
    )


@register(
    "sql_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           upper(substr(lower(c_mktsegment), 1, 1))
               || substr(lower(c_mktsegment), 2) AS ic,
           length(c_name) AS len,
           substr(c_name, 4, 5) AS sub,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad_l,
           rpad(c_mktsegment, 12, '.') AS pad_r,
           replace(c_name, '#', '-') AS repl,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
           reverse(c_mktsegment) AS rev,
           trim(concat(' ', c_mktsegment, ' ')) AS trm,
           split_part(c_name, '#', 2) AS sp,
           position('#' IN c_name) AS pos,
           concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS cw,
           repeat('ab', 3) AS rep,
           left(c_name, 6) AS lft, right(c_name, 4) AS rgt,
           starts_with(c_name, 'Customer') AS sw,
           contains(c_name, '#') AS ct
    FROM customer WHERE c_custkey <= 200
    """,
)
def sql_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar STRING-function battery — 20 functions differentially
    checked per row across engines (upper/lower/initcap, length, substr,
    l/rpad, replace, translate, reverse, trim, split_part, position,
    concat_ws, repeat, left/right, starts_with/contains).  The point is
    the SURFACE: these are the §2.10 functions an ETL transform spec
    reaches for, and each has documented cross-engine edge semantics
    (1-based substr, pad truncation, empty-separator splits) that only a
    value-level differential pins down.  Trivially narrow — runs at scan
    speed."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    key_str = F.col("c_custkey").cast("string")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.initcap(F.lower("c_mktsegment")).alias("ic"),
        F.length("c_name").alias("len"),
        F.substring("c_name", 4, 5).alias("sub"),
        F.lpad(key_str, 8, "0").alias("pad_l"),
        F.rpad("c_mktsegment", 12, ".").alias("pad_r"),
        F.replace("c_name", F.lit("#"), F.lit("-")).alias("repl"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("tr"),
        F.reverse("c_mktsegment").alias("rev"),
        F.trim(F.concat(F.lit(" "), "c_mktsegment", F.lit(" "))).alias("trm"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("sp"),
        F.instr("c_name", "#").alias("pos"),
        F.concat_ws("|", "c_mktsegment", key_str).alias("cw"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.left("c_name", F.lit(6)).alias("lft"),
        F.right("c_name", F.lit(4)).alias("rgt"),
        F.startswith("c_name", F.lit("Customer")).alias("sw"),
        F.contains("c_name", F.lit("#")).alias("ct"),
    )


@register(
    "sql_datetime_functions",
    """
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d_iso,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
           CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
           CAST(EXTRACT(dayofyear FROM o_orderdate) AS BIGINT) AS doy,
           CAST(date_part('isodow', o_orderdate) AS BIGINT) AS isodow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mend,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY, '%Y-%m-%d')
               AS plus45,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d')
               AS plus3m,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS week_iso
    FROM orders WHERE o_orderkey <= 400
    """,
)
def sql_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar DATE/TIME-function battery: extraction (year..dayofyear,
    ISO weekday), truncation (month start/end), interval arithmetic
    (+days, +months with end-of-month clamping), day differences, ISO
    week numbers — the §2.10 date surface the reference's date
    transforms rely on, where off-by-one conventions (dow base, week
    numbering, month-add clamping) differ BETWEEN engines unless pinned
    to the portable formulations used here."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("d_iso"),
        F.year(d).cast("long").alias("yr"),
        F.quarter(d).cast("long").alias("qtr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofyear(d).cast("long").alias("doy"),
        # ISO day-of-week (Mon=1..Sun=7), portable across engines
        F.expr("extract(dayofweek_iso FROM CAST(o_orderdate AS DATE))")
        .cast("long")
        .alias("isodow"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("mstart"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("mend"),
        F.date_format(F.date_add(d, 45), "yyyy-MM-dd").alias("plus45"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.weekofyear(d).cast("long").alias("week_iso"),
    )


@register(
    "sql_math_functions",
    """
    SELECT o_orderkey,
           ROUND(abs(o_totalprice - 150000), 4) AS ab,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ce,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS fl,
           ROUND(sqrt(o_totalprice), 4) AS sq,
           ROUND(ln(o_totalprice), 6) AS lg,
           ROUND(log10(o_totalprice), 6) AS l10,
           ROUND(exp(o_totalprice / 100000), 6) AS ex,
           ROUND(pow(o_totalprice / 10000, 2), 4) AS pw,
           CAST(o_orderkey % 7 AS BIGINT) AS md,
           CAST(sign(o_totalprice - 150000) AS BIGINT) AS sg,
           ROUND(greatest(o_totalprice, 100000.0), 2) AS gr,
           ROUND(least(o_totalprice, 100000.0), 2) AS ls,
           ROUND(sin(o_orderkey % 10), 6) AS sn,
           ROUND(cos(o_orderkey % 10), 6) AS cs,
           ROUND(atan2(CAST(o_orderkey % 5 AS DOUBLE), 2.0), 6) AS at2,
           ROUND(degrees(pi() / (1 + o_orderkey % 4)), 6) AS dg,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS bc,
           CAST(xor(o_orderkey, 255) AS BIGINT) AS xo,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 0.0825, 2)
                AS DOUBLE) AS tax
    FROM orders WHERE o_orderkey <= 400
    """,
)
def sql_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar MATH-function battery: rounding family (abs/ceil/floor/
    round), roots and logs, exp/pow, modulo, sign, greatest/least, trig
    (sin/cos/atan2/degrees), bit ops (bit_count/xor), and exact decimal
    multiplication — the §2.10 numeric surface.  Trig/log outputs round
    at 6 decimals: both engines call the same libm-level double
    functions, and the differential proves the remaining bits agree."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    p = F.col("o_totalprice")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.abs(p - 150000), 4).alias("ab"),
        F.ceil(p / 1000).cast("long").alias("ce"),
        F.floor(p / 1000).cast("long").alias("fl"),
        F.round(F.sqrt(p), 4).alias("sq"),
        F.round(F.log(p), 6).alias("lg"),
        F.round(F.log10(p), 6).alias("l10"),
        F.round(F.exp(p / 100000), 6).alias("ex"),
        F.round(F.pow(p / 10000, 2), 4).alias("pw"),
        (k % 7).cast("long").alias("md"),
        F.signum(p - 150000).cast("long").alias("sg"),
        F.round(F.greatest(p, F.lit(100000.0)), 2).alias("gr"),
        F.round(F.least(p, F.lit(100000.0)), 2).alias("ls"),
        F.round(F.sin(k % 10), 6).alias("sn"),
        F.round(F.cos(k % 10), 6).alias("cs"),
        F.round(F.atan2((k % 5).cast("double"), F.lit(2.0)), 6).alias("at2"),
        F.round(F.degrees(F.lit(3.141592653589793) / (1 + k % 4)), 6).alias("dg"),
        F.bit_count(k.cast("bigint")).cast("long").alias("bc"),
        k.bitwiseXOR(F.lit(255)).cast("long").alias("xo"),
        F.round(p.cast("decimal(18,2)") * F.lit(0.0825).cast("decimal(6,4)"), 2)
        .cast("double")
        .alias("tax"),
    )


@register(
    "sql_array_functions",
    """
    WITH base AS (
        SELECT o_orderkey,
               [o_orderkey % 5, o_orderkey % 3, o_orderkey % 7,
                o_orderkey % 3] AS arr
        FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           CAST(len(arr) AS INT) AS sz,
           list_contains(arr, 2) AS has2,
           CAST(arr[1] AS BIGINT) AS first_el,
           CAST(arr[len(arr)] AS BIGINT) AS last_el,
           array_to_string(list_sort(arr), ',') AS sorted_arr,
           array_to_string(list_reverse_sort(arr), ',') AS rsorted_arr,
           array_to_string(list_sort(list_distinct(arr)), ',') AS dedup_arr,
           array_to_string(arr, ',') AS joined,
           CAST(list_position(arr, 1) AS INT) AS pos1,
           array_to_string(list_transform(arr, x -> x * 10), ',') AS times10,
           COALESCE(array_to_string(list_filter(arr, x -> x >= 2), ','), '')
               AS geq2,
           CAST(list_sum(arr) AS BIGINT) AS total,
           CAST(list_max(arr) AS BIGINT) AS mx,
           CAST(list_min(arr) AS BIGINT) AS mn,
           array_to_string(list_slice(arr, 2, 3), ',') AS mid,
           array_to_string(list_concat(arr, [99]), ',') AS plus99,
           array_to_string(list_sort(list_intersect(arr, [0, 1, 2])), ',')
               AS inter
    FROM base
    """,
)
def sql_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY-function battery: size, membership, 1-based indexing (both
    engines), first/last element, sort both directions, distinct,
    join-to-string, position, higher-order transform/filter, sum/max/min
    aggregates, slice, concat, intersection — the array surface the
    text/embedding operators lean on, pinned value-level across engines.
    Note the portability traps the formulation dodges: DuckDB
    list_distinct does NOT preserve order (sort AFTER distinct), and
    both engines index from 1 with position 0 for a missing element.
    Every array-typed result is serialized with ``array_join`` /
    ``array_to_string`` so the driver's pandas canonicalizer (which
    sorts raw cell values and cannot hash lists) sees scalars only —
    VERDICT r6 item 1.  One more trap: on an EMPTY list Spark
    ``array_join`` returns ``''`` but DuckDB ``array_to_string``
    returns NULL, so the oracle COALESCEs the one empty-able column
    (``geq2``)."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    k = F.col("o_orderkey")
    base = o.select(
        "o_orderkey",
        F.array(k % 5, k % 3, k % 7, k % 3).alias("arr"),
    )

    def joined(col):  # serialize array<long> -> "a,b,c" for the driver
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return base.select(
        "o_orderkey",
        F.size("arr").alias("sz"),
        F.array_contains("arr", 2).alias("has2"),
        F.element_at("arr", 1).alias("first_el"),
        F.element_at("arr", F.size("arr")).alias("last_el"),
        joined(F.sort_array("arr")).alias("sorted_arr"),
        joined(F.sort_array("arr", asc=False)).alias("rsorted_arr"),
        joined(F.sort_array(F.array_distinct("arr"))).alias("dedup_arr"),
        F.array_join("arr", ",").alias("joined"),
        F.array_position("arr", 1).cast("int").alias("pos1"),
        joined(F.transform("arr", lambda x: x * 10)).alias("times10"),
        joined(F.filter("arr", lambda x: x >= 2)).alias("geq2"),
        F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("total"),
        F.array_max("arr").alias("mx"),
        F.array_min("arr").alias("mn"),
        joined(F.slice("arr", 2, 2)).alias("mid"),
        joined(F.concat("arr", F.array(F.lit(99)))).alias("plus99"),
        joined(
            F.sort_array(F.array_intersect(F.sort_array("arr"),
                                           F.array(F.lit(0), F.lit(1),
                                                   F.lit(2))))
        ).alias("inter"),
    )


@register(
    "sql_conditional_functions",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           NULLIF(c_custkey % 3, 0) IS NULL AS div3,
           IFNULL(NULLIF(c_mktsegment, 'MACHINERY'), 'was-machinery') AS ifn,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           CASE c_custkey % 2 WHEN 0 THEN 'even' ELSE 'odd' END AS parity,
           c_acctbal BETWEEN 0 AND 1000 AS in_band,
           c_mktsegment IN ('BUILDING', 'MACHINERY') AS in_list,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS clamped,
           CAST(CASE WHEN c_acctbal IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS not_null_flag,
           ROUND(COALESCE(NULLIF(c_acctbal, 0.0), -1.0), 2) AS bal_or_neg1
    FROM customer WHERE c_custkey <= 300
    """,
)
def sql_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDITIONAL / null-handling battery: coalesce, nullif, ifnull,
    searched + simple CASE, BETWEEN, IN-list, greatest-clamp, null
    flags — the §2.10 glue every transform spec's cleansing rules are
    written in, differentially pinned (null-propagation conventions are
    where engines quietly disagree)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.nullif(F.col("c_custkey") % 3, F.lit(0)).isNull().alias("div3"),
        F.ifnull(F.nullif("c_mktsegment", F.lit("MACHINERY")),
                 F.lit("was-machinery")).alias("ifn"),
        F.when(bal < 0, "neg").when(bal < 5000, "low").otherwise("high")
        .alias("bal_band"),
        F.when(F.col("c_custkey") % 2 == 0, "even").otherwise("odd")
        .alias("parity"),
        bal.between(0, 1000).alias("in_band"),
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY").alias("in_list"),
        F.round(F.greatest(bal, F.lit(0.0)), 2).alias("clamped"),
        bal.isNotNull().cast("int").alias("not_null_flag"),
        F.round(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)), 2)
        .alias("bal_or_neg1"),
    )


@register(
    "agg_stats_functions",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS cor,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
           ROUND(stddev_samp(l_quantity), 6) AS sd_s,
           ROUND(stddev_pop(l_quantity), 6) AS sd_p,
           ROUND(var_samp(l_quantity), 6) AS var_s,
           ROUND(var_pop(l_quantity), 6) AS var_p,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS rn
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATISTICAL-aggregate battery per return flag: correlation, both
    covariances, both stddevs/variances, and the SQL regression family
    (slope/intercept/R2/count) — the §2.5 analytics surface behind
    profiling and the OLS gate, pinned directly at the aggregate level.
    All are single-pass distributed moment accumulations (one shuffle on
    the group key, map-side partials); rounding absorbs the sub-ulp
    order-dependence of double moment sums."""
    li = t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr(q, p), 6).alias("cor"),
        F.round(F.covar_samp(q, p), 4).alias("cov_s"),
        F.round(F.covar_pop(q, p), 4).alias("cov_p"),
        F.round(F.stddev_samp(q), 6).alias("sd_s"),
        F.round(F.stddev_pop(q), 6).alias("sd_p"),
        F.round(F.var_samp(q), 6).alias("var_s"),
        F.round(F.var_pop(q), 6).alias("var_p"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("icept"),
        F.round(F.regr_r2(p, q), 6).alias("r2"),
        F.regr_count(p, q).cast("long").alias("rn"),
    )


@register(
    "sql_regex_functions",
    r"""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zeros,
           regexp_matches(c_name, '^Customer#[0-9]+$') AS well_formed,
           regexp_matches(c_mktsegment, '^(BUILDING|MACHINERY)$') AS seg_ab,
           regexp_extract(c_name, '#(0*)([1-9][0-9]*)$', 2) AS trimmed_id,
           regexp_replace(c_name, '0{2,}', 'Z', 'g') AS runs_collapsed
    FROM customer WHERE c_custkey <= 300
    """,
)
def sql_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEX battery: group extraction, character-class replace, match
    counting, anchored full-match tests, multi-group extraction with
    leading-zero trim, and bounded-repetition run collapsing — the
    §2.10 regex surface `columnfromcolumn`/`columnreplace`/PII scanning
    build on, restricted to the portable syntax subset (no lookaround,
    no named groups, NO BACKREFERENCES — DuckDB's RE2 rejects `\1`)
    that Java regex and RE2-family engines evaluate identically.
    Spark's rlike is unanchored search, so the full-match probes anchor
    explicitly with ^$ — the classic Java `matches()` vs SQL semantics
    trap.  Second live trap: DuckDB's regexp_replace replaces only the
    FIRST match unless passed the 'g' option, while Spark's is always
    global — the oracle says 'g' explicitly."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.regexp_count("c_name", F.lit("0")).cast("int").alias("n_zeros"),
        F.col("c_name").rlike(r"^Customer#[0-9]+$").alias("well_formed"),
        F.col("c_mktsegment").rlike(r"^(BUILDING|MACHINERY)$").alias("seg_ab"),
        F.regexp_extract("c_name", r"#(0*)([1-9][0-9]*)$", 2).alias("trimmed_id"),
        F.regexp_replace("c_name", r"0{2,}", "Z").alias("runs_collapsed"),
    )


@register(
    "sql_map_functions",
    """
    WITH m AS (
        SELECT o_orderkey,
               map(['p', 'q', 'r'],
                   [o_orderkey % 5, o_orderkey % 7, o_orderkey % 9]) AS mm
        FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           CAST(mm['p'][1] AS BIGINT) AS p_val,
           CAST(mm['q'][1] AS BIGINT) AS q_val,
           CAST(mm['r'][1] AS BIGINT) AS r_val,
           mm['zz'][1] IS NULL AS missing_null,
           CAST(cardinality(mm) AS INT) AS sz,
           array_to_string(map_keys(mm), ',') AS keys_joined,
           CAST(list_sum(map_values(mm)) AS BIGINT) AS vals_sum,
           list_contains(map_keys(mm), 'q') AS has_q
    FROM m
    """,
)
def sql_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-function battery: construction from key/value arrays, scalar
    extraction (Spark ``element_at`` vs DuckDB's list-returning bracket
    — the oracle unwraps with ``[1]``), the missing-key -> NULL
    convention, cardinality, insertion-ordered keys, value aggregation,
    and key membership — the §2.10 map surface behind the KV-pivot and
    ``jsonexpandmap`` operators."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    k = F.col("o_orderkey")
    m = F.map_from_arrays(
        F.array(F.lit("p"), F.lit("q"), F.lit("r")),
        F.array(k % 5, k % 7, k % 9),
    )
    base = o.select("o_orderkey", m.alias("mm"))
    return base.select(
        "o_orderkey",
        F.element_at("mm", "p").alias("p_val"),
        F.element_at("mm", "q").alias("q_val"),
        F.element_at("mm", "r").alias("r_val"),
        F.element_at("mm", "zz").isNull().alias("missing_null"),
        F.size("mm").alias("sz"),
        F.array_join(F.map_keys("mm"), ",").alias("keys_joined"),
        F.aggregate(
            F.map_values("mm"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("vals_sum"),
        F.array_contains(F.map_keys("mm"), "q").alias("has_q"),
    )


@register(
    "agg_ordered_string_concat",
    """
    WITH top3 AS (
        SELECT c_mktsegment, c_custkey FROM (
            SELECT c_mktsegment, c_custkey,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) WHERE rn <= 3
    )
    SELECT c_mktsegment,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
               AS top_custkeys,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM top3
    GROUP BY c_mktsegment
    """,
)
def agg_ordered_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED string aggregation — the listagg/string_agg surface,
    expressed portably: Spark has no ORDER BY inside collect_list (its
    aggregation order is nondeterministic under parallelism), so the
    deterministic form is ``array_join(array_sort(collect_list(x)))``
    matching DuckDB's ``string_agg(... ORDER BY x)`` exactly.  Applied
    to each segment's top-3 customers by balance (bounded rank
    upstream, so the concatenated value stays small at any corpus
    size — the unbounded form is the classic driver-OOM trap this gate
    deliberately avoids and documents)."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    top3 = (
        cust.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey")
    )
    return top3.groupBy("c_mktsegment").agg(
        # sort the NUMERIC keys, then stringify — sorting the strings
        # would order "1105" before "828"
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("c_custkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("top_custkeys"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "sql_try_cast_functions",
    """
    WITH raw AS (
        SELECT c_custkey,
               CASE c_custkey % 5
                    WHEN 0 THEN CAST(c_custkey AS VARCHAR)
                    WHEN 1 THEN ' ' || c_custkey || ' '
                    WHEN 2 THEN c_custkey || '.75'
                    WHEN 3 THEN 'not-a-number'
                    ELSE '' END AS num_str,
               CASE c_custkey % 4
                    WHEN 0 THEN '2024-0' || (c_custkey % 9 + 1) || '-15'
                    WHEN 1 THEN '2024-13-40'
                    WHEN 2 THEN 'yesterday'
                    ELSE '2023-02-29' END AS date_str
        FROM customer WHERE c_custkey <= 300
    )
    SELECT c_custkey,
           CAST(FLOOR(TRY_CAST(num_str AS DOUBLE)) AS BIGINT) AS as_long,
           ROUND(TRY_CAST(num_str AS DOUBLE), 2) AS as_double,
           TRY_CAST(num_str AS DOUBLE) IS NULL AS num_invalid,
           strftime(TRY_CAST(date_str AS DATE), '%Y-%m-%d') AS as_date,
           TRY_CAST(date_str AS DATE) IS NULL AS date_invalid
    FROM raw
    """,
)
def sql_try_cast_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST battery — the PERMISSIVE-ingestion semantics every
    file-drop pipeline depends on: malformed numerics ('not-a-number',
    empty string) and impossible dates ('2024-13-40', non-leap Feb 29)
    become NULL instead of failing the job, while valid values
    (whitespace-padded ints, decimals, real dates) convert exactly.
    Two live traps pinned here: (a) direct string->int casts of
    decimal strings ('7.75') — Spark truncates, DuckDB rejects — so the
    long path goes through DOUBLE; (b) DOUBLE->BIGINT casts — Spark
    truncates toward zero, DuckDB ROUNDS half-up — so the portable form
    floors explicitly before casting."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    k = F.col("c_custkey")
    num_str = (
        F.when(k % 5 == 0, k.cast("string"))
        .when(k % 5 == 1, F.concat(F.lit(" "), k.cast("string"), F.lit(" ")))
        .when(k % 5 == 2, F.concat(k.cast("string"), F.lit(".75")))
        .when(k % 5 == 3, F.lit("not-a-number"))
        .otherwise(F.lit(""))
    )
    date_str = (
        F.when(k % 4 == 0, F.concat(F.lit("2024-0"),
                                    (k % 9 + 1).cast("string"), F.lit("-15")))
        .when(k % 4 == 1, F.lit("2024-13-40"))
        .when(k % 4 == 2, F.lit("yesterday"))
        .otherwise(F.lit("2023-02-29"))
    )
    raw = c.select("c_custkey", num_str.alias("num_str"),
                   date_str.alias("date_str"))
    as_double = F.trim("num_str").try_cast("double")
    as_date = F.col("date_str").try_cast("date")
    return raw.select(
        "c_custkey",
        F.floor(as_double).try_cast("bigint").alias("as_long"),
        F.round(as_double, 2).alias("as_double"),
        as_double.isNull().alias("num_invalid"),
        F.date_format(as_date, "yyyy-MM-dd").alias("as_date"),
        as_date.isNull().alias("date_invalid"),
    )


@register(
    "stat_welch_ttest",
    """
    WITH w AS (
        SELECT
            COUNT(*) FILTER (event_type = 'click') AS n1,
            COUNT(*) FILTER (event_type = 'view') AS n2,
            AVG(value) FILTER (event_type = 'click') AS m1,
            AVG(value) FILTER (event_type = 'view') AS m2,
            var_samp(value) FILTER (event_type = 'click') AS v1,
            var_samp(value) FILTER (event_type = 'view') AS v2
        FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_view,
           ROUND(m1 - m2, 6) AS mean_diff,
           CASE WHEN n1 > 1 AND n2 > 1 THEN
               ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4)
           END AS t_stat,
           CASE WHEN n1 > 1 AND n2 > 1 THEN
               ROUND(pow(v1 / n1 + v2 / n2, 2)
                     / (pow(v1 / n1, 2) / (n1 - 1)
                        + pow(v2 / n2, 2) / (n2 - 1)), 2)
           END AS dof
    FROM w
    """,
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between event-type populations — THE
    A/B-testing primitive: unequal-variance t statistic and the
    Welch–Satterthwaite degrees of freedom, computed from one grouped
    moment pass (count/mean/sample variance per arm, map-side combined)
    and a scalar combine.  At 100 TB the expensive part is the single
    aggregation; the test statistic itself is arithmetic on six
    scalars.  Both arms are computed as conditional aggregates in ONE
    global aggregation (exactly one output row even if an arm is empty
    — ADVICE r5), with n>1 guards mirroring the oracle's CASE."""
    from .util import read_events

    ev = read_events(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    click = F.col("event_type") == "click"
    view = F.col("event_type") == "view"
    w = ev.agg(
        F.count(F.when(click, F.lit(1))).alias("n1"),
        F.count(F.when(view, F.lit(1))).alias("n2"),
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.avg(F.when(view, F.col("value"))).alias("m2"),
        F.var_samp(F.when(click, F.col("value"))).alias("v1"),
        F.var_samp(F.when(view, F.col("value"))).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    both = (F.col("n1") > 1) & (F.col("n2") > 1)
    return w.select(
        F.col("n1").cast("long").alias("n_click"),
        F.col("n2").cast("long").alias("n_view"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.when(
            both,
            F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4),
        ).alias("t_stat"),
        F.when(both, F.round(dof, 2)).alias("dof"),
    )


@register(
    "stat_chi_square_independence",
    """
    WITH obs AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               COUNT(*) AS o_ij
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    margins AS (
        SELECT seg, pri, o_ij,
               SUM(o_ij) OVER (PARTITION BY seg) AS row_n,
               SUM(o_ij) OVER (PARTITION BY pri) AS col_n,
               SUM(o_ij) OVER () AS total_n
        FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1)
                AS BIGINT) AS dof,
           ROUND(SUM(pow(o_ij - row_n * col_n * 1.0 / total_n, 2)
                     / (row_n * col_n * 1.0 / total_n)), 4) AS chi2
    FROM margins
    """,
)
def stat_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer segment and
    order priority: observed contingency counts in one grouped
    aggregation, expected counts from the margin windows (row/column/
    grand totals over the TINY contingency table — cells = segments ×
    priorities, so the windows cost nothing), then the chi² sum.  The
    categorical-association twin of the Welch gate; at scale only the
    contingency aggregation touches the data."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    obs = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("o_ij"))
    )
    w_row = Window.partitionBy("seg")
    w_col = Window.partitionBy("pri")
    w_all = Window.partitionBy()
    m = obs.select(
        "seg", "pri", "o_ij",
        F.sum("o_ij").over(w_row).alias("row_n"),
        F.sum("o_ij").over(w_col).alias("col_n"),
        F.sum("o_ij").over(w_all).alias("total_n"),
    )
    expected = F.col("row_n") * F.col("col_n") * 1.0 / F.col("total_n")
    # dof folds into the same lazy aggregate — no eager driver-side
    # distinct().count() jobs at DataFrame-construction time
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1))
        .cast("long")
        .alias("dof"),
        F.round(
            F.sum(F.pow(F.col("o_ij") - expected, 2) / expected), 4
        ).alias("chi2"),
    )


# Fixed evaluation grid for the KS gate: log-spaced over the positive
# value range so both tails contribute (values are heavy-tailed).
_KS_GRID = [0.5, 1, 2, 4, 8, 16, 32, 64, 96, 128, 160, 192, 224, 256, 320, 400]
_KS_GRID_SQL = ", ".join(f"({g})" for g in _KS_GRID)


@register(
    "stat_ks_grid_test",
    f"""
    WITH g(x) AS (VALUES {_KS_GRID_SQL}),
    arms AS (
        SELECT event_type, value FROM events
        WHERE event_type IN ('click', 'view')
    ),
    sizes AS (
        SELECT event_type, COUNT(*) AS n FROM arms GROUP BY event_type
    ),
    ecdf AS (
        SELECT g.x,
               SUM(CASE WHEN a.event_type = 'click' AND a.value <= g.x
                        THEN 1 ELSE 0 END) * 1.0
                   / (SELECT n FROM sizes WHERE event_type = 'click') AS f1,
               SUM(CASE WHEN a.event_type = 'view' AND a.value <= g.x
                        THEN 1 ELSE 0 END) * 1.0
                   / (SELECT n FROM sizes WHERE event_type = 'view') AS f2
        FROM g CROSS JOIN arms a
        GROUP BY g.x
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
           ROUND(MAX(abs(f1 - f2)), 4) AS d_stat,
           ROUND(MAX(CASE WHEN abs(f1 - f2) = m THEN x END), 1) AS d_at_x
    FROM (SELECT x, f1, f2, MAX(abs(f1 - f2)) OVER () AS m FROM ecdf)
    """,
)
def stat_ks_grid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic evaluated on a FIXED
    16-point grid — the scale-aware formulation: the exact KS needs a
    globally sorted merge of both samples (a serial bottleneck), while
    the grid ECDF is ONE aggregation pass computing 32 conditional
    counts map-side (each arm's ECDF at each grid point), giving a
    lower bound of the exact D that tightens with grid density.  This
    is how drift monitors actually run KS at warehouse scale — fixed
    bin edges, streaming-mergeable counts.  Grid evaluation reports the
    largest gap and where it occurs (ties broken toward the largest
    grid point on both engines)."""
    ev = read_events(spark, sf_dir).where(
        F.col("event_type").isin("click", "view")
    )
    aggs = []
    for g in _KS_GRID:
        for arm in ("click", "view"):
            aggs.append(
                F.sum(
                    (
                        (F.col("event_type") == arm) & (F.col("value") <= g)
                    ).cast("int")
                ).alias(f"c_{arm}_{str(g).replace('.', '_')}")
            )
        # noqa: per-grid-point conditional counts, all in ONE agg pass
    aggs.append(
        F.sum((F.col("event_type") == "click").cast("int")).alias("n_click")
    )
    aggs.append(
        F.sum((F.col("event_type") == "view").cast("int")).alias("n_view")
    )
    counts = ev.agg(*aggs)
    rows = []
    for g in _KS_GRID:
        tag = str(g).replace(".", "_")
        rows.append(
            F.struct(
                F.lit(float(g)).alias("x"),
                (F.col(f"c_click_{tag}") * 1.0 / F.col("n_click")).alias("f1"),
                (F.col(f"c_view_{tag}") * 1.0 / F.col("n_view")).alias("f2"),
            )
        )
    ecdf = counts.select(F.explode(F.array(*rows)).alias("e")).select(
        F.col("e.x").alias("x"),
        F.col("e.f1").alias("f1"),
        F.col("e.f2").alias("f2"),
    )
    w_all = Window.partitionBy()
    peaked = ecdf.withColumn("m", F.max(F.abs(F.col("f1") - F.col("f2"))).over(w_all))
    return peaked.agg(
        F.count(F.lit(1)).cast("long").alias("n_grid"),
        F.round(F.max("m"), 4).alias("d_stat"),
        F.round(
            F.max(F.when(F.abs(F.col("f1") - F.col("f2")) == F.col("m"),
                         F.col("x"))),
            1,
        ).alias("d_at_x"),
    )


@register(
    "sketch_hll_cardinality",
    """
    WITH h AS (
        SELECT o_orderpriority AS slice,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT
                   AS hv
        FROM orders WHERE o_custkey IS NOT NULL
    ),
    regs AS (
        SELECT slice, hv % 4096 AS idx,
               MAX(CASE WHEN (hv >> 12) = 0 THEN 49
                   ELSE CAST(floor(log2((hv >> 12) & (-(hv >> 12)))) AS INT) + 1
                   END) AS rho
        FROM h GROUP BY 1, 2
    ),
    allregs AS (
        SELECT 'ALL' AS slice, idx, MAX(rho) AS rho FROM regs GROUP BY 2, idx
    ),
    combined AS (
        SELECT * FROM regs UNION ALL SELECT * FROM allregs
    ),
    agg AS (
        SELECT slice, COUNT(*) AS n_regs,
               SUM(1::BIGINT << (49 - rho)) AS s_nonempty
        FROM combined GROUP BY 1
    ),
    est AS (
        SELECT slice,
               (0.7213 / (1 + 1.079 / 4096.0)) * 4096 * 4096
                   * 562949953421312.0
                   / CAST(s_nonempty + (4096 - n_regs) * 562949953421312
                          AS DOUBLE) AS raw,
               CAST(4096 - n_regs AS DOUBLE) AS v
        FROM agg
    ),
    fin AS (
        SELECT slice,
               CASE WHEN raw <= 10240.0 AND v > 0
                    THEN 4096.0 * ln(4096.0 / v) ELSE raw END AS e
        FROM est
    ),
    exact AS (
        SELECT o_orderpriority AS slice,
               COUNT(DISTINCT o_custkey) AS exact_distinct
        FROM orders GROUP BY 1
        UNION ALL
        SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM orders
    )
    SELECT f.slice, ROUND(f.e, 4) AS est_distinct,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct
    FROM fin f JOIN exact x ON f.slice = x.slice
    """,
)
def sketch_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC HyperLogLog (round 6): per-priority distinct-customer
    estimates plus an 'ALL' row computed by MERGING the per-priority
    register tables (max per idx) — never re-reading orders.  Spark's
    built-in approx_count_distinct is HLL++ with engine-private
    estimates; this md5-registered HLL with an exact-integer harmonic sum
    is reproduced bit-for-bit by DuckDB, so the sketch itself sits behind
    the differential oracle.  Register build = one (slice, idx)-keyed
    aggregation with map-side MAX partials (≤ 4096 rows per slice ever
    shuffle); the fixture sizes make BOTH estimator branches live:
    sf0.01 exercises linear counting (V large), sf0.1's ~10k-customer
    slices cross into the raw harmonic branch."""
    from ..operators.sketches import hll_estimate, hll_merge, hll_sketch

    orders = t(spark, sf_dir, "orders")
    sk = hll_sketch(orders, "o_custkey", ["o_orderpriority"])
    per = hll_estimate(sk, ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    per_rows = per.join(exact, "o_orderpriority").select(
        F.col("o_orderpriority").alias("slice"), "est_distinct", "exact_distinct"
    )
    merged = hll_merge(sk.select("idx", "rho"), [])
    all_row = (
        hll_estimate(merged, [])
        .crossJoin(
            orders.agg(
                F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct")
            )
        )
        .select(F.lit("ALL").alias("slice"), "est_distinct", "exact_distinct")
    )
    return per_rows.unionByName(all_row)


def _zorder_oracle(bits: int = 8) -> str:
    """Morton-interleave oracle: the bit arithmetic unrolled as SQL (no
    loops in SQL; the generator IS the spec, mirroring
    ``layout.interleave_bits``)."""
    terms = " + ".join(
        f"(((bu >> {i}) & 1) << {2 * i}) + (((bv >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    nb = 1 << bits
    return f"""
    WITH bounds AS (
        SELECT CAST(MIN(l_partkey) AS DOUBLE) AS mnp,
               CAST(MAX(l_partkey) AS DOUBLE) AS mxp,
               CAST(MIN(l_suppkey) AS DOUBLE) AS mns,
               CAST(MAX(l_suppkey) AS DOUBLE) AS mxs
        FROM lineitem
    ),
    q AS (
        SELECT LEAST(GREATEST(CAST(floor((CAST(l_partkey AS DOUBLE) - mnp)
                   * {nb}.0 / (mxp - mnp)) AS BIGINT), 0), {nb - 1}) AS bu,
               LEAST(GREATEST(CAST(floor((CAST(l_suppkey AS DOUBLE) - mns)
                   * {nb}.0 / (mxs - mns)) AS BIGINT), 0), {nb - 1}) AS bv
        FROM lineitem CROSS JOIN bounds
    )
    SELECT CAST({terms} AS BIGINT) AS zval, CAST(COUNT(*) AS BIGINT) AS n
    FROM q GROUP BY 1 ORDER BY n DESC, zval LIMIT 20
    """


@register("layout_zorder_cells", _zorder_oracle())
def layout_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) clustering key over (l_partkey, l_suppkey) —
    the layout primitive behind Delta OPTIMIZE ZORDER BY / Iceberg sort
    orders: interleaved quantized bits put rows close in BOTH dimensions
    into the same files, so parquet min/max footers prune scans for
    either predicate.  Bounds come from one scalar aggregate (4 doubles
    of driver state broadcast back as literals — the house two-phase
    pattern); the key itself is pure codegen'd bit arithmetic, checked
    here cell-by-cell against DuckDB computing the identical interleave.
    ``tests/test_layout.py`` + PERFORMANCE.md measure the actual
    file-skipping win of writing with this key."""
    from ..operators.layout import zorder_key

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    keyed, _bounds = zorder_key(li, ["l_partkey", "l_suppkey"], bits=8)
    return (
        keyed.groupBy(F.col("__z").alias("zval"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "zval")
        .limit(20)
    )


@register(
    "sketch_histogram_quantiles",
    """
    WITH hx AS (
        SELECT l_returnflag,
               floor(CAST(l_extendedprice AS DOUBLE) / 1000.0) AS bin,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, bin, cnt,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) - cnt
                   AS cum_before,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_total
        FROM hx
    ),
    qv AS (SELECT unnest([0.5, 0.95, 0.99]) AS q),
    hit AS (
        SELECT l_returnflag, q, bin, cnt, cum_before, q * n_total AS t
        FROM c CROSS JOIN qv
        WHERE cum >= q * n_total AND cum_before < q * n_total
    )
    SELECT l_returnflag, q,
           CAST(ROUND(bin * 1000.0 + (t - cum_before) / cnt * 1000.0, 4)
                AS DOUBLE) AS quantile_est
    FROM hit
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE histogram quantiles (round 6): p50/p95/p99 of extended
    price per return flag from a fixed-width histogram sketch — the
    deterministic, oracle-checkable alternative to approx_percentile
    (whose GK/t-digest state is engine-private) and the scalable
    alternative to a global sort: build is one (flag, bin)-keyed
    aggregation with map-side partials, the quantile pass is a window
    over each group's ~hundreds of bins, and stored per-slice
    histograms ADD, so percentile monitoring over any slice union needs
    no rescan (`histogram_merge`)."""
    from ..operators.sketches import histogram_quantiles, histogram_sketch

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    sk = histogram_sketch(li, "l_extendedprice", ["l_returnflag"], 1000.0)
    out = histogram_quantiles(sk, ["l_returnflag"], [0.5, 0.95, 0.99], 1000.0)
    return out.select(
        "l_returnflag", "q", F.round("quantile_est", 4).alias("quantile_est")
    )
