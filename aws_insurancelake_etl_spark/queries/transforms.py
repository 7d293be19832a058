"""The declarative transform library exercised as oracle-checked queries
(SURVEY §2.10 scalar families, §2.3 projection, §2.4 lookup joins).

Each query builds deterministic raw inputs from the TPC-H-ish tables
(e.g. re-format a date into a string) and then applies the *actual engine
operators* (``transform_date``, ``transform_currency``, ...), so the oracle
checks the operator implementations, not copies of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..context import RunContext
from .util import read_events
from ..operators.dataprotection import transform_hash, transform_redact
from ..operators.lookup import transform_lookup, transform_multilookup
from ..operators.misc import transform_filterrows, transform_merge
from ..operators.premium import (
    transform_addcolumns,
    transform_earnedpremium,
    transform_enddate,
    transform_flipsign,
    transform_multiplycolumns,
    transform_policymonths,
)
from ..operators.stringmanipulation import (
    transform_columnfromcolumn,
    transform_columnreplace,
    transform_combinecolumns,
    transform_literal,
)
from ..operators.structureddata import (
    transform_json,
    transform_jsonexpandarray,
    transform_jsonexpandmap,
)
from ..operators.typeconversion import (
    transform_changetype,
    transform_currency,
    transform_date,
    transform_implieddecimal,
    transform_timestamp,
    transform_titlecase,
)

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


def _ctx(spark: SparkSession) -> RunContext:
    return RunContext(spark=spark, args={"base_file_name": "orders-20240101.csv"})


@register(
    "tr_date_roundtrip",
    """
    SELECT o_orderkey,
           strftime(strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y'), '%Y-%m-%d')
               AS parsed_date,
           strftime(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts
    FROM orders WHERE o_orderkey % 25 = 0
    """,
)
def tr_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_date / transform_timestamp on string-formatted dates."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "MM/dd/yyyy").alias("date_str"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )
    df = transform_date(
        df, [{"field": "parsed_date", "source": "date_str", "format": "MM/dd/yyyy"}], ctx
    )
    df = transform_timestamp(
        df, [{"field": "parsed_ts", "source": "ts_str", "format": "yyyy-MM-dd HH:mm:ss"}], ctx
    )
    return df.select(
        "o_orderkey",
        F.date_format("parsed_date", "yyyy-MM-dd").alias("parsed_date"),
        F.date_format("parsed_ts", "yyyy-MM-dd HH:mm:ss").alias("parsed_ts"),
    )


@register(
    "tr_changetype_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def tr_changetype_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty_int"),
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price_str"),
        )
    )
    df = transform_changetype(df, {"qty_int": "bigint", "price_str": "string"}, ctx)
    return df


@register(
    "tr_implieddecimal",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
               AS raw_digits,
           CAST(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS DECIMAL(16,0)) / 100 AS DECIMAL(16,2)) AS DOUBLE) AS implied
    FROM lineitem WHERE l_orderkey % 50 = 1
    """,
)
def tr_implieddecimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_implieddecimal: digit string with 2 implied decimals."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string")
            .alias("raw_digits"),
        )
    )
    df = transform_implieddecimal(
        df, [{"field": "implied", "source": "raw_digits", "format": "16,2"}], ctx
    )
    return df.withColumn("implied", F.col("implied").cast("double"))


@register(
    "tr_currency_parse",
    """
    SELECT o_orderkey,
           CAST(CAST(regexp_replace('$' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
               '[^-0-9.]+', '', 'g') AS DECIMAL(16,2)) AS DOUBLE) AS us_amount,
           CAST(CAST(regexp_replace(regexp_replace(
                    replace(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), '.', ',')
                        || ' EUR',
                    '[^-0-9,-]+', '', 'g'), ',', '.', 'g') AS DECIMAL(16,2)) AS DOUBLE)
               AS eu_amount
    FROM orders WHERE o_orderkey % 40 = 0
    """,
)
def tr_currency_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = _ctx(spark)
    price_str = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select(
            "o_orderkey",
            F.concat(F.lit("$"), price_str).alias("us_raw"),
            F.concat(F.regexp_replace(price_str, r"\.", ","), F.lit(" EUR")).alias("eu_raw"),
        )
    )
    df = transform_currency(
        df,
        [
            {"field": "us_amount", "source": "us_raw", "format": "16,2"},
            {"field": "eu_amount", "source": "eu_raw", "format": "16,2", "euro": True},
        ],
        ctx,
    )
    return df.select(
        "o_orderkey",
        F.col("us_amount").cast("double").alias("us_amount"),
        F.col("eu_amount").cast("double").alias("eu_amount"),
    )


@register(
    "tr_titlecase",
    """
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
               x -> upper(x[1]) || lower(x[2:])), ' ') AS name_title
    FROM part
    """,
)
def tr_titlecase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = _ctx(spark)
    df = t(spark, sf_dir, "part").select("p_partkey", F.col("p_name").alias("name_title"))
    return transform_titlecase(df, ["name_title"], ctx)


@register(
    "tr_regex_extract_replace",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\S+)', 1) AS first_word,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
    FROM part
    """,
)
def tr_regex_extract_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_columnfromcolumn + transform_columnreplace."""
    ctx = _ctx(spark)
    df = t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    df = transform_columnfromcolumn(
        df, [{"field": "first_word", "source": "p_name", "pattern": r"^(\S+)"}], ctx
    )
    df = transform_columnreplace(
        df, [{"field": "brand_masked", "source": "p_brand", "pattern": "[0-9]+",
              "replacement": "#"}], ctx
    )
    return df.select("p_partkey", "first_word", "brand_masked")


@register(
    "tr_combine_literal",
    """
    SELECT p_partkey,
           trim(p_brand || '-' || CAST(p_partkey AS VARCHAR) || '-'
                || CAST(p_size AS VARCHAR)) AS row_key,
           'synthetic' AS source_system
    FROM part WHERE p_partkey % 5 = 0
    """,
)
def tr_combine_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_combinecolumns (native concat fast path) + transform_literal."""
    ctx = _ctx(spark)
    df = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 5 == 0)
    df = transform_combinecolumns(
        df,
        [{"field": "row_key", "format": "{}-{}-{}",
          "source_columns": ["p_brand", "p_partkey", "p_size"]}],
        ctx,
    )
    df = transform_literal(df, {"source_system": "synthetic"}, ctx)
    return df.select("p_partkey", "row_key", "source_system")


@register(
    "tr_hash_redact",
    """
    SELECT c_custkey, sha256(c_name) AS name_hash, '****' AS acct_redacted
    FROM customer
    """,
)
def tr_hash_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_hash (native sha2) + transform_redact."""
    ctx = _ctx(spark)
    df = t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_name").alias("name_hash"), F.col("c_acctbal").alias("acct_redacted")
    )
    df = transform_hash(df, ["name_hash"], ctx)
    df = transform_redact(df, {"acct_redacted": "****"}, ctx)
    return df


@register(
    "tr_merge_coalesce",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), NULLIF(o_orderpriority, '5-LOW'), 'fallback')
               AS merged
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def tr_merge_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select(
            "o_orderkey",
            F.nullif("o_orderstatus", F.lit("P")).alias("status_opt"),
            F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority_opt"),
        )
    )
    df = transform_merge(
        df,
        [{"field": "merged", "source_list": ["status_opt", "priority_opt"],
          "default": "fallback"}],
        ctx,
    )
    return df.select("o_orderkey", "merged")


_NORMALIZED_MONTHS_SQL = """
        CASE WHEN eff IS NULL OR exp IS NULL THEN NULL
             WHEN (exp - to_months(1))::DATE < eff
                 THEN GREATEST(0, (year(exp)*12 + month(exp)) - (year(eff)*12 + month(eff)) + 1)
             ELSE GREATEST(0, (year(exp)*12 + month(exp)) - (year(eff)*12 + month(eff)))
        END
"""


@register(
    "tr_enddate_policymonths",
    f"""
    SELECT o_orderkey, strftime(eff, '%Y-%m-%d') AS eff, strftime(exp, '%Y-%m-%d') AS exp,
           {_NORMALIZED_MONTHS_SQL} AS policy_months
    FROM (
        SELECT o_orderkey,
               o_orderdate::DATE AS eff,
               (o_orderdate::DATE + to_months((o_orderkey % 24 + 1)::INT))::DATE AS exp
        FROM orders WHERE o_orderkey % 15 = 0
    )
    """,
)
def tr_enddate_policymonths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_enddate (add_months by column) + transform_policymonths
    (normalized whole-month count, native month-index arithmetic)."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 15 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("eff"),
            (F.col("o_orderkey") % 24 + 1).cast("int").alias("term"),
        )
    )
    df = transform_enddate(df, [{"field": "exp", "start_date": "eff", "num_months": "term"}], ctx)
    df = transform_policymonths(
        df,
        [{"field": "policy_months", "policy_effective_date": "eff",
          "policy_expiration_date": "exp", "normalized": True}],
        ctx,
    )
    return df.select(
        "o_orderkey",
        F.date_format("eff", "yyyy-MM-dd").alias("eff"),
        F.date_format("exp", "yyyy-MM-dd").alias("exp"),
        "policy_months",
    )


@register(
    "tr_earnedpremium",
    f"""
    SELECT o_orderkey,
           CAST(CASE WHEN months_norm <= 0 OR pend < eff OR pend > date_trunc('month', exp)
                     THEN NULL
                     ELSE CAST(FLOOR((2 * abs(cents) * 1 + months_norm)
                                     / (2.0 * months_norm)) AS BIGINT)
                          * (CASE WHEN cents < 0 THEN -1 ELSE 1 END) * 0.01
                END AS DOUBLE) AS earned_straightline,
           CAST(CASE WHEN pend < eff OR pstart > exp OR date_diff('day', eff, exp) < 0
                     THEN NULL
                     ELSE CAST(FLOOR((2 * abs(cents)
                                      * (date_diff('day', GREATEST(pstart, eff),
                                                   LEAST(pend, exp)) + 1)
                                      + (date_diff('day', eff, exp) + 1))
                                     / (2.0 * (date_diff('day', eff, exp) + 1)))
                          AS BIGINT)
                          * (CASE WHEN cents < 0 THEN -1 ELSE 1 END) * 0.01
                END AS DOUBLE) AS earned_byday
    FROM (
        SELECT o_orderkey, eff, exp, pstart, pend,
               CAST(CAST(o_totalprice AS DECIMAL(16,2)) * 100 AS BIGINT) AS cents,
               {_NORMALIZED_MONTHS_SQL} AS months_norm
        FROM (
            SELECT o_orderkey, o_totalprice,
                   o_orderdate::DATE AS eff,
                   (o_orderdate::DATE + to_months(12))::DATE AS exp,
                   date_trunc('month', o_orderdate::DATE)::DATE AS pstart,
                   last_day(o_orderdate::DATE) AS pend
            FROM orders WHERE o_orderkey % 15 = 1
        )
    )
    """,
)
def tr_earnedpremium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_earnedpremium straight-line + by-day over the first policy
    month, policy = 12 months from order date."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 15 == 1)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(16,2)").alias("premium"),
            F.col("o_orderdate").cast("date").alias("eff"),
            F.add_months(F.col("o_orderdate").cast("date"), 12).alias("exp"),
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("pstart"),
            F.last_day(F.col("o_orderdate").cast("date")).alias("pend"),
        )
    )
    df = transform_earnedpremium(
        df,
        [
            {"field": "earned_straightline", "written_premium_list": ["premium"],
             "policy_effective_date": "eff", "policy_expiration_date": "exp",
             "period_start_date": "pstart", "period_end_date": "pend"},
            {"field": "earned_byday", "written_premium_list": ["premium"],
             "policy_effective_date": "eff", "policy_expiration_date": "exp",
             "period_start_date": "pstart", "period_end_date": "pend", "byday": True},
        ],
        ctx,
    )
    return df.select(
        "o_orderkey",
        F.col("earned_straightline").cast("double").alias("earned_straightline"),
        F.col("earned_byday").cast("double").alias("earned_byday"),
    )


@register(
    "tr_math_family",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_quantity AS DECIMAL(18,2)) + CAST(l_discount AS DECIMAL(18,2))
               + 0, 2) AS DOUBLE) AS qty_plus_disc,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)), 2) AS DOUBLE) AS price_times_qty,
           CAST(ROUND(- CAST(l_extendedprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS price_negated
    FROM lineitem WHERE l_orderkey % 75 = 0
    """,
)
def tr_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_addcolumns + transform_multiplycolumns + transform_flipsign."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 75 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
            F.col("l_discount").cast("decimal(18,2)").alias("disc_dec"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
        )
    )
    df = transform_addcolumns(
        df, [{"field": "qty_plus_disc", "source_columns": ["qty_dec", "disc_dec"]}], ctx
    )
    df = transform_multiplycolumns(
        df, [{"field": "price_times_qty", "source_columns": ["price_dec", "qty_dec"]}], ctx
    )
    df = transform_flipsign(df, [{"field": "price_negated", "source": "price_dec"}], ctx)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.round("qty_plus_disc", 2).cast("double").alias("qty_plus_disc"),
        F.round("price_times_qty", 2).cast("double").alias("price_times_qty"),
        F.round("price_negated", 2).cast("double").alias("price_negated"),
    )


@register(
    "tr_filterrows",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_totalprice > 100000 AND o_orderstatus <> 'P'
    """,
)
def tr_filterrows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = _ctx(spark)
    df = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    return transform_filterrows(
        df,
        [{"condition": "o_totalprice > 100000"}, {"condition": "o_orderstatus != 'P'"}],
        ctx,
    )


@register(
    "tr_lookup_join",
    """
    SELECT c_custkey, COALESCE(n_name, 'N/A') AS nation_name
    FROM customer LEFT JOIN nation
      ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR) AND n_nationkey < 20
    """,
)
def tr_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_lookup: broadcast left join against a value-lookup table
    (nations 0-19 only, so some rows take the nomatch default)."""
    ctx = _ctx(spark)
    nation_map = {
        str(row["n_nationkey"]): row["n_name"]
        for row in t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20).collect()
    }
    ctx.lookups.put_values("NationCd", nation_map)
    df = t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("string").alias("nation_key_str")
    )
    df = transform_lookup(
        df,
        [{"field": "nation_name", "source": "nation_key_str", "lookup": "NationCd",
          "nomatch": "N/A"}],
        ctx,
    )
    return df.select("c_custkey", "nation_name")


@register(
    "tr_multilookup_join",
    """
    SELECT s_suppkey,
           COALESCE(n_name, 'N/A') AS nation_name,
           COALESCE(CAST(n_regionkey AS VARCHAR), 'N/A') AS region_key
    FROM supplier LEFT JOIN nation ON CAST(s_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
    """,
)
def tr_multilookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_multilookup: N return attributes keyed on concatenated
    match columns."""
    ctx = _ctx(spark)
    multi = {
        str(row["n_nationkey"]): {
            "nation_name": row["n_name"],
            "region_key": str(row["n_regionkey"]),
        }
        for row in t(spark, sf_dir, "nation").collect()
    }
    ctx.lookups.put_multi("NationInfo", multi)
    df = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("string").alias("nation_key_str")
    )
    df = transform_multilookup(
        df,
        [{"lookup_group": "NationInfo", "match_columns": ["nation_key_str"],
          "return_attributes": ["nation_name", "region_key"], "nomatch": "N/A"}],
        ctx,
    )
    return df.select("s_suppkey", "nation_name", "region_key")


@register(
    "tr_json_structured",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id % 7 = 0
    """,
)
def tr_json_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_json: JSON string column → struct (distributed inference)."""
    ctx = _ctx(spark)
    df = (
        read_events(spark, sf_dir)
        .filter(F.col("event_id") % 7 == 0)
        .select("event_id", "props")
    )
    df = transform_json(df, ["props"], ctx)
    return df.select("event_id", F.col("props.k").cast("bigint").alias("k_value"))


@register(
    "tr_jsonexpandmap",
    """
    SELECT event_id, kv_index, kv_key, kv_value FROM (
        SELECT event_id, 1 AS kv_index, 'etype' AS kv_key, event_type AS kv_value
        FROM events WHERE event_id % 11 = 0
        UNION ALL
        SELECT event_id, 2, 'uid', CAST(user_id AS VARCHAR)
        FROM events WHERE event_id % 11 = 0
    )
    """,
)
def tr_jsonexpandmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_jsonexpandmap: struct → (1-based index, key, value) rows.
    Struct field order drives the index, so the oracle enumerates it."""
    ctx = _ctx(spark)
    df = (
        read_events(spark, sf_dir)
        .filter(F.col("event_id") % 11 == 0)
        .select(
            "event_id",
            F.struct(
                F.col("event_type").alias("etype"),
                F.col("user_id").cast("string").alias("uid"),
            ).alias("kv"),
        )
    )
    df = transform_jsonexpandmap(
        df, [{"field": "kv", "index_field": "kv_index", "key_field": "kv_key"}], ctx
    )
    return df.select(
        "event_id", "kv_index", "kv_key", F.col("kv").alias("kv_value")
    )


@register(
    "tr_fixedwidth_slice",
    """
    SELECT trim(substr(line, 1, 10)) AS policy_id,
           trim(substr(line, 11, 12)) AS amount_str,
           trim(substr(line, 23, 10)) AS status
    FROM (
        SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, ' ')
               || lpad(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 12, ' ')
               || rpad(o_orderstatus, 10, ' ') AS line
        FROM orders WHERE o_orderkey % 30 = 0
    )
    """,
)
def tr_fixedwidth_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width scan semantics (reference ``etl_collect_to_cleanse.py:
    138-152``): cumulative-width substr slices + trim, applied to rows
    rendered as fixed-width lines.  Same per-column projection the
    fixed-width reader builds from the mapping CSV widths."""
    lines = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 30 == 0)
        .select(
            F.concat(
                F.lpad(F.col("o_orderkey").cast("string"), 10, " "),
                F.lpad(F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 12, " "),
                F.rpad(F.col("o_orderstatus"), 10, " "),
            ).alias("value")
        )
    )
    mapping = [
        {"sourcename": "f1", "destname": "policy_id", "width": "10"},
        {"sourcename": "f2", "destname": "amount_str", "width": "12"},
        {"sourcename": "f3", "destname": "status", "width": "10"},
    ]
    from functools import reduce  # noqa: PLC0415

    columns = []
    for index, field_data in enumerate(mapping):
        start = reduce(lambda acc, row: acc + int(row["width"]), mapping[:index], 0) + 1
        columns.append(
            F.trim(F.col("value").substr(start, int(field_data["width"]))).alias(
                field_data["destname"]
            )
        )
    return lines.select(columns)


@register(
    "dq_profile_orders",
    """
    SELECT 'o_custkey' AS column_name,
           ROUND(COUNT(o_custkey) * 1.0 / COUNT(*), 6) AS completeness,
           ROUND(COUNT(DISTINCT o_custkey) * 1.0 / COUNT(o_custkey), 6) AS uniqueness
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           ROUND(COUNT(o_orderstatus) * 1.0 / COUNT(*), 6),
           ROUND(COUNT(DISTINCT o_orderstatus) * 1.0 / COUNT(o_orderstatus), 6)
    FROM orders
    """,
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DQ engine's Completeness/Uniqueness aggregates surfaced as a
    profile query (one pass per column set, map-side partials)."""
    orders = t(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return orders.agg(
            F.lit(col).alias("column_name"),
            F.round(F.count(F.col(col)) * 1.0 / F.count(F.lit(1)), 6).alias("completeness"),
            F.round(
                F.count_distinct(F.col(col)) * 1.0 / F.count(F.col(col)), 6
            ).alias("uniqueness"),
        )

    return profile("o_custkey").unionByName(profile("o_orderstatus"))


@register(
    "agg_numeric_audit",
    """
    SELECT COUNT(*) AS row_count,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_quantity,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS sum_extendedprice,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_discount,
           CAST(ROUND(SUM(CAST(l_tax AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_tax
    FROM lineitem
    """,
)
def agg_numeric_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage numeric-audit control totals (``datalineage.py:135-145``):
    row count + per-numeric-column sums in ONE aggregate job."""
    line = t(spark, sf_dir, "lineitem")
    return line.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_quantity"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_extendedprice"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,4)")), 4)
        .cast("double")
        .alias("sum_discount"),
        F.round(F.sum(F.col("l_tax").cast("decimal(18,4)")), 4)
        .cast("double")
        .alias("sum_tax"),
    )


@register(
    "tr_pii_scan_redact",
    r"""
    WITH synth AS (
        SELECT c_custkey, c_name,
               'contact ' || lower(replace(c_name, '#', '')) || '@example.com '
                   || 'or 25-989-741-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                   AS contact_note
        FROM customer
    ),
    scans AS (
        SELECT 'email' AS kind,
               CAST(SUM(CASE WHEN len(regexp_extract_all(contact_note,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) > 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_matched,
               CAST(SUM(len(regexp_extract_all(contact_note,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
                   AS BIGINT) AS n_matches
        FROM synth
        UNION ALL
        SELECT 'phone',
               CAST(SUM(CASE WHEN len(regexp_extract_all(contact_note,
                   '\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b')) > 0 THEN 1 ELSE 0 END)
                   AS BIGINT),
               CAST(SUM(len(regexp_extract_all(contact_note,
                   '\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b'))) AS BIGINT)
        FROM synth
        UNION ALL
        SELECT 'account',
               CAST(SUM(CASE WHEN len(regexp_extract_all(c_name, '#\d{3,}')) > 0
                   THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(len(regexp_extract_all(c_name, '#\d{3,}'))) AS BIGINT)
        FROM synth
    )
    SELECT kind, n_rows_matched, n_matches FROM scans
    """,
)
def tr_pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit over a synthesized free-text contact field (the synthetic
    tables carry no real PII, so the note embeds an email + phone per
    customer): per-kind row and match counts via native ``regexp_count``,
    one narrow aggregation pass.  Patterns live in the Java/RE2-portable
    subset so the DuckDB oracle counts identically —  the same property
    that makes the masks (``transform_piiredact``) reproducible across
    engines."""
    from ..operators.dataprotection import PII_PATTERNS, pii_scan

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.concat(
            F.lit("contact "),
            F.lower(F.regexp_replace("c_name", "#", "")),
            F.lit("@example.com or 25-989-741-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("contact_note"),
    )
    scans = pii_scan(
        cust,
        ["contact_note"],
        {k: PII_PATTERNS[k] for k in ("email", "phone")},
    ).union(
        pii_scan(cust, ["c_name"], {"account": PII_PATTERNS["account"]})
    )
    return scans.select("kind", "n_rows_matched", "n_matches")


@register(
    "tr_jsonexpandarray",
    r"""
    SELECT doc_id,
           generate_subscripts(string_split_regex(trim(text), '\s+'), 1)
               AS word_idx,
           unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents WHERE doc_id % 13 = 0
    """,
)
def tr_jsonexpandarray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_jsonexpandarray: array column → one row per element with a
    1-based index column (posexplode_outer; null/empty arrays keep their
    row).  Gate feeds a token array derived from documents; the oracle's
    generate_subscripts is 1-based by definition, so index parity is
    checked directly."""
    ctx = _ctx(spark)
    df = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 13 == 0)
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words"))
    )
    df = transform_jsonexpandarray(
        df, [{"field": "words", "index_field": "word_idx"}], ctx
    )
    return df.select("doc_id", "word_idx", F.col("words").alias("word"))


@register(
    "tr_filename_parse",
    """
    SELECT o_orderkey, 'orders' AS source_table, '20240101' AS file_date
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def tr_filename_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_filename (reference
    ``datatransform_stringmanipulation.py`` filename transform): regex
    group-1 extraction from the run-context source file name
    (``orders-20240101.csv``) materialized as constant columns on every
    row — table name and file date here.  Constant columns are literals,
    so the plan stays fully narrow; the oracle states the expected
    constants directly."""
    from ..operators.stringmanipulation import transform_filename

    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey")
    )
    return transform_filename(
        df,
        [
            {"field": "source_table", "pattern": r"^([a-z]+)-\d+\.csv$",
             "required": True},
            {"field": "file_date", "pattern": r"-(\d{8})\.csv$", "required": True},
        ],
        _ctx(spark),
    )


@register(
    "tr_flatten_clean_names",
    """
    SELECT o_orderkey AS order_key,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
           o_orderstatus AS statuscode
    FROM orders WHERE o_orderkey % 60 = 0
    """,
)
def tr_flatten_clean_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten_schema + clean_column_names (reference
    ``etl_collect_to_cleanse.py`` schema prep): a nested struct with
    messy field names (spaces, dots, semicolons) is flattened one level
    (``field.*``, no row multiplication) and the resulting columns pass
    through the parquet-safe rename rules (trim/lower, strip
    ``,;{}()``-class chars, `` .:`` → ``_``).  The oracle re-states the
    values under the names the cleaner must produce, so both the flatten
    and every rename rule are value-checked."""
    from ..mapping import clean_column_names
    from ..operators.structureddata import transform_flatten

    nested = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 60 == 0)
        .select(
            F.struct(
                F.col("o_orderkey").alias("Order Key"),
                F.col("o_totalprice").cast("decimal(12,2)").alias("Total.Price"),
            ).alias("Order Info"),
            F.col("o_orderstatus").alias("Status;Code"),
        )
    )
    flat = transform_flatten(
        nested, [{"field": "Order Info", "keep_field": False}], _ctx(spark)
    )
    cleaned, _field_map = clean_column_names(flat)
    # Surface the decimal as a double (registry convention: exact decimal
    # inside, rounded double at the gate boundary for cross-engine hashing).
    return cleaned.withColumn("total_price", F.col("total_price").cast("double"))


@register(
    "tr_xml_structured",
    """
    SELECT o_orderkey,
           o_orderkey AS rec_key,
           o_orderstatus AS rec_status
    FROM orders WHERE o_orderkey % 70 = 0
    """,
)
def tr_xml_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_xml (reference ``datatransform_structureddata.py``
    xmlstructured): an XML string column rendered from orders rows is
    parsed back into a nested struct with Spark-4 native
    ``schema_of_xml`` + ``from_xml`` (schema inferred from a bounded
    driver-side sample, widest wins), then fields are extracted.  The
    oracle re-states the payload from the source table, so the
    render → infer → parse → extract loop is value-checked end-to-end —
    the XML twin of ``tr_json_structured``."""
    from ..operators.structureddata import transform_xml

    df = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 70 == 0)
        .select(
            "o_orderkey",
            F.concat(
                F.lit("<rec><key>"),
                F.col("o_orderkey").cast("string"),
                F.lit("</key><status>"),
                F.col("o_orderstatus"),
                F.lit("</status></rec>"),
            ).alias("payload"),
        )
    )
    df = transform_xml(df, ["payload"], _ctx(spark))
    return df.select(
        "o_orderkey",
        F.col("payload.key").cast("bigint").alias("rec_key"),
        F.col("payload.status").alias("rec_status"),
    )


@register(
    "tr_date_shift_anonymize",
    """
    SELECT event_id, user_id,
           ts + INTERVAL 1 DAY * CAST(
               ('0x' || substr(md5('dateshift:' || CAST(user_id AS VARCHAR)),
                               1, 8))::BIGINT % 731 - 365 AS INT) AS ts_shifted
    FROM events
    """,
)
def tr_date_shift_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deterministic date shift (±365 days, md5-derived): absolute
    dates obscured, intra-user intervals exactly preserved, zero shuffles.
    See ``operators/dataprotection.date_shift``."""
    from ..operators.dataprotection import date_shift

    ev = read_events(spark, sf_dir).select("event_id", "user_id", "ts")
    return date_shift(ev, ts_cols=["ts"], entity_col="user_id").select(
        "event_id", "user_id", F.col("ts").alias("ts_shifted")
    )


@register(
    "tr_k_anonymity_audit",
    """
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) < 8
    """,
)
def tr_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit on (nation, market segment) quasi-identifiers:
    equivalence classes smaller than k=8 — the groups a privacy-safe
    release must generalize or suppress.  One map-side-combined groupBy;
    output bounded by risky classes.  See
    ``operators/dataprotection.k_anonymity_audit``."""
    from ..operators.dataprotection import k_anonymity_audit

    return k_anonymity_audit(
        t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=8
    )


@register(
    "tr_luhn_checksum",
    """
    WITH synth AS (
        SELECT c_custkey,
               lpad(CAST(c_custkey * 7919 % 1000000000 AS VARCHAR), 15, '4')
                   AS pan15
        FROM customer WHERE c_custkey <= 400
    ),
    digits AS (
        SELECT c_custkey, pan15,
               -- base digit at left index i sits 17-i from the PAN's right;
               -- Luhn doubles even right-positions, i.e. ODD i here
               list_sum(list_transform(
                   range(1, 16),
                   i -> CASE WHEN i % 2 = 0
                             THEN CAST(substr(pan15, i, 1) AS INTEGER)
                             ELSE CASE WHEN CAST(substr(pan15, i, 1) AS INTEGER) * 2 > 9
                                       THEN CAST(substr(pan15, i, 1) AS INTEGER) * 2 - 9
                                       ELSE CAST(substr(pan15, i, 1) AS INTEGER) * 2
                                  END END)) AS weighted_sum
        FROM synth
    ),
    finished AS (
        SELECT c_custkey,
               pan15 || CAST((10 - weighted_sum % 10) % 10 AS VARCHAR) AS pan,
               CAST((10 - weighted_sum % 10) % 10 AS INT) AS check_digit
        FROM digits
    )
    SELECT c_custkey, pan, check_digit,
           -- independent full-PAN validation: double even right-positions
           list_sum(list_transform(
               range(1, 17),
               i -> CASE WHEN (17 - i) % 2 = 1
                         THEN CAST(substr(pan, i, 1) AS INTEGER)
                         ELSE CASE WHEN CAST(substr(pan, i, 1) AS INTEGER) * 2 > 9
                                   THEN CAST(substr(pan, i, 1) AS INTEGER) * 2 - 9
                                   ELSE CAST(substr(pan, i, 1) AS INTEGER) * 2
                              END END)) % 10 = 0 AS luhn_valid
    FROM finished
    """,
)
def tr_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) check-digit computation — the validation every PII
    scanner runs before flagging a 16-digit run as a payment card
    (ISO/IEC 7812; pure digit arithmetic, fully public): for a
    synthesized 15-digit base, double every second digit from the
    right, subtract 9 above 9, and the check digit completes the sum to
    a multiple of 10.  Native higher-order array expressions on both
    sides (transform over digit positions) — zero UDFs, zero shuffles;
    the gate VALIDATES the emitted 16-digit PAN with an independent
    full-PAN Luhn pass rather than asserting it."""
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    pan15 = F.lpad(
        ((F.col("c_custkey") * 7919) % 1000000000).cast("string"), 15, "4"
    )
    synth = c.select("c_custkey", pan15.alias("pan15"))
    # base digit at left index i sits 17-i from the final PAN's right;
    # Luhn doubles even right-positions, i.e. ODD i here
    weighted = F.expr(
        "aggregate(sequence(1, 15), 0, (acc, i) ->"
        " acc + CASE WHEN i % 2 = 0"
        "            THEN CAST(substr(pan15, i, 1) AS INT)"
        "            ELSE CASE WHEN CAST(substr(pan15, i, 1) AS INT) * 2 > 9"
        "                      THEN CAST(substr(pan15, i, 1) AS INT) * 2 - 9"
        "                      ELSE CAST(substr(pan15, i, 1) AS INT) * 2"
        "                 END END)"
    )
    digits = synth.withColumn("weighted_sum", weighted)
    check = (10 - F.col("weighted_sum") % 10) % 10
    finished = digits.select(
        "c_custkey",
        F.concat("pan15", check.cast("string")).alias("pan"),
        check.cast("int").alias("check_digit"),
    )
    # independent full-PAN validation — computed, never asserted
    validate = F.expr(
        "aggregate(sequence(1, 16), 0, (acc, i) ->"
        " acc + CASE WHEN (17 - i) % 2 = 1"
        "            THEN CAST(substr(pan, i, 1) AS INT)"
        "            ELSE CASE WHEN CAST(substr(pan, i, 1) AS INT) * 2 > 9"
        "                      THEN CAST(substr(pan, i, 1) AS INT) * 2 - 9"
        "                      ELSE CAST(substr(pan, i, 1) AS INT) * 2"
        "                 END END) % 10 = 0"
    )
    return finished.select(
        "c_custkey", "pan", "check_digit", validate.alias("luhn_valid")
    )
