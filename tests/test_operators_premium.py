"""Premium-math operators, pinned to the reference's unit-test expectations
(``/root/reference/test/test_datatransform_premium.py:76-134``): 12+6 rows
from expandpolicymonths, 6000.00/100.50 sums, 750.00/70.35/0 products,
normalized month counts, straight-line and by-day earned premium."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from aws_insurancelake_etl_spark.operators.premium import (
    transform_addcolumns,
    transform_earnedpremium,
    transform_enddate,
    transform_expandpolicymonths,
    transform_flipsign,
    transform_multiplycolumns,
    transform_policymonths,
)

SCHEMA = (
    "id int, effectivedate date, expirationdate date, "
    "premium1 decimal(16,2), premium2 decimal(16,2), premium3 decimal(16,2)"
)
ROWS = [
    (1, datetime.date(2022, 1, 1), datetime.date(2022, 12, 31),
     Decimal("3000"), Decimal("2000"), Decimal("1000")),
    (2, datetime.date(2022, 3, 1), datetime.date(2022, 8, 31),
     Decimal("100.50"), Decimal("0"), Decimal("0")),
]


def make_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_expandpolicymonths_row_counts(spark, ctx):
    df = transform_expandpolicymonths(
        make_df(spark),
        {
            "policy_effective_date": "effectivedate",
            "policy_expiration_date": "expirationdate",
            "policy_month_start_field": "StartDate",
            "policy_month_end_field": "EndDate",
            "policy_month_index": "PolicyMonthIndex",
        },
        ctx,
    )
    counts = {r["id"]: r["n"] for r in df.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 12, 2: 6}
    first = df.where("id = 1 and PolicyMonthIndex = 1").collect()[0]
    assert first["StartDate"] == datetime.date(2022, 1, 1)
    assert first["EndDate"] == datetime.date(2022, 1, 31)
    last = df.where("id = 2 and PolicyMonthIndex = 6").collect()[0]
    assert last["StartDate"] == datetime.date(2022, 8, 1)
    assert last["EndDate"] == datetime.date(2022, 8, 31)


def test_expandpolicymonths_null_dates_keep_row(spark, ctx):
    df = spark.createDataFrame(
        [(9, None, None, Decimal("1"), Decimal("0"), Decimal("0"))], SCHEMA
    )
    out = transform_expandpolicymonths(
        df,
        {
            "policy_effective_date": "effectivedate",
            "policy_expiration_date": "expirationdate",
            "policy_month_start_field": "StartDate",
            "policy_month_end_field": "EndDate",
            "policy_month_index": "PolicyMonthIndex",
        },
        ctx,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["StartDate"] is None and rows[0]["PolicyMonthIndex"] is None


def test_addcolumns(spark, ctx):
    df = transform_addcolumns(
        make_df(spark),
        [{"field": "TotalPremium", "source_columns": ["premium1", "premium2", "premium3"]}],
        ctx,
    )
    values = {r["id"]: r["TotalPremium"] for r in df.collect()}
    assert values[1] == Decimal("6000.00")
    assert values[2] == Decimal("100.50")


def test_multiplycolumns_null_as_one_vs_empty_value(spark, ctx):
    df = spark.createDataFrame(
        [(1, Decimal("100.00"), Decimal("2.5"), Decimal("3.0")),
         (2, Decimal("100.50"), Decimal("0.70"), None)],
        "id int, premium decimal(16,2), split1 decimal(16,2), split2 decimal(16,2)",
    )
    out = transform_multiplycolumns(
        df, [{"field": "SplitPremium", "source_columns": ["premium", "split1", "split2"]}], ctx
    )
    values = {r["id"]: r["SplitPremium"] for r in out.collect()}
    assert values[1] == Decimal("750.00")
    assert values[2] == Decimal("70.35")  # null → 1

    out0 = transform_multiplycolumns(
        df,
        [{"field": "SplitPremium", "source_columns": ["premium", "split1", "split2"],
          "empty_value": 0}],
        ctx,
    )
    assert {r["id"]: r["SplitPremium"] for r in out0.collect()}[2] == Decimal("0.00")


def test_flipsign_in_place_and_new_column(spark, ctx):
    df = make_df(spark)
    out = transform_flipsign(
        df, [{"field": "premium1"}, {"field": "neg2", "source": "premium2"}], ctx
    )
    row = out.where("id = 1").collect()[0]
    assert row["premium1"] == Decimal("-3000.00")
    assert row["neg2"] == Decimal("-2000.00")


def test_enddate_add_months(spark, ctx):
    df = spark.createDataFrame(
        [(1, datetime.date(2022, 1, 31), 12), (2, datetime.date(2022, 3, 1), 6)],
        "id int, start date, term int",
    )
    out = transform_enddate(
        df, [{"field": "CalcExpiration", "start_date": "start", "num_months": "term"}], ctx
    )
    values = {r["id"]: r["CalcExpiration"] for r in out.collect()}
    assert values[1] == datetime.date(2023, 1, 31)
    assert values[2] == datetime.date(2022, 9, 1)


def test_policymonths_normalized_and_fractional(spark, ctx):
    df = make_df(spark)
    out = transform_policymonths(
        df,
        [
            {"field": "nmonths", "policy_effective_date": "effectivedate",
             "policy_expiration_date": "expirationdate", "normalized": True},
            {"field": "fmonths", "policy_effective_date": "effectivedate",
             "policy_expiration_date": "expirationdate"},
        ],
        ctx,
    )
    rows = {r["id"]: r for r in out.collect()}
    # Floor-style normalization: Jan-1→Dec-31 is 11.97 fractional months → 11
    # whole months (the reference's rrule walk over eff..exp-1month).
    assert rows[1]["nmonths"] == 11
    assert rows[2]["nmonths"] == 5
    assert rows[1]["fmonths"] == Decimal("11.97")  # months_between(12-31, 1-1)
    assert rows[2]["fmonths"] == Decimal("5.97")


def test_policymonths_normalized_edges(spark, ctx):
    cases = [
        # one-month-or-less policies fall back to the expiration month
        (1, datetime.date(2022, 1, 1), datetime.date(2022, 1, 15), 1),
        # short policy: exp-1month < eff → walk eff-month..exp-month = 2
        (2, datetime.date(2022, 1, 15), datetime.date(2022, 2, 10), 2),
        # ordinary year: 11.97 fractional months floors to 11
        (3, datetime.date(2022, 1, 1), datetime.date(2022, 12, 31), 11),
        # expiration before effective (bad data) → 0
        (4, datetime.date(2022, 6, 1), datetime.date(2021, 6, 1), 0),
        # null dates → null
        (5, None, datetime.date(2022, 6, 1), None),
    ]
    df = spark.createDataFrame(
        [(i, e, x) for i, e, x, _ in cases], "id int, eff date, exp date"
    )
    out = transform_policymonths(
        df,
        [{"field": "n", "policy_effective_date": "eff",
          "policy_expiration_date": "exp", "normalized": True}],
        ctx,
    )
    got = {r["id"]: r["n"] for r in out.collect()}
    for i, _, _, expected in cases:
        assert got[i] == expected, f"case {i}: {got[i]} != {expected}"


def test_earnedpremium_straightline(spark, ctx):
    df = transform_expandpolicymonths(
        make_df(spark),
        {
            "policy_effective_date": "effectivedate",
            "policy_expiration_date": "expirationdate",
            "policy_month_start_field": "StartDate",
            "policy_month_end_field": "EndDate",
            "policy_month_index": "PolicyMonthIndex",
        },
        ctx,
    )
    out = transform_earnedpremium(
        df,
        [{"field": "EarnedPremium", "written_premium_list": ["premium1", "premium2", "premium3"],
          "policy_effective_date": "effectivedate", "policy_expiration_date": "expirationdate",
          "period_start_date": "StartDate", "period_end_date": "EndDate"}],
        ctx,
    )
    values = {(r["id"], r["PolicyMonthIndex"]): r["EarnedPremium"] for r in out.collect()}
    assert values[(1, 1)] == Decimal("545.45")  # 6000 / 11 normalized months
    assert values[(2, 3)] == Decimal("20.10")  # 100.50 / 5
    # last policy month's period end falls past the first day of the
    # expiration month → null (reference straightline contract)
    assert values[(1, 12)] is None


def test_earnedpremium_byday(spark, ctx):
    df = transform_expandpolicymonths(
        make_df(spark),
        {
            "policy_effective_date": "effectivedate",
            "policy_expiration_date": "expirationdate",
            "policy_month_start_field": "StartDate",
            "policy_month_end_field": "EndDate",
            "policy_month_index": "PolicyMonthIndex",
        },
        ctx,
    )
    out = transform_earnedpremium(
        df,
        [{"field": "EarnedPremium", "written_premium_list": ["premium1", "premium2", "premium3"],
          "policy_effective_date": "effectivedate", "policy_expiration_date": "expirationdate",
          "period_start_date": "StartDate", "period_end_date": "EndDate", "byday": True}],
        ctx,
    )
    values = {(r["id"], r["PolicyMonthIndex"]): r["EarnedPremium"] for r in out.collect()}
    # policy 1: 365 days, January = 31 days → 6000 * 31/365 = 509.589... → 509.59
    assert values[(1, 1)] == Decimal("509.59")
    # policy 2: 2022-03-01..2022-08-31 = 184 days, June = 30 → 100.50 * 30/184 = 16.39
    assert values[(2, 4)] == Decimal("16.39")


def test_halfup_rational_cents_overflow_magnitudes(spark):
    """decimal(16,2) premiums at full magnitude with byday numerators used
    to overflow the old long path (2*|cents|*num > 2^63) or lose the
    floor to inexact double division (> 2^53); the decimal(38,0) path
    must stay exact to the true half-up cent."""
    from decimal import ROUND_HALF_UP

    import pyspark.sql.functions as F

    from aws_insurancelake_etl_spark.operators.premium import _halfup_rational_cents

    rows = [
        (Decimal("99999999999999.99"), 3653, 36525),  # old: 7.3e19 > 2^63
        (Decimal("12345678901234.56"), 1, 7),         # old: > 2^53, < 2^63
        (Decimal("-99999999999999.99"), 123, 365),    # sign restore at magnitude
        (Decimal("0.01"), 1, 3),                      # round-to-zero edge
    ]
    df = spark.createDataFrame(rows, "premium decimal(16,2), num int, den int")
    out = df.withColumn(
        "ep", _halfup_rational_cents(F.col("premium"), F.col("num"), F.col("den"))
    ).collect()
    for r in out:
        expect = (r.premium * r.num / Decimal(r.den)).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
        assert r.ep == expect, (r.premium, r.num, r.den, r.ep, expect)
