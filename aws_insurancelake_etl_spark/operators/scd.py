"""Slowly-changing-dimension type 2 (SCD2) apply: versioned history for a
dimension table, the lakehouse upsert the reference's SCD1 ``MERGE INTO``
(``etl_consume_entity_match.py:449-455``) does not keep.

Pure DataFrame composition — anti/outer joins + unions, no driver-side
iteration — so it MERGEs at any scale; the whole apply is deterministic
given (current, updates), which is what makes it oracle-checkable and
idempotent to re-run on retry.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _any_attr_changed(attr_cols: list[str], left: str, right: str) -> Column:
    diffs = [
        ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}")) for c in attr_cols
    ]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a snapshot of ``updates`` to an SCD2 ``current`` table.

    ``current`` carries (keys, attrs, valid_from, valid_to) with
    ``valid_to IS NULL`` marking the open version; ``updates`` carries
    (keys, attrs, effective_col).  Per key:

    - attrs changed   → the open row closes (``valid_to = effective``) and
      a new open version inserts at ``effective``;
    - attrs unchanged → the open row passes through untouched (no version
      churn on no-op updates);
    - new key         → inserts as a new open version;
    - closed history rows always pass through untouched.

    One outer-join shuffle on the key columns decides every case; the
    four output streams are unions of projections over that single join
    (plus the untouched closed-history scan).
    """
    open_rows = current.where(F.col(valid_to).isNull()).alias("cur")
    closed_rows = current.where(F.col(valid_to).isNotNull())
    upd = updates.alias("upd")

    joined = open_rows.join(upd, key_cols, "full_outer")
    has_cur = F.col(f"cur.{valid_from}").isNotNull()
    has_upd = F.col(f"upd.{effective_col}").isNotNull()
    changed = has_cur & has_upd & _any_attr_changed(attr_cols, "cur", "upd")

    out_cols = key_cols + attr_cols
    null_to = F.lit(None).cast(current.schema[valid_to].dataType)

    def stream(cond: Column, side: str, vf: Column, vt: Column) -> DataFrame:
        # Key columns are coalesced by the equi-join; attrs must come from
        # the side that owns this stream's version.
        return joined.where(cond).select(
            *key_cols,
            *[F.col(f"{side}.{c}").alias(c) for c in attr_cols],
            vf.alias(valid_from),
            vt.alias(valid_to),
        )

    # Open rows that stay open: no update arrived, or a no-op update.
    carried = stream(
        has_cur & (~has_upd | ~changed), "cur", F.col(f"cur.{valid_from}"), null_to
    )
    # Changed: the old version closes at the update's effective date...
    closed_now = stream(
        changed, "cur", F.col(f"cur.{valid_from}"), F.col(f"upd.{effective_col}")
    )
    # ...and the new version (changed or brand-new key) opens there.
    opened = stream(
        has_upd & (changed | ~has_cur), "upd", F.col(f"upd.{effective_col}"), null_to
    )

    history = closed_rows.select(*out_cols, valid_from, valid_to)
    return history.unionByName(carried).unionByName(closed_now).unionByName(opened)


def change_feed(
    history: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Derive a CDC change feed from an SCD2 history table: one
    ``insert`` event per key's first version, an ``update`` event (with
    old and new attribute values) per subsequent version, and a
    ``delete`` event when a key's LAST version is closed with no
    successor.  This is the inverse of :func:`scd2_apply` — history in,
    events out — the export shape downstream consumers (search indexes,
    caches, feature stores) subscribe to.

    Plan: ONE window partitioned by the key (lag carries the previous
    version's attributes; lead detects the missing successor), so the
    whole derivation is a single key-keyed exchange; event volume equals
    version volume + closed-tails, never more."""
    w = Window.partitionBy(*key_cols).orderBy(valid_from)
    is_first = F.lag(valid_from).over(w).isNull()
    versioned = history.select(
        *key_cols,
        *attr_cols,
        F.col(valid_from).alias("__vf"),
        F.col(valid_to).alias("__vt"),
        is_first.alias("__first"),
        *[F.lag(a).over(w).alias(f"__old_{a}") for a in attr_cols],
        F.lead(valid_from).over(w).isNull().alias("__last"),
    )
    upserts = versioned.select(
        *key_cols,
        F.when(F.col("__first"), F.lit("insert")).otherwise(F.lit("update"))
        .alias("change_type"),
        F.col("__vf").alias("changed_at"),
        *[F.col(f"__old_{a}").alias(f"old_{a}") for a in attr_cols],
        *[F.col(a).alias(f"new_{a}") for a in attr_cols],
    )
    deletes = versioned.where(F.col("__last") & F.col("__vt").isNotNull()).select(
        *key_cols,
        F.lit("delete").alias("change_type"),
        F.col("__vt").alias("changed_at"),
        *[F.col(a).alias(f"old_{a}") for a in attr_cols],
        *[F.lit(None).cast(history.schema[a].dataType).alias(f"new_{a}")
          for a in attr_cols],
    )
    return upserts.unionByName(deletes)
