"""Lookup transforms: value substitution and multi-attribute lookup via
broadcast left-outer joins against small side tables.

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_lookup.py``
(lookup :43-117, multilookup :162-221): left join keeps all source rows,
``nomatch`` fills unmatched values, ``source`` present ⇒ add a new column,
absent ⇒ replace in place.  The reference's DynamoDB side tables become a
local :class:`~aws_insurancelake_etl_spark.context.LookupStore`; lookup data
is dimension-sized, so an explicit ``broadcast()`` hint keeps the join a
broadcast hash join with no shuffle of the fact side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..context import RunContext


def transform_lookup(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{field, source?, lookup, nomatch?, source_system?}]`` — replace or
    add a column with values mapped through a named lookup table."""
    for entry in spec:
        mapping = ctx.lookups.get_values(entry["lookup"])
        source_field = entry.get("source", entry["field"])
        lookup_df = ctx.spark.createDataFrame(
            list(mapping.items()), schema=["orig_value", "new_value"]
        )
        df = df.join(
            F.broadcast(lookup_df), df[source_field] == lookup_df["orig_value"], "left"
        ).drop("orig_value")
        if "source" not in entry:
            df = df.drop(entry["field"])
        df = df.withColumnRenamed("new_value", entry["field"])
        if "nomatch" in entry:
            df = df.fillna(entry["nomatch"], entry["field"])
        ctx.log_lineage("lookup", df=df, transform=[entry])
    return df


def transform_multilookup(df: DataFrame, spec: list[dict], ctx: RunContext) -> DataFrame:
    """``[{lookup_group, match_columns, return_attributes, nomatch?}]`` —
    join N return attributes keyed on the ``-``-concatenation of the match
    columns."""
    for entry in spec:
        items = ctx.lookups.get_multi(entry["lookup_group"])
        rows = [
            {"lookup_item": key, **{a: value.get(a) for a in entry["return_attributes"]}}
            for key, value in items.items()
        ]
        lookup_df = ctx.spark.createDataFrame(rows).select(
            "lookup_item", *entry["return_attributes"]
        )
        df = df.join(
            F.broadcast(lookup_df),
            F.concat_ws("-", *entry["match_columns"]) == lookup_df["lookup_item"],
            "left",
        ).drop("lookup_item")
        if "nomatch" in entry:
            df = df.fillna({a: entry["nomatch"] for a in entry["return_attributes"]})
        ctx.log_lineage("multilookup", df=df, transform=[entry])
    return df
