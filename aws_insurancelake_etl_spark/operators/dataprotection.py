"""PII protection transforms: hash, redact, tokenize.

Semantics parity: reference ``lib/glue_scripts/lib/datatransform_dataprotection.py``
(hash :11-43, redact :46-77, tokenize :80-178).  A referenced field missing
from the incoming data is a **hard error** — schema drift must never leak
raw PII into the lake.

Physical difference: the reference hashes with a row-at-a-time Python UDF
(``hashlib.sha256(str(x))``).  Here hashing is the native ``sha2`` expression
over the value cast to string, with nulls mapped to the literal ``'None'``
to reproduce the reference's ``str(None)`` behavior bit-for-bit on string
columns.  Native sha2 stays in whole-stage codegen — on a 100 TB run this
removes the Python round-trip entirely.

The token vault (reverse-lookup of hash → raw value) accumulates on the
RunContext and is flushed by the pipeline writer to an ordinary lake table
deduplicated on ``raw_data`` — the reference's DynamoDB vault re-expressed
as a lake table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..context import RunContext


def sha256_column(source: Column) -> Column:
    """sha256 hex digest of a column's string form; null → ``str(None)``."""
    return F.sha2(F.coalesce(source.cast("string"), F.lit("None")), 256)


def _require_fields(df: DataFrame, fields: list[str], transform: str) -> None:
    for field in fields:
        if field not in df.columns:
            raise RuntimeError(
                f"Field '{field}' not found in incoming data (required by {transform}; "
                "failing hard so schema drift cannot expose PII)"
            )


def transform_hash(df: DataFrame, spec: list[str], ctx: RunContext) -> DataFrame:
    """``[field, ...]`` — replace values with their SHA-256 hex digest."""
    _require_fields(df, spec, "hash")
    cols = {field: sha256_column(F.col(field)) for field in spec}
    ctx.log_lineage("hash", df=df, transform=spec)
    return df.withColumns(cols)


def transform_redact(df: DataFrame, spec: dict[str, str], ctx: RunContext) -> DataFrame:
    """``{field: redact_string}`` — overwrite values with a constant."""
    _require_fields(df, list(spec), "redact")
    cols = {field: F.lit(redact_string) for field, redact_string in spec.items()}
    ctx.log_lineage("redact", df=df, transform=spec)
    return df.withColumns(cols)


def transform_tokenize(df: DataFrame, spec: list[str], ctx: RunContext) -> DataFrame:
    """``[field, ...]`` — like hash, but also stores (raw_data, hash_key)
    pairs on the run context for the pipeline to persist as the token
    vault table."""
    _require_fields(df, spec, "tokenize")
    for field in spec:
        ctx.add_token_vault(
            df.select(
                F.col(field).cast("string").alias("raw_data"),
                sha256_column(F.col(field)).alias("hash_key"),
            ).where(F.col(field).isNotNull())
        )
    cols = {field: sha256_column(F.col(field)) for field in spec}
    ctx.log_lineage("tokenize", df=df, transform=spec)
    return df.withColumns(cols)
