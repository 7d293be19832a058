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


# Engine-portable PII patterns: restricted to the regex subset where Java
# (Spark) and RE2-family (DuckDB/Go) engines agree — character classes,
# bounded repetition, \b word boundaries; no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "account": r"#\d{3,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(
    df: DataFrame,
    columns: list[str],
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Corpus PII audit: (column, kind, n_rows_matched, n_matches) for
    every (column, pattern) pair — the scan a training-data pipeline runs
    BEFORE deciding what to redact.  One narrow pass: all counts are
    ``regexp_count`` expressions aggregated map-side; the stack of
    (column, kind) pairs melts via a literal inline array, so the plan is
    scan → project → single aggregation regardless of how many patterns
    are scanned."""
    patterns = patterns or PII_PATTERNS
    aggs = []
    for column in columns:
        for kind, pattern in patterns.items():
            n = F.regexp_count(F.col(column).cast("string"), F.lit(pattern))
            aggs.append(
                F.struct(
                    F.lit(column).alias("column"),
                    F.lit(kind).alias("kind"),
                    F.sum((n > 0).cast("long")).alias("n_rows_matched"),
                    F.sum(n).alias("n_matches"),
                )
            )
    melted = df.agg(F.array(*aggs).alias("__cells")).select(
        F.explode("__cells").alias("c")
    )
    return melted.select("c.column", "c.kind", "c.n_rows_matched", "c.n_matches")


def transform_piiredact(df: DataFrame, spec: dict, ctx: RunContext) -> DataFrame:
    """``{field: [kind, ...]}`` — mask every occurrence of the named PII
    patterns inside free-text fields, preserving surrounding text (unlike
    ``redact``, which blanks whole values): each match becomes
    ``[PII:<kind>]``.  Chained native ``regexp_replace`` — narrow, no
    UDF."""
    cols = {}
    for field, kinds in spec.items():
        out = F.col(field).cast("string")
        for kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind], f"[PII:{kind}]")
        cols[field] = out
    ctx.log_lineage("piiredact", df=df, transform=spec)
    return df.withColumns(cols)


def date_shift(
    df: DataFrame, ts_cols: list[str], entity_col: str,
    max_days: int = 365, seed: str = "dateshift",
) -> DataFrame:
    """Deterministic per-entity date shifting (HIPAA Safe-Harbor-style
    de-identification): every timestamp column shifts by the SAME
    md5-derived offset in [-max_days, +max_days] for a given entity, so
    absolute dates are obscured while every intra-entity interval
    (session gaps, time-to-event, ordering) is exactly preserved — the
    property that keeps a de-identified events table usable for the
    time-series operators in this engine.  Reproducible across runs,
    engines, and partitionings (no RNG), and fully narrow: the offset is
    a hash expression, the shift is ``timestampadd`` — zero shuffles."""
    span = 2 * max_days + 1
    offset = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{seed}:"), F.col(entity_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % span
        - max_days
    )
    out = df.withColumn("__off_days", offset)
    for c in ts_cols:
        out = out.withColumn(
            c, F.expr(f"timestampadd(DAY, __off_days, {c})")
        )
    return out.drop("__off_days")


def k_anonymity_audit(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """K-anonymity audit over a set of quasi-identifier columns: returns
    the equivalence classes with fewer than ``k`` members — the groups a
    release would have to generalize or suppress.  One hash aggregation
    on the quasi-identifier tuple; at 100 TB this is a plain map-side-
    combined groupBy, and the output is bounded by the number of RISKY
    classes, not the table."""
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
    )


def transform_dateshift(df: DataFrame, spec: dict, ctx: RunContext) -> DataFrame:
    """``{entity, fields: [...], max_days?=365}`` — per-entity
    deterministic date shifting of timestamp columns
    (spec-dispatchable wrapper over :func:`date_shift`)."""
    out = date_shift(
        df,
        ts_cols=list(spec["fields"]),
        entity_col=spec["entity"],
        max_days=int(spec.get("max_days", 365)),
    )
    ctx.log_lineage("dateshift", df=out, transform=spec)
    return out
