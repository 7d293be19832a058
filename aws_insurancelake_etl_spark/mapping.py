"""Schema mapping: declarative rename/drop with fuzzy column-name matching,
column-name cleaning, schema flattening, recommended-artifact generation.

Semantics parity: reference ``lib/glue_scripts/lib/custom_mapping.py``
(flatten_schema :13-33, custommapping :48-115) and
``lib/glue_scripts/lib/glue_catalog_helpers.py`` (clean_column_names
:330-368, generate_spec :371-403, clean_nulltypes :427-437).

Mapping rows (from a per-dataset CSV ``sourcename,destname[,threshold,scorer]``):
- exact rows: ordered ``select(col(src).alias(dest))``; ``destname=null``
  drops the column; unmapped source columns are dropped (and reported);
- fuzzy rows (threshold set): after the exact pass, each fuzzy row picks the
  best-scoring remaining unmapped column using the named scorer; first-come
  matching, minimum score = threshold.

Fuzzy scoring uses rapidfuzz when available, else a difflib-based fallback
(``ratio`` / ``token_sort_ratio`` / ``partial_ratio`` approximations) — all
driver-side work over ``df.columns``, never touching data rows.
"""

from __future__ import annotations

import csv
import io
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - environment probe
    from rapidfuzz import fuzz as _fuzz
    from rapidfuzz.utils import default_process as _default_process

    def _score(scorer: str, a: str, b: str) -> float:
        return getattr(_fuzz, scorer)(_default_process(a), _default_process(b))

except ModuleNotFoundError:  # difflib fallback
    from difflib import SequenceMatcher

    def _normalize(value: str) -> str:
        cleaned = "".join(c if c.isalnum() else " " for c in value.lower())
        return " ".join(cleaned.split())

    def _score(scorer: str, a: str, b: str) -> float:
        a, b = _normalize(a), _normalize(b)
        if scorer == "token_sort_ratio":
            a = " ".join(sorted(a.split()))
            b = " ".join(sorted(b.split()))
        if scorer == "partial_ratio" and a and b:
            short, long_ = (a, b) if len(a) <= len(b) else (b, a)
            best = 0.0
            for start in range(len(long_) - len(short) + 1):
                best = max(
                    best, SequenceMatcher(None, short, long_[start : start + len(short)]).ratio()
                )
            return best * 100
        return SequenceMatcher(None, a, b).ratio() * 100


def escape_field_name(name: str) -> str:
    return f"`{name}`" if "`" not in name else name


def unescape_field_name(name: str) -> str:
    return name.replace("`", "")


def flatten_schema(schema: T.StructType, prefix: str = "") -> T.StructType:
    """Flattened field list including every nesting level (structs and
    arrays-of-structs are descended; parents are kept referenceable)."""
    flat: list[T.StructField] = []
    for field in schema:
        flat.append(T.StructField(f"{prefix}{field.name}", field.dataType, field.nullable))
        if isinstance(field.dataType, T.StructType):
            flat += flatten_schema(field.dataType, prefix=f"{prefix}{field.name}.")
        if isinstance(field.dataType, T.ArrayType) and isinstance(
            field.dataType.elementType, T.StructType
        ):
            flat += flatten_schema(field.dataType.elementType, prefix=f"{prefix}{field.name}.")
    return T.StructType(flat)


def custommapping(
    df: DataFrame,
    field_mapping_list: list[dict],
    ctx: Any = None,
    strict: bool = False,
) -> DataFrame:
    """Apply an ordered select of renames/drops plus a fuzzy-match pass."""
    unmapped = [field.name for field in flatten_schema(df.schema)]

    select_list = []
    for map_row in field_mapping_list:
        if map_row.get("threshold"):
            continue
        in_schema = True
        try:
            unmapped.remove(unescape_field_name(map_row["sourcename"]))
        except ValueError:
            in_schema = False
        if map_row["destname"].lower() != "null" and (in_schema or strict):
            select_list.append(
                F.col(escape_field_name(map_row["sourcename"])).alias(map_row["destname"])
            )

    if unmapped:
        for map_row in field_mapping_list:
            if not map_row.get("threshold"):
                continue
            scored = [
                (candidate, _score(map_row.get("scorer", "ratio"), map_row["sourcename"], candidate))
                for candidate in unmapped
            ]
            if not scored:
                continue
            match, score = max(scored, key=lambda pair: pair[1])
            if score >= int(map_row["threshold"]):
                select_list.append(F.col(escape_field_name(match)).alias(map_row["destname"]))
                unmapped.remove(match)
                map_row["match"] = match

    if ctx is not None:
        ctx.log_lineage("mapping", df=df, map=field_mapping_list, dropped=unmapped)
    return df.select(select_list)


def parse_mapping_csv(text: str) -> list[dict]:
    """Parse a mapping CSV (``SourceName,DestName[,Threshold,Scorer]`` or
    fixed-width ``SourceName,DestName,Width``) into mapping rows."""
    rows = []
    for row in csv.DictReader(io.StringIO(text)):
        normalized = {key.strip().lower(): (value or "").strip() for key, value in row.items()}
        rows.append(normalized)
    return rows


def clean_column_names(df: DataFrame) -> tuple[DataFrame, list[dict]]:
    """Parquet-safe renames: trim/lower/truncate-255, strip ``,;{}()\\n\\r\\t=``,
    replace `` .:`` with ``_``; returns the cleaned df and the applied map."""
    cols = []
    field_map_rows = []
    for field in df.schema:
        new_name = field.name.strip()[:255].lower()
        for char in ",;{}()\n\r\t=":
            new_name = new_name.replace(char, "")
        for char in " .:":
            new_name = new_name.replace(char, "_")
        new_name = new_name.replace("_-_", "-").replace("__", "_").replace("__", "_")
        column = F.col(escape_field_name(field.name))
        if field.name != new_name:
            column = column.alias(new_name)
        cols.append(column)
        field_map_rows.append({"sourcename": field.name, "destname": new_name})
    return df.select(cols), field_map_rows


def clean_nulltypes(df: DataFrame) -> DataFrame:
    """Cast Void/NullType columns to string (safest round-trippable type)."""
    cols = []
    for field in df.schema:
        column = F.col(escape_field_name(field.name))
        if isinstance(field.dataType, T.NullType):
            column = column.cast("string")
        cols.append(column)
    return df.select(cols)


def generate_spec(df: DataFrame, input_file_extension: str) -> dict:
    """Recommended transform spec: float/double → decimal(16,2), date/time
    column-name heuristics → date/timestamp parses."""
    input_spec: dict = {}
    if input_file_extension.lower() in (".xlsx", ".xls"):
        input_spec["excel"] = {"sheet_names": ["0"], "data_address": "A1", "header": True}
    transform_spec: dict = {"date": [], "timestamp": [], "changetype": {}}
    for field in df.schema:
        if isinstance(field.dataType, (T.DoubleType, T.FloatType)):
            transform_spec["changetype"][field.name] = "decimal(16,2)"
        if "date" in field.name.lower():
            transform_spec["date"].append({"field": field.name, "format": "MM/dd/yy"})
        if "time" in field.name.lower():
            transform_spec["timestamp"].append(
                {"field": field.name, "format": "yyyy-MM-dd HH:mm:ss"}
            )
    return {"input_spec": input_spec, "transform_spec": transform_spec}
