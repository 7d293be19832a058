"""Input scans: csv/tsv/pipe, json/jsonl, xml, parquet, fixed-width, excel.

Semantics parity: reference ``lib/glue_scripts/etl_collect_to_cleanse.py``
(fixed-width :138-152, excel :154-185, json :187-197, xml :199-207,
parquet :210-212, csv/tsv/pipe :214-240).  All readers infer schema and run
PERMISSIVE.  Format choice follows file extension, with ``input_spec``
entries overriding options.

Scale notes: every reader here is a plain ``spark.read`` — splittable,
predicate-pushdown-capable scans (CSV/JSON are line-splittable unless
``multiLine``; Parquet gets filter/column pushdown for free).  Fixed-width
is ``spark.read.text`` + per-column ``substr`` projections — a narrow
map-only stage.  Excel has no open-source Spark-native reader in this
environment, so it pre-converts via pandas on the driver (acceptable:
workbook files are single-machine-sized by construction).
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXCEL_EXTENSIONS = {".xlsx", ".xls", ".xlsm", ".xlm"}


def read_fixed_width(
    spark: SparkSession, source_path: str, mapping_data: list[dict]
) -> DataFrame:
    """``mapping_data`` rows: {sourcename (ignored), destname, width}; a
    ``destname`` of ``null`` skips (drops) the slice."""
    text_df = spark.read.text(source_path)
    columns = []
    for index, field_data in enumerate(mapping_data):
        if field_data["destname"].lower() == "null":
            continue
        start = reduce(lambda acc, row: acc + int(row["width"]), mapping_data[:index], 0) + 1
        columns.append(
            F.trim(F.col("value").substr(start, int(field_data["width"]))).alias(
                field_data["destname"]
            )
        )
    return text_df.select(columns)


def read_excel(spark: SparkSession, source_path: str, excel_spec: dict) -> DataFrame:
    """Excel via driver-side pandas conversion (no spark-excel JAR here).

    Honors ``sheet_names`` (tried in order), ``data_address`` (e.g. 'A2'),
    ``header``, ``password`` (unsupported → error if set).
    """
    import pandas as pd  # noqa: PLC0415

    if excel_spec.get("password"):
        raise NotImplementedError("Password-protected workbooks require openpyxl with crypto")
    sheet_names = excel_spec.get("sheet_names", ["0"])
    data_address = excel_spec.get("data_address", "A1")
    header = excel_spec.get("header", True)
    skiprows = 0
    if data_address and data_address.strip("ABCDEFGHIJKLMNOPQRSTUVWXYZ").isdigit():
        skiprows = int(data_address.strip("ABCDEFGHIJKLMNOPQRSTUVWXYZ")) - 1
    last_error: Exception | None = None
    for sheet_name in sheet_names:
        try:
            sheet: Any = int(sheet_name) if str(sheet_name).isdigit() else sheet_name
            pdf = pd.read_excel(
                source_path, sheet_name=sheet, header=0 if header else None, skiprows=skiprows
            )
            if not header:
                pdf.columns = [f"_c{i}" for i in range(len(pdf.columns))]
            return spark.createDataFrame(pdf)
        except Exception as exc:  # noqa: BLE001 - sheet fallback chain
            last_error = exc
    raise RuntimeError(f"None of sheet names {sheet_names} found in Excel workbook: {last_error}")


def read_input(
    spark: SparkSession,
    source_path: str,
    input_spec: dict | None = None,
    mapping_data: list[dict] | None = None,
) -> DataFrame:
    """Dispatch on extension/input_spec and load ``source_path``."""
    input_spec = input_spec or {}
    ext = os.path.splitext(source_path)[1].lower()

    if "fixed" in input_spec:
        if not mapping_data:
            raise RuntimeError("Fixed-width input requires a mapping file with widths")
        return read_fixed_width(spark, source_path, mapping_data)

    if ext in EXCEL_EXTENSIONS:
        return read_excel(spark, source_path, input_spec.get("excel", {}))

    if ext in (".json", ".jsonl"):
        json_spec = input_spec.get("json", {})
        return (
            spark.read.format("json")
            .option("prefersDecimal", "true")
            .option("allowComments", "true")
            .option("multiLine", json_spec.get("multiline", False))
            .option("mode", "PERMISSIVE")
            .load(source_path)
        )

    if ext == ".xml":
        xml_spec = input_spec.get("xml", {})
        return (
            spark.read.format("xml")
            .option("rowTag", xml_spec.get("row_tag", "row"))
            .option("mode", "PERMISSIVE")
            .load(source_path)
        )

    if ext == ".parquet" or "parquet" in input_spec:
        return spark.read.format("parquet").load(source_path)

    # CSV family is the default
    delimiter = ","
    format_spec: dict = input_spec.get("csv", {})
    if "tsv" in input_spec:
        delimiter, format_spec = "\t", input_spec["tsv"]
    if "pipe" in input_spec:
        delimiter, format_spec = "|", input_spec["pipe"]
    return (
        spark.read.format("csv")
        .option("header", format_spec.get("header", True))
        .option("delimiter", format_spec.get("delimiter", delimiter))
        .option("quote", format_spec.get("quote_character", '"'))
        .option("escape", format_spec.get("escape_character", '"'))
        .option("multiLine", format_spec.get("multiline", True))
        .option("inferSchema", True)
        .option("mode", "PERMISSIVE")
        .load(source_path)
    )
