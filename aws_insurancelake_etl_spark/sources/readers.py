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
import re
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


_CELL_REF_RE = re.compile(r"^([A-Za-z]+)(\d+)$")


def _col_index(letters: str) -> int:
    """Spreadsheet column letters → 0-based index ('A'→0, 'AA'→26)."""
    idx = 0
    for ch in letters.upper():
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def parse_data_address(addr: str | None) -> tuple[int, int, int | None, int | None]:
    """Reference ``data_address`` grammar (``docs/file_formats.md:327``):
    a cell reference naming the top-left corner ('A1', 'C3') or a range
    reference bounding the data block ('A2:D10').

    Returns 0-based ``(skiprows, col_start, col_stop_exclusive, block_rows)``
    — col_stop/block_rows are None for an open cell reference."""
    addr = (addr or "A1").strip()
    if ":" in addr:
        first, last = addr.split(":", 1)
        m1, m2 = _CELL_REF_RE.match(first.strip()), _CELL_REF_RE.match(last.strip())
        if not (m1 and m2):
            raise ValueError(f"Invalid Excel range reference: {addr!r}")
        r0, r1 = int(m1.group(2)) - 1, int(m2.group(2)) - 1
        c0, c1 = _col_index(m1.group(1)), _col_index(m2.group(1))
        if r1 < r0 or c1 < c0:
            raise ValueError(f"Excel range reference is inverted: {addr!r}")
        return r0, c0, c1 + 1, r1 - r0 + 1
    m = _CELL_REF_RE.match(addr)
    if not m:
        raise ValueError(f"Invalid Excel cell reference: {addr!r}")
    return int(m.group(2)) - 1, _col_index(m.group(1)), None, None


def read_excel(spark: SparkSession, source_path: str, excel_spec: dict) -> DataFrame:
    """Excel via driver-side pandas conversion (no spark-excel JAR here).

    Option parity with the reference's crealytics reader
    (``etl_collect_to_cleanse.py:154-185``; ``docs/file_formats.md:325-344``):

    - ``sheet_names``: tried in order, first readable sheet wins; numeric
      strings are 0-based sheet indexes — full parity;
    - ``data_address``: cell reference ('A2' → skip rows above, columns
      left of the anchor) or range reference ('A2:D10' → bounded block) —
      full parity;
    - ``header``: bool, headerless sheets get ``_c0..`` names — full parity;
    - ``password``: agile-encrypted (MS-OFFCRYPTO) workbooks are decrypted
      in-process via :mod:`.offcrypto` (pure spec implementation,
      AES/CBC from ``cryptography``) — parity with crealytics'
      ``workbookPassword`` (reference ``etl_collect_to_cleanse.py:165-170``).
      Wrong passwords raise ``WrongPassword``; legacy "standard"
      encryption raises ``NotImplementedError`` naming the scheme.

    Engine: ``pandas.read_excel`` when an Excel engine (openpyxl/xlrd) is
    importable; otherwise the pure-stdlib SpreadsheetML parser in
    :mod:`.xlsx_lite` — same option surface either way, so the path is
    fully exercised in engine-less containers.
    """
    import pandas as pd  # noqa: PLC0415

    from .offcrypto import CFB_MAGIC, decrypt_to_tempfile  # noqa: PLC0415

    try:
        with open(source_path, "rb") as handle:
            is_encrypted = handle.read(8) == CFB_MAGIC
    except OSError:
        is_encrypted = False
    if is_encrypted:
        password = excel_spec.get("password")
        if not password:
            raise ValueError(
                f"{source_path} is an encrypted workbook; pass 'password' "
                "in the excel input spec"
            )
        source_path = decrypt_to_tempfile(source_path, password)
    sheet_names = excel_spec.get("sheet_names", ["0"])
    header = excel_spec.get("header", True)
    skiprows, col_start, col_stop, block_rows = parse_data_address(
        excel_spec.get("data_address", "A1")
    )
    nrows = None
    if block_rows is not None:
        nrows = block_rows - 1 if header else block_rows
    try:
        import openpyxl  # noqa: F401, PLC0415
        have_engine = True
    except ImportError:
        try:
            import xlrd  # noqa: F401, PLC0415
            have_engine = True
        except ImportError:
            have_engine = False
    last_error: Exception | None = None
    for sheet_name in sheet_names:
        try:
            sheet: Any = int(sheet_name) if str(sheet_name).isdigit() else sheet_name
            if have_engine:
                pdf = pd.read_excel(
                    source_path, sheet_name=sheet, header=0 if header else None,
                    skiprows=skiprows, nrows=nrows,
                )
            else:
                from .xlsx_lite import read_sheet  # noqa: PLC0415

                rows = read_sheet(source_path, sheet)[skiprows:]
                if not rows:
                    # Existing-but-empty sheet: name the real condition so
                    # the fallback chain's error message carries it instead
                    # of a misleading missing-sheet IndexError.
                    raise ValueError(
                        f"Sheet {sheet!r} has no data rows (after "
                        f"data_address skip of {skiprows})"
                    )
                if header:
                    head, data = rows[0], rows[1:]
                    columns = [str(c) for c in head]
                else:
                    data = rows
                    columns = list(range(len(rows[0])))
                if nrows is not None:
                    data = data[:nrows]
                pdf = pd.DataFrame(data, columns=columns)
            pdf = pdf.iloc[:, col_start:col_stop]
            if not header:
                pdf.columns = [f"_c{i}" for i in range(len(pdf.columns))]
            return spark.createDataFrame(_coerce_mixed_columns(pdf))
        except Exception as exc:  # noqa: BLE001 - sheet fallback chain
            last_error = exc
    raise RuntimeError(f"None of sheet names {sheet_names} found in Excel workbook: {last_error}")


def _coerce_mixed_columns(pdf):
    """Real-world worksheets mix types inside a column (numbers + cached
    formula strings + error cells + booleans); Spark's pandas conversion
    cannot merge those and raises CANNOT_MERGE_TYPE.  Match the
    spark-excel/inferSchema behavior: a numeric-only mix widens to
    double, anything else stringifies (blanks stay null)."""
    import pandas as pd  # noqa: PLC0415

    def _isnull(v):
        return v is None or (isinstance(v, float) and pd.isna(v))

    for col in pdf.columns:
        if pdf[col].dtype != object:
            continue
        kinds = {type(v) for v in pdf[col] if not _isnull(v)}
        if len(kinds) <= 1:
            continue
        if kinds <= {int, float}:
            pdf[col] = pdf[col].astype(float)
        else:
            pdf[col] = pdf[col].map(lambda v: None if _isnull(v) else str(v))
    return pdf


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

    if "delta" in input_spec or (
        os.path.isdir(source_path)
        and os.path.isdir(os.path.join(source_path, "_delta_log"))
    ):
        # Transactional table directories dispatch on their on-disk
        # markers, like every other format here: `_delta_log/` -> the
        # pure-Python Delta log reader (snapshot / time travel /
        # partition pruning via the delta spec in input_spec).
        from .delta_lite import read_delta  # noqa: PLC0415

        delta_spec = input_spec.get("delta", {})
        return read_delta(
            spark,
            source_path,
            version=delta_spec.get("version"),
            partition_filter=delta_spec.get("partition_filter"),
        )

    if "iceberg" in input_spec or (
        os.path.isdir(source_path)
        and os.path.isdir(os.path.join(source_path, "metadata"))
        and any(
            n.endswith(".metadata.json")
            for n in os.listdir(os.path.join(source_path, "metadata"))
        )
    ):
        from .iceberg_lite import read_iceberg  # noqa: PLC0415

        ice_spec = input_spec.get("iceberg", {})
        return read_iceberg(
            spark,
            source_path,
            snapshot_id=ice_spec.get("snapshot_id"),
            partition_filter=ice_spec.get("partition_filter"),
        )

    if ext == ".parquet" or "parquet" in input_spec:
        return spark.read.format("parquet").load(source_path)

    if ext == ".orc" or "orc" in input_spec:
        return spark.read.format("orc").load(source_path)

    if ext == ".avro" or "avro" in input_spec:
        # spark-avro is an external module.  When its jar is absent
        # (missing-data-source failure), fall back to the avro_lite
        # Python DataSource (sources/pyds.py): a real distributed scan —
        # one input partition per container file, stdlib decoding on the
        # executors.  Genuine read failures (missing path, corrupt file,
        # permissions) propagate unchanged.
        try:
            return spark.read.format("avro").load(source_path)
        except Exception as exc:  # noqa: BLE001
            # Prefer the structured error class (stable across Spark
            # versions) over message wording; keep substrings as the
            # secondary match for non-AnalysisException wrappings.
            error_class = None
            get_cls = getattr(exc, "getCondition", None) or getattr(
                exc, "getErrorClass", None
            )
            if callable(get_cls):
                try:
                    error_class = get_cls()
                except Exception:  # noqa: BLE001
                    error_class = None
            msg = str(exc)
            if not ((error_class or "").startswith("DATA_SOURCE_NOT_FOUND")
                    or "Failed to find data source: avro" in msg
                    or "FAILED_FIND_DATA_SOURCE" in msg
                    or "ClassNotFoundException" in msg):
                raise
            from . import pyds  # noqa: PLC0415

            pyds.register(spark)
            return spark.read.format("avro_lite").load(source_path)

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
