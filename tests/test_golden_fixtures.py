"""Golden-fixture tests for the stdlib readers (VERDICT r5 item 2).

``tests/fixtures/golden.xlsx`` and ``golden.avro`` were hand-authored
against the public ECMA-376 SpreadsheetML and Avro 1.11 container specs
(see ``tests/fixtures/gen_golden_fixtures.py``), NOT produced by the
sibling writers in ``sources/``: they use wire features the writers never
emit (sharedStrings part, rich-text runs, cached-formula/error/date
cells, positional cells without refs, deflate codec, multi-block
containers, negative-count map/array blocks).  Every expected value is
asserted inline, so reader correctness no longer rests on writer/reader
round-trip symmetry.

Reference parity: the reference ingests arbitrary real-world workbooks
via crealytics spark-excel (etl_collect_to_cleanse.py:154-185,
docs/file_formats.md:146-165); these fixtures stand in for "a file we
did not write ourselves".
"""

from __future__ import annotations

import os

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN_XLSX = os.path.join(FIXTURES, "golden.xlsx")
GOLDEN_AVRO = os.path.join(FIXTURES, "golden.avro")


def test_golden_fixtures_are_committed():
    assert os.path.exists(GOLDEN_XLSX), "run tests/fixtures/gen_golden_fixtures.py"
    assert os.path.exists(GOLDEN_AVRO), "run tests/fixtures/gen_golden_fixtures.py"


def test_golden_xlsx_sheet1_values():
    from aws_insurancelake_etl_spark.sources.xlsx_lite import read_sheet

    matrix = read_sheet(GOLDEN_XLSX, 0)
    assert matrix == [
        # shared strings (t="s")
        ["policy_id", "holder", "premium"],
        # plain number, rich-text shared string (3 runs concatenated),
        # scientific-notation number
        [100, "Mary O'Hara", 150],
        # row without r attr: cached-formula string (t="str") lands in
        # column 0 positionally, explicit C3 boolean, B3 blank
        ["PC-7", None, True],
        # cached error cell (t="e") surfaces the error text; ISO date
        # cell (t="d") surfaces the literal string; plain decimal
        ["#DIV/0!", "2024-03-15T00:00:00", 12.25],
    ]
    # type fidelity, not just equality-after-coercion
    assert isinstance(matrix[1][0], int)
    assert isinstance(matrix[2][2], bool)
    assert isinstance(matrix[3][2], float)


def test_golden_xlsx_sheet_by_name_and_nonsequential_rel_id():
    import datetime

    from aws_insurancelake_etl_spark.sources.xlsx_lite import read_sheet

    # "Rates & Fees" is bound through the non-sequential rId7 and has an
    # escaped ampersand in its name.  Rows 3-6 pin the style-driven date
    # conversion: built-in numFmtId 14 -> date, custom datetime format ->
    # datetime, custom format whose only 'y' is INSIDE a quoted literal
    # ('0.00 "yrs"') -> stays numeric, built-in 0.00 -> stays numeric.
    expect = [
        ["rate"],
        [0.035],
        [datetime.date(2024, 3, 15)],
        [datetime.datetime(2024, 3, 15, 12, 0)],
        [45366.25],
        [1234.5],
    ]
    assert read_sheet(GOLDEN_XLSX, "Rates & Fees") == expect
    assert read_sheet(GOLDEN_XLSX, 1) == expect
    with pytest.raises(KeyError):
        read_sheet(GOLDEN_XLSX, "NoSuchSheet")


def test_golden_xlsx_through_spark_reader(spark):
    from aws_insurancelake_etl_spark.sources.readers import read_input

    df = read_input(
        spark,
        GOLDEN_XLSX,
        {"excel": {"sheet_names": ["Policies"], "data_address": "A1"}},
    )
    rows = {r["policy_id"]: r for r in df.collect()}
    assert set(df.columns) == {"policy_id", "holder", "premium"}
    assert rows["100"]["holder"] == "Mary O'Hara"
    assert rows["#DIV/0!"]["premium"] == "12.25"


def test_golden_avro_values():
    from aws_insurancelake_etl_spark.sources.avro_lite import read_avro

    names, rows = read_avro(GOLDEN_AVRO)
    assert names == ["claim_id", "payee", "amount", "status", "codes"]
    assert rows == [
        (1, "Ada Lovelace", 1200.5, "PAID", [10, 20, 30]),
        (2, None, 0.0, "OPEN", []),
        (3, "Grace Hopper", 99.99, "DENIED", [7]),
    ]


def test_golden_avro_through_spark_datasource(spark, tmp_path):
    from aws_insurancelake_etl_spark.sources.readers import read_input

    df = read_input(spark, GOLDEN_AVRO, {"avro": {}})
    got = sorted(
        (r["claim_id"], r["payee"], r["amount"], r["status"], list(r["codes"]))
        for r in df.collect()
    )
    assert got == [
        (1, "Ada Lovelace", 1200.5, "PAID", [10, 20, 30]),
        (2, None, 0.0, "OPEN", []),
        (3, "Grace Hopper", 99.99, "DENIED", [7]),
    ]


def test_golden_fixtures_regenerate_byte_identical(tmp_path):
    """The generator is deterministic, so the committed bytes are exactly
    what the script produces — drift in either direction fails."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_golden_fixtures", os.path.join(FIXTURES, "gen_golden_fixtures.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    x = tmp_path / "golden.xlsx"
    a = tmp_path / "golden.avro"
    gen.gen_xlsx(str(x))
    gen.gen_avro(str(a))
    with open(GOLDEN_XLSX, "rb") as f1, open(x, "rb") as f2:
        assert f1.read() == f2.read()
    with open(GOLDEN_AVRO, "rb") as f1, open(a, "rb") as f2:
        assert f1.read() == f2.read()


def test_xlsx_date_format_classifier_and_serial_conversion():
    import datetime

    from aws_insurancelake_etl_spark.sources.xlsx_lite import (
        _format_is_date, _serial_to_datetime,
    )

    assert _format_is_date("dd/mm/yyyy")
    assert _format_is_date("[$-409]h:mm AM/PM")          # h outside brackets
    assert _format_is_date("yyyy\\-mm\\-dd")             # escaped separators
    assert not _format_is_date("General")
    assert not _format_is_date("0.00%")
    assert not _format_is_date('0.00 "yrs"')             # quoted y
    assert not _format_is_date('#,##0 "hrs";[Red]-#,##0 "hrs"'
                               .replace("hrs", "units")) # quoted + bracket
    assert not _format_is_date("[Red]0.0")               # bracket only

    assert _serial_to_datetime(45366) == datetime.date(2024, 3, 15)
    assert _serial_to_datetime(45366.5) == datetime.datetime(2024, 3, 15, 12, 0)
    # 61 = 1900-03-01 (first serial after the fictitious leap day)
    assert _serial_to_datetime(61) == datetime.date(1900, 3, 1)
    assert _serial_to_datetime(0.75) == datetime.datetime(1899, 12, 30, 18, 0)
    # sub-second fractions survive rounding
    assert _serial_to_datetime(45366 + 1.5 / 86400) == datetime.datetime(
        2024, 3, 15, 0, 0, 1, 500000
    )


def test_xlsx_error_and_date_cells_unit():
    """_cell_value handles t='e'/'d' explicitly and reports unparseable
    numeric cells with a typed message (ADVICE r5)."""
    import xml.etree.ElementTree as ET

    from aws_insurancelake_etl_spark.sources.xlsx_lite import _MAIN_NS, _cell_value

    def cell(xml):
        return ET.fromstring(xml.replace("<c", f'<c xmlns="{_MAIN_NS}"', 1))

    assert _cell_value(cell('<c t="e"><v>#N/A</v></c>'), []) == "#N/A"
    assert (
        _cell_value(cell('<c t="d"><v>2023-12-31T23:59:59</v></c>'), [])
        == "2023-12-31T23:59:59"
    )
    with pytest.raises(ValueError, match="type='x'"):
        _cell_value(cell('<c t="x"><v>bogus</v></c>'), [])
