"""Minimal pure-stdlib XLSX reader/writer (zipfile + xml.etree).

An ``.xlsx`` workbook is a ZIP of XML parts (ECMA-376 / ISO 29500
SpreadsheetML — public spec).  This module implements just enough of it
to run the reference's Excel ingestion option surface
(``etl_collect_to_cleanse.py:154-185``: sheet selection by name or
0-based index, ``data_address`` block slicing, header flag) in
environments without a pandas Excel engine (openpyxl/xlrd), which is the
case in this container.  ``sources.readers.read_excel`` prefers pandas
when an engine is importable and falls back here; tests use
:func:`write_xlsx` to produce real workbook bytes without any
third-party writer.

Supported on read: shared strings (``t="s"``), inline strings
(``t="inlineStr"``), formula-cached strings (``t="str"``), booleans
(``t="b"``), numbers (int when integral), blank cells (None), sparse
rows/cells via ``r`` references, error (``t="e"``) and ISO-date
(``t="d"``) cells, and — round 6 — DATES STORED AS STYLED SERIALS: a
numeric cell whose cellXf number format is a date/time format (built-in
ids per ECMA-376 §18.8.30 or a custom code with date tokens) converts to
``datetime.date``/``datetime.datetime`` like pandas/crealytics do.
Not supported: formula re-evaluation (the cached value is returned,
same as pandas).  Encrypted workbooks (CFB container, not a ZIP) are
detected and reported; ``sources.offcrypto`` decrypts them upstream.
"""

from __future__ import annotations

import datetime
import re
import zipfile
from xml.etree import ElementTree as ET

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CELL_RE = re.compile(r"^([A-Z]+)(\d+)$")

# OLE/CFB magic: password-protected workbooks are an encrypted Compound
# File, not a ZIP — give a precise error instead of BadZipFile.
_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _q(tag: str) -> str:
    return f"{{{_MAIN_NS}}}{tag}"


def _col_to_index(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _index_to_col(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def sheet_names(path: str) -> list[str]:
    """Workbook sheet names in declared (tab) order."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [
        sheet.get("name", "")
        for sheet in wb.iter(_q("sheet"))
    ]


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member_path)] in workbook order via the rels part."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels.iter(f"{{{_PKG_REL_NS}}}Relationship")
    }
    out = []
    for sheet in wb.iter(_q("sheet")):
        rid = sheet.get(f"{{{_REL_NS}}}id")
        target = rid_to_target.get(rid, "")
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = "xl/" + target
        out.append((sheet.get("name", ""), member))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    strings = []
    for si in root.iter(_q("si")):
        # plain <t> or rich-text runs (<r><t>..</t></r>): concat all <t>
        strings.append("".join(t.text or "" for t in si.iter(_q("t"))))
    return strings


# Built-in numFmtIds Excel renders as dates/times (ECMA-376 §18.8.30);
# custom formats are classified by date tokens outside quoted/bracketed
# sections below.
_BUILTIN_DATE_FMTS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + [45, 46, 47]
    + list(range(50, 59))
)


def _format_is_date(code: str) -> bool:
    """True if a custom number-format code renders a date/time: contains
    y/m/d/h/s tokens outside string literals, [coloring]/[conditions],
    and escaped chars.  'General'/'0.00%'/'#,##0' → False."""
    depth_quote = False
    i = 0
    while i < len(code):
        ch = code[i]
        if ch == '"':
            depth_quote = not depth_quote
        elif not depth_quote:
            if ch == "\\":
                i += 1
            elif ch == "[":
                end = code.find("]", i)
                i = end if end != -1 else len(code)
            elif ch in "ymdhsYMDHS":
                return True
        i += 1
    return False


def _date_styles(zf: zipfile.ZipFile) -> list[bool]:
    """Per-cellXf 'renders as date' flags from xl/styles.xml (empty list
    when the workbook has no styles part — e.g. our own writer)."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return []
    custom_date = {
        int(fmt.get("numFmtId")): _format_is_date(fmt.get("formatCode", ""))
        for fmts in root.iter(_q("numFmts"))
        for fmt in fmts.iter(_q("numFmt"))
    }
    flags = []
    for xfs in root.iter(_q("cellXfs")):
        for xf in xfs.iter(_q("xf")):
            fmt_id = int(xf.get("numFmtId", "0"))
            flags.append(
                fmt_id in _BUILTIN_DATE_FMTS
                or custom_date.get(fmt_id, False)
            )
    return flags


# Excel's day-serial epoch.  1899-12-30 (not -31) absorbs the inherited
# Lotus 1-2-3 bug that treats 1900 as a leap year: serials >= 61 convert
# correctly with this epoch, and 60 (the fictitious 1900-02-29) maps to
# 1900-02-28 rather than crashing — the standard reader compromise.
_EXCEL_EPOCH = datetime.datetime(1899, 12, 30)


def _serial_to_datetime(num: float):
    whole = int(num)
    frac = num - whole
    moment = _EXCEL_EPOCH + datetime.timedelta(days=whole)
    if frac:
        seconds = round(frac * 86400, 6)
        moment += datetime.timedelta(seconds=seconds)
        return moment
    return moment.date()


def _cell_value(cell: ET.Element, shared: list[str],
                date_styles: list[bool] = ()):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(_q("is"))
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(_q("t")))
    v = cell.find(_q("v"))
    if v is None or v.text is None:
        return None
    text = v.text
    if ctype == "s":
        return shared[int(text)]
    if ctype == "str":
        return text
    if ctype == "b":
        return text == "1"
    if ctype == "e":
        # cached error cell ('#DIV/0!', '#N/A', ...): surface the error
        # text rather than crashing in float() (crealytics maps these to
        # error strings too)
        return text
    if ctype == "d":
        # ISO-8601 date cell (SpreadsheetML 'd' type): keep the literal
        # string; downstream `transform_date` handles parsing
        return text
    try:
        num = float(text)
    except ValueError as exc:
        raise ValueError(
            f"unsupported xlsx cell: type={ctype!r} value={text!r}"
        ) from exc
    style = cell.get("s")
    if style is not None and date_styles:
        idx = int(style)
        if 0 <= idx < len(date_styles) and date_styles[idx] and num >= 0:
            return _serial_to_datetime(num)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_sheet(path: str, sheet: int | str = 0) -> list[list]:
    """Return the sheet as a dense row-major matrix (None for blanks),
    trimmed to the bounding box of populated cells.  ``sheet`` is a
    0-based index or a sheet name; unknown names raise KeyError (the
    reader's sheet-fallback chain relies on that)."""
    with open(path, "rb") as handle:
        if handle.read(8) == _CFB_MAGIC:
            raise NotImplementedError(
                "Workbook is an encrypted OLE compound file (password-"
                "protected), not a plain xlsx ZIP — decrypt first via "
                "sources.offcrypto (readers.read_excel does this when the "
                "spec carries 'password')"
            )
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if isinstance(sheet, int):
            if not 0 <= sheet < len(targets):
                raise KeyError(f"sheet index {sheet} out of range ({len(targets)} sheets)")
            member = targets[sheet][1]
        else:
            by_name = {name: member for name, member in targets}
            if sheet not in by_name:
                raise KeyError(f"sheet {sheet!r} not in workbook {sorted(by_name)}")
            member = by_name[sheet]
        shared = _shared_strings(zf)
        date_styles = _date_styles(zf)
        root = ET.fromstring(zf.read(member))

    cells: dict[tuple[int, int], object] = {}
    max_row = max_col = -1
    row_counter = 0
    for row in root.iter(_q("row")):
        r_attr = row.get("r")
        row_idx = int(r_attr) - 1 if r_attr else row_counter
        row_counter = row_idx + 1
        col_counter = 0
        for cell in row.iter(_q("c")):
            ref = cell.get("r")
            if ref:
                m = _CELL_RE.match(ref)
                col_idx = _col_to_index(m.group(1)) if m else col_counter
            else:
                col_idx = col_counter
            col_counter = col_idx + 1
            value = _cell_value(cell, shared, date_styles)
            if value is not None:
                cells[(row_idx, col_idx)] = value
                max_row = max(max_row, row_idx)
                max_col = max(max_col, col_idx)
    return [
        [cells.get((r, c)) for c in range(max_col + 1)]
        for r in range(max_row + 1)
    ]


def _esc(text: str) -> str:
    # quote escaping matters for attribute contexts (sheet names)
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write a minimal valid workbook: one worksheet part per entry,
    strings inline (no sharedStrings part), numbers/bools typed.
    ``datetime.date``/``datetime.datetime`` values are written the way
    real producers write them — as numeric serials carrying a date
    style (cellXf 1 = built-in numFmtId 14, cellXf 2 = a custom
    datetime format) — so they round-trip through the style-aware
    reader and through pandas/openpyxl alike."""
    sheet_items = list(sheets.items())
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheet_items))
        )
        + "</Types>"
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_MAIN_NS}">'
        '<numFmts count="1">'
        '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd\\ hh:mm:ss"/>'
        "</numFmts>"
        '<cellXfs count="3">'
        '<xf numFmtId="0"/>'
        '<xf numFmtId="14" applyNumberFormat="1"/>'
        '<xf numFmtId="164" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}"><sheets>'
        + "".join(
            f'<sheet name="{_esc(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _) in enumerate(sheet_items)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_items))
        )
        + "</Relationships>"
    )

    def sheet_xml(rows: list[list]) -> str:
        parts = [
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
            f'<worksheet xmlns="{_MAIN_NS}"><sheetData>',
        ]
        for r, row in enumerate(rows):
            parts.append(f'<row r="{r + 1}">')
            for c, value in enumerate(row):
                if value is None:
                    continue
                ref = f"{_index_to_col(c)}{r + 1}"
                if isinstance(value, bool):
                    parts.append(f'<c r="{ref}" t="b"><v>{int(value)}</v></c>')
                elif isinstance(value, datetime.datetime):
                    serial = (value - _EXCEL_EPOCH).total_seconds() / 86400
                    parts.append(f'<c r="{ref}" s="2"><v>{serial!r}</v></c>')
                elif isinstance(value, datetime.date):
                    serial = (
                        datetime.datetime.combine(value, datetime.time())
                        - _EXCEL_EPOCH
                    ).days
                    parts.append(f'<c r="{ref}" s="1"><v>{serial}</v></c>')
                elif isinstance(value, (int, float)):
                    parts.append(f'<c r="{ref}"><v>{value!r}</v></c>')
                else:
                    parts.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{_esc(str(value))}</t></is></c>'
                    )
            parts.append("</row>")
        parts.append("</sheetData></worksheet>")
        return "".join(parts)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", styles)
        for i, (_, rows) in enumerate(sheet_items):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(rows))
