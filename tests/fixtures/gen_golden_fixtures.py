"""One-shot generator for the golden reader fixtures in this directory.

The point of these fixtures (VERDICT r5 item 2) is INDEPENDENCE from the
sibling writers in ``sources/xlsx_lite.py`` / ``sources/avro_lite.py``:
round-trip tests share any encoding bug between writer and reader, so the
fixtures here are hand-authored against the PUBLIC specs —
ECMA-376 SpreadsheetML (ISO/IEC 29500) and the Apache Avro 1.11 object
container spec — and deliberately use wire features the sibling writers
never emit:

golden.xlsx
  - a ``xl/sharedStrings.xml`` part (write_xlsx only emits inline strings)
  - rich-text runs (``<si><r><t>``) that must concatenate
  - cached-formula string cells (``t="str"``) and boolean cells
  - sparse rows (missing cells between refs), a row without an ``r``
    attribute, and a cell without an ``r`` attribute (positional fallback)
  - scientific-notation numerics
  - a cached error cell (``t="e"`` / #DIV/0!) and an ISO date cell
    (``t="d"``)
  - a second sheet resolved through workbook.xml.rels with a
    NON-sequential relationship id (rId7)
  - a styles part with date-styled serial numbers: built-in numFmtId 14,
    a custom datetime format, a NON-date custom format whose only 'y'
    sits inside a quoted literal (classifier trap), and a plain numeric
    format

golden.avro
  - ``deflate`` codec
  - TWO data blocks (write_avro always emits one)
  - file metadata map split into two map blocks using the
    negative-count-with-byte-size form the spec allows
  - an array value encoded as a negative-count block with byte-size
    prefix
  - an enum field and a ["null","..."] union with both branches exercised
  - a fixed (non-random) sync marker so bytes are reproducible

Run from the repo root:  python tests/fixtures/gen_golden_fixtures.py
The committed ``golden.xlsx`` / ``golden.avro`` bytes are what the tests
read; regeneration must be byte-identical (no randomness, fixed zip
metadata).
"""

from __future__ import annotations

import json
import os
import struct
import zipfile
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def gen_xlsx(path: str) -> None:
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    # second sheet deliberately bound to the non-sequential rId7
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}"><sheets>'
        '<sheet name="Policies" sheetId="1" r:id="rId1"/>'
        '<sheet name="Rates &amp; Fees" sheetId="2" r:id="rId7"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId7" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    shared_strings = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_MAIN_NS}" count="4" uniqueCount="4">'
        "<si><t>policy_id</t></si>"
        "<si><t>holder</t></si>"
        # rich-text runs: reader must concatenate "Mary" + " " + "O'Hara"
        "<si><r><t>Mary</t></r><r><t xml:space=\"preserve\"> </t></r>"
        "<r><t>O&#39;Hara</t></r></si>"
        "<si><t>premium</t></si>"
        "</sst>"
    )
    # Sheet 1 layout (refs sparse on purpose):
    #   row 1: A1=shared"policy_id" B1=shared"holder" C1=shared"premium"
    #   row 2: A2=100 B2=rich-text shared string, C2=1.5E2 (scientific)
    #   row 3 (NO r attr): first cell (no r attr) = cached-formula string
    #          "PC-7", then C3 bool TRUE (A->skip B)
    #   row 4: A4 error cell #DIV/0!, B4 date cell 2024-03-15T00:00:00,
    #          C4 = 12.25
    sheet1 = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>3</v></c>'
        "</row>"
        '<row r="2">'
        '<c r="A2"><v>100</v></c>'
        '<c r="B2" t="s"><v>2</v></c>'
        '<c r="C2"><v>1.5E2</v></c>'
        "</row>"
        "<row>"
        '<c t="str"><f>CONCAT("PC-",7)</f><v>PC-7</v></c>'
        '<c r="C3" t="b"><v>1</v></c>'
        "</row>"
        '<row r="4">'
        '<c r="A4" t="e"><f>1/0</f><v>#DIV/0!</v></c>'
        '<c r="B4" t="d"><v>2024-03-15T00:00:00</v></c>'
        '<c r="C4"><v>12.25</v></c>'
        "</row>"
        "</sheetData></worksheet>"
    )
    # cellXfs: 0=General, 1=builtin date (14), 2=custom datetime (164),
    # 3=custom NON-date whose 'y' is quoted (165), 4=builtin 0.00 (2)
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_MAIN_NS}">'
        '<numFmts count="2">'
        '<numFmt numFmtId="164" formatCode="dd/mm/yyyy hh:mm"/>'
        '<numFmt numFmtId="165" formatCode="0.00 &quot;yrs&quot;"/>'
        "</numFmts>"
        '<cellXfs count="5">'
        '<xf numFmtId="0"/>'
        '<xf numFmtId="14" applyNumberFormat="1"/>'
        '<xf numFmtId="164" applyNumberFormat="1"/>'
        '<xf numFmtId="165" applyNumberFormat="1"/>'
        '<xf numFmtId="2" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>"
    )
    # A3: serial 45366 styled as a date -> 2024-03-15
    # A4: serial 45366.5 styled datetime -> 2024-03-15 12:00:00
    # A5: serial 45366.25 styled with the QUOTED-'y' custom -> stays 45366.25
    # A6: 1234.5 styled 0.00 -> stays numeric
    sheet2 = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>rate</t></is></c></row>'
        '<row r="2"><c r="A2"><v>0.035</v></c></row>'
        '<row r="3"><c r="A3" s="1"><v>45366</v></c></row>'
        '<row r="4"><c r="A4" s="2"><v>45366.5</v></c></row>'
        '<row r="5"><c r="A5" s="3"><v>45366.25</v></c></row>'
        '<row r="6"><c r="A6" s="4"><v>1234.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    members = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", root_rels),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
        ("xl/sharedStrings.xml", shared_strings),
        ("xl/styles.xml", styles),
        ("xl/worksheets/sheet1.xml", sheet1),
        ("xl/worksheets/sheet2.xml", sheet2),
    ]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in members:
            # fixed date_time so regeneration is byte-identical
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, text)


def _varlong(value: int) -> bytes:
    encoded = (value << 1) ^ (value >> 63)
    out = bytearray()
    while True:
        if encoded < 0x80:
            out.append(encoded)
            return bytes(out)
        out.append((encoded & 0x7F) | 0x80)
        encoded >>= 7


def _avro_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _varlong(len(b)) + b


def gen_avro(path: str) -> None:
    schema = {
        "type": "record",
        "name": "claim",
        "fields": [
            {"name": "claim_id", "type": "long"},
            {"name": "payee", "type": ["null", "string"]},
            {"name": "amount", "type": "double"},
            {"name": "status", "type": {
                "type": "enum", "name": "st",
                "symbols": ["OPEN", "PAID", "DENIED"]}},
            {"name": "codes", "type": {"type": "array", "items": "int"}},
        ],
    }
    sync = bytes(range(16))  # fixed, reproducible

    out = bytearray()
    out += b"Obj\x01"
    # metadata map in TWO blocks, the second using the
    # negative-count + byte-size form (spec-legal, writer never emits it)
    out += _varlong(1)
    out += _avro_str("avro.schema")
    sj = json.dumps(schema, separators=(",", ":")).encode("utf-8")
    out += _varlong(len(sj)) + sj
    second = _avro_str("avro.codec") + _avro_str("deflate")
    out += _varlong(-1) + _varlong(len(second)) + second
    out += _varlong(0)
    out += sync

    def record(claim_id, payee, amount, status, codes) -> bytes:
        b = bytearray()
        b += _varlong(claim_id)
        if payee is None:
            b += _varlong(0)
        else:
            b += _varlong(1) + _avro_str(payee)
        b += struct.pack("<d", amount)
        b += _varlong(["OPEN", "PAID", "DENIED"].index(status))
        if codes:
            # negative-count array block with byte-size prefix
            items = b"".join(_varlong(c) for c in codes)
            b += _varlong(-len(codes)) + _varlong(len(items)) + items
        b += _varlong(0)
        return bytes(b)

    def block(records: list[bytes]) -> bytes:
        payload = b"".join(records)
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
        return _varlong(len(records)) + _varlong(len(payload)) + payload + sync

    out += block([
        record(1, "Ada Lovelace", 1200.50, "PAID", [10, 20, 30]),
        record(2, None, 0.0, "OPEN", []),
    ])
    out += block([
        record(3, "Grace Hopper", 99.99, "DENIED", [7]),
    ])
    with open(path, "wb") as handle:
        handle.write(bytes(out))


if __name__ == "__main__":
    gen_xlsx(os.path.join(HERE, "golden.xlsx"))
    gen_avro(os.path.join(HERE, "golden.avro"))
    print("wrote golden.xlsx and golden.avro")
