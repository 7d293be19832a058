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



# ------------------------------------------------------- encrypted xlsx
#
# golden_encrypted.xlsx: an MS-OFFCRYPTO agile-encrypted container built
# ENTIRELY here from the public spec (MS-OFFCRYPTO 2.3.4: password KDF
# with spin count, chained-block key derivation, verifier pair, 4096-byte
# package segments; MS-CFB v3 for the outer compound file) — fully
# independent of sources/offcrypto.py, and deliberately using wire
# features its encrypt_agile never emits:
#   - password keyEncryptor hash SHA384 (encrypt_agile: SHA512)
#   - keyData hash SHA256 *different from* the password hash (the spec
#     allows them to differ; encrypt_agile always uses one)
#   - AES-128 (keyBits=128; encrypt_agile: 256)
#   - NO dataIntegrity element (optional per spec)
#   - multi-segment package (payload > 8192 bytes)
#   - EncryptionInfo lives in the CFB MINISTREAM (as real Office writes
#     it), next to a stray extra stream readers must ignore
# The payload is golden.xlsx with an extra stored zip member appended so
# the package spans 4 segments.  All "random" values are fixed, so
# regeneration is byte-identical.

_ENC_PASSWORD = "golden-password"
_SEG = 4096


def _aes_cbc_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _zpad(data: bytes, block: int = 16) -> bytes:
    rem = len(data) % block
    return data if rem == 0 else data + b"\x00" * (block - rem)


def _cfb_v3(big: dict, mini: dict) -> bytes:
    """Minimal MS-CFB v3 writer: ``mini`` streams go through the
    ministream/miniFAT (all must be < 4096 bytes), ``big`` streams are
    regular FAT chains.  Single FAT sector (enough for ~120 sectors)."""
    import struct as st

    FREE, END, FATS = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD

    mini_data = bytearray()
    mini_starts = {}
    minifat = []
    for name, data in mini.items():
        start = len(mini_data) // 64
        mini_starts[name] = start
        n = (len(data) + 63) // 64
        mini_data += _zpad(data, 64)
        minifat += list(range(start + 1, start + n)) + [END]
    minifat += [FREE] * (128 - len(minifat))
    mini_bytes = _zpad(bytes(mini_data), 512)

    # sector plan: 0=FAT, 1=directory, 2=miniFAT, then ministream, then big
    n_dir_entries = 2 + len(mini) + len(big)  # root + padding below
    dir_sectors = max(1, (n_dir_entries * 128 + 511) // 512)
    first_dir = 1
    first_minifat = first_dir + dir_sectors
    first_ministream = first_minifat + 1
    n_ministream = len(mini_bytes) // 512
    cursor = first_ministream + n_ministream
    big_starts = {}
    big_chunks = []
    for name, data in big.items():
        big_starts[name] = cursor
        n = (len(data) + 511) // 512
        big_chunks.append(_zpad(data, 512))
        cursor += n
    total_sectors = cursor

    fat = [FREE] * 128
    fat[0] = FATS
    for s in range(first_dir, first_dir + dir_sectors - 1):
        fat[s] = s + 1
    fat[first_dir + dir_sectors - 1] = END
    fat[first_minifat] = END
    for s in range(first_ministream, first_ministream + n_ministream - 1):
        fat[s] = s + 1
    if n_ministream:
        fat[first_ministream + n_ministream - 1] = END
    for name, data in big.items():
        start = big_starts[name]
        n = (len(data) + 511) // 512
        for s in range(start, start + n - 1):
            fat[s] = s + 1
        fat[start + n - 1] = END
    assert total_sectors <= 128, "single-FAT-sector writer"

    def entry(name, obj_type, start, size, child=0xFFFFFFFF):
        raw = name.encode("utf-16-le")
        buf = bytearray(128)
        buf[0:len(raw)] = raw
        st.pack_into("<H", buf, 64, len(raw) + 2)
        buf[66] = obj_type
        buf[67] = 1  # black
        st.pack_into("<III", buf, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        st.pack_into("<I", buf, 116, start)
        st.pack_into("<Q", buf, 120, size)
        return bytes(buf)

    entries = [entry("Root Entry", 5, first_ministream, len(mini_data),
                     child=1)]
    for name, data in mini.items():
        entries.append(entry(name, 2, mini_starts[name], len(data)))
    for name, data in big.items():
        entries.append(entry(name, 2, big_starts[name], len(data)))
    directory = _zpad(b"".join(entries), 512)
    directory += b"\x00" * (dir_sectors * 512 - len(directory))

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    st.pack_into("<H", header, 24, 0x3E)   # minor
    st.pack_into("<H", header, 26, 3)      # major (v3)
    st.pack_into("<H", header, 28, 0xFFFE)  # little-endian marker
    st.pack_into("<H", header, 30, 9)      # 512-byte sectors
    st.pack_into("<H", header, 32, 6)      # 64-byte mini sectors
    st.pack_into("<I", header, 44, 1)      # one FAT sector
    st.pack_into("<I", header, 48, first_dir)
    st.pack_into("<I", header, 56, 4096)   # mini cutoff
    st.pack_into("<I", header, 60, first_minifat)
    st.pack_into("<I", header, 64, 1)      # one miniFAT sector
    st.pack_into("<I", header, 68, FREE)   # no extended DIFAT
    st.pack_into("<I", header, 72, 0)
    difat = [0] + [FREE] * 108
    st.pack_into("<109I", header, 76, *difat)

    fat_bytes = st.pack("<128I", *fat)
    minifat_bytes = st.pack("<128I", *minifat)
    return (bytes(header) + fat_bytes + directory + minifat_bytes
            + mini_bytes + b"".join(big_chunks))


def gen_encrypted_xlsx(path: str, golden_xlsx_path: str) -> None:
    import hashlib
    import io
    import struct as st
    from base64 import b64encode

    # payload: golden.xlsx + a stored padding member -> 4 segments
    with open(golden_xlsx_path, "rb") as handle:
        base = handle.read()
    buf = io.BytesIO(base)
    with zipfile.ZipFile(buf, "a") as zf:
        info = zipfile.ZipInfo("xl/padding.bin", date_time=(1980, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_STORED
        zf.writestr(info, b"\x90" * 12000)
    payload = buf.getvalue()
    assert len(payload) > 3 * _SEG

    pe_hash, kd_hash = "sha384", "sha256"
    key_bytes, block, spin = 16, 16, 3000
    kd_salt = bytes.fromhex("00112233445566778899aabbccddeeff")
    pe_salt = bytes.fromhex("f0e1d2c3b4a5968778695a4b3c2d1e0f")
    key_value = bytes.fromhex("0123456789abcdef0123456789abcdef")
    verifier = bytes.fromhex("deadbeefcafebabe8badf00ddefec8ed")

    def H(name, data):
        return hashlib.new(name, data).digest()

    # MS-OFFCRYPTO 2.3.4.7: H0 = H(salt || UTF-16LE(password));
    # Hi = H(LE32(i) || Hi-1) for i in [0, spinCount)
    acc = H(pe_hash, pe_salt + _ENC_PASSWORD.encode("utf-16-le"))
    for i in range(spin):
        acc = H(pe_hash, st.pack("<I", i) + acc)

    def derived_key(block_key: bytes) -> bytes:
        d = H(pe_hash, acc + block_key)
        return (d + b"\x36" * key_bytes)[:key_bytes]

    iv_pw = (pe_salt + b"\x36" * block)[:block]
    BLK_VI = bytes([0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79])
    BLK_VV = bytes([0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E])
    BLK_KV = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])

    enc_vi = _aes_cbc_enc(derived_key(BLK_VI), iv_pw, _zpad(verifier))
    enc_vv = _aes_cbc_enc(derived_key(BLK_VV), iv_pw,
                          _zpad(H(pe_hash, verifier)))
    enc_kv = _aes_cbc_enc(derived_key(BLK_KV), iv_pw, _zpad(key_value))

    ciphertext = bytearray()
    for seg_index, off in enumerate(range(0, len(payload), _SEG)):
        seg_iv = (H(kd_hash, kd_salt + st.pack("<I", seg_index))
                  + b"\x36" * block)[:block]
        ciphertext += _aes_cbc_enc(
            key_value, seg_iv, _zpad(payload[off:off + _SEG])
        )
    enc_package = st.pack("<Q", len(payload)) + bytes(ciphertext)

    b64 = lambda b: b64encode(b).decode()  # noqa: E731
    ns_e = "http://schemas.microsoft.com/office/2006/encryption"
    ns_p = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"
    xml = (
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
        f"<encryption xmlns=\"{ns_e}\" xmlns:p=\"{ns_p}\" "
        "xmlns:c=\"http://example.invalid/unused\">\n"
        f"  <keyData saltValue=\"{b64(kd_salt)}\" hashAlgorithm=\"SHA256\" "
        "cipherChaining=\"ChainingModeCBC\" cipherAlgorithm=\"AES\" "
        f"hashSize=\"32\" keyBits=\"{key_bytes * 8}\" blockSize=\"{block}\" "
        "saltSize=\"16\"/>\n"
        "  <keyEncryptors><keyEncryptor "
        f"uri=\"{ns_p}\">\n"
        f"    <p:encryptedKey encryptedKeyValue=\"{b64(enc_kv)}\" "
        f"encryptedVerifierHashValue=\"{b64(enc_vv)}\" "
        f"encryptedVerifierHashInput=\"{b64(enc_vi)}\" "
        f"saltValue=\"{b64(pe_salt)}\" hashAlgorithm=\"SHA384\" "
        "cipherChaining=\"ChainingModeCBC\" cipherAlgorithm=\"AES\" "
        f"hashSize=\"48\" keyBits=\"{key_bytes * 8}\" blockSize=\"{block}\" "
        f"saltSize=\"16\" spinCount=\"{spin}\"/>\n"
        "  </keyEncryptor></keyEncryptors>\n"
        "</encryption>"
    )
    info = st.pack("<HHI", 4, 4, 0x40) + xml.encode("utf-8")
    out = _cfb_v3(
        big={"EncryptedPackage": enc_package},
        mini={"EncryptionInfo": info,
              "GoldenJunk": b"ignore me, I am not part of the spec"},
    )
    with open(path, "wb") as handle:
        handle.write(out)

def _aes_ecb_enc(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()  # noqa: S305
    return enc.update(data) + enc.finalize()


def gen_standard_encrypted_xlsx(path: str, golden_xlsx_path: str) -> None:
    """ECMA-376 STANDARD encryption fixture (MS-OFFCRYPTO §2.3.4.5-15,
    the Office 2007-2010 default): binary EncryptionInfo 3.2, AES-128 +
    SHA-1 header, iterated-50000 SHA-1 KDF with the 0x36/0x5C XOR-pad
    finisher, AES-ECB package.  Independent of sources/offcrypto.py —
    the KDF and layout are re-derived here from the public spec so a
    shared bug cannot hide."""
    import hashlib
    import io
    import struct as st

    # pad past the 4096-byte CFB mini cutoff so EncryptedPackage is a
    # regular FAT stream (matching real Office output)
    with open(golden_xlsx_path, "rb") as handle:
        base = handle.read()
    buf = io.BytesIO(base)
    with zipfile.ZipFile(buf, "a") as zf:
        info_m = zipfile.ZipInfo(
            "xl/padding.bin", date_time=(1980, 1, 1, 0, 0, 0)
        )
        info_m.compress_type = zipfile.ZIP_STORED
        zf.writestr(info_m, b"\x5a" * 8000)
    payload = buf.getvalue()
    assert len(payload) + 8 >= 4096

    salt = bytes.fromhex("a1b2c3d4e5f60718293a4b5c6d7e8f90")
    verifier = bytes.fromhex("0f1e2d3c4b5a69788796a5b4c3d2e1f0")
    key_bytes = 16

    # §2.3.4.7: H0 = SHA1(salt||pw); Hi = SHA1(LE32(i)||Hi-1) x50000;
    # Hfinal = SHA1(Hn||LE32(0)); X1/X2 = SHA1(0x36/0x5C pad ^ Hfinal)
    acc = hashlib.sha1(salt + _ENC_PASSWORD.encode("utf-16-le")).digest()
    for i in range(50_000):
        acc = hashlib.sha1(st.pack("<I", i) + acc).digest()
    h_final = hashlib.sha1(acc + st.pack("<I", 0)).digest()

    def x(fill):
        buf = bytearray([fill] * 64)
        for i, b in enumerate(h_final):
            buf[i] ^= b
        return hashlib.sha1(bytes(buf)).digest()

    key = (x(0x36) + x(0x5C))[:key_bytes]

    enc_verifier = _aes_ecb_enc(key, verifier)
    enc_verifier_hash = _aes_ecb_enc(
        key, _zpad(hashlib.sha1(verifier).digest())
    )
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider\x00".encode(
        "utf-16-le"
    )
    header = st.pack("<8I", 0x24, 0, 0x660E, 0x8004, 128, 0x18, 0, 0) + csp
    ver = (
        st.pack("<I", 16) + salt + enc_verifier
        + st.pack("<I", 20) + enc_verifier_hash
    )
    info = st.pack("<HHII", 3, 2, 0x24, len(header)) + header + ver
    enc_package = st.pack("<Q", len(payload)) + _aes_ecb_enc(
        key, _zpad(payload)
    )
    out = _cfb_v3(
        big={"EncryptedPackage": enc_package},
        mini={"EncryptionInfo": info},
    )
    with open(path, "wb") as handle:
        handle.write(out)


if __name__ == "__main__":
    gen_xlsx(os.path.join(HERE, "golden.xlsx"))
    gen_avro(os.path.join(HERE, "golden.avro"))
    gen_encrypted_xlsx(os.path.join(HERE, "golden_encrypted.xlsx"),
                       os.path.join(HERE, "golden.xlsx"))
    gen_standard_encrypted_xlsx(
        os.path.join(HERE, "golden_standard_encrypted.xlsx"),
        os.path.join(HERE, "golden.xlsx"))
    print("wrote golden.xlsx, golden.avro, golden_encrypted.xlsx, "
          "golden_standard_encrypted.xlsx")
