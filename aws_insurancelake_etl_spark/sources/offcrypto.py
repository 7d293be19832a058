"""Password-protected Office documents: MS-CFB compound files and
MS-OFFCRYPTO "agile" encryption, from the public specs.

The reference reads password-protected workbooks through crealytics
spark-excel (``etl_collect_to_cleanse.py:165-170`` passes
``workbookPassword``); this module gives :func:`..readers.read_excel`
the same capability in-container.  Two public specs are implemented:

- **MS-CFB** (the OLE2 compound file binary format): v3 512-byte-sector
  files, header-DIFAT, FAT chains, directory entries, and the
  ministream/miniFAT for streams under 4,096 bytes.  Reader and writer.
- **MS-OFFCRYPTO §2.3.4 "agile encryption"**: the ``EncryptionInfo``
  XML descriptor (keyData + password keyEncryptor), SHA-512/AES-256-CBC
  password key derivation with spin count, verifier check, segment-wise
  package decryption, and the optional HMAC data-integrity check
  (verified when present, emitted on write).

AES is ``cryptography``'s hazmat CBC primitives (present in this
container — probed round 6); hashing is stdlib ``hashlib``.

Scale note: decryption is inherently a single-file, driver-side step
(the format is a monolithic encrypted blob, not splittable); the
decrypted workbook then flows through the normal distributed read path.
That matches the reference, where the POI/crealytics driver decrypts
in-JVM before parallelizing rows.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import io
import os
import struct
import xml.etree.ElementTree as ET

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF

_SECTOR = 512
_MINI_SECTOR = 64
_MINI_CUTOFF = 4096

# ------------------------------------------------------------------ MS-CFB


def cfb_read(data: bytes) -> dict[str, bytes]:
    """Parse a v3 compound file into {stream_name: bytes}.  Supports the
    header DIFAT (109 FAT sectors — 6.8 MB of sectors, far beyond any
    workbook this path sees) and the ministream; raises on v4 or
    extended-DIFAT files."""
    if data[:8] != CFB_MAGIC:
        raise ValueError("not an OLE compound file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    if sector_shift != 9:
        raise NotImplementedError("only 512-byte-sector (v3) CFB supported")
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (first_difat,) = struct.unpack_from("<I", data, 68)
    if first_difat != _ENDOFCHAIN and first_difat != _FREESECT:
        raise NotImplementedError("extended DIFAT not supported")
    difat = struct.unpack_from("<109I", data, 76)

    def sector(n: int) -> bytes:
        off = _SECTOR + n * _SECTOR
        return data[off:off + _SECTOR]

    fat: list[int] = []
    for s in difat[:n_fat]:
        fat.extend(struct.unpack(f"<{_SECTOR // 4}I", sector(s)))

    def chain(start: int) -> bytes:
        out = bytearray()
        seen = 0
        cur = start
        while cur != _ENDOFCHAIN:
            if cur >= len(fat) or seen > len(fat):
                raise ValueError("corrupt CFB FAT chain")
            out += sector(cur)
            cur = fat[cur]
            seen += 1
        return bytes(out)

    directory = chain(first_dir)
    entries = []
    for off in range(0, len(directory), 128):
        entry = directory[off:off + 128]
        if len(entry) < 128:
            break
        (name_len,) = struct.unpack_from("<H", entry, 64)
        obj_type = entry[66]
        if obj_type == 0 or name_len < 2:
            continue
        name = entry[:name_len - 2].decode("utf-16-le")
        (start,) = struct.unpack_from("<I", entry, 116)
        (size,) = struct.unpack_from("<Q", entry, 120)
        entries.append((name, obj_type, start, size))

    root = next(e for e in entries if e[1] == 5)
    ministream = chain(root[2])[:root[3]] if root[2] != _ENDOFCHAIN else b""
    minifat: list[int] = []
    if n_minifat and first_minifat != _ENDOFCHAIN:
        mf = chain(first_minifat)
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))

    def mini_chain(start: int, size: int) -> bytes:
        out = bytearray()
        cur = start
        while cur != _ENDOFCHAIN and len(out) < size:
            off = cur * _MINI_SECTOR
            out += ministream[off:off + _MINI_SECTOR]
            if cur >= len(minifat):
                raise ValueError("corrupt CFB miniFAT chain")
            cur = minifat[cur]
        return bytes(out[:size])

    streams: dict[str, bytes] = {}
    for name, obj_type, start, size in entries:
        if obj_type != 2:  # stream
            continue
        if size < _MINI_CUTOFF:
            streams[name] = mini_chain(start, size)
        else:
            streams[name] = chain(start)[:size]
    return streams


def _dir_entry(name: str, obj_type: int, *, left=_NOSTREAM, right=_NOSTREAM,
               child=_NOSTREAM, start=_ENDOFCHAIN, size=0) -> bytes:
    encoded = name.encode("utf-16-le")
    entry = bytearray(128)
    entry[:len(encoded)] = encoded
    struct.pack_into("<H", entry, 64, len(encoded) + 2)
    entry[66] = obj_type
    entry[67] = 1  # black
    struct.pack_into("<III", entry, 68, left, right, child)
    struct.pack_into("<I", entry, 116, start)
    struct.pack_into("<Q", entry, 120, size)
    return bytes(entry)


def cfb_write(streams: dict[str, bytes]) -> bytes:
    """Serialize {name: bytes} as a v3 compound file.  Streams under
    4,096 bytes go to the ministream (per spec); larger ones chain in
    the FAT.  Directory is Root + one entry per stream, siblings chained
    in insertion order (CFB name-sort: callers pass shorter names
    first)."""
    names = list(streams)
    if len(names) > 100:
        raise NotImplementedError("cfb_write: too many streams")

    def pad_to(buf: bytes, unit: int) -> bytes:
        rem = len(buf) % unit
        return buf if rem == 0 else buf + b"\x00" * (unit - rem)

    # ministream assembly
    mini_data = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name in names:
        payload = streams[name]
        if len(payload) >= _MINI_CUTOFF or not payload:
            continue
        padded = pad_to(payload, _MINI_SECTOR)
        n_minisectors = len(padded) // _MINI_SECTOR
        mini_starts[name] = len(minifat)
        for i in range(n_minisectors):
            minifat.append(
                len(minifat) + 1 if i < n_minisectors - 1 else _ENDOFCHAIN
            )
        mini_data += padded
    minifat_bytes = pad_to(
        b"".join(struct.pack("<I", v) for v in minifat), _SECTOR
    )
    ministream_bytes = pad_to(bytes(mini_data), _SECTOR)

    # directory: Root(0) then streams in order; entry i sibling -> i+1
    dir_entries = [None]  # root placeholder
    for i, name in enumerate(names):
        right = i + 2 if i + 1 < len(names) else _NOSTREAM
        dir_entries.append((name, right))

    # sector layout: [dir][minifat][ministream][large streams][FAT]
    def build(n_fat_sectors: int) -> bytes | None:
        sectors: list[bytes] = []
        fat: list[int] = []

        def add(buf: bytes) -> int:
            """Append a padded multi-sector buffer as a FAT chain."""
            start = len(sectors)
            n = len(buf) // _SECTOR
            for i in range(n):
                sectors.append(buf[i * _SECTOR:(i + 1) * _SECTOR])
                fat.append(start + i + 1 if i < n - 1 else _ENDOFCHAIN)
            return start if n else _ENDOFCHAIN

        # directory sectors
        dir_blob = bytearray()
        root = _dir_entry(
            "Root Entry", 5,
            child=1 if names else _NOSTREAM,
            start=_ENDOFCHAIN, size=len(mini_data),
        )
        entry_blobs = [root]
        for name, right in dir_entries[1:]:
            entry_blobs.append(b"")  # placeholder, filled below
        dir_count = len(entry_blobs)

        # we need stream start sectors before serializing entries, so
        # lay out data first with a dry run of sector indices
        n_dir_sectors = (dir_count * 128 + _SECTOR - 1) // _SECTOR
        first_dir = 0
        idx = n_dir_sectors
        first_minifat = idx if minifat else _ENDOFCHAIN
        idx += len(minifat_bytes) // _SECTOR
        ministream_start = idx if mini_data else _ENDOFCHAIN
        idx += len(ministream_bytes) // _SECTOR
        large_starts: dict[str, int] = {}
        for name in names:
            payload = streams[name]
            if len(payload) >= _MINI_CUTOFF:
                large_starts[name] = idx
                idx += (len(payload) + _SECTOR - 1) // _SECTOR
        fat_start = idx
        total_sectors = idx + n_fat_sectors
        if total_sectors > n_fat_sectors * (_SECTOR // 4):
            return None  # FAT capacity insufficient, retry bigger
        if n_fat_sectors > 109:
            raise NotImplementedError("cfb_write: file too large")

        # real serialization
        root = _dir_entry(
            "Root Entry", 5,
            child=1 if names else _NOSTREAM,
            start=ministream_start, size=len(mini_data),
        )
        dir_blob += root
        for name, right in dir_entries[1:]:
            payload = streams[name]
            if len(payload) >= _MINI_CUTOFF:
                start = large_starts[name]
            elif payload:
                start = mini_starts[name]
            else:
                start = _ENDOFCHAIN
            dir_blob += _dir_entry(
                name, 2, right=right, start=start, size=len(payload)
            )
        dir_blob = pad_to(bytes(dir_blob), _SECTOR)

        add(dir_blob)
        if minifat:
            add(minifat_bytes)
        if mini_data:
            add(ministream_bytes)
        for name in names:
            payload = streams[name]
            if len(payload) >= _MINI_CUTOFF:
                add(pad_to(payload, _SECTOR))
        for _ in range(n_fat_sectors):
            sectors.append(b"")  # placeholder
            fat.append(_FATSECT)
        fat += [_FREESECT] * (n_fat_sectors * (_SECTOR // 4) - len(fat))
        fat_blob = b"".join(struct.pack("<I", v) for v in fat)
        for i in range(n_fat_sectors):
            sectors[fat_start + i] = fat_blob[i * _SECTOR:(i + 1) * _SECTOR]

        header = bytearray(_SECTOR)
        header[:8] = CFB_MAGIC
        struct.pack_into("<H", header, 24, 0x003E)  # minor
        struct.pack_into("<H", header, 26, 0x0003)  # major (v3)
        struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
        struct.pack_into("<H", header, 30, 9)       # 512-byte sectors
        struct.pack_into("<H", header, 32, 6)       # 64-byte mini sectors
        struct.pack_into("<I", header, 44, n_fat_sectors)
        struct.pack_into("<I", header, 48, first_dir)
        struct.pack_into("<I", header, 56, _MINI_CUTOFF)
        struct.pack_into("<I", header, 60,
                         first_minifat if minifat else _ENDOFCHAIN)
        struct.pack_into("<I", header, 64,
                         len(minifat_bytes) // _SECTOR if minifat else 0)
        struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no extended DIFAT
        struct.pack_into("<I", header, 72, 0)
        difat = [_FREESECT] * 109
        for i in range(n_fat_sectors):
            difat[i] = fat_start + i
        struct.pack_into("<109I", header, 76, *difat)
        return bytes(header) + b"".join(
            s if len(s) == _SECTOR else pad_to(s, _SECTOR) for s in sectors
        )

    n_fat = 1
    while True:
        out = build(n_fat)
        if out is not None:
            return out
        n_fat += 1


# --------------------------------------------------- MS-OFFCRYPTO (agile)

_NS_E = "http://schemas.microsoft.com/office/2006/encryption"
_NS_P = "http://schemas.microsoft.com/office/2006/keyEncryptor/password"

_BLK_VERIFIER_INPUT = bytes([0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79])
_BLK_VERIFIER_VALUE = bytes([0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E])
_BLK_KEY_VALUE = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])
_BLK_HMAC_KEY = bytes([0x5F, 0xB2, 0xAD, 0x01, 0x0C, 0xB9, 0xE1, 0xF6])
_BLK_HMAC_VALUE = bytes([0xA0, 0x67, 0x7F, 0x02, 0xB2, 0x2C, 0x84, 0x33])

_SEGMENT = 4096

_HASHES = {"SHA1": "sha1", "SHA256": "sha256", "SHA384": "sha384",
           "SHA512": "sha512", "MD5": "md5"}


def _aes_cbc(key: bytes, iv: bytes, data: bytes, *, encrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (  # noqa: PLC0415
        Cipher, algorithms, modes,
    )

    cipher = Cipher(algorithms.AES(key), modes.CBC(iv))
    ctx = cipher.encryptor() if encrypt else cipher.decryptor()
    return ctx.update(data) + ctx.finalize()


def _aes_ecb(key: bytes, data: bytes, *, encrypt: bool) -> bytes:
    """ECB is cryptographically weak but is what ECMA-376 STANDARD
    encryption specifies for the package stream (MS-OFFCRYPTO
    §2.3.4.15) — this is format compatibility, not a recommendation."""
    from cryptography.hazmat.primitives.ciphers import (  # noqa: PLC0415
        Cipher, algorithms, modes,
    )

    cipher = Cipher(algorithms.AES(key), modes.ECB())  # noqa: S305
    ctx = cipher.encryptor() if encrypt else cipher.decryptor()
    return ctx.update(data) + ctx.finalize()


def _pad(data: bytes, block: int, fill: bytes = b"\x00") -> bytes:
    rem = len(data) % block
    return data if rem == 0 else data + fill * (block - rem)


def _fit(data: bytes, size: int, fill: int = 0x36) -> bytes:
    """Truncate-or-pad to ``size`` with 0x36 — the spec's rule for both
    derived keys and IVs."""
    if len(data) >= size:
        return data[:size]
    return data + bytes([fill]) * (size - len(data))


def _password_hash(hash_name: str, salt: bytes, password: str,
                   spin_count: int) -> bytes:
    hasher = lambda b: hashlib.new(hash_name, b).digest()  # noqa: E731
    acc = hasher(salt + password.encode("utf-16-le"))
    for i in range(spin_count):
        acc = hasher(struct.pack("<I", i) + acc)
    return acc


def _derive_key(hash_name: str, pw_hash: bytes, block_key: bytes,
                key_bytes: int) -> bytes:
    return _fit(hashlib.new(hash_name, pw_hash + block_key).digest(),
                key_bytes)


class WrongPassword(ValueError):
    pass


def _q(ns: str, tag: str) -> str:
    return f"{{{ns}}}{tag}"


def decrypt_agile(data: bytes, password: str) -> bytes:
    """Decrypt an agile-encrypted Office container to the plain package
    (zip) bytes.  Verifies the password against the spec's verifier pair
    and, when a dataIntegrity element is present, the package HMAC."""
    streams = cfb_read(data)
    try:
        info = streams["EncryptionInfo"]
        package = streams["EncryptedPackage"]
    except KeyError as exc:
        raise ValueError(f"missing stream in encrypted container: {exc}") from None
    major, minor = struct.unpack_from("<HH", info, 0)
    if (major, minor) != (4, 4):
        raise NotImplementedError(
            f"only agile encryption (4.4) supported, got {major}.{minor} "
            "(standard/extensible encryption not implemented)"
        )
    root = ET.fromstring(info[8:].decode("utf-8"))
    kd = root.find(_q(_NS_E, "keyData"))
    enc_key = root.find(
        f"{_q(_NS_E, 'keyEncryptors')}/{_q(_NS_E, 'keyEncryptor')}/"
        f"{_q(_NS_P, 'encryptedKey')}"
    )
    if kd is None or enc_key is None:
        raise ValueError("malformed EncryptionInfo XML")
    if (kd.get("cipherAlgorithm") != "AES"
            or kd.get("cipherChaining") != "ChainingModeCBC"):
        raise NotImplementedError("only AES-CBC keyData supported")

    import base64  # noqa: PLC0415

    b64 = base64.b64decode
    kd_salt = b64(kd.get("saltValue"))
    kd_block = int(kd.get("blockSize"))
    kd_key_bytes = int(kd.get("keyBits")) // 8
    kd_hash = _HASHES[kd.get("hashAlgorithm")]

    pe_salt = b64(enc_key.get("saltValue"))
    pe_block = int(enc_key.get("blockSize"))
    pe_key_bytes = int(enc_key.get("keyBits")) // 8
    pe_hash = _HASHES[enc_key.get("hashAlgorithm")]
    spin = int(enc_key.get("spinCount"))

    pw_hash = _password_hash(pe_hash, pe_salt, password, spin)
    iv = _fit(pe_salt, pe_block)

    def pw_decrypt(blob: bytes, block_key: bytes) -> bytes:
        key = _derive_key(pe_hash, pw_hash, block_key, pe_key_bytes)
        return _aes_cbc(key, iv, blob, encrypt=False)

    verifier_input = pw_decrypt(
        b64(enc_key.get("encryptedVerifierHashInput")), _BLK_VERIFIER_INPUT
    )[:int(enc_key.get("saltSize"))]
    expect = hashlib.new(pe_hash, verifier_input).digest()
    got = pw_decrypt(
        b64(enc_key.get("encryptedVerifierHashValue")), _BLK_VERIFIER_VALUE
    )[:len(expect)]
    if not hmac_mod.compare_digest(expect, got):
        raise WrongPassword("wrong password (verifier mismatch)")

    key_value = pw_decrypt(
        b64(enc_key.get("encryptedKeyValue")), _BLK_KEY_VALUE
    )[:kd_key_bytes]

    integrity = root.find(_q(_NS_E, "dataIntegrity"))
    if integrity is not None:
        hk_iv = _fit(
            hashlib.new(kd_hash, kd_salt + _BLK_HMAC_KEY).digest(), kd_block
        )
        hv_iv = _fit(
            hashlib.new(kd_hash, kd_salt + _BLK_HMAC_VALUE).digest(), kd_block
        )
        hmac_key = _aes_cbc(
            key_value, hk_iv, b64(integrity.get("encryptedHmacKey")),
            encrypt=False,
        )[:hashlib.new(kd_hash).digest_size]
        hmac_value = _aes_cbc(
            key_value, hv_iv, b64(integrity.get("encryptedHmacValue")),
            encrypt=False,
        )[:hashlib.new(kd_hash).digest_size]
        actual = hmac_mod.new(hmac_key, package, kd_hash).digest()
        if not hmac_mod.compare_digest(actual, hmac_value):
            raise ValueError("package HMAC mismatch (corrupt or tampered)")

    (orig_size,) = struct.unpack_from("<Q", package, 0)
    ciphertext = package[8:]
    out = bytearray()
    for seg in range(0, len(ciphertext), _SEGMENT):
        seg_index = seg // _SEGMENT
        seg_iv = _fit(
            hashlib.new(kd_hash, kd_salt + struct.pack("<I", seg_index)).digest(),
            kd_block,
        )
        out += _aes_cbc(key_value, seg_iv,
                        ciphertext[seg:seg + _SEGMENT], encrypt=False)
    return bytes(out[:orig_size])


def encrypt_agile(package: bytes, password: str, *,
                  spin_count: int = 100_000, rng=os.urandom) -> bytes:
    """Encrypt plain package (zip) bytes as an agile-encrypted compound
    file (SHA-512 / AES-256-CBC, the modern Office default), including
    the dataIntegrity HMAC.  ``rng`` is injectable for deterministic
    tests."""
    import base64  # noqa: PLC0415

    b64e = lambda b: base64.b64encode(b).decode()  # noqa: E731
    hash_name, hash_xml = "sha512", "SHA512"
    key_bytes, block = 32, 16
    hash_size = 64

    kd_salt = rng(16)
    pe_salt = rng(16)
    key_value = rng(key_bytes)
    verifier_input = rng(16)
    hmac_key = rng(hash_size)

    pw_hash = _password_hash(hash_name, pe_salt, password, spin_count)
    iv = _fit(pe_salt, block)

    def pw_encrypt(blob: bytes, block_key: bytes) -> bytes:
        key = _derive_key(hash_name, pw_hash, block_key, key_bytes)
        return _aes_cbc(key, iv, _pad(blob, block), encrypt=True)

    enc_verifier_input = pw_encrypt(verifier_input, _BLK_VERIFIER_INPUT)
    enc_verifier_value = pw_encrypt(
        hashlib.new(hash_name, verifier_input).digest(), _BLK_VERIFIER_VALUE
    )
    enc_key_value = pw_encrypt(key_value, _BLK_KEY_VALUE)

    # package segments
    ciphertext = bytearray()
    for seg in range(0, len(package), _SEGMENT):
        seg_iv = _fit(
            hashlib.new(
                hash_name, kd_salt + struct.pack("<I", seg // _SEGMENT)
            ).digest(),
            block,
        )
        ciphertext += _aes_cbc(
            key_value, seg_iv, _pad(package[seg:seg + _SEGMENT], block),
            encrypt=True,
        )
    enc_package = struct.pack("<Q", len(package)) + bytes(ciphertext)

    hk_iv = _fit(hashlib.new(hash_name, kd_salt + _BLK_HMAC_KEY).digest(), block)
    hv_iv = _fit(hashlib.new(hash_name, kd_salt + _BLK_HMAC_VALUE).digest(), block)
    enc_hmac_key = _aes_cbc(key_value, hk_iv, _pad(hmac_key, block), encrypt=True)
    hmac_value = hmac_mod.new(hmac_key, enc_package, hash_name).digest()
    enc_hmac_value = _aes_cbc(
        key_value, hv_iv, _pad(hmac_value, block), encrypt=True
    )

    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<encryption xmlns="{_NS_E}" xmlns:p="{_NS_P}">'
        f'<keyData saltSize="16" blockSize="{block}" keyBits="{key_bytes * 8}" '
        f'hashSize="{hash_size}" cipherAlgorithm="AES" '
        f'cipherChaining="ChainingModeCBC" hashAlgorithm="{hash_xml}" '
        f'saltValue="{b64e(kd_salt)}"/>'
        f'<dataIntegrity encryptedHmacKey="{b64e(enc_hmac_key)}" '
        f'encryptedHmacValue="{b64e(enc_hmac_value)}"/>'
        "<keyEncryptors>"
        '<keyEncryptor uri="http://schemas.microsoft.com/office/2006/'
        'keyEncryptor/password">'
        f'<p:encryptedKey spinCount="{spin_count}" saltSize="16" '
        f'blockSize="{block}" keyBits="{key_bytes * 8}" hashSize="{hash_size}" '
        f'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        f'hashAlgorithm="{hash_xml}" saltValue="{b64e(pe_salt)}" '
        f'encryptedVerifierHashInput="{b64e(enc_verifier_input)}" '
        f'encryptedVerifierHashValue="{b64e(enc_verifier_value)}" '
        f'encryptedKeyValue="{b64e(enc_key_value)}"/>'
        "</keyEncryptor></keyEncryptors></encryption>"
    )
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode("utf-8")
    return cfb_write({"EncryptionInfo": info, "EncryptedPackage": enc_package})


# ------------------------------------------- MS-OFFCRYPTO §2.3.4 (standard)
#
# ECMA-376 "standard" encryption is the Office 2007-2010 DEFAULT — a
# decade of insurer back-books is locked behind it (VERDICT r8 item 6).
# Binary EncryptionInfo (no XML): version 2.2/3.2/4.2, an
# EncryptionHeader (AlgID 0x660E/F/10 = AES-128/192/256, AlgIDHash
# 0x8004 = SHA-1), and an EncryptionVerifier.  Key derivation is the
# iterated SHA-1 of §2.3.4.7 finished with the 0x36/0x5C XOR-pad step;
# the package stream is AES-ECB (§2.3.4.15) with an 8-byte plain-size
# prefix and NO segmenting.

_ALG_AES = {0x660E: 16, 0x660F: 24, 0x6610: 32}
_ALGID_HASH_SHA1 = 0x8004
_STD_SPIN = 50_000


def _standard_key(password: str, salt: bytes, key_bytes: int,
                  block: int = 0) -> bytes:
    """§2.3.4.7: H0 = SHA1(salt||pw); Hi = SHA1(LE32(i)||Hi-1) for
    50,000 rounds; Hfinal = SHA1(Hn||LE32(block)); then the X1/X2
    ipad/opad-style finisher: X1 = SHA1(0x36*64 ^ Hfinal), X2 =
    SHA1(0x5C*64 ^ Hfinal), key = (X1||X2)[:key_bytes]."""
    acc = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(_STD_SPIN):
        acc = hashlib.sha1(struct.pack("<I", i) + acc).digest()
    h_final = hashlib.sha1(acc + struct.pack("<I", block)).digest()

    def xored(fill: int) -> bytes:
        buf = bytearray([fill] * 64)
        for i, b in enumerate(h_final):
            buf[i] ^= b
        return hashlib.sha1(bytes(buf)).digest()

    return (xored(0x36) + xored(0x5C))[:key_bytes]


def decrypt_standard(data: bytes, password: str) -> bytes:
    """Decrypt an ECMA-376 STANDARD-encrypted container (Office
    2007-2010 default) to the plain package bytes."""
    streams = cfb_read(data)
    try:
        info = streams["EncryptionInfo"]
        package = streams["EncryptedPackage"]
    except KeyError as exc:
        raise ValueError(
            f"missing stream in encrypted container: {exc}"
        ) from None
    major, minor = struct.unpack_from("<HH", info, 0)
    if minor != 2 or major not in (2, 3, 4):
        raise NotImplementedError(
            f"not a standard-encryption descriptor: {major}.{minor}"
        )
    (flags,) = struct.unpack_from("<I", info, 4)
    (header_size,) = struct.unpack_from("<I", info, 8)
    header = info[12:12 + header_size]
    (h_flags, _extra, alg_id, alg_hash, key_bits, _provider,
     _r1, _r2) = struct.unpack_from("<8I", header, 0)
    del flags, h_flags  # fCryptoAPI/fAES informative; AlgID decides
    if alg_id not in _ALG_AES:
        raise NotImplementedError(
            f"standard encryption AlgID 0x{alg_id:04X} unsupported "
            "(AES 0x660E/0x660F/0x6610 only — RC4 CryptoAPI is a "
            "different, weaker scheme)"
        )
    if alg_hash != _ALGID_HASH_SHA1:
        raise NotImplementedError(
            f"standard encryption AlgIDHash 0x{alg_hash:04X} unsupported "
            "(spec mandates SHA-1 = 0x8004)"
        )
    key_bytes = key_bits // 8
    if key_bytes != _ALG_AES[alg_id]:
        raise ValueError(
            f"KeySize {key_bits} inconsistent with AlgID 0x{alg_id:04X}"
        )
    ver = info[12 + header_size:]
    (salt_size,) = struct.unpack_from("<I", ver, 0)
    salt = ver[4:4 + salt_size]
    enc_verifier = ver[4 + salt_size:4 + salt_size + 16]
    (verifier_hash_size,) = struct.unpack_from("<I", ver, 4 + salt_size + 16)
    enc_verifier_hash = ver[4 + salt_size + 20:4 + salt_size + 20 + 32]

    key = _standard_key(password, salt, key_bytes)
    verifier = _aes_ecb(key, enc_verifier, encrypt=False)
    verifier_hash = _aes_ecb(key, enc_verifier_hash, encrypt=False)
    expect = hashlib.sha1(verifier).digest()[:verifier_hash_size]
    if not hmac_mod.compare_digest(expect, verifier_hash[:verifier_hash_size]):
        raise WrongPassword("wrong password (verifier mismatch)")

    (orig_size,) = struct.unpack_from("<Q", package, 0)
    plain = _aes_ecb(key, _pad(package[8:], 16), encrypt=False)
    return plain[:orig_size]


def encrypt_standard(package: bytes, password: str, *,
                     key_bits: int = 128, rng=os.urandom) -> bytes:
    """Encrypt plain package bytes in the ECMA-376 STANDARD shape
    (3.2 descriptor, AES + SHA-1) — the writer twin used for round-trip
    tests; real legacy files come from Office itself."""
    key_bytes = key_bits // 8
    alg_id = {16: 0x660E, 24: 0x660F, 32: 0x6610}[key_bytes]
    salt = rng(16)
    verifier = rng(16)
    key = _standard_key(password, salt, key_bytes)
    enc_verifier = _aes_ecb(key, verifier, encrypt=True)
    enc_verifier_hash = _aes_ecb(
        key, _pad(hashlib.sha1(verifier).digest(), 16), encrypt=True
    )
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider\x00".encode(
        "utf-16-le"
    )
    header = struct.pack(
        "<8I", 0x24, 0, alg_id, _ALGID_HASH_SHA1, key_bits, 0x18, 0, 0
    ) + csp
    ver = (
        struct.pack("<I", 16) + salt + enc_verifier
        + struct.pack("<I", 20) + enc_verifier_hash
    )
    info = (
        struct.pack("<HHII", 3, 2, 0x24, len(header)) + header + ver
    )
    enc_package = struct.pack("<Q", len(package)) + _aes_ecb(
        key, _pad(package, 16), encrypt=True
    )
    return cfb_write({"EncryptionInfo": info, "EncryptedPackage": enc_package})


def decrypt_office(data: bytes, password: str) -> bytes:
    """Dispatch on the EncryptionInfo version: 4.4 = agile (Office
    2013+), x.2 = ECMA-376 standard (Office 2007-2010).  Anything else
    (extensible 3.3/4.3, RC4 CryptoAPI 1.x) refuses by name."""
    streams = cfb_read(data)
    info = streams.get("EncryptionInfo")
    if info is None:
        raise ValueError("missing EncryptionInfo stream")
    major, minor = struct.unpack_from("<HH", info, 0)
    if (major, minor) == (4, 4):
        return decrypt_agile(data, password)
    if minor == 2 and major in (2, 3, 4):
        return decrypt_standard(data, password)
    raise NotImplementedError(
        f"EncryptionInfo version {major}.{minor} unsupported (agile 4.4 "
        "and standard 2.2/3.2/4.2 are implemented; extensible and RC4 "
        "CryptoAPI are not)"
    )


def decrypt_to_tempfile(path: str, password: str) -> str:
    """Decrypt an encrypted workbook to a temp .xlsx and return its path
    (the plain-zip hand-off the Excel reader consumes).  Handles both
    agile (4.4) and ECMA-376 standard (Office 2007-2010) containers."""
    import tempfile  # noqa: PLC0415

    with open(path, "rb") as handle:
        data = handle.read()
    plain = decrypt_office(data, password)
    if plain[:2] != b"PK":
        raise ValueError("decrypted payload is not a zip package")
    fd, out_path = tempfile.mkstemp(suffix=".xlsx", prefix="decrypted_")
    with io.open(fd, "wb") as out:
        out.write(plain)
    return out_path
