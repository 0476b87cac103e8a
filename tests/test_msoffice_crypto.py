"""VelvetSweatshop decrypt path on REAL container bytes — stdlib only.

The fixture builders here write genuine [MS-CFB] containers and
[MS-OFFCRYPTO] standard-encryption streams (the inverse of the product
decryptor, sharing only the FIPS-197-verified AES primitive), so the
test exercises: CFB header/FAT/mini-FAT parsing, EncryptionInfo parsing,
the 50k-round key derivation, password verification, package decrypt,
and the ExcelLoader end-to-end (encrypted bytes → repaired Spark frame).
"""

from __future__ import annotations

import hashlib
import io
import struct

import pytest

from openpolicedata_spark.sources.cfb import CfbReader
from openpolicedata_spark.sources.msoffice_crypto import (
    EncryptionError,
    aes_decrypt_block,
    aes_encrypt_block,
    decrypt_standard,
    derive_standard_key,
    is_encrypted_office,
    parse_encryption_info,
)

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
NOSTREAM = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal CFB writer (512-byte sectors, v3) — test fixture builder
# ---------------------------------------------------------------------------

def _dir_entry(name: str, typ: int, start: int, size: int,
               child: int = NOSTREAM) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    ent = bytearray(128)
    ent[0:len(raw)] = raw
    struct.pack_into("<H", ent, 64, len(raw))
    ent[66] = typ
    ent[67] = 1  # black
    struct.pack_into("<I", ent, 68, NOSTREAM)   # left
    struct.pack_into("<I", ent, 72, NOSTREAM)   # right
    struct.pack_into("<I", ent, 76, child)      # child
    struct.pack_into("<I", ent, 116, start)
    struct.pack_into("<Q", ent, 120, size)
    return bytes(ent)


def write_cfb(streams: dict[str, bytes], sector_size: int = 512) -> bytes:
    """Valid-enough CFB (v3 with 512-byte sectors, v4 with 4096): small
    streams (<4096) go through the mini stream + mini-FAT; large ones
    get FAT chains — both reader paths. In v4 the 512-byte header is
    padded to a full sector ([MS-CFB] §2.2) and sector n starts at
    (n+1)*sector_size."""
    small = {k: v for k, v in streams.items() if len(v) < 4096}
    large = {k: v for k, v in streams.items() if len(v) >= 4096}

    # mini stream: concat small streams at 64-byte alignment
    mini_parts, mini_starts, minifat = [], {}, []
    cursor = 0
    for name, data in small.items():
        n_sec = max(1, -(-len(data) // 64))
        mini_starts[name] = cursor
        minifat.extend(list(range(cursor + 1, cursor + n_sec)) + [ENDOFCHAIN])
        mini_parts.append(data + b"\x00" * (n_sec * 64 - len(data)))
        cursor += n_sec
    ministream = b"".join(mini_parts)

    # sector plan: [dir][minifat][ministream][large streams][fat]
    S = sector_size
    def n_sectors(nbytes):
        return max(1, -(-nbytes // S))

    n_dir_entries = 1 + len(streams)
    dir_secs = n_sectors(n_dir_entries * 128)
    minifat_bytes = struct.pack(f"<{len(minifat)}I", *minifat)
    minifat_secs = n_sectors(len(minifat_bytes)) if minifat else 0
    mini_secs = n_sectors(len(ministream)) if ministream else 0
    large_secs = {k: n_sectors(len(v)) for k, v in large.items()}

    layout = []
    dir_start = 0
    layout += ["dir"] * dir_secs
    minifat_start = len(layout) if minifat_secs else ENDOFCHAIN
    layout += ["minifat"] * minifat_secs
    mini_start = len(layout) if mini_secs else ENDOFCHAIN
    layout += ["mini"] * mini_secs
    large_starts = {}
    for k in large:
        large_starts[k] = len(layout)
        layout += [k] * large_secs[k]
    n_data = len(layout)
    fat_secs = n_sectors((n_data + 1) * 4)  # +1 for the FAT sector itself
    fat_start = n_data
    layout += ["fat"] * fat_secs
    assert fat_secs == 1, "fixture stays small"

    # FAT: chain within each contiguous run
    fat = [FREESECT] * (fat_secs * (S // 4))
    def chain(start, count):
        for i in range(count - 1):
            fat[start + i] = start + i + 1
        fat[start + count - 1] = ENDOFCHAIN
    chain(dir_start, dir_secs)
    if minifat_secs:
        chain(minifat_start, minifat_secs)
    if mini_secs:
        chain(mini_start, mini_secs)
    for k in large:
        chain(large_starts[k], large_secs[k])
    fat[fat_start] = 0xFFFFFFFD  # FATSECT marker

    # directory
    entries = [_dir_entry("Root Entry", 5,
                          mini_start if mini_secs else ENDOFCHAIN,
                          len(ministream), child=1)]
    for name, data in streams.items():
        if name in small:
            entries.append(_dir_entry(name, 2, mini_starts[name], len(data)))
        else:
            entries.append(_dir_entry(name, 2, large_starts[name], len(data)))
    dir_bytes = b"".join(entries)
    dir_bytes += b"\x00" * (dir_secs * S - len(dir_bytes))

    # header
    head = bytearray(512)
    head[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", head, 24, 0x3E)     # minor
    struct.pack_into("<H", head, 26, 3 if S == 512 else 4)
    struct.pack_into("<H", head, 28, 0xFFFE)   # byte order
    struct.pack_into("<H", head, 30, 9 if S == 512 else 12)
    struct.pack_into("<H", head, 32, 6)        # mini shift
    struct.pack_into("<I", head, 44, fat_secs)
    struct.pack_into("<I", head, 48, dir_start)
    struct.pack_into("<I", head, 56, 4096)     # mini cutoff
    struct.pack_into("<I", head, 60,
                     minifat_start if minifat_secs else ENDOFCHAIN)
    struct.pack_into("<I", head, 64, minifat_secs)
    struct.pack_into("<I", head, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", head, 72, 0)
    difat = [fat_start] + [FREESECT] * 108
    struct.pack_into("<109I", head, 76, *difat)

    body = {"dir": dir_bytes,
            "minifat": minifat_bytes + b"\x00" * (minifat_secs * S
                                                  - len(minifat_bytes)),
            "mini": ministream + b"\x00" * (mini_secs * S
                                            - len(ministream))}
    # v4: the 512-byte header is padded with zeros to a full sector
    out = bytes(head) + b"\x00" * (S - 512)
    emitted = set()
    for tag in layout:
        if tag == "fat":
            out += struct.pack(f"<{len(fat)}I", *fat)
        elif tag in body:
            if tag not in emitted:
                out += body[tag]
                emitted.add(tag)
        else:  # a large stream
            if tag not in emitted:
                data = large[tag]
                out += data + b"\x00" * (large_secs[tag] * S - len(data))
                emitted.add(tag)
    return out


# ---------------------------------------------------------------------------
# standard-encryption writer ([MS-OFFCRYPTO] §2.3.4.5) — fixture builder
# ---------------------------------------------------------------------------

SALT = bytes(range(16))
VERIFIER = bytes(range(100, 116))


def encrypt_standard(package: bytes,
                     password: str = "VelvetSweatshop") -> bytes:
    key = derive_standard_key(password, SALT, 128)
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider"\
        .encode("utf-16-le") + b"\x00\x00"
    header = struct.pack("<8I", 0x24, 0, 0x660E, 0x8004, 128, 0x18, 0, 0) + csp
    vh = hashlib.sha1(VERIFIER).digest() + b"\x00" * 12  # pad 20 -> 32
    enc_v = aes_encrypt_block(key, VERIFIER)
    enc_vh = b"".join(aes_encrypt_block(key, vh[i:i + 16])
                      for i in (0, 16))
    verifier_blob = (struct.pack("<I", 16) + SALT + enc_v
                     + struct.pack("<I", 20) + enc_vh)
    info = (struct.pack("<HHI", 3, 2, 0x24)
            + struct.pack("<I", len(header)) + header + verifier_blob)
    padded = package + b"\x00" * (-len(package) % 16)
    enc_pkg = b"".join(aes_encrypt_block(key, padded[i:i + 16])
                       for i in range(0, len(padded), 16))
    pkg_stream = struct.pack("<Q", len(package)) + enc_pkg
    return write_cfb({"EncryptionInfo": info, "EncryptedPackage": pkg_stream})


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_aes_fips197_vectors():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes_encrypt_block(key, pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes_decrypt_block(key, aes_encrypt_block(key, pt)) == pt
    k256 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                         "101112131415161718191a1b1c1d1e1f")
    assert aes_encrypt_block(k256, pt).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"


def test_cfb_roundtrip_mini_and_fat_streams():
    small = b"small stream content" * 3          # < 4096: mini-FAT path
    big = bytes(range(256)) * 20                 # >= 4096: FAT path
    data = write_cfb({"Small": small, "Big": big})
    r = CfbReader(data)
    assert set(r.list_streams()) == {"Small", "Big"}
    assert r.read_stream("Small") == small
    assert r.read_stream("Big") == big
    with pytest.raises(KeyError):
        r.read_stream("Nope")


def test_decrypt_standard_roundtrip_and_wrong_password():
    package = b"PK\x03\x04 pretend zip " + bytes(range(256)) * 2
    blob = encrypt_standard(package)
    assert is_encrypted_office(blob)
    assert decrypt_standard(blob) == package
    with pytest.raises(EncryptionError, match="verification"):
        decrypt_standard(blob, password="wrong")


def test_parse_encryption_info_rejects_agile():
    bad = struct.pack("<HHI", 4, 4, 0x40) + b"<xml/>"
    with pytest.raises(EncryptionError, match="agile"):
        parse_encryption_info(bad)


def test_is_encrypted_office_negative():
    assert not is_encrypted_office(b"PK\x03\x04 plain zip")
    # CFB but no EncryptionInfo stream
    assert not is_encrypted_office(write_cfb({"Other": b"x" * 10}))


def test_excel_loader_decrypts_velvetsweatshop_end_to_end(spark, tmp_path):
    """The full production path: a standard-encrypted workbook (real CFB
    + AES bytes) → stdlib decrypt → stdlib xlsx parse → repair → Spark."""
    from tests.test_native_parsers import make_xlsx

    plain = make_xlsx({"Sheet1": [
        ["Case", "Race"],
        ["C1", "WHITE"],
        ["C2", "BLACK"],
    ]})
    path = tmp_path / "velvet.xlsx"
    path.write_bytes(encrypt_standard(plain))
    from openpolicedata_spark.sources.excel import ExcelLoader

    pdf = ExcelLoader(spark, str(path)).load().toPandas()
    assert sorted(pdf["Case"]) == ["C1", "C2"]

    # a plain workbook still passes through the sniff untouched
    plain_path = tmp_path / "plain.xlsx"
    plain_path.write_bytes(plain)
    assert ExcelLoader(spark, str(plain_path)).load().count() == 2


def test_cfb_v4_4096_byte_sectors():
    """Version-4 containers (4096-byte sectors, header padded to a full
    sector): sector n starts at (n+1)*sector_size — the offset formula
    that breaks if the header is assumed to always be 512 bytes."""
    small = b"mini stream payload"
    big = bytes(range(256)) * 24                 # >= 4096: FAT path
    data = write_cfb({"Small": small, "Big": big}, sector_size=4096)
    r = CfbReader(data)
    assert r.sector_size == 4096
    assert r.read_stream("Small") == small
    assert r.read_stream("Big") == big
