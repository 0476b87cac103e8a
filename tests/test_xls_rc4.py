"""RC4 FILEPASS decryption tests — the encryptor below is written HERE,
forward from [MS-OFFCRYPTO] §2.3.5/§2.3.6 and [MS-XLS] 2.2.10 spec
literals, independent of sources/xls_crypto.py's decryptor (the same
construction discipline as test_png.py / test_msoffice_agile.py).
Reference analog: openpolicedata excel.py:132-150 (msoffcrypto +
'VelvetSweatshop')."""

from __future__ import annotations

import hashlib
import struct

import pytest

from openpolicedata_spark.sources.xls import XlsError, read_xls
from openpolicedata_spark.sources.xls_crypto import (
    BiffCryptoError,
    decrypt_biff_workbook,
)
from tests.test_msoffice_crypto import write_cfb
from tests.test_xls import (
    as_xls,
    bof,
    boundsheet,
    eof,
    label,
    number,
    rec,
    sst,
    labelsst,
    _BOF_WBGLOBALS,
    _BOF_WORKSHEET,
)

SALT = bytes(range(16))


# ------------------------------------------------ spec-literal encryptor

def _rc4_stream(key: bytes, n: int) -> bytes:
    """Raw RC4 keystream, written independently (table + generator)."""
    S = bytearray(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) % 256
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for _ in range(n):
        i = (i + 1) % 256
        j = (j + S[i]) % 256
        S[i], S[j] = S[j], S[i]
        out.append(S[(S[i] + S[j]) % 256])
    return bytes(out)


def _xor(a: bytes, ks: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, ks))


def _std_block_key(password: str, block: int) -> bytes:
    # §2.3.6.2 verbatim: MD5(pw)[:5]; MD5(((...)+salt)*16)[:5];
    # MD5(material + block_le32)
    trunc = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
    material = hashlib.md5((trunc + SALT) * 16).digest()[:5]
    return hashlib.md5(material + struct.pack("<I", block)).digest()


def _capi_block_key(password: str, block: int, key_bits: int) -> bytes:
    # §2.3.5.2 verbatim: SHA1(salt+pw); SHA1(H0+block_le32)[:bits/8],
    # 40-bit padded with 11 zero bytes
    h0 = hashlib.sha1(SALT + password.encode("utf-16-le")).digest()
    h = hashlib.sha1(h0 + struct.pack("<I", block)).digest()
    k = h[:key_bits // 8]
    return k + b"\x00" * 11 if key_bits == 40 else k


def _filepass_std(password: str) -> bytes:
    verifier = bytes(range(100, 116))
    ks = _rc4_stream(_std_block_key(password, 0), 32)
    enc_ver = _xor(verifier, ks[:16])
    enc_vh = _xor(hashlib.md5(verifier).digest(), ks[16:])
    return rec(0x002F, struct.pack("<HHH", 1, 1, 1)
               + SALT + enc_ver + enc_vh)


def _filepass_capi(password: str, key_bits: int) -> bytes:
    verifier = bytes(range(50, 66))
    ks = _rc4_stream(_capi_block_key(password, 0, key_bits), 36)
    enc_ver = _xor(verifier, ks[:16])
    enc_vh = _xor(hashlib.sha1(verifier).digest(), ks[16:])
    csp = "Microsoft Base Cryptographic Provider v1.0\x00".encode(
        "utf-16-le")
    header = struct.pack("<IIIIIIII", 0, 0, 0x6801, 0x8004, key_bits,
                         0x18, 0, 0) + csp
    body = (struct.pack("<HHH", 1, 4, 2)            # type=RC4, ver 4.2
            + struct.pack("<II", 0, len(header)) + header
            + struct.pack("<I", 16) + SALT + enc_ver
            + struct.pack("<I", 20) + enc_vh)
    return rec(0x002F, body)


def _encrypt_stream(wb: bytes, fp_end: int, key_for_block) -> bytes:
    """[MS-XLS] 2.2.10: one cipher byte-space over the stream, rekeyed
    each 1024 bytes; headers, pre-FILEPASS bytes, exempt record bodies
    and BoundSheet8 lbPlyPos stay plaintext but consume keystream."""
    plain_body = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}
    mask = bytearray(len(wb))  # 1 = encrypt this byte
    pos = 0
    while pos + 4 <= len(wb):
        opcode, length = struct.unpack_from("<HH", wb, pos)
        body_start = pos + 4
        for i in range(body_start, body_start + length):
            inside_plain = (
                pos < fp_end
                or opcode in plain_body
                or (opcode == 0x0085 and i < body_start + 4)
            )
            mask[i] = 0 if inside_plain else 1
        pos += 4 + length
    out = bytearray(wb)
    # generate keystream block by block and xor where mask says encrypted
    for block_start in range(0, len(wb), 1024):
        block = block_start // 1024
        ks = _rc4_stream(key_for_block(block),
                         min(1024, len(wb) - block_start))
        for off, k in enumerate(ks):
            p = block_start + off
            if mask[p]:
                out[p] ^= k
    return bytes(out)


def _encrypted_workbook(password: str = "VelvetSweatshop",
                        scheme: str = "std", key_bits: int = 128,
                        n_rows: int = 200) -> tuple[bytes, dict]:
    """A real multi-record workbook (SST big enough that cell records
    span several 1024-byte cipher blocks), encrypted forward from the
    spec. Returns (cfb bytes, expected {cell: value})."""
    strings = [f"doc-{i}-" + "x" * 40 for i in range(60)]
    cells = b""
    expect = {}
    for r in range(n_rows):
        cells += number(r, 0, float(r) / 4.0)
        cells += labelsst(r, 1, r % 60)
        expect[(r, 0)] = r / 4.0 if r % 4 else r // 4
        expect[(r, 1)] = strings[r % 60]
    fp = (_filepass_std(password) if scheme == "std"
          else _filepass_capi(password, key_bits))
    head = bof(_BOF_WBGLOBALS) + fp + rec(0x0022, struct.pack("<H", 0)) \
        + sst(strings)
    bs_placeholder = boundsheet(0, "S")
    globals_len = len(head) + len(bs_placeholder) + len(eof())
    sheet = bof(_BOF_WORKSHEET) + cells + eof()
    wb = head + boundsheet(globals_len, "S") + eof() + sheet
    fp_end = len(bof(_BOF_WBGLOBALS)) + len(fp)
    if scheme == "std":
        key_fn = lambda b: _std_block_key(password, b)        # noqa: E731
    else:
        key_fn = lambda b: _capi_block_key(password, b,       # noqa: E731
                                           key_bits)
    enc = _encrypt_stream(wb, fp_end, key_fn)
    assert enc != wb  # something actually got encrypted
    return write_cfb({"Workbook": enc}), expect


# ----------------------------------------------------------------- tests

def _check(out, expect):
    g = out["S"]
    for (r, c), want in expect.items():
        got = g.iloc[r, c]
        assert got == want, ((r, c), got, want)


def test_std_rc4_roundtrip_multiblock():
    blob, expect = _encrypted_workbook(scheme="std")
    _check(read_xls(blob), expect)


@pytest.mark.parametrize("key_bits", [40, 128])
def test_cryptoapi_roundtrip(key_bits):
    blob, expect = _encrypted_workbook(scheme="capi", key_bits=key_bits)
    _check(read_xls(blob), expect)


def test_custom_password():
    blob, expect = _encrypted_workbook(password="s3cret", scheme="std")
    _check(read_xls(blob, password="s3cret"), expect)
    with pytest.raises(XlsError, match="password verification"):
        read_xls(blob)  # VelvetSweatshop is wrong for this one


def test_wrong_password_raises_before_parsing():
    blob, _ = _encrypted_workbook(scheme="capi", key_bits=128)
    with pytest.raises(XlsError, match="password verification"):
        read_xls(blob, password="nope")


def test_truncated_xor_filepass_raises_clearly():
    # wEncryptionType 0 with no key/verifier bytes: truncated XOR record
    wb = bof(_BOF_WBGLOBALS) + rec(0x002F, struct.pack("<H", 0)) + eof()
    with pytest.raises(XlsError, match="truncated XOR FILEPASS"):
        read_xls(write_cfb({"Workbook": wb}))


def test_truncated_filepass_raises_crypto_error():
    wb = bof(_BOF_WBGLOBALS) + rec(0x002F, b"\x01\x00\x01\x00\x01\x00") \
        + eof()
    with pytest.raises(XlsError, match="truncated"):
        read_xls(write_cfb({"Workbook": wb}))


def test_plaintext_workbook_rejected_by_decryptor():
    wb = bof(_BOF_WBGLOBALS) + eof()
    with pytest.raises(BiffCryptoError, match="no FILEPASS"):
        decrypt_biff_workbook(wb)


def test_boundsheet_offsets_survive_decryption():
    """lbPlyPos is plaintext in the encrypted file; after decryption the
    recorded offset must still land exactly on the sheet's BOF."""
    blob, _ = _encrypted_workbook(scheme="std", n_rows=5)
    from openpolicedata_spark.sources.cfb import CfbReader

    wb_enc = CfbReader(blob).read_stream("Workbook")
    wb = decrypt_biff_workbook(wb_enc)
    # walk globals to the BoundSheet8 record
    pos, sheet_off = 0, None
    while pos + 4 <= len(wb):
        opcode, length = struct.unpack_from("<HH", wb, pos)
        if opcode == 0x0085:
            (sheet_off,) = struct.unpack_from("<I", wb, pos + 4)
            break
        pos += 4 + length
    assert sheet_off is not None
    assert struct.unpack_from("<HH", wb, sheet_off)[0] == 0x0809  # BOF


def test_excel_loader_opens_rc4_workbook_end_to_end(spark, tmp_path):
    from openpolicedata_spark.sources.excel import ExcelLoader

    blob, _ = _encrypted_workbook(scheme="std", n_rows=4)
    p = tmp_path / "enc.xls"
    p.write_bytes(blob)
    df = ExcelLoader(spark, url=str(p)).load()
    assert df.count() == 3  # row 0 becomes the header


def test_filepass_junk_fuzz_never_escapes_struct_error():
    """Arbitrary FILEPASS bodies must fail with XlsError (wrapping
    BiffCryptoError), never a raw struct.error/IndexError."""
    import numpy as np

    for seed in range(60):
        r = np.random.default_rng(seed)
        n = int(r.integers(0, 60))
        body = bytes(r.integers(0, 256, size=n, dtype=np.uint8))
        # bias half the cases toward the real scheme prefixes
        if seed % 2:
            body = bytes([1, 0, seed % 5, 0, 2, 0]) + body
        wb = bof(_BOF_WBGLOBALS) + rec(0x002F, body) + eof()
        try:
            read_xls(write_cfb({"Workbook": wb}))
        except XlsError:
            pass
