"""BIFF5 parsing + XOR-obfuscation (FILEPASS wEncryptionType 0) tests.

The XOR encryptor below is written HERE, forward from [MS-OFFCRYPTO]
§2.3.7.1-3 and [MS-XLS] 2.2.10 spec literals, independent of
sources/xls_crypto.py's decryptor (the construction discipline of
test_xls_rc4.py / test_msoffice_agile.py). In particular the 105-word
XorMatrix is written out VERBATIM from the spec table — the source
module generates it from 15 row heads via the GF(2) shift structure,
so a round-trip here cross-checks the generated table word for word.

Same documented caveat as the agile fixtures: a workbook obfuscated by
real Excel can't be produced in this offline container, so a spec
misreading shared by encryptor and decryptor would round-trip
invisibly; the hand-derived verifier/key anchors below pin the
primitives independently of both implementations.

Reference analog: openpolicedata excel.py:128-153 (xlrd + msoffcrypto
open password-protected legacy workbooks transparently).
"""

from __future__ import annotations

import struct

import pytest

from openpolicedata_spark.sources.xls import XlsError, read_xls
from openpolicedata_spark.sources.xls_crypto import (
    xor_array,
    xor_key,
    xor_password_verifier,
)
from tests.test_msoffice_crypto import write_cfb
from tests.test_xls import (
    _BOF_WBGLOBALS,
    _BOF_WORKSHEET,
    as_xls,
    bof,
    build_workbook,
    eof,
    label,
    mulrk,
    number,
    rec,
    rk,
    rk_int,
    xf,
)

# --------------------------------------------- spec literals (§2.3.7.2)

_INITIAL_CODE = (
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE, 0x313E,
    0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A, 0x4EC3)

# the full XorMatrix, verbatim from the spec (15 password positions x 7
# bits) — NOT generated, so it cross-checks the source module's
# GF(2)-generated table
_XOR_MATRIX = (
    0xAEFC, 0x4DD9, 0x9BB2, 0x2745, 0x4E8A, 0x9D14, 0x2A09,
    0x7B61, 0xF6C2, 0xFDA5, 0xEB6B, 0xC6F7, 0x9DCF, 0x2BBF,
    0x4563, 0x8AC6, 0x05AD, 0x0B5A, 0x16B4, 0x2D68, 0x5AD0,
    0x0375, 0x06EA, 0x0DD4, 0x1BA8, 0x3750, 0x6EA0, 0xDD40,
    0xD849, 0xA0B3, 0x5147, 0xA28E, 0x553D, 0xAA7A, 0x44D5,
    0x6F45, 0xDE8A, 0xAD35, 0x4A4B, 0x9496, 0x390D, 0x721A,
    0xEB23, 0xC667, 0x9CEF, 0x29FF, 0x53FE, 0xA7FC, 0x5FD9,
    0x47D3, 0x8FA6, 0x0F6D, 0x1EDA, 0x3DB4, 0x7B68, 0xF6D0,
    0xB861, 0x60E3, 0xC1C6, 0x93AD, 0x377B, 0x6EF6, 0xDDEC,
    0x45A0, 0x8B40, 0x06A1, 0x0D42, 0x1A84, 0x3508, 0x6A10,
    0xAA51, 0x4483, 0x8906, 0x022D, 0x045A, 0x08B4, 0x1168,
    0x76B4, 0xED68, 0xCAF1, 0x85C3, 0x1BA7, 0x374E, 0x6E9C,
    0x3730, 0x6E60, 0xDCC0, 0xA9A1, 0x4363, 0x86C6, 0x1DAD,
    0x3331, 0x6662, 0xCCC4, 0x89A9, 0x0373, 0x06E6, 0x0DCC,
    0x1021, 0x2042, 0x4084, 0x8108, 0x1231, 0x2462, 0x48C4)

_PAD = (0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80,
        0x00, 0xBE, 0x0F, 0x00, 0xBF, 0x0F, 0x00)


def _spec_verifier(pw: bytes) -> int:
    """CreatePasswordVerifier_Method1."""
    v = 0
    for b in pw[::-1]:
        hi = (v >> 14) & 1
        v = ((v << 1) & 0x7FFF) | hi
        v ^= b
    hi = (v >> 14) & 1
    v = ((v << 1) & 0x7FFF) | hi
    return v ^ len(pw) ^ 0xCE4B


def _spec_key(pw: bytes) -> int:
    """CreateXorKey_Method1."""
    key = _INITIAL_CODE[len(pw) - 1]
    cur = 0x68
    for i in range(len(pw) - 1, -1, -1):
        ch = pw[i]
        for _ in range(7):
            if ch & 0x40:
                key ^= _XOR_MATRIX[cur]
            ch = (ch << 1) & 0xFF
            cur -= 1
    return key


def _spec_array(pw: bytes) -> bytes:
    """CreateXorArray_Method1."""
    key = _spec_key(pw)
    hi, lo = key >> 8, key & 0xFF

    def xor_ror(a: int, b: int) -> int:
        t = (a ^ b) & 0xFF
        return ((t >> 1) | ((t & 1) << 7)) & 0xFF

    arr = bytearray(16)
    idx = len(pw)
    if idx & 1:
        arr[idx] = xor_ror(_PAD[0], hi)
        idx -= 1
        arr[idx] = xor_ror(pw[-1], lo)
    while idx > 0:
        idx -= 1
        arr[idx] = xor_ror(pw[idx], hi)
        idx -= 1
        arr[idx] = xor_ror(pw[idx], lo)
    idx, pad = 15, 15 - len(pw)
    while pad > 0:
        arr[idx] = xor_ror(_PAD[pad], hi)
        idx -= 1
        pad -= 1
        arr[idx] = xor_ror(_PAD[pad], lo)
        idx -= 1
        pad -= 1
    return bytes(arr)


# records whose bodies stay plaintext ([MS-XLS] 2.2.10) — written here
# from the spec list, independent of the source module's set
_PLAIN = {0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138}


def _spec_obfuscate(wb: bytes, fp_end: int, arr: bytes) -> bytes:
    """Forward XOR obfuscation of every record body after FILEPASS:
    byte i of a record whose data starts at absolute offset `off` uses
    arr[(off + length + i) % 16]; encode = rotate-left 3 then XOR."""
    out = bytearray()
    pos = 0
    while pos + 4 <= len(wb):
        opcode, length = struct.unpack_from("<HH", wb, pos)
        out += wb[pos:pos + 4]
        body = bytearray(wb[pos + 4:pos + 4 + length])
        if pos >= fp_end and opcode not in _PLAIN:
            start = 4 if opcode == 0x0085 and length >= 4 else 0
            for i in range(start, len(body)):
                t = ((body[i] << 3) | (body[i] >> 5)) & 0xFF
                body[i] = t ^ arr[(pos + 4 + length + i) & 0x0F]
        out += body
        pos += 4 + length
    out += wb[pos:]
    return bytes(out)


def _filepass_xor(pw: bytes, biff5: bool = False) -> bytes:
    body = struct.pack("<HH", _spec_key(pw), _spec_verifier(pw))
    if not biff5:
        body = struct.pack("<H", 0) + body
    return rec(0x002F, body)


def _xor_encrypted_workbook(password: str = "VelvetSweatshop",
                            biff5: bool = False) -> tuple[bytes, list]:
    """Workbook with FILEPASS(XOR) injected after globals BOF and every
    later record body obfuscated forward from the spec."""
    pw = password.encode("latin-1")
    if biff5:
        cells = (number(0, 0, 7.0) + rk(1, 0, rk_int(25))
                 + label5(2, 0, "xor label"))
        wb = build_workbook5({"S1": cells},
                             globals_extra=_filepass_xor(pw, biff5=True))
    else:
        cells = (number(0, 0, 7.0) + rk(1, 0, rk_int(25))
                 + label(2, 0, "xor label"))
        wb = build_workbook({"S1": cells},
                            globals_extra=_filepass_xor(pw))
    # globals_extra lands right after BOF+DATEMODE; find FILEPASS end
    pos = 0
    fp_end = None
    while pos + 4 <= len(wb):
        opcode, length = struct.unpack_from("<HH", wb, pos)
        if opcode == 0x002F:
            fp_end = pos + 4 + length
            break
        pos += 4 + length
    assert fp_end is not None
    enc = _spec_obfuscate(wb, fp_end, _spec_array(pw))
    assert enc != wb
    expect = [(0, 0, 7), (1, 0, 25), (2, 0, "xor label")]
    return enc, expect


# ------------------------------------------------- BIFF5 fixture builders

def bof5(dt_: int) -> bytes:
    return bof(dt_, vers=0x0500)


def bstr(s: str, short: bool = False, enc: str = "cp1252") -> bytes:
    raw = s.encode(enc)
    head = struct.pack("<B", len(raw)) if short \
        else struct.pack("<H", len(raw))
    return head + raw


def label5(r: int, c: int, s: str, enc: str = "cp1252") -> bytes:
    return rec(0x0204, struct.pack("<HHH", r, c, 0) + bstr(s, enc=enc))


def rstring5(r: int, c: int, s: str) -> bytes:
    # RSTRING = LABEL body + run count + formatting runs (ignored)
    return rec(0x00D6, struct.pack("<HHH", r, c, 0) + bstr(s)
               + struct.pack("<B", 1) + bytes(2))


def string5(s: str) -> bytes:
    return rec(0x0207, bstr(s))


def formula_string5(r: int, c: int) -> bytes:
    res = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    return rec(0x0006, struct.pack("<HHH", r, c, 0) + res
               + struct.pack("<HIH", 0, 0, 0))


def fmt5(ifmt: int, code: str) -> bytes:
    return rec(0x041E, struct.pack("<H", ifmt) + bstr(code, short=True))


def boundsheet5(pos: int, name: str, dt_: int = 0) -> bytes:
    return rec(0x0085, struct.pack("<IBB", pos, 0, dt_)
               + bstr(name, short=True))


def codepage(cv: int) -> bytes:
    return rec(0x0042, struct.pack("<H", cv))


def build_workbook5(sheets: dict[str, bytes], *, datemode: int = 0,
                    globals_extra: bytes = b"") -> bytes:
    head = bof5(_BOF_WBGLOBALS)
    head += rec(0x0022, struct.pack("<H", datemode))
    head += globals_extra
    bs = [boundsheet5(0, n) for n in sheets]
    globals_len = len(head) + sum(len(b) for b in bs) + len(eof())
    offsets, cursor, bodies = [], globals_len, []
    for name, cells in sheets.items():
        sub = bof5(_BOF_WORKSHEET) + cells + eof()
        offsets.append(cursor)
        bodies.append(sub)
        cursor += len(sub)
    bs = [boundsheet5(off, n) for off, n in zip(offsets, sheets)]
    return head + b"".join(bs) + eof() + b"".join(bodies)


def as_xls5(wb_stream: bytes) -> bytes:
    # Excel 5.0/95 names the stream 'Book'
    return write_cfb({"Book": wb_stream})


def _check(out, expect):
    (df,) = out.values()
    for r, c, v in expect:
        assert df.iat[r, c] == v, (r, c, df.iat[r, c], v)


# ------------------------------------------------------ primitive anchors

def test_verifier_and_key_hand_derived_anchor():
    """Hand-derived values for password 'A' (single char 0x41),
    independent of both implementations:
    verifier: v=0 -> rotl15 -> 0 ^ 0x41 -> rotl15 = 0x82;
              0x82 ^ len(1) = 0x83; 0x83 ^ 0xCE4B = 0xCEC8.
    key: InitialCode[0]=0xE1F0; bit 6 of 0x41 set at cur=0x68 ->
         ^= Matrix[104]=0x48C4 -> 0xA934; after 6 shifts the low bit
         0x01 reaches 0x40 at cur=0x62 -> ^= Matrix[98]=0x1021 ->
         0xB915."""
    assert _spec_verifier(b"A") == 0xCEC8
    assert xor_password_verifier("A") == 0xCEC8
    assert _spec_key(b"A") == 0xB915
    assert xor_key("A") == 0xB915


def test_spec_matrix_matches_generated_table():
    from openpolicedata_spark.sources.xls_crypto import _XOR_MATRIX as gen
    assert tuple(gen) == _XOR_MATRIX


@pytest.mark.parametrize("pw", ["A", "ab", "abc", "VelvetSweatshop",
                                "p4ssw0rd!", "fourteen chars"])
def test_primitives_match_spec_encryptor(pw):
    raw = pw.encode("latin-1")
    assert xor_password_verifier(pw) == _spec_verifier(raw)
    assert xor_key(pw) == _spec_key(raw)
    assert xor_array(pw) == _spec_array(raw)


# ----------------------------------------------------------- XOR roundtrip

def test_biff8_xor_roundtrip():
    blob, expect = _xor_encrypted_workbook()
    _check(read_xls(as_xls(blob)), expect)


def test_biff8_xor_custom_password():
    blob, expect = _xor_encrypted_workbook(password="s3cret")
    _check(read_xls(as_xls(blob), password="s3cret"), expect)


def test_biff5_xor_roundtrip():
    blob, expect = _xor_encrypted_workbook(biff5=True)
    _check(read_xls(as_xls5(blob)), expect)


def test_xor_wrong_password_raises_before_parsing():
    blob, _ = _xor_encrypted_workbook(password="right")
    with pytest.raises(XlsError, match="password verification failed"):
        read_xls(as_xls(blob), password="wrong")


def test_xor_boundsheet_offsets_stay_plaintext():
    """lbPlyPos survives obfuscation byte-identical, so sheet substream
    offsets resolve without decrypting BOUNDSHEET first."""
    pw = b"VelvetSweatshop"
    wb = build_workbook({"S1": number(0, 0, 1.0)},
                        globals_extra=_filepass_xor(pw))
    enc = _spec_obfuscate(wb, wb.index(struct.pack("<HH", 0x002F, 6)) + 10,
                          _spec_array(pw))
    # locate BOUNDSHEET in both and compare the first 4 data bytes
    def bs_pos(stream):
        pos = 0
        while pos + 4 <= len(stream):
            opcode, length = struct.unpack_from("<HH", stream, pos)
            if opcode == 0x0085:
                return stream[pos + 4:pos + 8]
            pos += 4 + length
        raise AssertionError("no BOUNDSHEET")
    assert bs_pos(enc) == bs_pos(wb)
    _check(read_xls(as_xls(enc)), [(0, 0, 1)])


# ------------------------------------------------------------ BIFF5 parsing

def test_biff5_cells_and_strings():
    cells = (number(0, 0, 1.5) + rk(0, 1, rk_int(42))
             + mulrk(1, 0, [rk_int(7), rk_int(8)])
             + label5(2, 0, "hello") + rstring5(2, 1, "rich")
             + formula_string5(3, 0) + string5("cached"))
    out = read_xls(as_xls5(build_workbook5({"Sheet1": cells})))
    (df,) = out.values()
    assert df.iat[0, 0] == 1.5 and df.iat[0, 1] == 42
    assert df.iat[1, 0] == 7 and df.iat[1, 1] == 8
    assert df.iat[2, 0] == "hello" and df.iat[2, 1] == "rich"
    assert df.iat[3, 0] == "cached"


def test_biff5_codepage_accents():
    # 0xE9 is é in cp1252 but й in cp1251 — CODEPAGE decides
    raw = rec(0x0204, struct.pack("<HHH", 0, 0, 0)
              + struct.pack("<H", 4) + b"caf\xe9")
    for cp, want in [(1252, "café"), (1251, "cafй")]:
        wb = build_workbook5({"S": raw}, globals_extra=codepage(cp))
        (df,) = read_xls(as_xls5(wb)).values()
        assert df.iat[0, 0] == want, (cp, df.iat[0, 0])


def test_biff5_dates_and_formats():
    from datetime import datetime
    cells = number(0, 0, 25569.0, ixfe=1)  # 1970-01-01 in 1900 system
    wb = build_workbook5(
        {"S": cells},
        globals_extra=fmt5(200, "yyyy-mm-dd") + xf(0) + xf(200))
    (df,) = read_xls(as_xls5(wb)).values()
    assert df.iat[0, 0] == datetime(1970, 1, 1)


def test_biff5_sheet_names_and_order():
    wb = build_workbook5({"Zwei": label5(0, 0, "b"),
                          "Ähre": label5(0, 0, "a")})
    out = read_xls(as_xls5(wb))
    assert list(out) == ["Zwei", "Ähre"]


def test_biff5_xor_truncation_never_leaks_struct_error():
    """Every truncation of a valid XOR-obfuscated BIFF5 workbook either
    parses or raises XlsError — raw struct.error / IndexError /
    UnicodeDecodeError must never escape (the BIFF8 fuzz property,
    replayed over the new code paths)."""
    blob, _ = _xor_encrypted_workbook(biff5=True)
    for cut in range(0, len(blob), 7):
        try:
            read_xls(as_xls5(blob[:cut]))
        except XlsError:
            pass


def test_excel_loader_end_to_end_on_biff5_bytes(spark, tmp_path):
    """The ExcelLoader CFB sniff routes a BIFF5 'Book' container through
    read_xls and lands a Spark DataFrame."""
    cells = (label5(0, 0, "Year") + label5(0, 1, "Agency")
             + number(1, 0, 2001.0) + label5(1, 1, "Alpha")
             + number(2, 0, 2002.0) + label5(2, 1, "Beta"))
    blob = as_xls5(build_workbook5({"Data": cells}))
    p = tmp_path / "legacy5.xls"
    p.write_bytes(blob)

    from openpolicedata_spark.sources.excel import ExcelLoader
    df = ExcelLoader(spark, str(p)).load()
    rows = {(str(r["Year"]), r["Agency"]) for r in df.collect()}
    assert rows == {("2001", "Alpha"), ("2002", "Beta")}
