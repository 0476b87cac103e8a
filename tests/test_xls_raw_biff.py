"""Raw (non-CFB) BIFF2/3/4 .xls stream tests — Excel 2.x/3.0/4.0 files
where the file IS the worksheet stream. Fixtures are forward-assembled
record-by-record from the spec layouts HERE in the test (never by the
reader under test): BOF opcodes 0x0009/0x0209/0x0409 select the
version; BIFF2 cells carry 3 attribute bytes (byte 1 bits 0-5 = number
format index) while BIFF3/4 carry a 2-byte XF index; FORMAT indexes
are sequential record order; strings are code-page bytes with 1-byte
(BIFF2) / 2-byte (BIFF3/4) lengths. Reference analog: openpolicedata
excel.py:128-153 reads these via xlrd.

Last round-6 Excel parity sliver (VERDICT item 8)."""

from __future__ import annotations

import datetime as dt
import struct

import pandas as pd
import pytest

from openpolicedata_spark.sources.xls import (
    XlsError,
    looks_like_raw_biff,
    read_xls,
)


def rec(op: int, body: bytes) -> bytes:
    return struct.pack("<HH", op, len(body)) + body


def bof(ver: int) -> bytes:
    op = {2: 0x0009, 3: 0x0209, 4: 0x0409}[ver]
    # BIFF2 BOF body: vers(2) dt(2); BIFF3/4 add 2 build bytes
    body = struct.pack("<HH", 0, 0x0010) + (b"" if ver == 2 else bytes(2))
    return rec(op, body)


EOF = rec(0x000A, b"")


def attrs2(ifmt: int = 0) -> bytes:
    """BIFF2 3-byte cell attributes: byte 0 XF idx, byte 1 bits 0-5 =
    number format index, byte 2 style."""
    return bytes([0, ifmt & 0x3F, 0])


def fmt2(code: str) -> bytes:
    return rec(0x001E, bytes([len(code)]) + code.encode("cp1252"))


def fmt4(code: str) -> bytes:
    return rec(0x041E, bytes(2) + bytes([len(code)])
               + code.encode("cp1252"))


def xf3(ifmt: int) -> bytes:
    # BIFF3/4 XF: font(1) ifmt(1) + remaining type/alignment bytes
    return rec(0x0243, bytes([0, ifmt]) + bytes(10))


def xf4(ifmt: int) -> bytes:
    return rec(0x0443, bytes([0, ifmt]) + bytes(10))


# ----------------------------------------------------------------- BIFF2

def test_biff2_cells_and_inline_format_dates():
    stream = (
        bof(2)
        + rec(0x0022, struct.pack("<H", 0))                   # 1900 mode
        + fmt2("General") + fmt2("0.00") + fmt2("YYYY-MM-DD")  # ids 0,1,2
        + rec(0x0003, struct.pack("<HH", 0, 0) + attrs2(1)
              + struct.pack("<d", 3.5))                        # NUMBER
        + rec(0x0002, struct.pack("<HH", 0, 1) + attrs2(0)
              + struct.pack("<H", 41))                         # INTEGER
        + rec(0x0004, struct.pack("<HH", 0, 2) + attrs2(0)
              + bytes([5]) + b"hello")                         # LABEL
        + rec(0x0005, struct.pack("<HH", 1, 0) + attrs2(0)
              + bytes([1, 0]))                                 # BOOLERR ok
        + rec(0x0005, struct.pack("<HH", 1, 1) + attrs2(0)
              + bytes([0x17, 1]))                              # BOOLERR err
        + rec(0x0003, struct.pack("<HH", 1, 2) + attrs2(2)
              + struct.pack("<d", 45000.0))                    # date fmt
        + EOF)
    assert looks_like_raw_biff(stream)
    out = read_xls(stream)
    assert list(out) == ["Sheet1"]
    g = out["Sheet1"]
    assert g.iloc[0, 0] == 3.5
    assert g.iloc[0, 1] == 41.0
    assert g.iloc[0, 2] == "hello"
    assert g.iloc[1, 0] is True
    assert g.iloc[1, 1] is None                    # error cell -> empty
    assert g.iloc[1, 2] == dt.datetime(2023, 3, 15)  # serial 45000, 1900


def test_biff2_formula_number_then_string_override():
    stream = (
        bof(2)
        + rec(0x0006, struct.pack("<HH", 0, 0) + attrs2(0)
              + struct.pack("<d", 7.0) + bytes(3))   # numeric result
        + rec(0x0006, struct.pack("<HH", 0, 1) + attrs2(0)
              + struct.pack("<d", 0.0) + bytes(3))   # string result...
        + rec(0x0007, bytes([3]) + b"abc")           # ...in STRING after
        + EOF)
    g = read_xls(stream)["Sheet1"]
    assert g.iloc[0, 0] == 7.0
    assert g.iloc[0, 1] == "abc"


# --------------------------------------------------------------- BIFF3/4

@pytest.mark.parametrize("ver", [3, 4])
def test_biff34_cells_xf_dates_and_rk(ver):
    fmt = fmt2 if ver == 3 else fmt4
    xf = xf3 if ver == 3 else xf4
    formula_op = 0x0206 if ver == 3 else 0x0406
    rk_55 = ((55 & 0x3FFFFFFF) << 2) | 0x02        # RK int 55
    stream = (
        bof(ver)
        + rec(0x0022, struct.pack("<H", 1))        # 1904 date mode
        + fmt("General") + fmt("D/M/YY")           # ids 0, 1
        + xf(0) + xf(1)                            # xf 0 -> General, 1 -> date
        + rec(0x0203, struct.pack("<HHHd", 0, 0, 0, 2.25))       # NUMBER
        + rec(0x0203, struct.pack("<HHHd", 0, 1, 1, 1000.0))     # date
        + rec(0x027E, struct.pack("<HHHI", 0, 2, 0, rk_55))      # RK
        + rec(0x0204, struct.pack("<HHHH", 1, 0, 0, 4) + b"caf\xe9")
        + rec(0x0205, struct.pack("<HHHBB", 1, 1, 0, 0, 0))      # False
        + rec(formula_op, struct.pack("<HHHd", 1, 2, 0, 9.5) + bytes(2))
        + rec(formula_op, struct.pack("<HHH", 2, 0, 0)
              + bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF]) + bytes(2))
        + rec(0x0207, struct.pack("<H", 2) + b"ok")  # cached string
        + EOF)
    assert looks_like_raw_biff(stream)
    g = read_xls(stream)["Sheet1"]
    assert g.iloc[0, 0] == 2.25
    assert g.iloc[0, 1] == dt.datetime(1904, 1, 1) + dt.timedelta(1000)
    assert g.iloc[0, 2] == 55.0
    assert g.iloc[1, 0] == "café"                  # cp1252 byte string
    assert g.iloc[1, 1] is False
    assert g.iloc[1, 2] == 9.5
    assert g.iloc[2, 0] == "ok"


def test_biff34_codepage_override():
    stream = (
        bof(3)
        + rec(0x0042, struct.pack("<H", 1251))     # cp1251 (Cyrillic)
        + rec(0x0204, struct.pack("<HHHH", 0, 0, 0, 2)
              + "да".encode("cp1251"))
        + EOF)
    assert read_xls(stream)["Sheet1"].iloc[0, 0] == "да"


def test_builtin_date_fallback_when_formats_omitted():
    # minimal third-party writers omit FORMAT records; ifmt then refers
    # to the shared builtin table (id 14 = m/d/yy)
    stream = (
        bof(3)
        + xf3(0) * 14 + xf3(14)
        + rec(0x0203, struct.pack("<HHHd", 0, 0, 14, 45000.0))
        + EOF)
    assert read_xls(stream)["Sheet1"].iloc[0, 0] == dt.datetime(2023, 3, 15)


def test_empty_and_malformed_raw_streams():
    assert read_xls(bof(2) + EOF)["Sheet1"].empty
    assert not looks_like_raw_biff(b"\x00\x01\x02\x03")
    assert not looks_like_raw_biff(b"")
    with pytest.raises(XlsError, match="CFB|raw BIFF"):
        read_xls(b"totally not excel" + bytes(600))
    # truncated record bodies surface as XlsError, never struct.error
    trunc = bof(2) + rec(0x0003, struct.pack("<HH", 0, 0) + attrs2(0))
    with pytest.raises(XlsError):
        read_xls(trunc + EOF)


def test_raw_biff_truncation_fuzz_never_leaks_struct_error():
    """Every prefix truncation of a valid raw stream either parses or
    raises XlsError — never struct.error/IndexError (the BIFF8 suite's
    robustness property, applied to the BIFF2-4 path)."""
    stream = (
        bof(3)
        + fmt2("General") + fmt2("YYYY-MM-DD")
        + xf3(0) + xf3(1)
        + rec(0x0203, struct.pack("<HHHd", 0, 0, 1, 45000.0))
        + rec(0x0204, struct.pack("<HHHH", 0, 1, 0, 5) + b"hello")
        + rec(0x027E, struct.pack("<HHHI", 1, 0, 0,
                                  ((7 & 0x3FFFFFFF) << 2) | 0x02))
        + EOF)
    for cut in range(4, len(stream)):
        try:
            read_xls(stream[:cut])
        except XlsError:
            pass


def test_raw_biff_random_junk_never_leaks_struct_error():
    import random

    rnd = random.Random(42)
    for _ in range(200):
        n = rnd.randrange(4, 200)
        junk = bytes([0x09, rnd.choice([0x00, 0x02, 0x04])]) + bytes(
            rnd.randrange(256) for _ in range(n))
        try:
            read_xls(junk)
        except XlsError:
            pass


def test_excel_loader_end_to_end_on_raw_biff4(spark, tmp_path):
    """ExcelLoader routes a raw BIFF4 stream (magic sniff, no CFB) through
    the stdlib reader and yields a typed Spark DataFrame."""
    from openpolicedata_spark.sources.excel import ExcelLoader

    stream = (
        bof(4)
        + fmt4("General")
        + xf4(0)
        + rec(0x0204, struct.pack("<HHHH", 0, 0, 0, 4) + b"name")
        + rec(0x0204, struct.pack("<HHHH", 0, 1, 0, 3) + b"val")
        + rec(0x0204, struct.pack("<HHHH", 1, 0, 0, 5) + b"alpha")
        + rec(0x0203, struct.pack("<HHHd", 1, 1, 0, 1.5))
        + rec(0x0204, struct.pack("<HHHH", 2, 0, 0, 4) + b"beta")
        + rec(0x0203, struct.pack("<HHHd", 2, 1, 0, 2.5))
        + EOF)
    p = tmp_path / "old.xls"
    p.write_bytes(stream)
    df = ExcelLoader(spark, url=str(p)).load()
    # the loader's header repair + schema inference may stringify
    # numerics (same tolerance as the BIFF8 e2e test)
    rows = {r["name"]: float(r["val"]) for r in df.collect()}
    assert rows == {"alpha": 1.5, "beta": 2.5}
