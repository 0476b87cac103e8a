"""BIFF8 (.xls) reader tests — forward-constructed fixtures, the same
independent-construction pattern as test_png.py / test_msoffice_agile.py:
workbooks are assembled record-by-record from [MS-XLS] spec literals here
in the test (never by the reader under test), then parsed by
sources/xls.py. Reference analog: openpolicedata excel.py:15,128 (xlrd
path + XLRDError handling)."""

from __future__ import annotations

import datetime as dt
import random
import struct

import pandas as pd
import pytest

from openpolicedata_spark.sources.xls import XlsError, looks_like_xls, read_xls
from tests.test_msoffice_crypto import write_cfb

# ---------------------------------------------------------------- builders

_BOF_WBGLOBALS = 0x0005
_BOF_WORKSHEET = 0x0010
_BOF_CHART = 0x0020


def rec(op: int, body: bytes) -> bytes:
    return struct.pack("<HH", op, len(body)) + body


def bof(dt_: int, vers: int = 0x0600) -> bytes:
    return rec(0x0809, struct.pack("<HHHH", vers, dt_, 0x0DBB, 0x07CC)
               + bytes(8))


def eof() -> bytes:
    return rec(0x000A, b"")


def unistr(s: str, short: bool = False, high: bool | None = None) -> bytes:
    """XLUnicodeString ([MS-XLS] 2.5.294); short form = 1-byte cch."""
    if high is None:
        high = any(ord(ch) > 0xFF for ch in s)
    head = struct.pack("<B", len(s)) if short else struct.pack("<H", len(s))
    flags = 0x01 if high else 0x00
    chars = s.encode("utf-16-le") if high else s.encode("latin-1")
    return head + struct.pack("<B", flags) + chars


def boundsheet(pos: int, name: str, hidden: int = 0, dt_: int = 0) -> bytes:
    return rec(0x0085, struct.pack("<IBB", pos, hidden, dt_)
               + unistr(name, short=True))


def sst(strings: list[str]) -> bytes:
    body = struct.pack("<ii", len(strings), len(strings))
    for s in strings:
        body += unistr(s)
    return rec(0x00FC, body)


def number(r: int, c: int, v: float, ixfe: int = 0) -> bytes:
    return rec(0x0203, struct.pack("<HHHd", r, c, ixfe, v))


def rk_int(v: int, div100: bool = False) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if div100 else 0x00)


def rk_float(v: float) -> int:
    (q,) = struct.unpack("<Q", struct.pack("<d", v))
    assert q & 0x3FFFFFFFF == 0, "value not exact in 30-bit RK float"
    return (q >> 32) & ~0x3


def rk(r: int, c: int, rkval: int, ixfe: int = 0) -> bytes:
    return rec(0x027E, struct.pack("<HHHI", r, c, ixfe, rkval))


def mulrk(r: int, c0: int, rkvals: list[int], ixfe: int = 0) -> bytes:
    body = struct.pack("<HH", r, c0)
    for v in rkvals:
        body += struct.pack("<HI", ixfe, v)
    body += struct.pack("<H", c0 + len(rkvals) - 1)  # colLast
    return rec(0x00BD, body)


def labelsst(r: int, c: int, isst: int) -> bytes:
    return rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def label(r: int, c: int, s: str) -> bytes:
    return rec(0x0204, struct.pack("<HHH", r, c, 0) + unistr(s))


def boolerr(r: int, c: int, val: int, is_err: int = 0) -> bytes:
    return rec(0x0205, struct.pack("<HHHBB", r, c, 0, val, is_err))


def formula_string(r: int, c: int) -> bytes:
    """FORMULA whose cached result is a string (kind 0, fExprO sentinel
    0xFFFF in bytes 6:8 of the result); the value follows in STRING."""
    res = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    return rec(0x0006, struct.pack("<HHH", r, c, 0) + res
               + struct.pack("<HIH", 0, 0, 0))


def formula_bool(r: int, c: int, val: bool) -> bytes:
    res = bytes([1, 0, int(val), 0, 0, 0, 0xFF, 0xFF])
    return rec(0x0006, struct.pack("<HHH", r, c, 0) + res
               + struct.pack("<HIH", 0, 0, 0))


def formula_num(r: int, c: int, v: float, ixfe: int = 0) -> bytes:
    return rec(0x0006, struct.pack("<HHHd", r, c, ixfe, v)
               + struct.pack("<HIH", 0, 0, 0))


def string_rec(s: str) -> bytes:
    return rec(0x0207, unistr(s))


def xf(ifmt: int) -> bytes:
    return rec(0x00E0, struct.pack("<HHH", 0, ifmt, 0) + bytes(14))


def fmt(ifmt: int, code: str) -> bytes:
    return rec(0x041E, struct.pack("<H", ifmt) + unistr(code))


def build_workbook(sheets: dict[str, bytes], *, datemode: int = 0,
                   globals_extra: bytes = b"",
                   hidden: dict[str, int] | None = None,
                   sheet_dt: dict[str, int] | None = None) -> bytes:
    """Assemble globals + sheet substreams with patched BOUNDSHEET
    offsets; sheets maps name -> cell-record bytes (without BOF/EOF)."""
    hidden = hidden or {}
    sheet_dt = sheet_dt or {}
    head = bof(_BOF_WBGLOBALS)
    head += rec(0x0022, struct.pack("<H", datemode))
    head += globals_extra
    # placeholder boundsheets to learn the globals length
    bs = [boundsheet(0, n, hidden.get(n, 0), sheet_dt.get(n, 0))
          for n in sheets]
    globals_len = len(head) + sum(len(b) for b in bs) + len(eof())
    offsets, cursor, bodies = [], globals_len, []
    for name, cells in sheets.items():
        sub = bof(_BOF_WORKSHEET) + cells + eof()
        offsets.append(cursor)
        bodies.append(sub)
        cursor += len(sub)
    bs = [boundsheet(off, n, hidden.get(n, 0), sheet_dt.get(n, 0))
          for off, n in zip(offsets, sheets)]
    return head + b"".join(bs) + eof() + b"".join(bodies)


def as_xls(wb_stream: bytes) -> bytes:
    return write_cfb({"Workbook": wb_stream})


# ------------------------------------------------------------------- tests

def test_rk_mulrk_number_label_boolerr():
    cells = (
        number(0, 0, 3.75)
        + rk(0, 1, rk_int(123))
        + rk(0, 2, rk_int(-45))
        + rk(0, 3, rk_int(12345, div100=True))
        + rk(0, 4, rk_float(2.5))
        + mulrk(1, 1, [rk_int(7), rk_int(8), rk_float(0.25)])
        + label(2, 0, "hello")
        + boolerr(2, 1, 1)
        + boolerr(2, 2, 0)
        + boolerr(2, 3, 0x17, is_err=1)  # #REF! → empty cell
    )
    out = read_xls(as_xls(build_workbook({"S": cells})))
    g = out["S"]
    assert g.iloc[0].tolist() == [3.75, 123, -45, 123.45, 2.5]
    assert g.iloc[1, 1:4].tolist() == [7, 8, 0.25]
    assert g.iloc[2, 0] == "hello"
    assert g.iloc[2, 1] is True and g.iloc[2, 2] is False
    assert g.iloc[2, 3] is None


def test_labelsst_and_sst_continue_split_both_flips():
    # s0 splits compressed→utf-16 mid-string; s1 splits utf-16→compressed;
    # s2 lives entirely in the CONTINUE fragment
    s0, s1, s2 = "abcdef", "héllo☃wörld", "tail"
    body = struct.pack("<ii", 3, 3)
    body += struct.pack("<HB", len(s0), 0x00) + s0[:3].encode("latin-1")
    frag1 = bytes([0x01]) + s0[3:].encode("utf-16-le")
    frag1 += struct.pack("<HB", len(s1), 0x01) + s1[:4].encode("utf-16-le")
    frag2 = bytes([0x01]) + s1[4:].encode("utf-16-le")  # stays utf-16
    frag2 += unistr(s2, high=False)
    globals_extra = rec(0x00FC, body) + rec(0x003C, frag1) \
        + rec(0x003C, frag2)
    cells = labelsst(0, 0, 0) + labelsst(0, 1, 1) + labelsst(0, 2, 2)
    out = read_xls(as_xls(build_workbook({"S": cells},
                                         globals_extra=globals_extra)))
    assert out["S"].iloc[0].tolist() == [s0, s1, s2]


def test_sst_continue_utf16_to_compressed_flip():
    s = "AAAABBBB"  # all latin-1, so the utf-16→compressed flip is legal
    body = struct.pack("<ii", 1, 1)
    body += struct.pack("<HB", len(s), 0x01) + s[:4].encode("utf-16-le")
    frag = bytes([0x00]) + s[4:].encode("latin-1")
    globals_extra = rec(0x00FC, body) + rec(0x003C, frag)
    out = read_xls(as_xls(build_workbook(
        {"S": labelsst(0, 0, 0)}, globals_extra=globals_extra)))
    assert out["S"].iloc[0, 0] == s


def test_formula_cached_results_and_shrfmla_between():
    # FORMULA+STRING with a SHRFMLA (0x04BC) between them must still bind
    # the string (ADVICE r4: shared-formula string results were dropped);
    # same for ARRAY (0x0221) and TABLE (0x0236)
    cells = (
        formula_string(0, 0) + rec(0x04BC, bytes(10)) + string_rec("shared")
        + formula_string(0, 1) + rec(0x0221, bytes(12)) + string_rec("arr")
        + formula_string(0, 2) + rec(0x0236, bytes(16)) + string_rec("tbl")
        + formula_string(0, 3) + string_rec("plain")
        + formula_bool(1, 0, True)
        + formula_num(1, 1, 6.5)
        # a non-exempt record between FORMULA and STRING clears the
        # binding: the STRING must NOT attach to the stale formula
        + formula_string(2, 0) + number(2, 1, 9.0) + string_rec("orphan")
    )
    out = read_xls(as_xls(build_workbook({"S": cells})))
    g = out["S"]
    assert g.iloc[0].tolist() == ["shared", "arr", "tbl", "plain"]
    assert g.iloc[1, 0] is True and g.iloc[1, 1] == 6.5
    assert g.iloc[2, 0] is None and g.iloc[2, 1] == 9.0


def test_dates_1900_and_1904_modes():
    extra = fmt(200, "yyyy-mm-dd") + xf(0) + xf(14) + xf(200)
    # xf indices: 0→general, 1→builtin date 14, 2→custom date 200
    cells = (number(0, 0, 44197.0, ixfe=1)    # 2021-01-01 via builtin fmt
             + number(0, 1, 44197.5, ixfe=2)  # noon, custom yyyy-mm-dd
             + number(0, 2, 44197.0, ixfe=0)  # general → stays numeric
             + rk(1, 0, rk_int(44197), ixfe=1))
    out = read_xls(as_xls(build_workbook({"S": cells},
                                         globals_extra=extra)))
    g = out["S"]
    assert g.iloc[0, 0] == dt.datetime(2021, 1, 1)
    assert g.iloc[0, 1] == dt.datetime(2021, 1, 1, 12, 0)
    assert g.iloc[0, 2] == 44197
    assert g.iloc[1, 0] == dt.datetime(2021, 1, 1)
    # 1904 system: serial 42735 + 1462 = 44197 → same calendar date
    out4 = read_xls(as_xls(build_workbook(
        {"S": number(0, 0, 42735.0, ixfe=1)}, datemode=1,
        globals_extra=extra)))
    assert out4["S"].iloc[0, 0] == dt.datetime(2021, 1, 1)


def test_embedded_chart_bof_eof_nesting():
    chart = bof(_BOF_CHART) + number(5, 5, 999.0) + eof()
    cells = number(0, 0, 1.0) + chart + number(1, 0, 2.0)
    out = read_xls(as_xls(build_workbook({"S": cells})))
    g = out["S"]
    assert g.iloc[0, 0] == 1 and g.iloc[1, 0] == 2
    assert len(g) == 2 and len(g.columns) == 1  # chart cells ignored


def test_hidden_sheets_kept_chart_sheets_dropped():
    # ADVICE r4: hidden worksheets must be returned (xlrd/read_xlsx do)
    wb = build_workbook(
        {"Vis": number(0, 0, 1.0), "Hid": number(0, 0, 2.0),
         "VeryHid": number(0, 0, 3.0), "Chart": b""},
        hidden={"Hid": 1, "VeryHid": 2}, sheet_dt={"Chart": 2})
    out = read_xls(as_xls(wb))
    assert list(out) == ["Vis", "Hid", "VeryHid"]
    assert out["Hid"].iloc[0, 0] == 2 and out["VeryHid"].iloc[0, 0] == 3


def test_multi_sheet_order_and_empty_sheet():
    wb = build_workbook({"B": number(0, 0, 1.0), "A": b"",
                         "C": label(0, 0, "x")})
    out = read_xls(as_xls(wb))
    assert list(out) == ["B", "A", "C"]  # workbook order, not alphabetical
    assert out["A"].empty


def test_filepass_and_old_biff_raise_cleanly():
    # an all-zero XOR FILEPASS: key/verifier 0 never match the default
    # password, so this is now a clean wrong-password failure
    wb = bof(_BOF_WBGLOBALS) + rec(0x002F, bytes(6)) + eof()
    with pytest.raises(XlsError, match="FILEPASS"):
        read_xls(as_xls(wb))
    wb5 = bof(_BOF_WBGLOBALS, vers=0x0500) + eof()
    assert read_xls(as_xls(wb5)) == {}  # BIFF5 parses (empty workbook)
    wb4 = bof(_BOF_WBGLOBALS, vers=0x0400) + eof()
    with pytest.raises(XlsError, match="BIFF5-BIFF8"):
        read_xls(as_xls(wb4))
    with pytest.raises(XlsError, match="CFB"):
        read_xls(b"not a cfb container at all" + bytes(600))
    with pytest.raises(XlsError, match="no Workbook stream"):
        read_xls(write_cfb({"Other": bytes(8)}))


def test_truncation_never_leaks_struct_error():
    """Every truncation of a valid workbook either parses or raises
    XlsError — raw struct.error / IndexError must never escape
    (VERDICT r4 item 2)."""
    extra = fmt(200, "yyyy-mm-dd") + xf(200) + sst(["alpha", "beta"])
    cells = (number(0, 0, 44197.0, ixfe=0) + labelsst(0, 1, 1)
             + mulrk(1, 0, [rk_int(5), rk_int(6)])
             + formula_string(2, 0) + string_rec("cached"))
    wb = build_workbook({"S": cells}, globals_extra=extra)
    for cut in range(0, len(wb), 5):
        try:
            read_xls(write_cfb({"Workbook": wb[:cut]}))
        except XlsError:
            pass  # the documented contract


def test_random_junk_never_leaks_struct_error():
    rng = random.Random(20260814)
    for _ in range(60):
        junk = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(1, 400)))
        try:
            read_xls(write_cfb({"Workbook": junk}))
        except XlsError:
            pass


def test_sst_index_out_of_range():
    wb = build_workbook({"S": labelsst(0, 0, 7)},
                        globals_extra=sst(["only"]))
    with pytest.raises(XlsError, match="out of range"):
        read_xls(as_xls(wb))


def test_looks_like_xls():
    wb = build_workbook({"S": number(0, 0, 1.0)})
    assert looks_like_xls(as_xls(wb))
    assert looks_like_xls(write_cfb({"Book": wb}))
    assert not looks_like_xls(b"PK\x03\x04zipzip")
    assert not looks_like_xls(write_cfb({"EncryptionInfo": bytes(8),
                                         "EncryptedPackage": bytes(8)}))
    assert not looks_like_xls(write_cfb({"Workbook": wb,
                                         "EncryptionInfo": bytes(8)}))


def test_excel_loader_end_to_end_on_xls_bytes(spark, tmp_path):
    """ExcelLoader reads real .xls bytes through the stdlib BIFF8 path
    (reference excel.py:15 loads .xls via pd.read_excel/xlrd)."""
    from openpolicedata_spark.sources.excel import ExcelLoader

    header = label(0, 0, "Case") + label(0, 1, "Date") + label(0, 2, "Qty")
    extra = xf(0) + fmt(201, "m/d/yyyy") + xf(201)
    rows = b""
    for i, (case, serial, qty) in enumerate(
            [("C1", 44197.0, 3), ("C2", 44228.0, 5), ("C3", 44256.0, 2)],
            start=1):
        rows += (label(i, 0, case) + number(i, 1, serial, ixfe=1)
                 + rk(i, 2, rk_int(qty)))
    wb = build_workbook({"2021": header + rows}, globals_extra=extra)
    p = tmp_path / "report.xls"
    p.write_bytes(as_xls(wb))
    df = ExcelLoader(spark, url=str(p)).load()
    pdf = df.toPandas()
    assert len(pdf) == 3
    assert sorted(pdf["Case"]) == ["C1", "C2", "C3"]
    assert set(pdf["Qty"]) == {"3", "5", "2"} or set(pdf["Qty"]) == {3, 5, 2}
