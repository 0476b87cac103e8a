"""Minimal BIFF8 (.xls) workbook reader — pure stdlib + the in-repo CFB
parser, same contract as sources/xlsx.py's ``read_xlsx``.

Reference analog: openpolicedata excel.py:15 reads legacy .xls via xlrd
(XLRDError handling at :128). Agencies still publish .xls, so the repo
needs a real parser rather than an ImportError gate; this covers the
records that carry cell data in practice:

- workbook globals: BOF, DATEMODE, FORMAT, XF, BOUNDSHEET, SST
  (including strings split across CONTINUE records, where each split
  resumes with a fresh grbit byte — the classic BIFF8 trap)
- sheet substreams: NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR,
  FORMULA (+ trailing STRING for cached string results), nested
  BOF/EOF depth tracking for embedded charts

BIFF5/BIFF7 workbooks (BOF version 0x0500 — Excel 5.0/95, the 'Book'
stream) parse too: strings are code-page byte strings (CODEPAGE record
selects the encoding, default cp1252) instead of XLUnicodeString, there
is no SST/LABELSST (LABEL/RSTRING carry text inline), and FORMAT's
format code uses a 1-byte length. Cell-record layouts (NUMBER, RK,
MULRK, BOOLERR, FORMULA+STRING) are unchanged from BIFF8.

Protected workbooks (FILEPASS) decrypt transparently via
sources/xls_crypto.py with the 'VelvetSweatshop' magic password,
mirroring the reference's msoffcrypto path (excel.py:132-150): both
RC4 schemes (Office-Binary MD5 and RC4 CryptoAPI) and XOR obfuscation
(wEncryptionType 0, the only FILEPASS form BIFF5 has).

BIFF2/BIFF3/BIFF4 raw streams (Excel 2.x/3.0/4.0 — the file IS the
BIFF worksheet stream, no CFB container; the reference reads them via
xlrd, excel.py:128-153) parse through `_read_raw_biff`: the BOF opcode
itself selects the version (0x0009/0x0209/0x0409), every number format
is written explicitly (indexes are sequential record order, with the
BIFF5+ builtin-date-id table as fallback for minimal writers), BIFF2
cell attributes carry the format index inline (byte 1 bits 0-5) while
BIFF3/4 go through XF records (ifmt at body[1]), and strings are
code-page bytes with 1-byte (BIFF2) or 2-byte (BIFF3/4) lengths.
BIFF2 FORMULA results have no string sentinel — a STRING record
directly following supplies the value instead.

Dates follow the same rules as the xlsx reader: a numeric cell whose XF
points at a date number-format (built-in ids or a format code with
date tokens) converts from the 1900/1904 serial system.
"""

from __future__ import annotations

import codecs
import io
import struct
from typing import Union

import pandas as pd

from openpolicedata_spark.sources.cfb import CfbReader, is_cfb
from openpolicedata_spark.sources.xlsx import (
    _BUILTIN_DATE_FMTS,
    _is_date_fmt,
    _serial_to_datetime,
)


class XlsError(ValueError):
    """Malformed or unsupported BIFF workbook."""


# record opcodes
_BOF = 0x0809
_EOF = 0x000A
_FILEPASS = 0x002F
_DATEMODE = 0x0022
_CODEPAGE = 0x0042
_FORMAT = 0x041E
_RSTRING = 0x00D6
_XF = 0x00E0
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
# records that may legally sit between a FORMULA and its trailing STRING
# ([MS-XLS] 2.4.127: SharedFmla / Array / Table follow the Formula they
# belong to) — a cached-string result must survive them
_SHRFMLA = 0x04BC
_ARRAY = 0x0221
_TABLE = 0x0236


def _records(stream: bytes, start: int = 0):
    """Yield (opcode, data, offset_of_next_record) from a BIFF stream."""
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        opcode, length = struct.unpack_from("<HH", stream, pos)
        data = stream[pos + 4:pos + 4 + length]
        pos += 4 + length
        yield opcode, data, pos


class _SstReader:
    """Byte reader over SST + CONTINUE fragments that understands the
    continuation rule: when CHARACTER DATA is split across a record
    boundary, the next fragment starts with a new grbit byte (the
    encoding may flip compressed<->utf-16 mid-string); counts, rich
    runs, and ext data continue raw."""

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _advance(self) -> None:
        while self.fi < len(self.frags) and \
                self.pos >= len(self.frags[self.fi]):
            self.fi += 1
            self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise XlsError("truncated SST")
            frag = self.frags[self.fi]
            take = min(n, len(frag) - self.pos)
            out += frag[self.pos:self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out = []
        while cch > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise XlsError("truncated SST string")
            frag = self.frags[self.fi]
            if self.pos >= len(frag):
                continue
            avail = len(frag) - self.pos
            if avail == 0:
                continue
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:
                # a char can't split across the boundary; fragment ends
                # here and the next one re-declares the encoding
                raise XlsError("misaligned SST continuation")
            raw = frag[self.pos:self.pos + take * width]
            self.pos += take * width
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= take
            if cch > 0:
                # crossing into the next fragment: fresh grbit byte
                self._advance()
                if self.fi >= len(self.frags):
                    raise XlsError("truncated SST continuation")
                high = bool(self.frags[self.fi][self.pos] & 1)
                self.pos += 1
        return "".join(out)

    def read_string(self) -> str:
        (cch,) = struct.unpack("<H", self.read(2))
        flags = self.read(1)[0]
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        crun = struct.unpack("<H", self.read(2))[0] if rich else 0
        cbext = struct.unpack("<i", self.read(4))[0] if ext else 0
        s = self.read_chars(cch, high)
        if crun:
            self.read(4 * crun)
        if cbext > 0:
            self.read(cbext)
        return s


def _unicode_string(data: bytes, offset: int, short: bool = False) -> str:
    """In-record XLUnicodeString (LABEL, STRING, FORMAT) or the short
    form (BOUNDSHEET sheet names: 1-byte cch)."""
    if short:
        cch = data[offset]
        offset += 1
    else:
        (cch,) = struct.unpack_from("<H", data, offset)
        offset += 2
    flags = data[offset]
    offset += 1
    high = bool(flags & 0x01)
    if flags & 0x08:
        offset += 2  # rich run count
    if flags & 0x04:
        offset += 4  # ext length
    if high:
        return data[offset:offset + 2 * cch].decode("utf-16-le")
    return data[offset:offset + cch].decode("latin-1")


def _byte_string(data: bytes, offset: int, enc: str,
                 short: bool = False) -> str:
    """BIFF5 byte string: 1- or 2-byte cch + code-page bytes (no grbit
    flags, no unicode)."""
    if short:
        cch = data[offset]
        offset += 1
    else:
        (cch,) = struct.unpack_from("<H", data, offset)
        offset += 2
    return data[offset:offset + cch].decode(enc, "replace")


def _codepage_enc(cv: int) -> str:
    """CODEPAGE record value → python codec. 1200 marks BIFF8 utf-16
    (byte strings never use it); 32768/10000 are classic Mac Roman and
    32769 is the Windows-ANSI alias."""
    if cv in (10000, 32768):
        return "mac_roman"
    if cv in (1200, 32769):
        return "cp1252"
    try:
        codecs.lookup(f"cp{cv}")
        return f"cp{cv}"
    except LookupError:
        return "latin-1"


def _decode_rk(v: int) -> float:
    if v & 0x02:  # 30-bit signed integer
        num = v >> 2
        if num >= 1 << 29:
            num -= 1 << 30
        num = float(num)
    else:  # top 30 bits of an IEEE double
        (num,) = struct.unpack("<d", struct.pack("<Q", (v & ~0x3) << 32))
    return num / 100.0 if v & 0x01 else num


def _parse_sst(data: bytes, continues: list[bytes]) -> list[str]:
    (_total, unique) = struct.unpack_from("<ii", data, 0)
    rd = _SstReader([data[8:]] + continues)
    return [rd.read_string() for _ in range(unique)]


def _num_value(num: float, ixfe: int, date_xfs: set[int], datemode: int):
    if ixfe in date_xfs and num >= 0:
        return _serial_to_datetime(num + (1462 if datemode else 0))
    if num == int(num) and abs(num) < 2 ** 52:
        return int(num)
    return num


# raw-stream (non-CFB) BIFF2-4 opcodes; BIFF3/4 cell records reuse the
# 0x02xx constants above (NUMBER/LABEL/BOOLERR/STRING/RK are identical)
_BOF_RAW = {0x0009: 2, 0x0209: 3, 0x0409: 4}
_FORMAT_OLD = 0x001E          # BIFF2/3 (BIFF4 uses 0x041E == _FORMAT)
_XF2, _XF3, _XF4 = 0x0043, 0x0243, 0x0443
_INTEGER2 = 0x0002
_NUMBER2, _LABEL2, _BOOLERR2 = 0x0003, 0x0004, 0x0005
_FORMULA2, _STRING2 = 0x0006, 0x0007
_FORMULA3, _FORMULA4 = 0x0206, 0x0406


def looks_like_raw_biff(data: bytes) -> bool:
    """True when the bytes start with a BIFF2/3/4 worksheet BOF (raw
    stream, no CFB container)."""
    if len(data) < 4:
        return False
    opcode, length = struct.unpack_from("<HH", data, 0)
    return opcode in _BOF_RAW and length in (4, 6, 8, 16)


def _read_raw_biff(data: bytes) -> dict[str, pd.DataFrame]:
    """Parse a raw (non-CFB) BIFF2/3/4 worksheet stream into the same
    one-grid contract as `read_xls`. Single sheet ('Sheet1' — raw
    streams carry no sheet name), globals records inline."""
    (opcode0,) = struct.unpack_from("<H", data, 0)
    ver = _BOF_RAW.get(opcode0)
    if ver is None:
        raise XlsError("not a raw BIFF2-4 stream (bad BOF opcode)")

    datemode = 0
    enc = "cp1252"
    fmt_codes: list[str] = []   # BIFF2-4 write every format; sequential ids
    xf_ifmt: list[int] = []     # BIFF3/4 route cells through XF records
    cells: dict[int, dict[int, object]] = {}
    ncols = 0

    def put(r: int, c: int, v: object) -> None:
        nonlocal ncols
        if v is not None:
            cells.setdefault(r, {})[c] = v
            ncols = max(ncols, c + 1)

    def is_date(ifmt: int) -> bool:
        if ifmt < len(fmt_codes):
            return _is_date_fmt(fmt_codes[ifmt])
        return ifmt in _BUILTIN_DATE_FMTS  # minimal writers omit FORMATs

    def numval(num: float, ifmt: int):
        if is_date(ifmt):
            # 1904 mode offsets by the 1462 days between the epochs
            return _serial_to_datetime(num + (1462 if datemode else 0))
        return num

    def cell_ifmt2(attrs: bytes) -> int:
        # BIFF2 cell attributes: byte 1 bits 0-5 = number format index
        return attrs[1] & 0x3F

    def cell_ifmt34(ixfe: int) -> int:
        return xf_ifmt[ixfe] if ixfe < len(xf_ifmt) else 0xFFF

    pending: tuple[int, int] | None = None  # formula awaiting its STRING
    try:
        for opcode, body, _pos in _records(data):
            if opcode in (_STRING2, _STRING):
                if pending is not None:
                    r, c = pending
                    off, cch = ((1, body[0]) if opcode == _STRING2
                                else (2, struct.unpack_from(
                                    "<H", body, 0)[0]))
                    s = body[off:off + cch].decode(enc, errors="replace")
                    put(r, c, s or None)
                pending = None
                continue
            pending = None
            if opcode == _EOF:
                break
            if opcode == _DATEMODE:
                (datemode,) = struct.unpack_from("<H", body, 0)
            elif opcode == _CODEPAGE:
                enc = _codepage_enc(struct.unpack_from("<H", body, 0)[0])
            elif opcode in (_FORMAT_OLD, _FORMAT):
                off = 2 if opcode == _FORMAT else 0  # BIFF4: 2 unused bytes
                cch = body[off]
                fmt_codes.append(
                    body[off + 1:off + 1 + cch].decode(enc,
                                                       errors="replace"))
            elif opcode in (_XF3, _XF4):
                xf_ifmt.append(body[1])
            elif opcode == _XF2:
                xf_ifmt.append(body[2] & 0x3F)
            elif opcode == _INTEGER2:
                r, c = struct.unpack_from("<HH", body, 0)
                (v,) = struct.unpack_from("<H", body, 7)
                put(r, c, numval(float(v), cell_ifmt2(body[4:7])))
            elif opcode == _NUMBER2:
                r, c = struct.unpack_from("<HH", body, 0)
                (num,) = struct.unpack_from("<d", body, 7)
                put(r, c, numval(num, cell_ifmt2(body[4:7])))
            elif opcode == _LABEL2:
                r, c = struct.unpack_from("<HH", body, 0)
                cch = body[7]
                put(r, c, body[8:8 + cch].decode(enc, errors="replace")
                    or None)
            elif opcode == _BOOLERR2:
                r, c = struct.unpack_from("<HH", body, 0)
                val, is_err = body[7], body[8]
                put(r, c, None if is_err else bool(val))
            elif opcode == _FORMULA2:
                # BIFF2 formula: result is always a stored double; a
                # directly-following STRING record overrides with the
                # cached string result (no 0xFFFF sentinel before BIFF3)
                r, c = struct.unpack_from("<HH", body, 0)
                (num,) = struct.unpack_from("<d", body, 7)
                put(r, c, numval(num, cell_ifmt2(body[4:7])))
                pending = (r, c)
            elif ver >= 3 and opcode == _NUMBER:
                r, c, ixfe = struct.unpack_from("<HHH", body, 0)
                (num,) = struct.unpack_from("<d", body, 6)
                put(r, c, numval(num, cell_ifmt34(ixfe)))
            elif ver >= 3 and opcode == _RK:
                r, c, ixfe, rk = struct.unpack_from("<HHHI", body, 0)
                put(r, c, numval(_decode_rk(rk), cell_ifmt34(ixfe)))
            elif ver >= 3 and opcode == _LABEL:
                r, c = struct.unpack_from("<HH", body, 0)
                (cch,) = struct.unpack_from("<H", body, 6)
                put(r, c, body[8:8 + cch].decode(enc, errors="replace")
                    or None)
            elif ver >= 3 and opcode == _BOOLERR:
                r, c, _ixfe, val, is_err = struct.unpack_from(
                    "<HHHBB", body, 0)
                put(r, c, None if is_err else bool(val))
            elif opcode in (_FORMULA3, _FORMULA4):
                r, c, ixfe = struct.unpack_from("<HHH", body, 0)
                res = body[6:14]
                if res[6:8] == b"\xff\xff":
                    kind = res[0]
                    if kind == 0:      # cached string follows
                        pending = (r, c)
                    elif kind == 1:
                        put(r, c, bool(res[2]))
                else:
                    (num,) = struct.unpack("<d", res)
                    put(r, c, numval(num, cell_ifmt34(ixfe)))
    except (struct.error, IndexError) as e:
        raise XlsError(f"malformed BIFF{ver} record: {e}") from e

    if not cells:
        return {"Sheet1": pd.DataFrame()}
    nrows = max(cells) + 1
    grid = [[cells.get(r, {}).get(c) for c in range(ncols)]
            for r in range(nrows)]
    return {"Sheet1": pd.DataFrame(grid, dtype=object)}


def read_xls(source: Union[str, bytes, io.IOBase],
             password: str = "VelvetSweatshop") -> dict[str, pd.DataFrame]:
    """Parse a BIFF8 .xls file (path, bytes, or binary file object) into
    raw unlabeled grids, one ``pd.DataFrame`` per worksheet in workbook
    order — the same contract as ``read_xlsx``. RC4-encrypted workbooks
    (FILEPASS, both Office-Binary and CryptoAPI schemes) decrypt
    transparently via sources/xls_crypto — `password` defaults to
    Excel's invisible 'VelvetSweatshop', matching the reference's
    msoffcrypto path (excel.py:132-150)."""
    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    elif isinstance(source, bytes):
        data = source
    else:
        data = source.read()
        try:
            source.seek(0)
        except Exception:
            pass
    if not is_cfb(data):
        if looks_like_raw_biff(data):
            return _read_raw_biff(data)
        raise XlsError("not a BIFF workbook (missing CFB signature, "
                       "and not a raw BIFF2-4 stream)")
    cfb = CfbReader(data)
    streams = cfb.list_streams()
    name = next((s for s in ("Workbook", "Book") if s in streams), None)
    if name is None:
        raise XlsError(f"no Workbook stream in container (has {streams})")
    wb = cfb.read_stream(name)

    from openpolicedata_spark.sources.xls_crypto import (
        BiffCryptoError,
        decrypt_biff_workbook,
        find_filepass,
    )

    # the BOF record body is always plaintext, so the BIFF version is
    # readable before decryption (XOR FILEPASS parsing needs it: BIFF5's
    # FILEPASS has no wEncryptionType field)
    if len(wb) < 10 or struct.unpack_from("<H", wb, 0)[0] != _BOF:
        raise XlsError("stream does not start with a well-formed BOF")
    vers = struct.unpack_from("<H", wb, 4)[0]
    if vers not in (0x0600, 0x0500):
        raise XlsError(
            f"only BIFF5-BIFF8 are supported (BOF version 0x{vers:04x})")
    biff5 = vers == 0x0500

    if find_filepass(wb) is not None:
        try:
            wb = decrypt_biff_workbook(wb, password,
                                       biff_version=5 if biff5 else 8)
        except BiffCryptoError as e:
            raise XlsError(f"FILEPASS: {e}") from e

    # ---- globals substream -------------------------------------------------
    datemode = 0
    enc = "cp1252"  # BIFF5 byte-string code page until CODEPAGE says else
    formats: dict[int, str] = {}
    xf_fmts: list[int] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    sst: list[str] = []
    it = _records(wb)
    opcode, body, _ = next(it, (None, b"", 0))
    if opcode != _BOF or len(body) < 4:
        raise XlsError("stream does not start with a well-formed BOF")
    pending_sst = None
    sst_cont: list[bytes] = []
    try:
        for opcode, body, _pos in it:
            if opcode == _CONTINUE and pending_sst is not None:
                sst_cont.append(body)
                continue
            if pending_sst is not None:
                sst = _parse_sst(pending_sst, sst_cont)
                pending_sst = None
            if opcode == _EOF:
                break
            if opcode == _FILEPASS:
                # already decrypted above; the record is preserved in
                # place so BoundSheet8 stream offsets stay valid
                continue
            if opcode == _DATEMODE:
                (datemode,) = struct.unpack_from("<H", body, 0)
            elif opcode == _CODEPAGE:
                enc = _codepage_enc(struct.unpack_from("<H", body, 0)[0])
            elif opcode == _FORMAT:
                (ifmt,) = struct.unpack_from("<H", body, 0)
                formats[ifmt] = (_byte_string(body, 2, enc, short=True)
                                 if biff5 else _unicode_string(body, 2))
            elif opcode == _XF:
                xf_fmts.append(struct.unpack_from("<H", body, 2)[0])
            elif opcode == _BOUNDSHEET:
                (pos32,) = struct.unpack_from("<I", body, 0)
                dt = body[5]
                sname = (_byte_string(body, 6, enc, short=True) if biff5
                         else _unicode_string(body, 6, short=True))
                # hidden/very-hidden sheets are KEPT (dt==0 only filters
                # charts/macros) so output matches xlrd and read_xlsx,
                # which both return hidden worksheets
                if dt == 0:
                    sheets.append((sname, pos32))
            elif opcode == _SST:
                pending_sst = body
                sst_cont = []
        if pending_sst is not None:
            sst = _parse_sst(pending_sst, sst_cont)
    except (struct.error, IndexError) as e:
        raise XlsError(f"malformed BIFF record in globals: {e}") from e

    date_ids = set(_BUILTIN_DATE_FMTS)
    date_ids |= {i for i, code in formats.items() if _is_date_fmt(code)}
    date_xfs = {i for i, ifmt in enumerate(xf_fmts) if ifmt in date_ids}

    # ---- worksheet substreams ---------------------------------------------
    out: dict[str, pd.DataFrame] = {}
    for sname, start in sheets:
        cells: dict[int, dict[int, object]] = {}
        ncols = 0

        def put(r: int, c: int, v: object) -> None:
            nonlocal ncols
            if v is not None:
                cells.setdefault(r, {})[c] = v
                ncols = max(ncols, c + 1)

        depth = 0
        pending_formula: tuple[int, int] | None = None
        try:
          for opcode, body, _pos in _records(wb, start):
            if opcode == _BOF:
                depth += 1
                continue
            if opcode == _EOF:
                depth -= 1
                if depth <= 0:
                    break
                continue
            if depth != 1:
                continue  # records of an embedded (chart) substream
            if opcode == _STRING:
                if pending_formula is not None:
                    r, c = pending_formula
                    s = (_byte_string(body, 0, enc) if biff5
                         else _unicode_string(body, 0))
                    put(r, c, s or None)
                pending_formula = None
                continue
            if opcode in (_SHRFMLA, _ARRAY, _TABLE):
                continue  # may sit between FORMULA and its STRING result
            pending_formula = None
            if opcode == _NUMBER:
                r, c, ixfe = struct.unpack_from("<HHH", body, 0)
                (num,) = struct.unpack_from("<d", body, 6)
                put(r, c, _num_value(num, ixfe, date_xfs, datemode))
            elif opcode == _RK:
                r, c, ixfe, rk = struct.unpack_from("<HHHI", body, 0)
                put(r, c, _num_value(_decode_rk(rk), ixfe, date_xfs,
                                     datemode))
            elif opcode == _MULRK:
                r, c0 = struct.unpack_from("<HH", body, 0)
                nrk = (len(body) - 6) // 6
                for i in range(nrk):
                    ixfe, rk = struct.unpack_from("<HI", body, 4 + 6 * i)
                    put(r, c0 + i, _num_value(_decode_rk(rk), ixfe,
                                              date_xfs, datemode))
            elif opcode == _LABELSST:
                r, c, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
                if isst >= len(sst):
                    raise XlsError(f"SST index {isst} out of range")
                put(r, c, sst[isst] or None)
            elif opcode == _LABEL or (biff5 and opcode == _RSTRING):
                # BIFF5 RSTRING is a LABEL plus trailing format runs,
                # which the cch-bounded slice never reads
                r, c = struct.unpack_from("<HH", body, 0)
                s = (_byte_string(body, 6, enc) if biff5
                     else _unicode_string(body, 6))
                put(r, c, s or None)
            elif opcode == _BOOLERR:
                r, c, _ixfe, val, is_err = struct.unpack_from(
                    "<HHHBB", body, 0)
                put(r, c, None if is_err else bool(val))
            elif opcode == _FORMULA:
                r, c, ixfe = struct.unpack_from("<HHH", body, 0)
                res = body[6:14]
                if res[6:8] == b"\xff\xff":
                    kind = res[0]
                    if kind == 0:  # cached string in the STRING that follows
                        pending_formula = (r, c)
                    elif kind == 1:
                        put(r, c, bool(res[2]))
                    # kind 2 (error) and 3 (empty string) → no value
                else:
                    (num,) = struct.unpack("<d", res)
                    put(r, c, _num_value(num, ixfe, date_xfs, datemode))
        except (struct.error, IndexError) as e:
            raise XlsError(
                f"malformed BIFF record in sheet {sname!r}: {e}") from e
        if not cells:
            out[sname] = pd.DataFrame()
            continue
        nrows = max(cells) + 1
        grid = [[cells.get(r, {}).get(c) for c in range(ncols)]
                for r in range(nrows)]
        out[sname] = pd.DataFrame(grid, dtype=object)
    return out


def looks_like_xls(data: bytes) -> bool:
    """CFB container with a BIFF Workbook stream (and NOT a modern
    encrypted OOXML container, which is also CFB)."""
    if not is_cfb(data):
        return False
    try:
        names = CfbReader(data).list_streams()
    except Exception:
        return False
    return ("Workbook" in names or "Book" in names) \
        and "EncryptionInfo" not in names
