"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the JPEG half of the multimodal codec gate
(operators/multimodal.py): ``decode_image`` previously decoded PNG only
and raised for JPEG because no DCT library ships in this container.
Baseline sequential JPEG needs nothing beyond ``struct`` and numpy —
the same replace-the-dependency pattern as sources/png.py (Pillow),
sources/xlsx.py (openpyxl), and sources/htmltable.py (lxml).

Reference analog: the reference's loaders parse real file bytes end to
end (openpolicedata data_loaders.py); this gives the JPEG image path
the same property.

Coverage (T.81 baseline process):
- SOF0 (baseline) and SOF1 (extended sequential, 8-bit) frames
- grayscale (1 component) and YCbCr (3 components, JFIF color
  transform); arbitrary sampling factors incl. 4:4:4, 4:2:2, 4:2:0
  (chroma upsampled by pixel replication)
- DQT 8- and 16-bit precision tables, multi-table segments
- DHT multi-table segments, DC + AC classes
- DRI restart intervals (RST0-7 resync + DC predictor reset)
- 0xFF00 byte stuffing; fill bytes before markers
- progressive (SOF2), arithmetic coding, 12-bit precision, and
  hierarchical processes raise ``JpegError`` clearly

The entropy (Huffman) loop is per-symbol Python — fine for the
mapInPandas hot path where each Arrow batch decodes hundreds of small
images per task; dequantization, the 2-D IDCT (one einsum over ALL
blocks of a component), upsampling, and the color transform are
vectorized numpy.

``encode_jpeg`` is the minimal baseline writer used to build
real-bytes fixtures and the q130 oracle round trip: with flat 8x8
blocks and unit quantization the decode(encode(x)) composition is
bit-exact (DC-only spectra are integers and the IDCT of a DC-only
block is an exact float division by 8), so the full marker + Huffman +
dequant + IDCT path pins against a DuckDB md5 replay the same way
q129 pins the PNG codec. Decoder correctness independent of the
in-repo encoder is established by tests/test_jpeg.py, whose fixture
encoder is written forward from T.81 Annex C/F/K spec literals.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "encode_jpeg", "JPEG_SIGNATURE"]

JPEG_SIGNATURE = b"\xff\xd8"


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# Zigzag scan order: _ZIGZAG[k] = (row, col) flat index of coefficient k.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1],
                        rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Orthonormal-style DCT basis with JPEG's normalization:
# S[u,v] = sum_xy C[u,x] C[v,y] s[x,y], s[x,y] = sum_uv C[u,x] C[v,y] S[u,v]
# where C[u,x] = 1/2 * c(u) * cos((2x+1) u pi / 16), c(0) = 1/sqrt(2).
def _dct_basis() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    C = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    C[0] /= np.sqrt(2.0)
    return C


_C = _dct_basis()


class _Huff:
    """Canonical Huffman table: (code_length, code) -> symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        if len(counts) != 16 or len(symbols) != sum(counts):
            raise JpegError("malformed DHT table")
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs 0xFF00, stops at any
    real marker, and resyncs across RSTn at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.at_marker = False

    def _fill(self) -> None:
        if self.at_marker:
            raise JpegError("entropy data exhausted (hit marker)")
        d = self.data
        p = self.pos
        if p >= len(d):
            raise JpegError("entropy data truncated")
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                raise JpegError("entropy data truncated at 0xFF")
            nxt = d[p + 1]
            if nxt == 0x00:          # stuffed data byte 0xFF
                self.pos = p + 2
            else:                    # a real marker terminates the segment
                self.at_marker = True
                raise JpegError(
                    f"entropy data exhausted (marker 0xFF{nxt:02X})")
        else:
            self.pos = p + 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def get_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def decode(self, table: _Huff) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.get_bits(1)
            length += 1
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in entropy data")

    def restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1                   # fill bytes
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + expect:
            raise JpegError(f"expected RST{expect} at restart boundary")
        self.pos = p + 2
        self.at_marker = False


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks",
                 "blocks_x", "blocks_y", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.pred = 0


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes → uint8 array, (H, W) for grayscale or
    (H, W, 3) RGB for YCbCr. Raises ``JpegError`` on malformed or
    non-baseline input."""
    if data[:2] != JPEG_SIGNATURE:
        raise JpegError("not a JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc: dict[int, _Huff] = {}
    ac: dict[int, _Huff] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    n = len(data)

    def need(k: int) -> None:
        if pos + k > n:
            raise JpegError("truncated JPEG stream")

    while True:
        need(2)
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}, "
                            f"got 0x{data[pos]:02X}")
        while pos < n and data[pos] == 0xFF and pos + 1 < n \
                and data[pos + 1] == 0xFF:
            pos += 1                 # fill bytes
        need(2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:           # EOI with no scan
            raise JpegError("no SOS scan before EOI")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                 # TEM / stray RST: no payload
        need(2)
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2:
            raise JpegError("marker segment length < 2")
        need(seglen)
        body = data[pos + 2:pos + seglen]
        pos += seglen

        if marker in (0xC0, 0xC1):   # SOF0 / SOF1
            if len(body) < 6:
                raise JpegError("truncated SOF")
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported "
                                "(baseline is 8)")
            if ncomp not in (1, 3):
                raise JpegError(f"{ncomp}-component images not supported "
                                "(grayscale or YCbCr)")
            if width == 0 or height == 0:
                raise JpegError("zero image dimension")
            if len(body) < 6 + 3 * ncomp:
                raise JpegError("truncated SOF component specs")
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise JpegError(f"bad sampling factors {h}x{v}")
                comps.append(_Component(cid, h, v, tq))
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) not supported "
                            "(baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"SOF marker 0xFF{marker:02X} process "
                            "not supported (baseline only)")
        elif marker == 0xC4:         # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise JpegError("truncated DHT")
                tc_th = body[b]
                counts = body[b + 1:b + 17]
                nsym = sum(counts)
                if b + 17 + nsym > len(body):
                    raise JpegError("truncated DHT symbols")
                table = _Huff(counts, body[b + 17:b + 17 + nsym])
                (dc if tc_th >> 4 == 0 else ac)[tc_th & 0x0F] = table
                b += 17 + nsym
        elif marker == 0xDB:         # DQT
            b = 0
            while b < len(body):
                pq_tq = body[b]
                pq, tq_id = pq_tq >> 4, pq_tq & 0x0F
                step = 1 + 64 * (2 if pq else 1)
                if b + step > len(body):
                    raise JpegError("truncated DQT")
                if pq:
                    vals = np.frombuffer(
                        body[b + 1:b + 129], dtype=">u2").astype(np.int64)
                else:
                    vals = np.frombuffer(
                        body[b + 1:b + 65], dtype=np.uint8).astype(np.int64)
                table = np.zeros(64, dtype=np.int64)
                table[_ZIGZAG] = vals
                qt[tq_id] = table.reshape(8, 8)
                b += step
        elif marker == 0xDD:         # DRI
            if len(body) < 2:
                raise JpegError("truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:         # SOS — decode the scan below
            break
        # APPn / COM / DNL / anything else: skipped
    else:  # pragma: no cover
        raise JpegError("unreachable")

    if not comps:
        raise JpegError("SOS before SOF")
    if not body or len(body) < 1 + 2 * body[0] + 3:
        raise JpegError("truncated SOS")
    ns = body[0]
    if ns != len(comps):
        raise JpegError("partial (multi-scan) baseline files not supported")
    by_id = {c.cid: c for c in comps}
    scan: list[_Component] = []
    for i in range(ns):
        cid, tables = body[1 + 2 * i], body[2 + 2 * i]
        c = by_id.get(cid)
        if c is None:
            raise JpegError(f"SOS references unknown component {cid}")
        c.td, c.ta = tables >> 4, tables & 0x0F
        scan.append(c)
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    if (ss, se) != (0, 63):
        raise JpegError("non-full spectral selection in baseline scan")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        c.blocks_x = mcux * c.h
        c.blocks_y = mcuy * c.v
        c.blocks = np.zeros((c.blocks_y * c.blocks_x, 64), dtype=np.int64)
        if c.tq not in qt:
            raise JpegError(f"component references missing DQT {c.tq}")

    reader = _BitReader(data, pos)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart(rst)
            rst = (rst + 1) & 7
            for c in comps:
                c.pred = 0
        my, mx = divmod(m, mcux)
        for c in scan:
            dtab = dc.get(c.td)
            atab = ac.get(c.ta)
            if dtab is None or atab is None:
                raise JpegError("scan references missing DHT")
            for by in range(c.v):
                for bx in range(c.h):
                    coef = np.zeros(64, dtype=np.int64)
                    s = reader.decode(dtab)
                    if s > 11:
                        raise JpegError("DC magnitude category > 11")
                    c.pred += _extend(reader.get_bits(s), s)
                    coef[0] = c.pred
                    k = 1
                    while k < 64:
                        rs = reader.decode(atab)
                        r, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if r == 15:
                                k += 16      # ZRL
                                continue
                            break            # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC run past end of block")
                        coef[_ZIGZAG[k]] = _extend(
                            reader.get_bits(size), size)
                        k += 1
                    row = (my * c.v + by) * c.blocks_x + (mx * c.h + bx)
                    c.blocks[row] = coef

    # Dequantize + one batched IDCT per component, then assemble planes.
    planes: list[np.ndarray] = []
    for c in comps:
        spec = (c.blocks.reshape(-1, 8, 8)
                * qt[c.tq][None, :, :]).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _C, spec, _C)
        pix = np.clip(np.rint(pix) + 128, 0, 255).astype(np.uint8)
        plane = (pix.reshape(c.blocks_y, c.blocks_x, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c.blocks_y * 8, c.blocks_x * 8))
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        plane = plane[:ch, :cw]
        if c.h != hmax or c.v != vmax:
            plane = plane.repeat(vmax // c.v, axis=0) \
                         .repeat(hmax // c.h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Minimal baseline writer (fixtures + the q130 oracle round trip). Encodes
# grayscale or RGB (4:4:4 YCbCr) with caller-supplied or unit quantization.
# --------------------------------------------------------------------------

def _build_huff_spec(counts: bytes, symbols: bytes):
    """(symbol -> (code, length)) for the encoder side."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc

# T.81 Annex K.3 typical Huffman tables (spec literals).
_K_DC_LUMA = (bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
              bytes(range(12)))
_K_AC_LUMA_COUNTS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1,
                           0x7D])
_K_AC_LUMA_SYMS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # 1-pad


def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_enc, ac_enc) -> int:
    zz = coef.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(diff).bit_length() if diff else 0
    code, ln = dc_enc[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            w.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]
        w.put(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as baseline
    JPEG (4:4:4, Annex K Huffman tables). ``quant`` is an 8x8 table
    applied to every component; default all-ones (near-lossless: exact
    for flat 8x8 blocks, the q130 oracle's construction)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(8, 8)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    zz_q = quant.reshape(64)[_ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zz_q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts, dc_syms = _K_DC_LUMA
    dht = bytes([0x00]) + dc_counts + dc_syms \
        + bytes([0x10]) + _K_AC_LUMA_COUNTS + _K_AC_LUMA_SYMS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([ncomp]) + b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(ncomp)) \
        + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_enc = _build_huff_spec(*_K_DC_LUMA)
    ac_enc = _build_huff_spec(_K_AC_LUMA_COUNTS, _K_AC_LUMA_SYMS)
    bw = h // 8 + (1 if h % 8 else 0)
    bh_ = w // 8 + (1 if w % 8 else 0)
    writer = _BitWriter()
    preds = [0] * ncomp
    for my in range(bw):
        for mx in range(bh_):
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), 128.0)
                ys, xs = my * 8, mx * 8
                tile = plane[ys:ys + 8, xs:xs + 8]
                blk[:tile.shape[0], :tile.shape[1]] = tile
                # edge replicate so partial tiles stay flat-block exact
                if tile.shape[0] < 8:
                    blk[tile.shape[0]:, :] = blk[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1]:] = blk[:, tile.shape[1] - 1][:, None]
                spec = _C @ (blk - 128.0) @ _C.T
                coef = np.rint(spec / quant).astype(np.int64)
                preds[ci] = _encode_block(writer, coef, preds[ci],
                                          dc_enc, ac_enc)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
