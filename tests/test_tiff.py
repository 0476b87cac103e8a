"""TIFF decoder tests — fixtures written HERE forward from the TIFF 6.0
spec literals (header/IFD layout, tag ids, strip structure), independent
of sources/tiff.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.tiff import TiffError, decode_tiff

rng = np.random.default_rng(20260814)

# tag ids typed from the spec: ImageWidth 256, ImageLength 257,
# BitsPerSample 258, Compression 259, Photometric 262, StripOffsets 273,
# SamplesPerPixel 277, RowsPerStrip 278, StripByteCounts 279,
# ColorMap 320


def build_tiff(strips: list[bytes], tags: dict[int, tuple[int, list[int]]],
               endian: str = "<", tiled: bool = False) -> bytes:
    """Forward TIFF construction: header, pixel strips, value areas,
    then one IFD. `tags` maps tag id → (type, values); StripOffsets
    (or TileOffsets with ``tiled=True``) is filled in automatically."""
    e = endian
    out = bytearray(b"II*\x00" if e == "<" else b"MM\x00*")
    out += b"\x00" * 4  # IFD offset patched later
    strip_offsets = []
    for sdata in strips:
        strip_offsets.append(len(out))
        out += sdata
    if len(out) % 2:
        out += b"\x00"
    tags = dict(tags)
    off_tag, cnt_tag = (324, 325) if tiled else (273, 279)
    tags[off_tag] = (4, strip_offsets)
    tags[cnt_tag] = (4, [len(s) for s in strips])

    type_size = {1: 1, 3: 2, 4: 4}
    fmt = {1: "B", 3: "H", 4: "I"}
    # out-of-line value areas first
    value_off: dict[int, int] = {}
    for tag, (typ, vals) in sorted(tags.items()):
        total = type_size[typ] * len(vals)
        if total > 4:
            value_off[tag] = len(out)
            out += struct.pack(f"{e}{len(vals)}{fmt[typ]}", *vals)
            if len(out) % 2:
                out += b"\x00"
    ifd_off = len(out)
    out += struct.pack(f"{e}H", len(tags))
    for tag, (typ, vals) in sorted(tags.items()):
        out += struct.pack(f"{e}HHI", tag, typ, len(vals))
        total = type_size[typ] * len(vals)
        if total > 4:
            out += struct.pack(f"{e}I", value_off[tag])
        else:
            inline = struct.pack(f"{e}{len(vals)}{fmt[typ]}", *vals)
            out += inline + b"\x00" * (4 - len(inline))
    out += struct.pack(f"{e}I", 0)  # next-IFD = none
    struct.pack_into(f"{e}I", out, 4, ifd_off)
    return bytes(out)


def gray_tags(w: int, h: int, rows_per_strip: int,
              photometric: int = 1) -> dict:
    return {256: (3, [w]), 257: (3, [h]), 258: (3, [8]),
            259: (3, [1]), 262: (3, [photometric]),
            277: (3, [1]), 278: (3, [rows_per_strip])}


@pytest.mark.parametrize("endian", ["<", ">"])
def test_gray_multi_strip_both_endians(endian):
    img = rng.integers(0, 256, size=(10, 7), dtype=np.uint8)
    strips = [img[i:i + 4].tobytes() for i in range(0, 10, 4)]
    blob = build_tiff(strips, gray_tags(7, 10, 4), endian)
    assert np.array_equal(decode_tiff(blob), img)


def test_white_is_zero_inverts():
    img = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    blob = build_tiff([img.tobytes()], gray_tags(4, 4, 4, photometric=0))
    assert np.array_equal(decode_tiff(blob), 255 - img)


def test_rgb_and_alpha_dropped():
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    tags = {256: (3, [6]), 257: (3, [5]), 258: (3, [8, 8, 8]),
            259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
            278: (3, [5])}
    blob = build_tiff([img.tobytes()], tags)
    assert np.array_equal(decode_tiff(blob), img)
    rgba = np.dstack([img, np.full((5, 6), 77, np.uint8)])
    tags_a = dict(tags)
    tags_a[258] = (3, [8, 8, 8, 8])
    tags_a[277] = (3, [4])
    blob = build_tiff([rgba.tobytes()], tags_a)
    assert np.array_equal(decode_tiff(blob), img)


def test_palette_colormap_16bit_downscale():
    idx = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    pal8 = rng.integers(0, 256, size=(256, 3), dtype=np.uint16)
    cmap = []  # spec layout: all red, then all green, then all blue
    for c in range(3):
        cmap.extend(int(v) << 8 for v in pal8[:, c])
    tags = {256: (3, [5]), 257: (3, [3]), 258: (3, [8]), 259: (3, [1]),
            262: (3, [3]), 277: (3, [1]), 278: (3, [3]),
            320: (3, cmap)}
    blob = build_tiff([idx.tobytes()], tags)
    assert np.array_equal(decode_tiff(blob), pal8.astype(np.uint8)[idx])


def test_bilevel_1bit():
    img = rng.integers(0, 2, size=(4, 11), dtype=np.uint8)
    rows = np.packbits(img, axis=1)
    tags = {256: (3, [11]), 257: (3, [4]), 258: (3, [1]), 259: (3, [1]),
            262: (3, [1]), 277: (3, [1]), 278: (3, [4])}
    blob = build_tiff([rows.tobytes()], tags)
    assert np.array_equal(decode_tiff(blob), img * 255)


def test_errors():
    img = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(TiffError, match="signature"):
        decode_tiff(b"BM nope")
    t = gray_tags(2, 2, 2)
    t[259] = (3, [6])  # old-style JPEG-in-TIFF stays gated
    with pytest.raises(TiffError, match="compression"):
        decode_tiff(build_tiff([img.tobytes()], t))
    t = gray_tags(2, 2, 2)
    t[322] = (3, [16])  # TileWidth without TileLength/TileOffsets
    with pytest.raises(TiffError, match="323"):
        decode_tiff(build_tiff([img.tobytes()], t))
    t = gray_tags(2, 2, 2)
    t[322] = (3, [10])  # not a multiple of 16
    t[323] = (3, [16])
    with pytest.raises(TiffError, match="multiple of 16"):
        decode_tiff(build_tiff([img.tobytes()], t, tiled=True))
    t = gray_tags(2, 2, 2)
    t[258] = (3, [32])  # 16-bit now decodes; 32-bit stays gated
    with pytest.raises(TiffError, match="32-bit"):
        decode_tiff(build_tiff([img.tobytes()], t))
    with pytest.raises(TiffError, match="truncated chunk|strips"):
        decode_tiff(build_tiff([img.tobytes()[:-1]], gray_tags(2, 2, 2)))


def test_junk_fuzz_raises_tifferror_only():
    for seed in range(40):
        r = np.random.default_rng(seed)
        blob = b"II*\x00" + bytes(r.integers(0, 256, size=120,
                                             dtype=np.uint8))
        try:
            decode_tiff(blob)
        except TiffError:
            pass


def test_decode_image_dispatch():
    from openpolicedata_spark.operators.multimodal import decode_image

    img = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    blob = build_tiff([img.tobytes()], gray_tags(4, 4, 4))
    out = decode_image(blob, "mislabeled/png")
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[..., 0], img)


# --------------------------------------------------- compressed strips

def packbits_encode(raw: bytes) -> bytes:
    """Independent PackBits writer (TIFF §9 pseudo-code form)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and raw[i + run] == raw[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, raw[i]])
            i += run
        else:
            j = i
            while j < n and (j + 1 >= n or raw[j + 1] != raw[j]) \
                    and j - i < 128:
                j += 1
            out += bytes([j - i - 1]) + raw[i:j]
            i = j
    return bytes(out)


class _MsbPacker:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(self.out)


def tiff_lzw_encode(raw: bytes) -> bytes:
    """Independent TIFF-LZW writer: MSB-first packing, Clear/EOI, and
    the early width change tracked by SIMULATING the decoder's table
    growth (it adds one entry per code starting with the second after
    a clear, and widens when the table reaches 2^w - 1)."""
    p = _MsbPacker()
    width = 9
    p.put(256, width)  # Clear
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    dec_len = 258
    first = True

    def after_emit():
        nonlocal dec_len, width, first
        if not first:
            dec_len += 1
        first = False
        if dec_len == (1 << width) - 1 and width < 12:
            width += 1

    w = b""
    for b in raw:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        p.put(table[w], width)
        after_emit()
        if next_code < 4094:
            table[wk] = next_code
            next_code += 1
        w = bytes([b])
    if w:
        p.put(table[w], width)
        after_emit()
    p.put(257, width)  # EOI
    return p.done()


def test_hand_packed_lzw_streams():
    """Two streams bit-packed by hand in the comments (independent of
    both LZW implementations): single literal, and the KwKwK case.
    'A' → codes 256,65,257 @9 bits → 80 10 60 20;
    'AAA' → codes 256,65,258,257 → 80 10 60 50 10."""
    from openpolicedata_spark.sources.tiff import _lzw_decode

    assert _lzw_decode(bytes([0x80, 0x10, 0x60, 0x20]), 1) == b"A"
    assert _lzw_decode(bytes([0x80, 0x10, 0x60, 0x50, 0x10]), 3) == b"AAA"


@pytest.mark.parametrize("compression", [5, 32773])
def test_compressed_gray_multi_strip(compression):
    img = rng.integers(0, 256, size=(9, 6), dtype=np.uint8)
    img[2:5] = 7  # compressible region
    enc = tiff_lzw_encode if compression == 5 else packbits_encode
    strips = [enc(img[i:i + 3].tobytes()) for i in range(0, 9, 3)]
    t = gray_tags(6, 9, 3)
    t[259] = (3, [compression])
    assert np.array_equal(decode_tiff(build_tiff(strips, t)), img)


def test_lzw_rgb_large_enough_to_widen_codes():
    # > 256 distinct pairs so the dictionary passes 511 and the early
    # width change actually fires
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    tags = {256: (3, [40]), 257: (3, [40]), 258: (3, [8, 8, 8]),
            259: (3, [5]), 262: (3, [2]), 277: (3, [3]),
            278: (3, [40])}
    strips = [tiff_lzw_encode(img.tobytes())]
    assert np.array_equal(decode_tiff(build_tiff(strips, tags)), img)


def test_packbits_noop_and_truncation():
    from openpolicedata_spark.sources.tiff import _unpackbits

    # 0x80 is a no-op between runs
    assert _unpackbits(bytes([0x80, 0x00, 0x41, 0x80, 0xFF, 0x42]), 3) \
        == b"ABB"
    with pytest.raises(TiffError, match="truncated PackBits"):
        _unpackbits(bytes([0x05, 0x41]), 6)
    with pytest.raises(TiffError, match="truncated PackBits"):
        _unpackbits(bytes([0xFE]), 3)


@pytest.mark.parametrize("tag", [8, 32946])
def test_deflate_strips(tag):
    import zlib

    img = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    strips = [zlib.compress(img[i:i + 3].tobytes())
              for i in range(0, 6, 3)]
    t = gray_tags(5, 6, 3)
    t[259] = (3, [tag])
    assert np.array_equal(decode_tiff(build_tiff(strips, t)), img)


def test_deflate_bad_stream_raises():
    t = gray_tags(2, 2, 2)
    t[259] = (3, [8])
    with pytest.raises(TiffError, match="Deflate"):
        decode_tiff(build_tiff([b"\x99\x99\x99\x99"], t))


# ------------------------------------------------- tiles and planar config

def tile_split(img: np.ndarray, tw: int, tl: int) -> list[bytes]:
    """Spec §15 tile chunking: row-major tiles, edge tiles padded to the
    full tile size (pad bytes arbitrary — zeros here)."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    tiles = []
    for y0 in range(0, h, tl):
        for x0 in range(0, w, tw):
            pad = np.zeros((tl, tw, spp), dtype=np.uint8)
            blk = img[y0:y0 + tl, x0:x0 + tw].reshape(
                min(tl, h - y0), min(tw, w - x0), spp)
            pad[:blk.shape[0], :blk.shape[1]] = blk
            tiles.append(pad.tobytes())
    return tiles


def test_tiled_gray_edge_clipping():
    img = rng.integers(0, 256, size=(21, 37), dtype=np.uint8)
    t = gray_tags(37, 21, 21)
    del t[278]
    t[322] = (3, [16])
    t[323] = (3, [16])
    out = decode_tiff(build_tiff(tile_split(img, 16, 16), t, tiled=True))
    assert np.array_equal(out, img)


def test_tiled_rgb_matches_strip_decode():
    img = rng.integers(0, 256, size=(18, 20, 3), dtype=np.uint8)
    t = {256: (3, [20]), 257: (3, [18]), 258: (3, [8, 8, 8]),
         259: (3, [1]), 262: (3, [2]), 277: (3, [3])}
    tiled = decode_tiff(build_tiff(tile_split(img, 16, 16),
                                   {**t, 322: (3, [16]),
                                    323: (3, [16])},
                                   tiled=True))
    striped = decode_tiff(build_tiff([img.tobytes()],
                                     {**t, 278: (3, [18])}))
    assert np.array_equal(tiled, striped)
    assert np.array_equal(tiled, img)


def test_tiled_lzw_compressed():
    img = rng.integers(0, 4, size=(17, 19), dtype=np.uint8) * 80
    t = gray_tags(19, 17, 17)
    del t[278]
    t[259] = (3, [5])
    t[322] = (3, [16])
    t[323] = (3, [16])
    tiles = [tiff_lzw_encode(raw) for raw in tile_split(img, 16, 16)]
    out = decode_tiff(build_tiff(tiles, t, tiled=True))
    assert np.array_equal(out, img)


def test_tiled_bilevel():
    img = (rng.integers(0, 2, size=(20, 22), dtype=np.uint8))
    packed_tiles = []
    for y0 in range(0, 20, 16):
        for x0 in range(0, 22, 16):
            pad = np.zeros((16, 16), dtype=np.uint8)
            blk = img[y0:y0 + 16, x0:x0 + 16]
            pad[:blk.shape[0], :blk.shape[1]] = blk
            packed_tiles.append(np.packbits(pad, axis=1).tobytes())
    t = {256: (3, [22]), 257: (3, [20]), 258: (3, [1]),
         259: (3, [1]), 262: (3, [1]), 277: (3, [1]),
         322: (3, [16]), 323: (3, [16])}
    out = decode_tiff(build_tiff(packed_tiles, t, tiled=True))
    assert np.array_equal(out, img * 255)


def test_planar2_strips_match_planar1():
    img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    base = {256: (3, [9]), 257: (3, [11]), 258: (3, [8, 8, 8]),
            259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
            278: (3, [4])}
    # planar 1: interleaved strips of 4 rows
    s1 = [img[y:y + 4].tobytes() for y in range(0, 11, 4)]
    # planar 2: plane 0's strips, then plane 1's, then plane 2's
    s2 = [img[y:y + 4, :, p].tobytes()
          for p in range(3) for y in range(0, 11, 4)]
    out1 = decode_tiff(build_tiff(s1, base))
    out2 = decode_tiff(build_tiff(s2, {**base, 284: (3, [2])}))
    assert np.array_equal(out1, out2)
    assert np.array_equal(out2, img)


def test_planar2_tiled_rgb():
    img = rng.integers(0, 256, size=(17, 18, 3), dtype=np.uint8)
    tiles = []
    for p in range(3):
        tiles += tile_split(img[:, :, p], 16, 16)
    t = {256: (3, [18]), 257: (3, [17]), 258: (3, [8, 8, 8]),
         259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
         284: (3, [2]), 322: (3, [16]), 323: (3, [16])}
    out = decode_tiff(build_tiff(tiles, t, tiled=True))
    assert np.array_equal(out, img)


def test_tile_and_strip_count_mismatch_raise():
    img = rng.integers(0, 256, size=(17, 18), dtype=np.uint8)
    t = gray_tags(18, 17, 17)
    del t[278]
    t[322] = (3, [16])
    t[323] = (3, [16])
    with pytest.raises(TiffError, match="expected 4 tiles"):
        decode_tiff(build_tiff(tile_split(img, 16, 16)[:2], t,
                               tiled=True))
    base = {256: (3, [9]), 257: (3, [11]), 258: (3, [8, 8, 8]),
            259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
            278: (3, [4]), 284: (3, [2])}
    img2 = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    only_one_plane = [img2[y:y + 4, :, 0].tobytes()
                      for y in range(0, 11, 4)]
    with pytest.raises(TiffError, match="expected 9 strips"):
        decode_tiff(build_tiff(only_one_plane, base))


# --------------------------------------------- 16-bit and JPEG-in-TIFF

@pytest.mark.parametrize("endian", ["<", ">"])
def test_16bit_gray_high_byte_downscale(endian):
    img16 = rng.integers(0, 65536, size=(6, 5), dtype=np.uint16)
    body = img16.astype(f"{endian}u2").tobytes()
    t = gray_tags(5, 6, 6)
    t[258] = (3, [16])
    out = decode_tiff(build_tiff([body], t, endian))
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))


def test_16bit_rgb_tiled_and_planar2():
    img16 = rng.integers(0, 65536, size=(17, 18, 3), dtype=np.uint16)
    t = {256: (3, [18]), 257: (3, [17]), 258: (3, [16, 16, 16]),
         259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
         322: (3, [16]), 323: (3, [16])}
    tiles = []
    for y0 in range(0, 17, 16):
        for x0 in range(0, 18, 16):
            pad = np.zeros((16, 16, 3), dtype="<u2")
            blk = img16[y0:y0 + 16, x0:x0 + 16]
            pad[:blk.shape[0], :blk.shape[1]] = blk
            tiles.append(pad.tobytes())
    out = decode_tiff(build_tiff(tiles, t, tiled=True))
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))
    # planar-2 strips of the same image agree
    base = {256: (3, [18]), 257: (3, [17]), 258: (3, [16, 16, 16]),
            259: (3, [1]), 262: (3, [2]), 277: (3, [3]),
            278: (3, [17]), 284: (3, [2])}
    strips = [img16[:, :, p].astype("<u2").tobytes() for p in range(3)]
    out2 = decode_tiff(build_tiff(strips, base))
    assert np.array_equal(out2, (img16 >> 8).astype(np.uint8))


def _flat_jpeg(tiles: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Flat-block grayscale JPEG (bit-exact with unit quantization)."""
    from openpolicedata_spark.sources.jpeg import encode_jpeg
    img = tiles.repeat(8, 0).repeat(8, 1)
    return encode_jpeg(img), img


def _split_tables(jpg: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG into (JPEGTables stream, abbreviated stream)
    by walking markers: DQT/DHT move to the tables stream."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos < len(jpg):
        assert jpg[pos] == 0xFF
        marker = jpg[pos + 1]
        if marker == 0xD9:  # EOI
            rest += jpg[pos:pos + 2]
            break
        (ln,) = struct.unpack_from(">H", jpg, pos + 2)
        seg = jpg[pos:pos + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
            if marker == 0xDA:  # SOS: entropy data to EOI
                rest += jpg[pos + 2 + ln:]
                break
        pos += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def test_jpeg_in_tiff_full_streams():
    jpg1, img1 = _flat_jpeg(rng.integers(0, 256, (1, 2), dtype=np.uint8))
    jpg2, img2 = _flat_jpeg(rng.integers(0, 256, (1, 2), dtype=np.uint8))
    t = gray_tags(16, 16, 8)
    t[259] = (3, [7])
    out = decode_tiff(build_tiff([jpg1, jpg2], t))
    assert np.array_equal(out[:8], img1)
    assert np.array_equal(out[8:], img2)


def test_jpeg_in_tiff_shared_jpegtables():
    jpg, img = _flat_jpeg(rng.integers(0, 256, (2, 2), dtype=np.uint8))
    tables, abbreviated = _split_tables(jpg)
    assert b"\xff\xdb" in tables and b"\xff\xdb" not in abbreviated
    t = gray_tags(16, 16, 16)
    t[259] = (3, [7])
    t[347] = (1, list(tables))
    out = decode_tiff(build_tiff([abbreviated], t))
    assert np.array_equal(out, img)


def test_jpeg_in_tiff_tiled_rgb():
    from openpolicedata_spark.sources.jpeg import encode_jpeg
    tiles_px = []
    full = np.zeros((16, 32, 3), dtype=np.uint8)
    blobs = []
    for tx in range(2):
        tile = rng.integers(0, 256, (2, 2), dtype=np.uint8) \
            .repeat(8, 0).repeat(8, 1)
        rgb = np.stack([tile] * 3, axis=-1)
        full[:, tx * 16:(tx + 1) * 16] = rgb
        blobs.append(encode_jpeg(rgb))
    t = {256: (3, [32]), 257: (3, [16]), 258: (3, [8, 8, 8]),
         259: (3, [7]), 262: (3, [6]), 277: (3, [3]),
         322: (3, [16]), 323: (3, [16])}
    out = decode_tiff(build_tiff(blobs, t, tiled=True))
    # RGB JPEG is 4:2:0 YCbCr — equal-channel gray stays equal-channel
    # and flat blocks stay exact
    assert np.array_equal(out, full)


def test_jpeg_in_tiff_errors():
    t = gray_tags(16, 16, 16)
    t[259] = (3, [7])
    with pytest.raises(TiffError, match="SOI"):
        decode_tiff(build_tiff([b"\x00\x01\x02\x03"], t))
    t[347] = (1, [0, 1, 2])
    with pytest.raises(TiffError, match="JPEGTables"):
        decode_tiff(build_tiff([b"\xff\xd8\xff\xd9"], t))
