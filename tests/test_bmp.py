"""BMP decoder tests — fixtures written HERE forward from the Windows
DIB spec literals (BITMAPFILEHEADER/BITMAPINFOHEADER layout, BGR order,
4-byte stride, bottom-up rows), independent of sources/bmp.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.bmp import BmpError, decode_bmp

rng = np.random.default_rng(20260814)


def build_bmp(img: np.ndarray, bpp: int = 24,
              palette: np.ndarray | None = None,
              top_down: bool = False, header_size: int = 40,
              compression: int = 0) -> bytes:
    """Forward BMP construction. For bpp<=8, `img` holds palette
    indices; else (H, W, 3) RGB."""
    h, w = img.shape[:2]
    stride = ((w * bpp + 31) // 32) * 4
    rows = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        if bpp == 24:
            line = img[y][:, ::-1].tobytes()          # RGB → BGR
        elif bpp == 32:
            bgra = np.zeros((w, 4), dtype=np.uint8)
            bgra[:, :3] = img[y][:, ::-1]
            bgra[:, 3] = 0xAA
            line = bgra.tobytes()
        elif bpp == 8:
            line = img[y].tobytes()
        else:  # 4- or 1-bit packing, MSB first
            bits = []
            for v in img[y]:
                for k in range(bpp - 1, -1, -1):
                    bits.append((int(v) >> k) & 1)
            while len(bits) % 8:
                bits.append(0)
            line = np.packbits(np.array(bits, dtype=np.uint8)).tobytes()
        rows += line + b"\x00" * (stride - len(line))
    pal = b""
    if palette is not None:
        for r, g, b in palette:
            pal += bytes([b, g, r, 0])               # BGRX entries
    pixel_off = 14 + header_size + len(pal)
    info = struct.pack("<IiiHHIIiiII", header_size, w,
                       -h if top_down else h, 1, bpp, compression,
                       len(rows), 2835, 2835,
                       0 if palette is None else len(palette), 0)
    info += b"\x00" * (header_size - 40)             # V4/V5 tail zeros
    head = b"BM" + struct.pack("<IHHI", pixel_off + len(rows), 0, 0,
                               pixel_off)
    return head + info + pal + bytes(rows)


def test_24bit_bottom_up_with_stride():
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)  # stride pad
    assert np.array_equal(decode_bmp(build_bmp(img)), img)


def test_24bit_top_down():
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(img, top_down=True)), img)


def test_32bit_alpha_ignored():
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(img, bpp=32)), img)


def test_8bit_palette():
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    out = decode_bmp(build_bmp(idx, bpp=8, palette=pal))
    assert np.array_equal(out, pal[idx])


def test_4bit_and_1bit_palette():
    pal4 = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx4 = rng.integers(0, 16, size=(3, 5), dtype=np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(idx4, bpp=4, palette=pal4)),
                          pal4[idx4])
    pal1 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx1 = rng.integers(0, 2, size=(4, 11), dtype=np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(idx1, bpp=1, palette=pal1)),
                          pal1[idx1])


def test_v5_header_accepted():
    img = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(img, header_size=124)), img)


def test_errors():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(BmpError, match="signature"):
        decode_bmp(b"PNG nope")
    with pytest.raises(BmpError, match="compression"):
        decode_bmp(build_bmp(img, compression=1))  # RLE8
    with pytest.raises(BmpError, match="truncated"):
        decode_bmp(build_bmp(img)[:-5])
    blob = bytearray(build_bmp(img))
    struct.pack_into("<H", blob, 28, 13)  # bpp=13
    with pytest.raises(BmpError, match="13-bit"):
        decode_bmp(bytes(blob))


def test_junk_fuzz_raises_bmperror_only():
    for seed in range(40):
        r = np.random.default_rng(seed)
        blob = b"BM" + bytes(r.integers(0, 256, size=100, dtype=np.uint8))
        try:
            decode_bmp(blob)
        except BmpError:
            pass


def test_decode_image_dispatch():
    from openpolicedata_spark.operators.multimodal import decode_image

    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    out = decode_image(build_bmp(img), "mislabeled/gif")  # magic wins
    assert np.array_equal(out, img)
