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
               endian: str = "<") -> bytes:
    """Forward TIFF construction: header, pixel strips, value areas,
    then one IFD. `tags` maps tag id → (type, values); StripOffsets is
    filled in automatically."""
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
    tags[273] = (4, strip_offsets)
    tags[279] = (4, [len(s) for s in strips])

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
    t[259] = (3, [5])  # LZW
    with pytest.raises(TiffError, match="compression"):
        decode_tiff(build_tiff([img.tobytes()], t))
    t = gray_tags(2, 2, 2)
    t[322] = (3, [16])  # TileWidth
    with pytest.raises(TiffError, match="tiled"):
        decode_tiff(build_tiff([img.tobytes()], t))
    t = gray_tags(2, 2, 2)
    t[258] = (3, [16])
    with pytest.raises(TiffError, match="16-bit"):
        decode_tiff(build_tiff([img.tobytes()], t))
    with pytest.raises(TiffError, match="truncated strip|strips cover"):
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
