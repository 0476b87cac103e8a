"""Pure-stdlib/numpy baseline TIFF decoder (TIFF 6.0).

Completes the stills codec set (PNG/JPEG/GIF/BMP): uncompressed
stripped TIFF is the remaining format public agencies attach (scanner
output, GIS exports), and it needs nothing beyond ``struct`` + numpy.

Coverage (TIFF 6.0 baseline):
- both byte orders (``II`` little-endian, ``MM`` big-endian)
- IFD tag parsing with inline (≤4-byte) and offset-stored values
- uncompressed (Compression=1) strip layout, any RowsPerStrip
- PhotometricInterpretation 0/1 (grayscale, both polarities),
  2 (RGB, extra samples e.g. alpha dropped), 3 (palette via ColorMap,
  16-bit entries downscaled to 8)
- BitsPerSample 8 (and 1-bit bilevel for photometric 0/1)
- multi-strip images; only the FIRST IFD (page) is decoded
- LZW/PackBits/JPEG compression, tiled layout, planar configuration 2,
  and 16-bit samples raise ``TiffError`` clearly

Decoding is ``np.frombuffer`` + reshape per strip — memcpy-bound, no
per-pixel Python (bilevel rows go through vectorized ``unpackbits``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["TiffError", "decode_tiff", "TIFF_SIGNATURES"]

TIFF_SIGNATURES = (b"II*\x00", b"MM\x00*")


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_values(data: bytes, e: str, typ: int, count: int,
                 raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise TiffError(f"unknown IFD entry type {typ}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(f"{e}I", raw)
        if off + total > len(data):
            raise TiffError("IFD value offset out of bounds")
        buf = data[off:off + total]
    if typ in (3, 8):
        return list(struct.unpack(f"{e}{count}H", buf))
    if typ in (4, 9, 11):
        fmt = "I" if typ == 4 else ("i" if typ == 9 else "f")
        return list(struct.unpack(f"{e}{count}{fmt}", buf))
    if typ in (1, 6, 7, 2):
        return list(buf)
    raise TiffError(f"IFD entry type {typ} not supported")


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first page of baseline TIFF bytes → uint8 array,
    (H, W) grayscale or (H, W, 3) RGB."""
    if data[:4] not in TIFF_SIGNATURES:
        raise TiffError("not a TIFF: bad signature")
    e = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(f"{e}I", data, 4)
    if ifd_off + 2 > len(data):
        raise TiffError("truncated IFD offset")
    (n_entries,) = struct.unpack_from(f"{e}H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    if pos + 12 * n_entries > len(data):
        raise TiffError("truncated IFD")
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(f"{e}HHI", data, pos)
        tags[tag] = _read_values(data, e, typ, count,
                                 data[pos + 8:pos + 12])
        pos += 12

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"required TIFF tag {tag} missing")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    if width == 0 or height == 0 or width * height > (1 << 28):
        raise TiffError("bad dimensions")
    compression = one(259, 1)
    if compression != 1:
        raise TiffError(f"compression {compression} not supported "
                        "(uncompressed baseline only)")
    if 322 in tags or 323 in tags:
        raise TiffError("tiled TIFF not supported (stripped only)")
    if one(284, 1) != 1:
        raise TiffError("planar configuration 2 not supported")
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [1 if photometric in (0, 1) else 8])
    if len(set(bits)) != 1:
        raise TiffError("mixed bits-per-sample not supported")
    bps = bits[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing strip offsets/byte counts")
    rows_per_strip = one(278, height)

    if bps == 1 and photometric in (0, 1) and spp == 1:
        row_bytes = (width + 7) // 8
    elif bps == 8:
        row_bytes = width * spp
    else:
        raise TiffError(f"{bps}-bit samples not supported "
                        "(8-bit, or 1-bit bilevel)")

    rows = np.empty((height, row_bytes), dtype=np.uint8)
    y = 0
    for off, cnt in zip(offsets, counts):
        n_rows = min(rows_per_strip, height - y)
        need = n_rows * row_bytes
        if cnt < need or off + need > len(data):
            raise TiffError("truncated strip data")
        rows[y:y + n_rows] = np.frombuffer(
            data, dtype=np.uint8, count=need, offset=off
        ).reshape(n_rows, row_bytes)
        y += n_rows
    if y < height:
        raise TiffError("strips cover fewer rows than ImageLength")

    if bps == 1:
        bitsarr = np.unpackbits(rows, axis=1)[:, :width]
        img = (bitsarr * 255).astype(np.uint8)
        if photometric == 0:  # WhiteIsZero: 0 = white
            img = 255 - img
        return img
    if photometric in (0, 1):
        if spp != 1:
            raise TiffError("grayscale with extra samples not supported")
        img = rows.reshape(height, width)
        return (255 - img) if photometric == 0 else img.copy()
    if photometric == 2:
        if spp < 3:
            raise TiffError("RGB needs SamplesPerPixel >= 3")
        px = rows.reshape(height, width, spp)
        return np.ascontiguousarray(px[:, :, :3])  # drop alpha/extras
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * (1 << bps):
            raise TiffError("palette image without a full ColorMap")
        n = 1 << bps
        # ColorMap entries are 16-bit [0, 65535]: downscale via the
        # standard high-byte transform
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, n).T
               >> 8).astype(np.uint8)
        idx = rows.reshape(height, width)
        return pal[idx]
    raise TiffError(f"photometric interpretation {photometric} "
                    "not supported")
