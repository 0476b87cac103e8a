"""Pure-stdlib AVI (RIFF) container reader + writer for Motion-JPEG
video streams.

AVI is the classic MJPEG carrier (dashcams, CCTV exports, scientific
capture rigs). The container layer is the venerable RIFF layout:
``RIFF('AVI ') → LIST('hdrl')(avih, LIST('strl')(strh, strf)) →
LIST('movi')('##dc' frame chunks)``. The reader locates the first
``vids`` stream, takes timing from ``strh``'s dwScale/dwRate pair,
collects that stream's ``dc``/``db`` chunks from movi (recursively —
some muxers nest frames inside LIST('rec ') groups), and decodes each
through the in-repo JPEG codec (sources/jpeg.py), so AVI video is REAL
end-to-end. Non-MJPEG fourccs raise with the codec name.

``encode_avi_mjpeg`` writes a spec-conformant single-stream file
(avih/strh/strf + movi + idx1) for fixtures and the container-parity
oracle (q145).

Reference parity note: openpolicedata decodes no media; this exists
for the multimodal pipeline operators.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["AviError", "read_avi_video", "encode_avi_mjpeg",
           "looks_like_avi"]


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


def looks_like_avi(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"AVI ")


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end); chunks pad to even."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(f"chunk {fourcc!r} overruns its container")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)


def _lists(data: bytes, start: int, end: int, list_type: bytes):
    for fourcc, b, e in _chunks(data, start, end):
        if fourcc == b"LIST" and data[b:b + 4] == list_type:
            yield b + 4, e


_MJPEG_FOURCC = (b"MJPG", b"mjpg", b"jpeg", b"dmb1")


def read_avi_video(data: bytes) -> tuple[list["np.ndarray"], list[int]]:
    """Decode a Motion-JPEG AVI → (frames as (H, W, 3) uint8,
    per-frame delays in centiseconds) — the decode_video contract."""
    from openpolicedata_spark.sources.jpeg import decode_jpeg

    try:
        return _read(data, decode_jpeg)
    except (struct.error, IndexError) as e:
        raise AviError(f"malformed RIFF structure: {e}") from e


def _read(data, decode_jpeg):
    if not looks_like_avi(data):
        raise AviError("not AVI: bad RIFF signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    stream_no = None
    scale = rate = None
    handler = None
    idx = 0
    for hb, he in _lists(data, 12, end, b"hdrl"):
        for sb, se in _lists(data, hb, he, b"strl"):
            strh = next(((b, e) for f, b, e in _chunks(data, sb, se)
                         if f == b"strh"), None)
            if strh is None:
                raise AviError("strl LIST without a strh chunk")
            fcc_type = data[strh[0]:strh[0] + 4]
            if fcc_type == b"vids" and stream_no is None:
                stream_no = idx
                handler = data[strh[0] + 4:strh[0] + 8]
                scale, rate = struct.unpack_from("<II", data,
                                                 strh[0] + 20)
            idx += 1
    if stream_no is None:
        raise AviError("no video (vids) stream")
    if handler not in _MJPEG_FOURCC:
        raise AviError(
            f"codec {handler!r} needs a real video decoder (ffmpeg); "
            "only Motion-JPEG streams decode in-repo")
    if not rate:
        raise AviError("strh dwRate 0")
    delay_cs = round(100 * (scale or 1) / rate)

    prefix = b"%02d" % stream_no

    def collect(b: int, e: int, out: list) -> None:
        for fourcc, cb, ce in _chunks(data, b, e):
            if fourcc == b"LIST" and data[cb:cb + 4] == b"rec ":
                collect(cb + 4, ce, out)
            elif fourcc[:2] == prefix and fourcc[2:4] in (b"dc", b"db"):
                out.append(data[cb:ce])

    payloads: list[bytes] = []
    for mb, me in _lists(data, 12, end, b"movi"):
        collect(mb, me, payloads)
    if not payloads:
        raise AviError("movi list has no frames for the video stream")
    frames = []
    for p in payloads:
        img = decode_jpeg(p)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        frames.append(img)
    return frames, [delay_cs] * len(frames)


# --------------------------------------------------------------- writer

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(jpegs: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Write a single-stream Motion-JPEG AVI with an idx1 index."""
    if not jpegs:
        raise AviError("no frames")
    n = len(jpegs)
    avih = _chunk(b"avih", struct.pack(
        "<14I", round(1_000_000 / fps), 0, 0, 0x10, n, 0, 1,
        max(len(j) for j in jpegs), width, height, 0, 0, 0, 0))
    strh = _chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height))
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = bytearray(b"movi")
    offsets = []  # offsets of each frame chunk relative to 'movi'
    for j in jpegs:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", bytes(movi_body))

    idx_body = bytearray()
    for off, j in zip(offsets, jpegs):
        # AVIOLDINDEX: offset from the start of the 'movi' fourcc
        idx_body += b"00dc" + struct.pack("<III", 0x10, off, len(j))
    idx1 = _chunk(b"idx1", bytes(idx_body))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
