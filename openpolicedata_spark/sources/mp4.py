"""Pure-stdlib ISO BMFF (MP4 / QuickTime MOV) container reader +
writer for Motion-JPEG video tracks.

The container layer is codec-agnostic sample plumbing (ISO/IEC
14496-12): box walk, track selection via ``hdlr`` = 'vide', and the
sample-table math — ``stts`` (decode deltas), ``stsc``
(samples-per-chunk runs), ``stsz`` (sizes), ``stco``/``co64`` (chunk
offsets) — that turns table rows into absolute (offset, size, delta)
triples. ``read_mp4_video`` then decodes each sample payload:

- codec '``jpeg``' / '``mjpa``' (Motion-JPEG): every sample is a
  standalone baseline/progressive JPEG — decoded frame-by-frame with
  the in-repo sources/jpeg.py, so MP4 video is REAL end-to-end with
  no new entropy code.
- anything else ('avc1'/'hev1'/'vp09'/'av01'…) raises with the codec
  name — the documented gate (an H.264+ decoder is out of scope).

``encode_mp4_mjpeg`` writes a spec-conformant single-track file
(ftyp isom, mdat of JPEG samples, moov with mvhd/tkhd/mdia/minf/stbl,
one sample per chunk) for fixtures and the q144 oracle.

64-bit ``largesize`` boxes and ``co64`` offsets are handled; only the
first video track is decoded. Timestamps convert through the ``mdhd``
timescale.

Reference parity note: openpolicedata decodes no media; this exists
for the multimodal pipeline operators (frame sampling / video dedup)
to run on real container bytes.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["Mp4Error", "parse_mp4_video_track", "read_mp4_video",
           "encode_mp4_mjpeg", "looks_like_mp4"]


class Mp4Error(ValueError):
    """Malformed or unsupported MP4/MOV payload."""


def looks_like_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in a span."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"box {btype!r} overruns its container")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full(data: bytes, pos: int) -> tuple[int, int]:
    """FullBox header → (version, body offset after version+flags)."""
    if pos + 4 > len(data):
        raise Mp4Error("truncated FullBox header")
    return data[pos], pos + 4


def parse_mp4_video_track(data: bytes) -> dict:
    """First 'vide' track → {codec, width, height, timescale,
    samples: [(offset, size, delta), ...]}. Declared-length lies
    (table counts past the real bytes) surface as Mp4Error, never raw
    struct.error/IndexError."""
    try:
        return _parse_video_track(data)
    except (struct.error, IndexError) as e:
        raise Mp4Error(f"malformed box structure: {e}") from e


def _parse_video_track(data: bytes) -> dict:
    if not looks_like_mp4(data):
        raise Mp4Error("not ISO BMFF: no ftyp box")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4Error("no moov box")
    for t, b, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None:
            continue
        _, hb = _full(data, hdlr[0])
        if data[hb + 4:hb + 8] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is None:
            raise Mp4Error("video track missing mdhd")
        ver, mb = _full(data, mdhd[0])
        timescale = struct.unpack_from(
            ">I", data, mb + (16 if ver == 1 else 8))[0]
        if timescale == 0:
            raise Mp4Error("mdhd timescale 0")
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise Mp4Error("video track missing stbl")
        return _parse_stbl(data, stbl[0], stbl[1], timescale)
    raise Mp4Error("no video track")


def _parse_stbl(data: bytes, b: int, e: int, timescale: int) -> dict:
    stsd = _find(data, b, e, b"stsd")
    if stsd is None:
        raise Mp4Error("missing stsd")
    _, p = _full(data, stsd[0])
    (n_desc,) = struct.unpack_from(">I", data, p)
    if n_desc < 1:
        raise Mp4Error("empty stsd")
    entry = p + 4
    (esize,) = struct.unpack_from(">I", data, entry)
    codec = data[entry + 4:entry + 8].decode("latin-1")
    # VisualSampleEntry: 6 reserved + 2 dref idx + 16 pre_defined/
    # reserved + width(2) + height(2)
    width, height = struct.unpack_from(">HH", data, entry + 32)

    def table(btype: bytes, required: bool = True):
        box = _find(data, b, e, btype)
        if box is None:
            if required:
                raise Mp4Error(f"missing {btype.decode()}")
            return None
        return box

    ver, p = _full(data, table(b"stts")[0])
    (n_stts,) = struct.unpack_from(">I", data, p)
    stts = [struct.unpack_from(">II", data, p + 4 + 8 * i)
            for i in range(n_stts)]

    _, p = _full(data, table(b"stsz")[0])
    fixed_size, n_samples = struct.unpack_from(">II", data, p)
    if fixed_size:
        sizes = [fixed_size] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, p + 8))

    _, p = _full(data, table(b"stsc")[0])
    (n_stsc,) = struct.unpack_from(">I", data, p)
    stsc = [struct.unpack_from(">III", data, p + 4 + 12 * i)
            for i in range(n_stsc)]
    if not stsc:
        raise Mp4Error("empty stsc")

    co = _find(data, b, e, b"stco")
    if co is not None:
        _, p = _full(data, co[0])
        (n_chunks,) = struct.unpack_from(">I", data, p)
        offsets = list(struct.unpack_from(f">{n_chunks}I", data, p + 4))
    else:
        co = _find(data, b, e, b"co64")
        if co is None:
            raise Mp4Error("missing stco/co64")
        _, p = _full(data, co[0])
        (n_chunks,) = struct.unpack_from(">I", data, p)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", data, p + 4))

    # expand stsc runs → samples-per-chunk for every chunk
    spc = []
    for i, (first, per, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        if first < 1 or first > last + 1:
            raise Mp4Error("bad stsc chunk run")
        spc.extend([per] * (last - first + 1))
    if len(spc) != n_chunks:
        raise Mp4Error("stsc runs do not cover the chunk list")

    # expand stts runs → per-sample deltas
    deltas = []
    for count, delta in stts:
        deltas.extend([delta] * count)
    if len(deltas) != n_samples:
        raise Mp4Error("stts does not cover the sample list")

    samples = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(spc[ci]):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(data):
                raise Mp4Error("sample overruns file")
            samples.append((off, size, deltas[si]))
            off += size
            si += 1
    if si != n_samples:
        raise Mp4Error("chunk layout does not cover every sample")
    return {"codec": codec, "width": width, "height": height,
            "timescale": timescale, "samples": samples}


_MJPEG_CODECS = ("jpeg", "mjpa", "MJPG")


def read_mp4_video(data: bytes) -> tuple[list["np.ndarray"], list[int]]:
    """Decode a Motion-JPEG MP4/MOV → (frames as (H, W, 3) uint8,
    per-frame delays in centiseconds) — the decode_video contract."""
    from openpolicedata_spark.sources.jpeg import decode_jpeg

    track = parse_mp4_video_track(data)
    if track["codec"] not in _MJPEG_CODECS:
        raise Mp4Error(
            f"codec {track['codec']!r} needs a real video decoder "
            "(ffmpeg); only Motion-JPEG tracks decode in-repo")
    frames = []
    delays = []
    ts = track["timescale"]
    for off, size, delta in track["samples"]:
        img = decode_jpeg(data[off:off + size])
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        frames.append(img)
        delays.append(round(delta * 100 / ts))
    if not frames:
        raise Mp4Error("video track has no samples")
    return frames, delays


# --------------------------------------------------------------- writer

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _fullbox(btype: bytes, body: bytes, version: int = 0,
             flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


_IDENTITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)


def encode_mp4_mjpeg(jpegs: list[bytes], width: int, height: int,
                     timescale: int = 600,
                     delta: int = 60) -> bytes:
    """Write a single-video-track Motion-JPEG MP4: one chunk per
    sample, constant frame duration `delta` (in `timescale` units)."""
    if not jpegs:
        raise Mp4Error("no samples")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2" + b"mp41")
    mdat_body = b"".join(jpegs)
    # sample offsets are absolute: ftyp + mdat header precede the data
    base = len(ftyp) + 8
    offsets = []
    pos = base
    for j in jpegs:
        offsets.append(pos)
        pos += len(j)
    n = len(jpegs)
    duration = n * delta

    stsd_entry = (struct.pack(">I", 86 + 8) + b"jpeg"
                  + bytes(6) + struct.pack(">H", 1)
                  + bytes(16)
                  + struct.pack(">HH", width, height)
                  + struct.pack(">II", 0x480000, 0x480000)
                  + bytes(4) + struct.pack(">H", 1)
                  + bytes(32)
                  + struct.pack(">Hh", 24, -1))
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + stsd_entry)
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _fullbox(b"stsz", struct.pack(">II", 0, n)
                    + struct.pack(f">{n}I", *[len(j) for j in jpegs]))
    stco = _fullbox(b"stco", struct.pack(">I", n)
                    + struct.pack(f">{n}I", *offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _fullbox(b"dref", struct.pack(">I", 1)
                    + _fullbox(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide"
                    + bytes(12) + b"Motion-JPEG\x00")
    mdhd = _fullbox(b"mdhd", struct.pack(">IIII", 0, 0, timescale,
                                         duration)
                    + struct.pack(">HH", 0x55C4, 0))  # 'und' language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fullbox(b"tkhd", struct.pack(">IIII", 0, 0, 1, 0)
                    + struct.pack(">I", duration) + bytes(8)
                    + struct.pack(">HHHH", 0, 0, 0, 0)
                    + _IDENTITY_MATRIX
                    + struct.pack(">II", width << 16, height << 16),
                    flags=7)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fullbox(b"mvhd", struct.pack(">IIII", 0, 0, timescale,
                                         duration)
                    + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                    + bytes(8) + _IDENTITY_MATRIX + bytes(24)
                    + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
