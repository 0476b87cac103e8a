"""Pure-stdlib Matroska/WebM (EBML) container reader + writer for
Motion-JPEG video tracks.

EBML is a binary XML: every element is (varint id, varint size, body).
The reader walks Segment → Info (TimestampScale), Tracks (first
TrackType=1 entry: TrackNumber, CodecID, Video dims), and Clusters
(Timestamp + SimpleBlock / BlockGroup>Block), decoding each frame
payload of a ``V_MJPEG`` track through the in-repo JPEG codec
(sources/jpeg.py). Other codec ids (V_VP8/V_VP9/V_AV1…) raise with
the codec name — the documented inter-frame-codec gate. Laced blocks
raise clearly (the writer never emits lacing).

Per-frame delays come from consecutive block timestamps × the segment
TimestampScale (default 1,000,000 ns = 1 ms ticks); the final frame
reuses the previous spacing.

``encode_webm_mjpeg`` writes a minimal conformant file (EBML header
with DocType webm, Segment with Info/Tracks/one Cluster of keyframe
SimpleBlocks) for fixtures and the container-parity oracle (q145).

Reference parity note: openpolicedata decodes no media; this exists
for the multimodal pipeline operators.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WebmError", "read_webm_video", "encode_webm_mjpeg",
           "looks_like_webm"]


class WebmError(ValueError):
    """Malformed or unsupported Matroska/WebM payload."""


_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1


def looks_like_webm(data: bytes) -> bool:
    return data[:4] == b"\x1a\x45\xdf\xa3"


def _varint(data: bytes, pos: int,
            strip_marker: bool) -> tuple[int, int, int]:
    """EBML varint at pos → (value, next_pos, byte_length). Element
    IDs keep the length-marker bit; sizes strip it."""
    if pos >= len(data):
        raise WebmError("truncated varint")
    b0 = data[pos]
    if b0 == 0:
        raise WebmError("invalid varint lead byte 0")
    n = 9 - b0.bit_length()          # leading zeros + 1 = total bytes
    if pos + n > len(data):
        raise WebmError("truncated varint body")
    v = b0 if not strip_marker else b0 & (0xFF >> n)
    for i in range(1, n):
        v = (v << 8) | data[pos + i]
    return v, pos + n, n


# children a Cluster may contain ([Matroska]): an unknown-size Cluster
# ends at the first element that is NOT one of these (typically the
# next Cluster) — the spec's "first non-child element" rule
_CLUSTER_CHILDREN = frozenset({0xE7, 0xA3, 0xA0, 0xA7, 0xAB, 0x5854,
                               0xBF, 0xEC})  # + CRC-32, Void


def _cluster_end(data: bytes, start: int, end: int) -> int:
    """End offset of an unknown-size Cluster: walk its (known-size)
    children until an id outside the Cluster child set appears."""
    pos = start
    while pos < end:
        eid, p2, _ = _varint(data, pos, strip_marker=False)
        if eid not in _CLUSTER_CHILDREN:
            return pos
        size, p2, slen = _varint(data, p2, strip_marker=True)
        if size == (1 << (7 * slen)) - 1:
            raise WebmError("unknown-size element inside a Cluster")
        if p2 + size > end:
            raise WebmError("Cluster child overruns the Segment")
        pos = p2 + size
    return end


def _elements(data: bytes, start: int, end: int):
    """Yield (id, body_start, body_end) for the elements in a span.
    An "unknown size" (all value bits set — the live-mux convention)
    extends to the end of the container span, EXCEPT an unknown-size
    Cluster, which per the spec ends at its first non-child element
    (so a following Cluster is a sibling, not swallowed content)."""
    pos = start
    while pos < end:
        eid, pos, _ = _varint(data, pos, strip_marker=False)
        size, pos, slen = _varint(data, pos, strip_marker=True)
        if size == (1 << (7 * slen)) - 1:
            body_end = _cluster_end(data, pos, end) \
                if eid == _CLUSTER else end
        else:
            body_end = pos + size
        if body_end > end:
            raise WebmError(f"element 0x{eid:X} overruns its container")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


def _find(data: bytes, start: int, end: int, eid: int):
    for i, b, e in _elements(data, start, end):
        if i == eid:
            return b, e
    return None


def read_webm_video(data: bytes) -> tuple[list["np.ndarray"], list[int]]:
    """Decode a Motion-JPEG Matroska/WebM → (frames as (H, W, 3)
    uint8, per-frame delays in centiseconds)."""
    from openpolicedata_spark.sources.jpeg import decode_jpeg

    try:
        return _read(data, decode_jpeg)
    except (struct.error, IndexError) as e:
        raise WebmError(f"malformed EBML structure: {e}") from e


def _read(data, decode_jpeg):
    if not looks_like_webm(data):
        raise WebmError("not EBML: bad magic")
    seg = None
    for eid, b, e in _elements(data, 0, len(data)):
        if eid == _SEGMENT:
            seg = (b, e)
            break
        if eid != _EBML:
            raise WebmError(f"unexpected top-level element 0x{eid:X}")
    if seg is None:
        raise WebmError("no Segment element")

    scale_ns = 1_000_000
    track_no = None
    codec = None
    info = _find(data, *seg, _INFO)
    if info is not None:
        ts = _find(data, *info, _TIMESTAMP_SCALE)
        if ts is not None:
            scale_ns = _uint(data, *ts)
    tracks = _find(data, *seg, _TRACKS)
    if tracks is None:
        raise WebmError("no Tracks element")
    for eid, b, e in _elements(data, *tracks):
        if eid != _TRACK_ENTRY:
            continue
        tt = _find(data, b, e, _TRACK_TYPE)
        if tt is None or _uint(data, *tt) != 1:
            continue
        tn = _find(data, b, e, _TRACK_NUMBER)
        cid = _find(data, b, e, _CODEC_ID)
        if tn is None or cid is None:
            raise WebmError("video TrackEntry missing number/codec")
        track_no = _uint(data, *tn)
        codec = data[cid[0]:cid[1]].rstrip(b"\x00").decode("latin-1")
        break
    if track_no is None:
        raise WebmError("no video track")
    if codec != "V_MJPEG":
        raise WebmError(
            f"codec {codec!r} needs a real video decoder (ffmpeg); "
            "only V_MJPEG tracks decode in-repo")

    stamped: list[tuple[int, bytes]] = []

    def block(b: int, e: int, cluster_ts: int) -> None:
        tn, p, _ = _varint(data, b, strip_marker=True)
        if tn != track_no:
            return
        if p + 3 > e:
            raise WebmError("truncated block header")
        (rel,) = struct.unpack_from(">h", data, p)
        flags = data[p + 2]
        if flags & 0x06:
            raise WebmError("laced blocks not supported")
        stamped.append((cluster_ts + rel, data[p + 3:e]))

    for eid, b, e in _elements(data, *seg, ):
        if eid != _CLUSTER:
            continue
        cluster_ts = 0
        ts = _find(data, b, e, _TIMESTAMP)
        if ts is not None:
            cluster_ts = _uint(data, *ts)
        for eid2, b2, e2 in _elements(data, b, e):
            if eid2 == _SIMPLE_BLOCK:
                block(b2, e2, cluster_ts)
            elif eid2 == _BLOCK_GROUP:
                blk = _find(data, b2, e2, _BLOCK)
                if blk is not None:
                    block(blk[0], blk[1], cluster_ts)
    if not stamped:
        raise WebmError("no frames for the video track")

    stamped.sort(key=lambda t: t[0])
    frames = []
    for _, payload in stamped:
        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        frames.append(img)
    delays = []
    for i in range(len(stamped) - 1):
        dt_ticks = stamped[i + 1][0] - stamped[i][0]
        delays.append(round(dt_ticks * scale_ns / 10_000_000))
    delays.append(delays[-1] if delays else 0)
    return frames, delays


# --------------------------------------------------------------- writer

def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise WebmError("size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_webm_mjpeg(jpegs: list[bytes], width: int, height: int,
                      delta_ms: int = 100) -> bytes:
    """Write a single-track V_MJPEG Matroska file: one Cluster at
    timestamp 0, one keyframe SimpleBlock per frame at i*delta_ms
    (1 ms ticks via the default TimestampScale)."""
    if not jpegs:
        raise WebmError("no frames")
    header = _el(_EBML,
                 _el_uint(0x4286, 1)        # EBMLVersion
                 + _el_uint(0x42F7, 1)      # EBMLReadVersion
                 + _el_uint(0x42F2, 4)      # EBMLMaxIDLength
                 + _el_uint(0x42F3, 8)      # EBMLMaxSizeLength
                 + _el(0x4282, b"matroska")  # DocType
                 + _el_uint(0x4287, 2)      # DocTypeVersion
                 + _el_uint(0x4285, 2))     # DocTypeReadVersion
    info = _el(_INFO, _el_uint(_TIMESTAMP_SCALE, 1_000_000))
    video = _el(_VIDEO, _el_uint(_PIXEL_WIDTH, width)
                + _el_uint(_PIXEL_HEIGHT, height))
    entry = _el(_TRACK_ENTRY,
                _el_uint(_TRACK_NUMBER, 1)
                + _el_uint(0x73C5, 1)       # TrackUID
                + _el_uint(_TRACK_TYPE, 1)
                + _el(_CODEC_ID, b"V_MJPEG")
                + video)
    tracks = _el(_TRACKS, entry)
    # SimpleBlock timestamps are int16 RELATIVE to their Cluster: start
    # a new Cluster (absolute Timestamp) before the offset overflows
    per_cluster = max(1, 0x7FFF // max(delta_ms, 1))
    clusters = b""
    for c0 in range(0, len(jpegs), per_cluster):
        base_ms = c0 * delta_ms
        blocks = bytearray(_el_uint(_TIMESTAMP, base_ms))
        for i, j in enumerate(jpegs[c0:c0 + per_cluster]):
            body = (b"\x81" + struct.pack(">h", i * delta_ms)
                    + b"\x80" + j)
            blocks += _el(_SIMPLE_BLOCK, body)
        clusters += _el(_CLUSTER, bytes(blocks))
    segment = _el(_SEGMENT, info + tracks + clusters)
    return header + segment
