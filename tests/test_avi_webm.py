"""AVI (RIFF) and Matroska/WebM (EBML) Motion-JPEG container tests —
fixtures written HERE forward from the public layouts (RIFF chunk
framing + AVIMAINHEADER/AVISTREAMHEADER fields; EBML varints + the
registered Matroska element IDs), independent of the source writers.
The hand-built files exercise layouts the writers never emit:
rec-nested AVI frame groups, odd-size chunk padding, BlockGroup>Block
framing, multiple Clusters with relative timestamps, unknown-size
Segment/Cluster (live-mux convention)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.avi import (
    AviError,
    encode_avi_mjpeg,
    read_avi_video,
)
from openpolicedata_spark.sources.jpeg import encode_jpeg
from openpolicedata_spark.sources.webm import (
    WebmError,
    encode_webm_mjpeg,
    read_webm_video,
)

rng = np.random.default_rng(20260814)


def flat_frame() -> np.ndarray:
    tiles = rng.integers(0, 256, (2, 2), dtype=np.uint8)
    return tiles.repeat(8, 0).repeat(8, 1)


# ----------------------------------------------------- RIFF builders

def ck(fourcc: bytes, body: bytes) -> bytes:
    return fourcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def lst(list_type: bytes, body: bytes) -> bytes:
    return ck(b"LIST", list_type + body)


def strh(fcc_type: bytes, handler: bytes, scale: int, rate: int,
         n: int) -> bytes:
    return ck(b"strh", fcc_type + handler + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0, n, 0, 0, 0)
        + struct.pack("<4h", 0, 0, 16, 16))


def avi_file(streams: list[bytes], movi_body: bytes) -> bytes:
    avih = ck(b"avih", struct.pack("<14I", 100000, 0, 0, 0x10, 1, 0,
                                   len(streams), 0, 16, 16, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + b"".join(streams))
    body = b"AVI " + hdrl + ck(b"LIST", b"movi" + movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------ EBML builders

def eid(i: int) -> bytes:
    return i.to_bytes((i.bit_length() + 7) // 8, "big")


def esize(n: int, length: int | None = None) -> bytes:
    ln = length or 1
    while n >= (1 << (7 * ln)) - 1:
        ln += 1
    return ((1 << (7 * ln)) | n).to_bytes(ln, "big")


def el(i: int, body: bytes) -> bytes:
    return eid(i) + esize(len(body)) + body


def euint(i: int, v: int) -> bytes:
    return el(i, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def ebml_header() -> bytes:
    return el(0x1A45DFA3, el(0x4282, b"webm") + euint(0x4287, 2))


def track_entry(codec: bytes, number: int = 1) -> bytes:
    return el(0xAE, euint(0xD7, number) + euint(0x83, 1)
              + el(0x86, codec)
              + el(0xE0, euint(0xB0, 16) + euint(0xBA, 16)))


def simple_block(track: int, rel_ts: int, payload: bytes) -> bytes:
    return el(0xA3, bytes([0x80 | track])
              + struct.pack(">h", rel_ts) + b"\x80" + payload)


# -------------------------------------------------------- AVI tests

def test_avi_roundtrip_and_fps():
    frames = [flat_frame() for _ in range(4)]
    blob = encode_avi_mjpeg([encode_jpeg(f) for f in frames], 16, 16,
                            fps=20)
    out, delays = read_avi_video(blob)
    assert delays == [5, 5, 5, 5]
    for got, want in zip(out, frames):
        assert np.array_equal(got[..., 0], want)
        assert np.array_equal(got[..., 2], want)


def test_avi_rec_nested_frames_and_second_stream():
    """Frames wrapped in LIST('rec ') groups; an audio stream 0 makes
    the video stream number 01 — its '00wb' chunks must be ignored."""
    f1, f2 = flat_frame(), flat_frame()
    j1, j2 = encode_jpeg(f1), encode_jpeg(f2)
    audio = strh(b"auds", b"\x00\x00\x00\x00", 1, 8000, 2)
    video = strh(b"vids", b"MJPG", 1, 10, 2)
    movi = (ck(b"00wb", b"\x01\x02\x03")  # audio payload: skipped
            + lst(b"rec ", ck(b"01dc", j1))
            + ck(b"01dc", j2))
    blob = avi_file([lst(b"strl", audio + b"strf"),
                     lst(b"strl", video + b"strf")], movi)
    out, delays = read_avi_video(blob)
    assert len(out) == 2 and delays == [10, 10]
    assert np.array_equal(out[0][..., 0], f1)
    assert np.array_equal(out[1][..., 0], f2)


def test_avi_odd_size_chunk_padding():
    f = flat_frame()
    j = encode_jpeg(f)
    if len(j) % 2 == 0:
        j = j + b""  # JPEG EOI keeps it valid; force odd via a COM?
    # force an odd-length chunk by appending a junk byte the JPEG
    # decoder ignores after EOI
    j_odd = j + (b"\x00" if len(j) % 2 == 0 else b"")
    video = strh(b"vids", b"MJPG", 1, 10, 2)
    movi = ck(b"00dc", j_odd) + ck(b"00dc", j_odd)
    blob = avi_file([lst(b"strl", video + b"strf")], movi)
    out, _ = read_avi_video(blob)
    assert len(out) == 2
    assert np.array_equal(out[0][..., 0], f)


def test_avi_codec_gate_and_errors():
    video = strh(b"vids", b"H264", 1, 10, 1)
    blob = avi_file([lst(b"strl", video + b"strf")],
                    ck(b"00dc", b"\x00"))
    with pytest.raises(AviError, match="H264"):
        read_avi_video(blob)
    with pytest.raises(AviError, match="RIFF"):
        read_avi_video(b"RIFX" + bytes(20))
    with pytest.raises(AviError, match="no video"):
        read_avi_video(avi_file([], ck(b"00dc", b"\x00")))


def test_avi_truncation_and_junk_never_leak():
    from openpolicedata_spark.sources.jpeg import JpegError

    blob = encode_avi_mjpeg([encode_jpeg(flat_frame())], 16, 16)
    for cut in range(0, len(blob), 3):
        try:
            read_avi_video(blob[:cut])
        except (AviError, JpegError):
            pass
    for seed in range(30):
        r = np.random.default_rng(seed)
        junk = (b"RIFF" + struct.pack("<I", 120) + b"AVI "
                + bytes(r.integers(0, 256, size=112, dtype=np.uint8)))
        try:
            read_avi_video(junk)
        except (AviError, JpegError):
            pass


# ------------------------------------------------------- WebM tests

def test_webm_roundtrip_and_delays():
    frames = [flat_frame() for _ in range(3)]
    blob = encode_webm_mjpeg([encode_jpeg(f) for f in frames], 16, 16,
                             delta_ms=40)
    out, delays = read_webm_video(blob)
    assert delays == [4, 4, 4]
    for got, want in zip(out, frames):
        assert np.array_equal(got[..., 1], want)


def test_webm_blockgroup_multicluster_and_scale():
    """Two Clusters; second uses BlockGroup>Block; a custom
    TimestampScale of 2 ms ticks doubles the centisecond delays."""
    f1, f2 = flat_frame(), flat_frame()
    j1, j2 = encode_jpeg(f1), encode_jpeg(f2)
    info = el(0x1549A966, euint(0x2AD7B1, 2_000_000))
    tracks = el(0x1654AE6B, track_entry(b"V_MJPEG"))
    c1 = el(0x1F43B675, euint(0xE7, 0) + simple_block(1, 0, j1))
    block = el(0xA1, b"\x81" + struct.pack(">h", 0) + b"\x00" + j2)
    c2 = el(0x1F43B675, euint(0xE7, 50) + el(0xA0, block))
    blob = ebml_header() + el(0x18538067, info + tracks + c1 + c2)
    out, delays = read_webm_video(blob)
    assert len(out) == 2
    # 50 ticks * 2 ms = 100 ms = 10 cs; last frame repeats the spacing
    assert delays == [10, 10]
    assert np.array_equal(out[0][..., 0], f1)
    assert np.array_equal(out[1][..., 0], f2)


def test_webm_unknown_size_segment_and_cluster():
    """Live-mux convention: Segment and Cluster declare the all-ones
    unknown size and extend to the end of their container."""
    f = flat_frame()
    j = encode_jpeg(f)
    info = el(0x1549A966, euint(0x2AD7B1, 1_000_000))
    tracks = el(0x1654AE6B, track_entry(b"V_MJPEG"))
    cluster_body = euint(0xE7, 0) + simple_block(1, 0, j)
    cluster = eid(0x1F43B675) + b"\xff" + cluster_body
    segment = eid(0x18538067) + b"\xff" + info + tracks + cluster
    out, delays = read_webm_video(ebml_header() + segment)
    assert len(out) == 1 and delays == [0]
    assert np.array_equal(out[0][..., 0], f)


def test_webm_skips_other_tracks_and_gates_codecs():
    f = flat_frame()
    j = encode_jpeg(f)
    audio = el(0xAE, euint(0xD7, 1) + euint(0x83, 2)
               + el(0x86, b"A_OPUS"))
    video = track_entry(b"V_MJPEG", number=2)
    tracks = el(0x1654AE6B, audio + video)
    cluster = el(0x1F43B675, euint(0xE7, 0)
                 + simple_block(1, 0, b"\x00\x01")   # audio: skipped
                 + simple_block(2, 0, j))
    blob = ebml_header() + el(0x18538067,
                              el(0x1549A966, b"") + tracks + cluster)
    out, _ = read_webm_video(blob)
    assert len(out) == 1
    assert np.array_equal(out[0][..., 0], f)

    vp9 = el(0x1654AE6B, track_entry(b"V_VP9"))
    blob = ebml_header() + el(0x18538067, vp9 + cluster)
    with pytest.raises(WebmError, match="V_VP9"):
        read_webm_video(blob)


def test_webm_laced_blocks_raise():
    tracks = el(0x1654AE6B, track_entry(b"V_MJPEG"))
    laced = el(0xA3, b"\x81" + struct.pack(">h", 0) + b"\x06" + b"xx")
    blob = ebml_header() + el(0x18538067,
                              tracks + el(0x1F43B675, laced))
    with pytest.raises(WebmError, match="laced"):
        read_webm_video(blob)


def test_webm_truncation_and_junk_never_leak():
    from openpolicedata_spark.sources.jpeg import JpegError

    blob = encode_webm_mjpeg([encode_jpeg(flat_frame())], 16, 16)
    for cut in range(0, len(blob), 3):
        try:
            read_webm_video(blob[:cut])
        except (WebmError, JpegError):
            pass
    for seed in range(30):
        r = np.random.default_rng(seed)
        junk = b"\x1a\x45\xdf\xa3" + bytes(
            r.integers(0, 256, size=150, dtype=np.uint8))
        try:
            read_webm_video(junk)
        except (WebmError, JpegError):
            pass


# ------------------------------------------------------- dispatch

def test_decode_video_dispatch_all_containers():
    from openpolicedata_spark.operators.multimodal import decode_video

    f = flat_frame()
    j = encode_jpeg(f)
    for blob, mime in [
            (encode_avi_mjpeg([j], 16, 16), "video/avi"),
            (encode_webm_mjpeg([j], 16, 16), "video/webm")]:
        out, _ = decode_video(blob, mime)
        assert np.array_equal(out[0][..., 0], f), mime


def test_webm_unknown_size_cluster_followed_by_sibling():
    """Live-mux pattern: EVERY Cluster declares the unknown size. The
    spec ends an unknown-size Cluster at its first non-child element,
    so cluster 2 is a sibling — not swallowed content (regression:
    the old reader returned only cluster 1's frames)."""
    f1, f2 = flat_frame(), flat_frame()
    j1, j2 = encode_jpeg(f1), encode_jpeg(f2)
    tracks = el(0x1654AE6B, track_entry(b"V_MJPEG"))
    c1_body = euint(0xE7, 0) + simple_block(1, 0, j1)
    c2_body = euint(0xE7, 100) + simple_block(1, 0, j2)
    c1 = eid(0x1F43B675) + b"\xff" + c1_body
    c2 = eid(0x1F43B675) + b"\xff" + c2_body
    segment = eid(0x18538067) + b"\xff" + tracks + c1 + c2
    out, delays = read_webm_video(ebml_header() + segment)
    assert len(out) == 2, len(out)
    assert delays == [10, 10]
    assert np.array_equal(out[0][..., 0], f1)
    assert np.array_equal(out[1][..., 0], f2)


def test_webm_encoder_splits_clusters_for_long_clips():
    """>327 frames at delta_ms=100 would overflow the int16 relative
    block timestamp — the writer must start new Clusters instead
    (regression: struct.error)."""
    f = flat_frame()
    j = encode_jpeg(f)
    blob = encode_webm_mjpeg([j] * 400, 32, 32, delta_ms=100)
    out, delays = read_webm_video(blob)
    assert len(out) == 400
    assert delays == [10] * 400
