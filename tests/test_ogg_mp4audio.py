"""Ogg container (RFC 3533) + MP4 audio-track tests — fixtures written
HERE forward from the public layouts (Ogg page header fields, the
xiph Ogg-FLAC mapping, AudioSampleEntry offsets, the dfLa
FLACSpecificBox), independent of the source writers. Hand-built
streams exercise paths the writers never emit: packets spanning pages
(continuation flag + 255 lacing chains), multiplexed serials, CRC
corruption, unknown header counts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.flac import encode_flac_parts
from openpolicedata_spark.sources.mp4 import (
    Mp4Error,
    encode_mp4_audio,
    parse_mp4_audio_track,
    read_mp4_audio,
)
from openpolicedata_spark.sources.ogg import (
    OggError,
    encode_ogg_flac,
    read_ogg_audio,
)

rng = np.random.default_rng(20260814)


# ---------------------------------------------- spec-literal Ogg pages

def ogg_crc(data: bytes) -> int:
    """CRC-32, poly 0x04C11DB7, init 0, no reflection (bitwise)."""
    r = 0
    for b in data:
        r ^= b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
    return r


def page(serial: int, seq: int, lacing: list[int], body: bytes,
         htype: int = 0, granule: int = 0) -> bytes:
    hdr = (b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule, serial,
                                 seq, 0, len(lacing)) + bytes(lacing))
    crc = ogg_crc(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def flac_first_packet(samples: np.ndarray, rate: int,
                      nheaders: int = 0) -> tuple[bytes, list[bytes]]:
    info, frames = encode_flac_parts(samples, rate, 16)
    return (b"\x7fFLAC\x01\x00" + struct.pack(">H", nheaders)
            + b"fLaC" + info), frames


def lacing_for(n: int) -> list[int]:
    out = [255] * (n // 255)
    out.append(n % 255)
    return out


# -------------------------------------------------------- Ogg roundtrip

@pytest.mark.parametrize("n", [100, 4096, 9001])
def test_ogg_flac_roundtrip(n):
    a = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    rate, bps, out = read_ogg_audio(encode_ogg_flac(a, 16000))
    assert (rate, bps) == (16000, 16)
    assert np.array_equal(out[:, 0], a)


def test_ogg_flac_stereo_dispatch():
    from openpolicedata_spark.operators.multimodal import decode_audio

    a = rng.integers(-3000, 3000, size=(5000, 2), dtype=np.int16)
    rate, norm = decode_audio(encode_ogg_flac(a, 22050), "audio/ogg")
    assert rate == 22050
    assert np.array_equal(np.rint(norm * 32768).astype(np.int16), a)


# -------------------------------------------- hand-built page layouts

def test_packet_spanning_pages_with_255_chain():
    """A FLAC frame split across two pages: first page ends with 255
    lacing values (packet open), second carries the continuation
    flag."""
    a = rng.integers(-32768, 32768, size=600, dtype=np.int16)
    first, frames = flac_first_packet(a, 8000)
    (frame,) = frames
    cut = 255 * (len(frame) // 510 + 1)
    cut = min(cut, len(frame) - 1)
    cut -= cut % 255 or 255  # ensure the first part is a 255-multiple
    if cut <= 0:
        cut = 255 if len(frame) > 255 else 0
    part1, part2 = frame[:cut], frame[cut:]
    blob = page(7, 0, lacing_for(len(first)), first, htype=0x02)
    if part1:
        blob += page(7, 1, [255] * (len(part1) // 255), part1)
        blob += page(7, 2, lacing_for(len(part2)), part2,
                     htype=0x04 | 0x01, granule=600)
    else:
        blob += page(7, 1, lacing_for(len(part2)), part2,
                     htype=0x04, granule=600)
    rate, bps, out = read_ogg_audio(blob)
    assert np.array_equal(out[:, 0], a)


def test_ogg_skips_foreign_serial_and_unknown_nheaders():
    """A second logical stream interleaves; the FLAC stream (with a
    VorbisComment header packet and nheaders=0 'unknown') still
    reconstructs — non-frame packets are filtered by the 0xFF sync."""
    a = rng.integers(-100, 100, size=300, dtype=np.int16)
    first, frames = flac_first_packet(a, 8000, nheaders=0)
    comment = bytes([0x04]) + (30).to_bytes(3, "big") + bytes(30)
    other = b"\x01vorbis" + bytes(20)
    blob = (page(9, 0, lacing_for(len(other)), other, htype=0x02)
            + page(7, 0, lacing_for(len(first)), first, htype=0x02)
            + page(7, 1, lacing_for(len(comment)), comment)
            + page(9, 1, lacing_for(4), b"\x00\x01\x02\x03")
            + page(7, 2, lacing_for(len(frames[0])), frames[0],
                   htype=0x04, granule=300))
    rate, bps, out = read_ogg_audio(blob)
    assert np.array_equal(out[:, 0], a)


def test_ogg_vorbis_and_opus_gate_by_name():
    v = b"\x01vorbis" + bytes(23)
    blob = page(5, 0, lacing_for(len(v)), v, htype=0x02)
    with pytest.raises(OggError, match="vorbis"):
        read_ogg_audio(blob)
    o = b"OpusHead" + bytes(11)
    blob = page(5, 0, lacing_for(len(o)), o, htype=0x02)
    with pytest.raises(OggError, match="opus"):
        read_ogg_audio(blob)


def test_ogg_crc_and_sync_errors():
    a = rng.integers(-100, 100, size=64, dtype=np.int16)
    blob = bytearray(encode_ogg_flac(a, 8000))
    blob[30] ^= 0xFF  # inside the first page body/header
    with pytest.raises(OggError):
        read_ogg_audio(bytes(blob))
    with pytest.raises(OggError, match="capture"):
        read_ogg_audio(b"Oggs wrong")


def test_ogg_truncation_and_junk_never_leak():
    from openpolicedata_spark.sources.flac import FlacError

    a = rng.integers(-3000, 3000, size=5000, dtype=np.int16)
    blob = encode_ogg_flac(a, 8000)
    for cut in range(0, len(blob), 7):
        try:
            read_ogg_audio(blob[:cut])
        except (OggError, FlacError):
            pass
    for seed in range(30):
        r = np.random.default_rng(seed)
        junk = b"OggS" + bytes(r.integers(0, 256, 150, dtype=np.uint8))
        try:
            read_ogg_audio(junk)
        except (OggError, FlacError):
            pass


# ------------------------------------------------------- MP4 audio

@pytest.mark.parametrize("codec", ["sowt", "twos", "fLaC"])
def test_mp4_audio_roundtrip(codec):
    a = rng.integers(-32768, 32768, size=(9000, 2), dtype=np.int16)
    blob = encode_mp4_audio(a, 16000, codec=codec)
    rate, bps, out = read_mp4_audio(blob)
    assert (rate, bps) == (16000, 16)
    assert np.array_equal(out, a)


def test_mp4_audio_track_metadata_and_dispatch():
    from openpolicedata_spark.operators.multimodal import decode_audio

    a = rng.integers(-500, 500, size=4500, dtype=np.int16)
    blob = encode_mp4_audio(a, 8000, codec="fLaC")
    tr = parse_mp4_audio_track(blob)
    assert tr["codec"] == "fLaC" and tr["channels"] == 1
    assert tr["dfla"] is not None
    rate, norm = decode_audio(blob, "audio/mp4")
    assert rate == 8000
    assert np.array_equal(np.rint(norm[:, 0] * 32768).astype(np.int16),
                          a)


def test_mp4_audio_aac_gates_by_name():
    # swap the sample-entry fourcc of a valid PCM file to mp4a
    a = rng.integers(-100, 100, size=100, dtype=np.int16)
    blob = encode_mp4_audio(a, 8000, codec="sowt")
    patched = blob.replace(b"sowt", b"mp4a")
    with pytest.raises(Mp4Error, match="mp4a"):
        read_mp4_audio(patched)


def test_mp4_raw_uint8_offset_binary():
    """Hand-patch a 'raw ' entry: uint8 samples are offset-binary."""
    a = rng.integers(-128, 128, size=64, dtype=np.int32)
    # encode as sowt then swap payload+entry for raw u8
    pcm = (a + 128).astype(np.uint8).tobytes()
    blob = encode_mp4_audio(np.zeros(64, dtype=np.int16), 8000,
                            codec="sowt")
    # replace mdat payload (64 int16 zeros = 128 bytes) with 64 u8 + pad
    zeros = np.zeros(64, dtype="<i2").tobytes()
    assert zeros in blob
    patched = blob.replace(zeros, pcm + bytes(64))
    patched = patched.replace(b"sowt", b"raw ")
    # stsz says 128 bytes -> 128 u8 mono samples; check the first 64
    rate, bps, out = read_mp4_audio(patched)
    assert bps == 8
    assert np.array_equal(out[:64, 0], a)


def test_mp4_audio_truncation_never_leaks():
    from openpolicedata_spark.sources.flac import FlacError

    blob = encode_mp4_audio(
        rng.integers(-100, 100, size=600, dtype=np.int16), 8000,
        codec="fLaC")
    for cut in range(0, len(blob), 5):
        try:
            read_mp4_audio(blob[:cut])
        except (Mp4Error, FlacError):
            pass
