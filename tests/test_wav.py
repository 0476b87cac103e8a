"""WAV codec tests — fixtures are built HERE, forward from the RIFF/WAVE
spec literals (chunk layout, fmt fields, EXTENSIBLE GUIDs), independent
of sources/wav.py's encoder (the test_png.py/test_jpeg.py discipline).
Reference analog: openpolicedata loaders parse real file bytes end to
end (data_loaders.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.wav import (
    WavError,
    encode_wav,
    read_wav,
)

rng = np.random.default_rng(20260814)


def riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"  # word alignment pad, excluded from the size
    return out


def fmt_chunk(wtag: int, nch: int, rate: int, bits: int,
              extensible_sub: bytes | None = None) -> bytes:
    block = (bits // 8) * nch
    base = struct.pack("<HHIIHH", 0xFFFE if extensible_sub else wtag,
                       nch, rate, rate * block, block, bits)
    if extensible_sub:
        # cbSize=22, wValidBitsPerSample, dwChannelMask, SubFormat GUID
        base += struct.pack("<HHI", 22, bits, 0) + extensible_sub
    return chunk(b"fmt ", base)


# GUIDs typed from the mmreg.h spec literal:
# {00000001-0000-0010-8000-00AA00389B71} / {00000003-...}
PCM_GUID = struct.pack("<IHH", 1, 0, 0x0010) + \
    bytes([0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])
FLOAT_GUID = struct.pack("<IHH", 3, 0, 0x0010) + \
    bytes([0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])


def test_pcm16_mono():
    samples = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    blob = riff(fmt_chunk(1, 1, 16000, 16),
                chunk(b"data", samples.astype("<i2").tobytes()))
    rate, out = read_wav(blob)
    assert rate == 16000 and out.shape == (300, 1)
    assert np.array_equal(out[:, 0], samples)


def test_pcm16_stereo_interleave():
    left = np.arange(100, dtype=np.int16)
    right = -np.arange(100, dtype=np.int16)
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    blob = riff(fmt_chunk(1, 2, 44100, 16), chunk(b"data", inter.tobytes()))
    rate, out = read_wav(blob)
    assert out.shape == (100, 2)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def test_pcm8_unsigned():
    samples = rng.integers(0, 256, size=64, dtype=np.uint8)
    blob = riff(fmt_chunk(1, 1, 8000, 8), chunk(b"data", samples.tobytes()))
    _, out = read_wav(blob)
    assert out.dtype == np.uint8
    assert np.array_equal(out[:, 0], samples)


def test_pcm24_sign_extension():
    # hand-built 3-byte little-endian samples incl. negative values
    vals = [0, 1, -1, 8388607, -8388608, 70000, -70000]
    payload = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    blob = riff(fmt_chunk(1, 1, 22050, 24), chunk(b"data", payload))
    _, out = read_wav(blob)
    assert out.dtype == np.int32
    assert out[:, 0].tolist() == vals


def test_pcm32():
    samples = rng.integers(-2**31, 2**31, size=50, dtype=np.int64) \
        .astype("<i4")
    blob = riff(fmt_chunk(1, 1, 48000, 32), chunk(b"data", samples.tobytes()))
    _, out = read_wav(blob)
    assert np.array_equal(out[:, 0], samples)


def test_float32_and_float64():
    f32 = rng.uniform(-1, 1, size=40).astype("<f4")
    blob = riff(fmt_chunk(3, 1, 16000, 32), chunk(b"data", f32.tobytes()))
    _, out = read_wav(blob)
    assert out.dtype == np.float32 and np.array_equal(out[:, 0], f32)
    f64 = rng.uniform(-1, 1, size=40).astype("<f8")
    blob = riff(fmt_chunk(3, 1, 16000, 64), chunk(b"data", f64.tobytes()))
    _, out = read_wav(blob)
    assert out.dtype == np.float64 and np.array_equal(out[:, 0], f64)


def test_extensible_pcm_and_float():
    s = rng.integers(-1000, 1000, size=20, dtype=np.int16)
    blob = riff(fmt_chunk(0, 1, 16000, 16, extensible_sub=PCM_GUID),
                chunk(b"data", s.astype("<i2").tobytes()))
    _, out = read_wav(blob)
    assert np.array_equal(out[:, 0], s)
    f = rng.uniform(-1, 1, size=20).astype("<f4")
    blob = riff(fmt_chunk(0, 1, 16000, 32, extensible_sub=FLOAT_GUID),
                chunk(b"data", f.tobytes()))
    _, out = read_wav(blob)
    assert np.array_equal(out[:, 0], f)


def test_unknown_chunks_skipped_and_odd_padding():
    s = np.array([5, -5, 7], dtype=np.int16)
    blob = riff(
        chunk(b"JUNK", b"\x01\x02\x03"),           # odd length → padded
        fmt_chunk(1, 1, 16000, 16),
        chunk(b"LIST", b"INFOIART" + struct.pack("<I", 3) + b"me\x00"),
        chunk(b"data", s.astype("<i2").tobytes()),
        chunk(b"cue ", b"\x00" * 4),
    )
    rate, out = read_wav(blob)
    assert rate == 16000 and np.array_equal(out[:, 0], s)


def test_truncated_data_clips_to_whole_frames():
    s = np.array([1, 2, 3], dtype=np.int16)
    payload = s.astype("<i2").tobytes() + b"\x7f"  # half a sample extra
    blob = riff(fmt_chunk(1, 1, 16000, 16), chunk(b"data", payload))
    _, out = read_wav(blob)
    assert np.array_equal(out[:, 0], s)


def test_errors():
    with pytest.raises(WavError, match="RIFF"):
        read_wav(b"OggS junk")
    with pytest.raises(WavError, match="no fmt"):
        read_wav(riff(chunk(b"data", b"\x00\x00")))
    with pytest.raises(WavError, match="no data"):
        read_wav(riff(fmt_chunk(1, 1, 16000, 16)))
    with pytest.raises(WavError, match="wFormatTag"):
        read_wav(riff(fmt_chunk(0x0055, 1, 16000, 16),  # mp3 tag
                      chunk(b"data", b"")))
    with pytest.raises(WavError, match="bit depth"):
        read_wav(riff(fmt_chunk(1, 1, 16000, 12), chunk(b"data", b"")))
    with pytest.raises(WavError, match="SubFormat"):
        read_wav(riff(fmt_chunk(0, 1, 16000, 16,
                                extensible_sub=b"\xde" * 16),
                      chunk(b"data", b"")))
    with pytest.raises(WavError, match="zero"):
        read_wav(riff(fmt_chunk(1, 0, 16000, 16), chunk(b"data", b"")))


def test_junk_fuzz_raises_waverror_only():
    for seed in range(40):
        r = np.random.default_rng(seed)
        blob = b"RIFF" + bytes(r.integers(0, 256, size=80, dtype=np.uint8))
        try:
            read_wav(blob)
        except WavError:
            pass


# ------------------------------------------------ in-repo encoder parity

def test_encode_wav_roundtrips_every_dtype():
    for arr in (
        rng.integers(0, 256, size=30, dtype=np.uint8),
        rng.integers(-32768, 32768, size=30, dtype=np.int16),
        rng.integers(-2**31, 2**31, size=30, dtype=np.int64).astype(np.int32),
        rng.uniform(-1, 1, size=30).astype(np.float32),
        rng.uniform(-1, 1, size=30).astype(np.float64),
    ):
        rate, out = read_wav(encode_wav(arr, 16000))
        assert rate == 16000
        assert out.dtype == arr.dtype
        assert np.array_equal(out[:, 0], arr)


def test_encode_wav_stereo_roundtrip():
    a = rng.integers(-1000, 1000, size=(40, 2), dtype=np.int16)
    _, out = read_wav(encode_wav(a, 8000))
    assert np.array_equal(out, a)


def test_encode_wav_odd_payload_padded():
    a = rng.integers(0, 256, size=5, dtype=np.uint8)  # odd data size
    blob = encode_wav(a, 8000)
    assert len(blob) % 2 == 0
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    assert riff_size == len(blob) - 8
    _, out = read_wav(blob)
    assert np.array_equal(out[:, 0], a)


# -------------------------------------------------- decode_audio dispatch

def test_decode_audio_magic_dispatch_and_normalization():
    from openpolicedata_spark.operators.multimodal import decode_audio

    s = np.array([-32768, 0, 16384, 32767], dtype=np.int16)
    rate, norm = decode_audio(encode_wav(s, 22050), "audio/wav")
    assert rate == 22050
    assert np.allclose(norm[:, 0], s / 32768.0)
    assert np.rint(norm[:, 0] * 32768.0).astype(np.int16).tolist() \
        == s.tolist()
    u = np.array([0, 128, 255], dtype=np.uint8)
    _, norm = decode_audio(encode_wav(u, 8000), "audio/wav")
    assert np.allclose(norm[:, 0], (u.astype(float) - 128) / 128.0)
    # FLAC now routes to the real decoder (sources/flac.py): garbage
    # after the magic fails there, not at the dispatch gate
    from openpolicedata_spark.sources.flac import FlacError
    with pytest.raises(FlacError):
        decode_audio(b"fLaC rest", "audio/flac")
    with pytest.raises(NotImplementedError, match="no stdlib codec"):
        decode_audio(b"ID3\x04 mp3 bytes", "audio/mpeg")
