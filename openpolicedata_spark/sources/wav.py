"""Pure-stdlib/numpy WAV (RIFF PCM) codec.

Closes the audio half of the multimodal codec gate
(operators/multimodal.py): ``decode_audio`` previously raised for ALL
formats; WAV needs nothing beyond ``struct`` and numpy — the same
replace-the-dependency pattern as sources/png.py and sources/jpeg.py.
Compressed formats (mp3/flac/ogg) still raise clearly.

Reference analog: the reference's loaders parse real file bytes end to
end (openpolicedata data_loaders.py); this gives the audio path the
same property.

Coverage (RIFF/WAVE, MS multimedia spec):
- PCM (wFormatTag 1): unsigned 8-bit, signed 16/24/32-bit little-endian
- IEEE float (wFormatTag 3): 32- and 64-bit
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) with PCM or float SubFormat GUIDs
- any channel count (samples return as (n_frames, n_channels))
- unknown chunks skipped, odd-length chunk padding honored, truncated
  ``data`` chunks clipped to whole frames
- compressed format tags (ADPCM, mp3, a-law, ...) raise ``WavError``

Everything is numpy ``frombuffer`` reshapes — no per-sample Python, so
decode cost is memcpy-bounded even for long clips inside mapInPandas
Arrow batches.

``encode_wav`` writes canonical PCM (8/16/32-bit int or float32/64)
and backs the q131 oracle round trip: int16 PCM encode→decode is the
identity on the payload bytes, so the decoded-sample hash replays in
DuckDB from the same md5 stream (the q129/q130 pattern).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "read_wav", "encode_wav", "WAV_SIGNATURE"]

WAV_SIGNATURE = b"RIFF"

_KSDATAFORMAT_PCM = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
_KSDATAFORMAT_FLOAT = (
    b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def _iter_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        yield tag, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def read_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse WAV bytes → (sample_rate, samples). Samples come back in
    their native storage type, shaped (n_frames, n_channels):
    uint8 / int16 / int32 (24-bit widened to int32, low byte zero-free
    sign-extended) / float32 / float64."""
    fmt = None
    payload = None
    for tag, body in _iter_chunks(data):
        if tag == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            (wtag, nch, rate, _byte_rate, block_align,
             bits) = struct.unpack_from("<HHIIHH", body, 0)
            if wtag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if len(body) < 40:
                    raise WavError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
                sub = body[24:40]
                if sub == _KSDATAFORMAT_PCM:
                    wtag = 1
                elif sub == _KSDATAFORMAT_FLOAT:
                    wtag = 3
                else:
                    raise WavError(
                        f"unsupported EXTENSIBLE SubFormat {sub.hex()}")
            fmt = (wtag, nch, rate, block_align, bits)
        elif tag == b"data" and payload is None:
            payload = body
    if fmt is None:
        raise WavError("no fmt chunk")
    if payload is None:
        raise WavError("no data chunk")
    wtag, nch, rate, block_align, bits = fmt
    if nch == 0 or rate == 0:
        raise WavError("zero channels or sample rate")

    if wtag == 1:
        if bits == 8:
            dt, width = np.uint8, 1
        elif bits == 16:
            dt, width = np.dtype("<i2"), 2
        elif bits == 24:
            dt, width = None, 3
        elif bits == 32:
            dt, width = np.dtype("<i4"), 4
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif wtag == 3:
        if bits == 32:
            dt, width = np.dtype("<f4"), 4
        elif bits == 64:
            dt, width = np.dtype("<f8"), 8
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported wFormatTag 0x{wtag:04x} "
                       "(PCM and IEEE float only; compressed audio "
                       "needs soundfile/ffmpeg)")

    frame_bytes = width * nch
    n_frames = len(payload) // frame_bytes  # clip trailing partial frame
    payload = payload[:n_frames * frame_bytes]
    if width == 3:  # 24-bit: widen to int32 via a zero-padded 4th byte
        raw = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        ext = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        ext[:, 1:] = raw  # little-endian: value << 8, then arithmetic >> 8
        samples = ext.view("<i4").ravel() >> 8
    else:
        samples = np.frombuffer(payload, dtype=dt)
    return rate, samples.reshape(n_frames, nch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Write canonical PCM/float WAV from a (n_frames, n_channels) or
    (n_frames,) array of uint8 / int16 / int32 / float32 / float64."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise WavError("samples must be 1-D or 2-D (frames, channels)")
    nch = a.shape[1]
    kind_map = {
        np.dtype(np.uint8): (1, 8),
        np.dtype(np.int16): (1, 16),
        np.dtype(np.int32): (1, 32),
        np.dtype(np.float32): (3, 32),
        np.dtype(np.float64): (3, 64),
    }
    if a.dtype not in kind_map:
        raise WavError(f"unsupported sample dtype {a.dtype}")
    wtag, bits = kind_map[a.dtype]
    payload = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<"))) \
        .tobytes()
    block_align = (bits // 8) * nch
    fmt = struct.pack("<HHIIHH", wtag, nch, rate, rate * block_align,
                      block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
