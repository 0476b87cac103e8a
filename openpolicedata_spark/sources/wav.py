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
- G.711 µ-law (wFormatTag 7) and A-law (wFormatTag 6): 256-entry
  decode LUTs generated from the ITU-T G.711 segment/mantissa
  expansion (anchor values + structural properties cross-checked in
  tests/test_wav_g711_adpcm.py against hand-derived spec literals)
- IMA/DVI ADPCM (wFormatTag 0x11): block-structured 4-bit decode,
  vectorized ACROSS blocks (the per-block state machine is sequential,
  so the loop runs over samples-per-block positions with numpy state
  arrays over all blocks — O(samples_per_block) Python iterations
  regardless of clip length, the same lockstep trick as the JPEG/GIF
  entropy tables)
- any channel count (samples return as (n_frames, n_channels))
- unknown chunks skipped, odd-length chunk padding honored, truncated
  ``data`` chunks clipped to whole frames
- remaining compressed format tags (mp3, GSM, ...) raise ``WavError``

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

__all__ = ["WavError", "read_wav", "encode_wav", "WAV_SIGNATURE",
           "ulaw_decode_table", "alaw_decode_table",
           "linear_to_ulaw", "linear_to_alaw",
           "IMA_STEP_TABLE", "IMA_INDEX_TABLE"]

WAV_SIGNATURE = b"RIFF"

_KSDATAFORMAT_PCM = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
_KSDATAFORMAT_FLOAT = (
    b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


# --------------------------------------------------------------------------
# G.711 µ-law / A-law (ITU-T G.711): 8-bit log-companded telephony audio.
# Decode is a pure 256-entry table lookup; the tables are GENERATED here
# from the published segment/mantissa expansion (µ-law: ones-complement,
# bias 0x84, 8 segments of 16 steps doubling per segment; A-law: XOR 0x55,
# segment 0 linear). tests/test_wav_g711_adpcm.py cross-checks anchors
# (±max 32124 µ / 32256 A, the two µ-law zeros, segment boundaries) that
# were hand-derived from the spec — the xls_crypto XorMatrix pattern.
# --------------------------------------------------------------------------

def ulaw_decode_table() -> np.ndarray:
    """256-entry int16 µ-law→linear table (G.711 table 2a/2b expansion)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted ones-complement
    exp = (u >> 4) & 7
    mant = u & 0x0F
    t = ((mant << 3) + 0x84) << exp
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def alaw_decode_table() -> np.ndarray:
    """256-entry int16 A-law→linear table (G.711 table 1a/1b expansion)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55  # even-bit inversion
    seg = (a >> 4) & 7
    mant = a & 0x0F
    t = np.where(seg == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    # sign bit SET (after XOR) means positive in A-law
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_DECODE = ulaw_decode_table()
_ALAW_DECODE = alaw_decode_table()


# The STANDARD G.711 encoders (the Sun/CCITT g711.c algorithm used by
# audioop, ffmpeg, and ITU-T G.191 STL): segment search over the 14-bit
# (µ) / 13-bit (A) domain. Byte-for-byte equal to `audioop.lin2ulaw`/
# `lin2alaw` on every int16 input (pinned exhaustively in tests when
# audioop is importable), so fixtures interoperate with external
# tooling. Both satisfy the level fixed-point property the q146 parity
# chains rely on: encode(decode(c)) decodes back to decode(c) for all
# 256 codes (µ-law's two zeros both canonicalize to 0xFF).
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF,
                      0x1FFF], dtype=np.int32)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF,
                      0xFFF], dtype=np.int32)


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """Vectorized standard µ-law encoder (16-bit in, 8-bit codes)."""
    x = np.asarray(samples, dtype=np.int32) >> 2
    neg = x < 0
    mask = np.where(neg, 0x7F, 0xFF)
    x = np.where(neg, -x, x)
    x = np.minimum(x, 8159) + 33  # CLIP, then BIAS >> 2
    seg = np.searchsorted(_SEG_UEND, x, side="left")
    uval = (seg << 4) | ((x >> (seg + 1)) & 0xF)
    return np.where(seg >= 8, 0x7F ^ mask,
                    uval ^ mask).astype(np.uint8)


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    """Vectorized standard A-law encoder (16-bit in, 8-bit codes)."""
    x = np.asarray(samples, dtype=np.int32) >> 3
    neg = x < 0
    mask = np.where(neg, 0x55, 0xD5)
    x = np.where(neg, -x - 1, x)
    seg = np.searchsorted(_SEG_AEND, x, side="left")
    aval = (seg << 4) | np.where(seg < 2, (x >> 1) & 0xF,
                                 (x >> seg) & 0xF)
    return np.where(seg >= 8, 0x7F ^ mask,
                    aval ^ mask).astype(np.uint8)


# --------------------------------------------------------------------------
# IMA/DVI ADPCM (wFormatTag 0x11): 4-bit adaptive-delta coding. The step
# table (89 entries, ~1.1x geometric with spec rounding) and index
# adjustments are the published IMA spec literals — they cannot be
# regenerated from a closed form, so tests anchor first/last entries,
# monotonicity, and hand-decoded vectors instead.
# --------------------------------------------------------------------------

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767], dtype=np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: np.ndarray, index: np.ndarray,
              nib: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One IMA decode step, vectorized over any shape of state arrays:
    (pred, index, nibble) -> (new_pred, new_index). Integer-exact per the
    spec's shift-add reconstruction (diff = step/8 + bits*step/{4,2,1})."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    pred = np.clip(pred, -32768, 32767)
    index = np.clip(index + IMA_INDEX_TABLE[nib & 7], 0, 88)
    return pred, index


def _ima_decode_blocks(payload: bytes, nch: int,
                       block_align: int) -> np.ndarray:
    """Decode IMA-ADPCM WAV blocks → (n_frames, nch) int16. Sequential
    within a block, lockstep-vectorized across blocks: the Python loop is
    over sample positions IN a block, with numpy state arrays spanning all
    blocks (and a possibly-padded final partial block, trimmed by caller)."""
    if block_align <= 4 * nch or (block_align - 4 * nch) % (4 * nch):
        raise WavError(f"bad IMA-ADPCM nBlockAlign {block_align} "
                       f"for {nch} channel(s)")
    n_blocks = -(-len(payload) // block_align)  # ceil: short final block ok
    buf = payload + b"\x00" * (n_blocks * block_align - len(payload))
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(n_blocks, block_align)
    hdr = raw[:, :4 * nch].reshape(n_blocks, nch, 4).astype(np.int32)
    pred0 = ((hdr[:, :, 0] | (hdr[:, :, 1] << 8)) ^ 0x8000) - 0x8000
    index0 = np.clip(hdr[:, :, 2], 0, 88)
    body = raw[:, 4 * nch:]
    nib = np.empty((n_blocks, body.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = body & 0x0F  # low nibble first
    nib[:, 1::2] = body >> 4
    # channel interleave: 4-byte (8-nibble) groups rotate through channels
    groups = nib.reshape(n_blocks, -1, nch, 8)
    spb = (block_align - 4 * nch) * 2 // nch  # data samples per block
    out = np.empty((n_blocks, spb + 1, nch), dtype=np.int16)
    out[:, 0, :] = pred0.astype(np.int16)
    for ch in range(nch):
        nibs = groups[:, :, ch, :].reshape(n_blocks, spb)
        pred, index = pred0[:, ch], index0[:, ch]
        for s in range(spb):
            pred, index = _ima_step(pred, index, nibs[:, s].astype(np.int32))
            out[:, s + 1, ch] = pred.astype(np.int16)
    return out.reshape(-1, nch)


def _ima_encode_blocks(frames: np.ndarray,
                       block_align: int) -> tuple[bytes, int]:
    """Encode (n_frames, nch) int16 → IMA-ADPCM block bytes. Same
    across-block lockstep vectorization as decode; each block is
    self-contained (header predictor = its first sample, index restarts
    at 0 — decoder-correct since the header carries both). The final
    partial block is padded by repeating the last frame; callers trim on
    decode via the fact chunk. Returns (payload, samples_per_block)."""
    nch = frames.shape[1]
    spb = (block_align - 4 * nch) * 2 // nch
    n_frames = frames.shape[0]
    n_blocks = -(-max(n_frames, 1) // (spb + 1))
    padded = np.empty((n_blocks * (spb + 1), nch), dtype=np.int16)
    padded[:n_frames] = frames
    padded[n_frames:] = frames[-1] if n_frames else 0
    x = padded.astype(np.int32).reshape(n_blocks, spb + 1, nch)
    payload = np.zeros((n_blocks, block_align), dtype=np.uint8)
    hdr = payload[:, :4 * nch].reshape(n_blocks, nch, 4)
    hdr[:, :, 0] = x[:, 0, :] & 0xFF
    hdr[:, :, 1] = (x[:, 0, :] >> 8) & 0xFF
    # hdr[:, :, 2] initial index 0; hdr[:, :, 3] reserved 0
    nib_store = np.empty((n_blocks, spb, nch), dtype=np.uint8)
    for ch in range(nch):
        pred = x[:, 0, ch].copy()
        index = np.zeros(n_blocks, dtype=np.int32)
        for s in range(spb):
            d = x[:, s + 1, ch] - pred
            nib = np.where(d < 0, 8, 0).astype(np.int32)
            diff = np.abs(d)
            step = IMA_STEP_TABLE[index]
            for bit, sh in ((4, 0), (2, 1), (1, 2)):
                q = step >> sh
                hit = diff >= q
                nib = nib | np.where(hit, bit, 0)
                diff = diff - np.where(hit, q, 0)
            nib_store[:, s, ch] = nib.astype(np.uint8)
            pred, index = _ima_step(pred, index, nib)
    # pack: per 8-nibble group per channel, low nibble first
    g = nib_store.reshape(n_blocks, -1, 8, nch).transpose(0, 1, 3, 2)
    packed = (g[..., 0::2] | (g[..., 1::2] << 4)).reshape(n_blocks, -1)
    payload[:, 4 * nch:] = packed
    return payload.tobytes(), spb + 1


def _ima_true_frames(n_payload: int, nch: int, block_align: int) -> int:
    """Frame count actually ENCODED in an IMA-ADPCM payload of
    `n_payload` bytes, honoring a truncated final block: the spec
    requires a `fact` chunk for compressed WAV, but real-world writers
    omit it, and decoding the zero-PADDING of a short final block
    would silently append fabricated near-DC samples (the ceil-pad at
    _ima_decode_blocks). A frame exists only when EVERY channel has
    its nibble: data bytes rotate through channels in 4-byte groups
    (8 nibbles), so within a partial round only the bytes past the
    last channel's group start contribute complete frames."""
    spb = (block_align - 4 * nch) * 2 // nch   # data samples per full block
    full = n_payload // block_align
    rem = n_payload % block_align
    total = full * (spb + 1)
    if rem >= 4 * nch:  # header complete → at least the predictor sample
        db = rem - 4 * nch
        extra = (db // (4 * nch)) * 8          # complete channel rounds
        tail = db % (4 * nch) - 4 * (nch - 1)  # bytes into the LAST
        if tail > 0:                           # channel's group, if any
            extra += 2 * tail
        total += 1 + min(extra, spb)
    return total


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
    fact_len = None
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
        elif tag == b"fact" and len(body) >= 4:
            (fact_len,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data" and payload is None:
            payload = body
    if fmt is None:
        raise WavError("no fmt chunk")
    if payload is None:
        raise WavError("no data chunk")
    wtag, nch, rate, block_align, bits = fmt
    if nch == 0 or rate == 0:
        raise WavError("zero channels or sample rate")

    if wtag in (6, 7):  # G.711 A-law / µ-law: one byte per sample
        n_frames = len(payload) // nch
        raw = np.frombuffer(payload[:n_frames * nch], dtype=np.uint8)
        table = _ALAW_DECODE if wtag == 6 else _ULAW_DECODE
        samples = table[raw].reshape(n_frames, nch)
        if fact_len is not None:
            samples = samples[:fact_len]
        return rate, samples
    if wtag == 0x11:  # IMA/DVI ADPCM
        samples = _ima_decode_blocks(payload, nch, block_align)
        # fact is spec-required for compressed WAV but often omitted;
        # without it, trim to the frames the BYTES actually encode so a
        # truncated final block never yields padding-decoded samples
        total = (fact_len if fact_len is not None
                 else _ima_true_frames(len(payload), nch, block_align))
        return rate, samples[:total]

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
                       "(PCM, IEEE float, G.711 ulaw/alaw, and IMA ADPCM "
                       "are native; mp3/GSM/etc need soundfile/ffmpeg)")

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


def encode_wav(samples: np.ndarray, rate: int, codec: str | None = None,
               block_align: int | None = None) -> bytes:
    """Write canonical PCM/float WAV from a (n_frames, n_channels) or
    (n_frames,) array of uint8 / int16 / int32 / float32 / float64.

    codec: None (linear PCM/float per dtype), or for int16 input one of
    'ulaw' / 'alaw' (G.711, lossy nearest-level companding) or
    'ima_adpcm' (4-bit IMA blocks; block_align defaults to
    4*nch*253 bytes = 2017 samples per block per channel:
    (block_align - 4*nch)*2/nch data samples + the header sample). Compressed
    encodes write the spec-required fact chunk (true frame count) and,
    for ADPCM, the wSamplesPerBlock extension."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise WavError("samples must be 1-D or 2-D (frames, channels)")
    nch = a.shape[1]
    if codec is not None:
        if a.dtype != np.int16:
            raise WavError(f"codec={codec!r} needs int16 samples")
        n_frames = a.shape[0]
        extra = b""
        if codec == "ima_adpcm":
            ba = block_align if block_align is not None else 4 * nch * 253
            payload, spb = _ima_encode_blocks(a, ba)
            wtag, bits = 0x11, 4
            extra = struct.pack("<HH", 2, spb)  # cbSize, wSamplesPerBlock
        elif codec in ("ulaw", "alaw"):
            enc = linear_to_ulaw if codec == "ulaw" else linear_to_alaw
            payload = enc(a.astype(np.int32)).astype(np.uint8).tobytes()
            wtag, bits, ba = (7 if codec == "ulaw" else 6), 8, nch
            extra = struct.pack("<H", 0)  # cbSize: required for tag != 1
        else:
            raise WavError(f"unknown codec {codec!r}")
        if codec == "ima_adpcm":
            byte_rate = (rate * ba + spb - 1) // spb  # ~rate*block/samples
        else:
            byte_rate = rate * nch  # one byte per sample per channel
        fmt = struct.pack("<HHIIHH", wtag, nch, rate, byte_rate,
                          ba, bits) + extra
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"fact" + struct.pack("<II", 4, n_frames)
                + b"data" + struct.pack("<I", len(payload)) + payload)
        if len(payload) & 1:
            body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body
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
