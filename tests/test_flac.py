"""FLAC codec tests — fixtures written HERE forward from the xiph FLAC
spec / RFC 9639 literals (frame header layout, subframe type codes,
Rice residual structure, stereo decorrelation math, CRC polynomials),
independent of sources/flac.py. The hand-built streams exercise paths
the repo's subset encoder never produces: LPC, mid/left/right-side
stereo, escape + multi-level partitions, wasted bits, VERBATIM and
CONSTANT subframes, variable block-size codes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources.flac import (
    FlacError,
    encode_flac,
    read_flac,
)

rng = np.random.default_rng(20260814)


# ------------------------------------------------ spec-literal writers

def crc8(data: bytes) -> int:
    """poly x^8 + x^2 + x + 1 = 0x07, init 0, MSB-first (bitwise)."""
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def crc16(data: bytes) -> int:
    """poly x^16 + x^15 + x^2 + 1 = 0x8005, init 0, MSB-first."""
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 \
                else (r << 1) & 0xFFFF
    return r


class W:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> "W":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def sw(self, v: int, n: int) -> "W":
        return self.w(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> "W":
        return self.w(1, q + 1)  # q zeros then a one

    def rice(self, v: int, k: int) -> "W":
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        self.unary(z >> k)
        return self.w(z & ((1 << k) - 1), k)

    def done(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def streaminfo(rate: int, nch: int, bps: int, total: int) -> bytes:
    body = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body += packed.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def frame_header(bs: int, ch_code: int, ss_code: int,
                 frame_no: int = 0) -> bytes:
    w = W()
    w.w(0x3FFE, 14).w(0, 1).w(0, 1)
    w.w(7, 4)              # block size: 16-bit value - 1 at header end
    w.w(0, 4)              # rate from STREAMINFO
    w.w(ch_code, 4)
    w.w(ss_code, 3)
    w.w(0, 1)
    hdr = w.done() + bytes([frame_no]) + struct.pack(">H", bs - 1)
    return hdr + bytes([crc8(hdr)])


def finish_frame(hdr: bytes, body: W) -> bytes:
    frame = hdr + body.done()
    return frame + struct.pack(">H", crc16(frame))


def sub_verbatim(w: W, vals, bps: int) -> None:
    w.w(0, 1).w(1, 6).w(0, 1)
    for v in vals:
        w.sw(int(v), bps)


def sub_constant(w: W, v: int, bps: int) -> None:
    w.w(0, 1).w(0, 6).w(0, 1).sw(v, bps)


def sub_fixed(w: W, vals, order: int, bps: int, k: int = 4,
              porder: int = 0, escapes: dict | None = None) -> None:
    """FIXED subframe; residuals computed here from the spec predictor
    polynomials. `escapes` maps partition index -> raw bit width (15 =
    escape code) for escape-coded partitions."""
    vals = [int(v) for v in vals]
    coef = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
            4: [4, -6, 4, -1]}[order]
    res = []
    for i in range(order, len(vals)):
        pred = sum(c * vals[i - 1 - j] for j, c in enumerate(coef))
        res.append(vals[i] - pred)
    w.w(0, 1).w(8 + order, 6).w(0, 1)
    for v in vals[:order]:
        w.sw(v, bps)
    w.w(0, 2).w(porder, 4)
    bs = len(vals)
    nparts = 1 << porder
    pos = 0
    for p in range(nparts):
        n = (bs >> porder) - (order if p == 0 else 0)
        raw_bits = (escapes or {}).get(p)
        if raw_bits is not None:
            w.w(15, 4).w(raw_bits, 5)
            for v in res[pos:pos + n]:
                w.sw(v, raw_bits)
        else:
            w.w(k, 4)
            for v in res[pos:pos + n]:
                w.rice(v, k)
        pos += n


def sub_lpc(w: W, vals, coefs, shift: int, bps: int, prec: int,
            k: int = 6) -> None:
    """LPC subframe; residuals computed here from the spec formula
    s[i] - (sum(c[j] * s[i-1-j]) >> shift)."""
    vals = [int(v) for v in vals]
    order = len(coefs)
    w.w(0, 1).w(32 + order - 1, 6).w(0, 1)
    for v in vals[:order]:
        w.sw(v, bps)
    w.w(prec - 1, 4).sw(shift, 5)
    for c in coefs:
        w.sw(c, prec)
    w.w(0, 2).w(0, 4).w(k, 4)
    for i in range(order, len(vals)):
        pred = sum(c * vals[i - 1 - j] for j, c in enumerate(coefs)) \
            >> shift
        w.rice(vals[i] - pred, k)


# -------------------------------------------------- encoder roundtrips

@pytest.mark.parametrize("n", [1, 63, 4096, 4097, 9001])
def test_roundtrip_mono_int16(n):
    a = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    rate, bps, out = read_flac(encode_flac(a, 16000))
    assert (rate, bps) == (16000, 16)
    assert np.array_equal(out[:, 0], a)


def test_roundtrip_stereo_and_compression():
    t = np.arange(12000)
    smooth = np.stack([(2000 * np.sin(t / 23)).astype(np.int16),
                       (999 * np.sin(t / 31)).astype(np.int16)], axis=1)
    blob = encode_flac(smooth, 44100)
    assert len(blob) < smooth.nbytes * 0.6  # FIXED predictors engage
    rate, bps, out = read_flac(blob)
    assert np.array_equal(out, smooth)


def test_roundtrip_8_and_24_bit():
    a8 = rng.integers(-128, 128, size=500).astype(np.int64)
    rate, bps, out = read_flac(encode_flac(a8, 8000, bps=8))
    assert bps == 8 and np.array_equal(out[:, 0], a8)
    a24 = rng.integers(-(1 << 23), 1 << 23, size=500)
    rate, bps, out = read_flac(encode_flac(a24, 8000, bps=24))
    assert bps == 24 and np.array_equal(out[:, 0], a24)


# ------------------------------------------- spec-literal decode pins

def test_verbatim_and_constant():
    vals = rng.integers(-32768, 32768, size=32).tolist()
    w = W()
    sub_verbatim(w, vals, 16)
    blob = streaminfo(8000, 1, 16, 32) \
        + finish_frame(frame_header(32, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == vals

    w = W()
    sub_constant(w, -7, 16)
    blob = streaminfo(8000, 1, 16, 16) \
        + finish_frame(frame_header(16, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == [-7] * 16


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    # a cubic-ish ramp keeps residuals small at every order
    vals = [((i * i) // 8) - 40 + (i % 3) for i in range(48)]
    w = W()
    sub_fixed(w, vals, order, 16, k=6)
    blob = streaminfo(8000, 1, 16, 48) \
        + finish_frame(frame_header(48, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == vals


def test_lpc_subframe():
    # run the spec prediction forward in the test to build the signal
    coefs = [3, -1]          # s[i] = r[i] + ((3*s[i-1] - s[i-2]) >> 1)
    vals = [100, 90]
    for i in range(2, 64):
        pred = (coefs[0] * vals[i - 1] + coefs[1] * vals[i - 2]) >> 1
        vals.append(pred + int(rng.integers(-5, 6)))
    w = W()
    sub_lpc(w, vals, coefs, shift=1, bps=16, prec=4)
    blob = streaminfo(8000, 1, 16, 64) \
        + finish_frame(frame_header(64, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == vals


def test_stereo_decorrelation_all_three():
    L = rng.integers(-20000, 20000, size=32).tolist()
    R = rng.integers(-20000, 20000, size=32).tolist()
    side = [a - b for a, b in zip(L, R)]
    mid = [(a + b) >> 1 for a, b in zip(L, R)]

    # left/side (ch_code 8): L at bps, side at bps+1
    w = W()
    sub_verbatim(w, L, 16)
    sub_verbatim(w, side, 17)
    blob = streaminfo(8000, 2, 16, 32) \
        + finish_frame(frame_header(32, 8, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == L and out[:, 1].tolist() == R

    # right/side (ch_code 9): side at bps+1, R at bps
    w = W()
    sub_verbatim(w, side, 17)
    sub_verbatim(w, R, 16)
    blob = streaminfo(8000, 2, 16, 32) \
        + finish_frame(frame_header(32, 9, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == L and out[:, 1].tolist() == R

    # mid/side (ch_code 10): mid at bps, side at bps+1
    w = W()
    sub_verbatim(w, mid, 16)
    sub_verbatim(w, side, 17)
    blob = streaminfo(8000, 2, 16, 32) \
        + finish_frame(frame_header(32, 10, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == L and out[:, 1].tolist() == R


def test_partitions_and_escapes():
    vals = rng.integers(-30, 30, size=64).tolist()
    # porder=2 -> 4 partitions of 16; partition 1 escape-coded at 7
    # bits, partition 3 escape-coded at 0 bits (all-zero residuals)
    vals[48:] = [0] * 16   # order-0 residuals == values
    w = W()
    sub_fixed(w, vals, 0, 16, k=5, porder=2, escapes={1: 7, 3: 0})
    blob = streaminfo(8000, 1, 16, 64) \
        + finish_frame(frame_header(64, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == vals


def test_wasted_bits():
    vals = [v * 4 for v in rng.integers(-500, 500, size=16).tolist()]
    w = W()
    # VERBATIM with 2 wasted bits: flag 1, unary(2-1)=001, samples
    # stored at bps-2 shifted right by 2
    w.w(0, 1).w(1, 6).w(1, 1).unary(1)
    for v in vals:
        w.sw(v >> 2, 14)
    blob = streaminfo(8000, 1, 16, 16) \
        + finish_frame(frame_header(16, 0, 4), w)
    _, _, out = read_flac(blob)
    assert out[:, 0].tolist() == vals


def test_multi_frame_and_8bit_code():
    f1 = list(range(-8, 8))
    f2 = list(range(16))
    frames = b""
    for i, vals in enumerate([f1, f2]):
        w = W()
        sub_verbatim(w, vals, 8)
        frames += finish_frame(frame_header(16, 0, 1, frame_no=i), w)
    blob = streaminfo(8000, 1, 8, 32) + frames
    _, bps, out = read_flac(blob)
    assert bps == 8
    assert out[:, 0].tolist() == f1 + f2


# ------------------------------------------------------------- errors

def test_crc_mismatches_raise():
    a = rng.integers(-100, 100, size=64, dtype=np.int16)
    blob = bytearray(encode_flac(a, 8000))
    good = bytes(blob)
    # flip a bit in the frame body (after the 4+4+34 byte metadata)
    blob[60] ^= 0x01
    with pytest.raises(FlacError, match="CRC|sync|exceed|truncated|"
                                        "reserved|order|unary"):
        read_flac(bytes(blob))
    read_flac(good)  # sanity: untouched stream still decodes


def test_header_crc8_detects_header_corruption():
    w = W()
    sub_constant(w, 5, 16)
    frame = bytearray(finish_frame(frame_header(16, 0, 4), w))
    frame[2] ^= 0x10  # inside the header, before CRC-8
    blob = streaminfo(8000, 1, 16, 16) + bytes(frame)
    with pytest.raises(FlacError):
        read_flac(blob)


def test_truncation_never_leaks():
    a = rng.integers(-3000, 3000, size=300, dtype=np.int16)
    blob = encode_flac(a, 8000)
    for cut in range(0, len(blob), 3):
        try:
            read_flac(blob[:cut])
        except FlacError:
            pass


def test_junk_fuzz_raises_flacerror_only():
    for seed in range(40):
        r = np.random.default_rng(seed)
        blob = b"fLaC" + bytes(r.integers(0, 256, size=200,
                                          dtype=np.uint8))
        try:
            read_flac(blob)
        except FlacError:
            pass


def test_not_flac():
    with pytest.raises(FlacError, match="signature"):
        read_flac(b"RIFF....WAVE")


# ------------------------------------------------------ spark dispatch

def test_decode_audio_dispatch():
    from openpolicedata_spark.operators.multimodal import decode_audio

    a = rng.integers(-32768, 32768, size=600, dtype=np.int16)
    rate, norm = decode_audio(encode_flac(a, 22050), "audio/flac")
    assert rate == 22050
    back = np.rint(norm[:, 0] * 32768.0).astype(np.int16)
    assert np.array_equal(back, a)


# --------------------------------------------- hypothesis properties

from hypothesis import given, settings, strategies as st  # noqa: E402

_HSET = dict(deadline=None, max_examples=25)


@settings(**_HSET)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
       st.sampled_from([1, 2]))
def test_flac_roundtrip_property(samples, nch):
    """ANY int16 signal (any length, mono or stereo) survives
    encode_flac → read_flac bit-exactly."""
    import numpy as np

    n = (len(samples) // nch) * nch
    if n == 0:
        return
    a = np.array(samples[:n], dtype=np.int16).reshape(-1, nch)
    rate, bps, out = read_flac(encode_flac(a, 8000))
    assert (rate, bps) == (8000, 16)
    assert np.array_equal(out, a)


@settings(**_HSET)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
       st.sampled_from(["ogg", "mp4_sowt", "mp4_twos", "mp4_flac"]))
def test_audio_container_roundtrip_property(samples, container):
    """ANY int16 signal survives every lossless container chain
    bit-exactly (Ogg-FLAC pages, MP4 PCM both endians, FLAC-in-MP4)."""
    import numpy as np

    from openpolicedata_spark.sources.mp4 import (
        encode_mp4_audio,
        read_mp4_audio,
    )
    from openpolicedata_spark.sources.ogg import (
        encode_ogg_flac,
        read_ogg_audio,
    )

    a = np.array(samples, dtype=np.int16)
    if container == "ogg":
        rate, bps, out = read_ogg_audio(encode_ogg_flac(a, 8000))
    else:
        codec = {"mp4_sowt": "sowt", "mp4_twos": "twos",
                 "mp4_flac": "fLaC"}[container]
        rate, bps, out = read_mp4_audio(
            encode_mp4_audio(a, 8000, codec=codec))
    assert (rate, bps) == (8000, 16)
    assert np.array_equal(out[:, 0], a)


@settings(**_HSET)
@given(st.lists(st.integers(-32768, 32767), min_size=64, max_size=640))
def test_audio_energy_hash_lossless_invariance_property(samples):
    """The energy fingerprint is invariant across EVERY lossless
    encode→decode chain for ANY signal — the property the streaming
    audio dedup index depends on."""
    import numpy as np

    from openpolicedata_spark.operators.multimodal import (
        audio_energy_hash,
        decode_audio,
    )
    from openpolicedata_spark.sources.wav import encode_wav

    a = np.array(samples, dtype=np.int16)
    h0 = audio_energy_hash(a)
    for enc in (lambda s: encode_wav(s, 8000),
                lambda s: encode_flac(s, 8000)):
        _r, norm = decode_audio(enc(a), "audio/*")
        back = np.rint(norm * 32768.0).astype(np.int64)
        assert audio_energy_hash(back) == h0


def test_wide_samples_use_5bit_rice_and_stay_fast():
    """24/32-bit content encodes with the 5-bit Rice method (k up to
    30): full-range 32-bit NOISE — the 4-bit method's pathological
    case, where k<=14 forces ~2^17-bit unary runs per sample — round
    trips exactly in linear time and size."""
    import time

    import numpy as np

    from openpolicedata_spark.sources.flac import encode_flac, read_flac

    rng = np.random.RandomState(7)
    x = rng.randint(-(1 << 31), 1 << 31, size=4001, dtype=np.int64)
    t0 = time.perf_counter()
    blob = encode_flac(x, 8000, bps=32)
    rate, bps, out = read_flac(blob)
    took = time.perf_counter() - t0
    assert bps == 32 and np.array_equal(out.ravel().astype(np.int64), x)
    assert len(blob) < x.size * 6       # ~4.1 B/sample + headers
    assert took < 10                     # seconds, generous CI margin
    # and 16-bit still uses the 4-bit method (byte-level stability of
    # the q143/q146 oracle streams): method bits are the 2 MSBs of the
    # residual header — cheapest to pin via a decode of both widths
    y = rng.randint(-(1 << 23), 1 << 23, size=4001, dtype=np.int64)
    rate, bps, out = read_flac(encode_flac(y, 8000, bps=24))
    assert bps == 24 and np.array_equal(out.ravel().astype(np.int64), y)


def test_bit_window_reposition_and_grow_paths(monkeypatch):
    """Force the sliding-window machinery through its slide AND
    grow-retry paths by shrinking the window far below frame size:
    decode must remain bit-exact (normal files never trigger growth,
    so this pins the _NeedMoreBits retry loop explicitly)."""
    import numpy as np

    from openpolicedata_spark.sources import flac as F

    rng = np.random.RandomState(5)
    t = np.arange(20_000)
    sig = (5000 * np.sin(t / 30)
           + rng.randint(-500, 500, len(t))).astype(np.int16)
    st = np.stack([sig, np.roll(sig, 3)], axis=1)
    blob = F.encode_flac(st, 16000)
    # frames here are ~10 KB; a 2 KB starting window must grow
    monkeypatch.setattr(F._BitWindow, "MIN_BYTES", 2048)
    rate, bps, out = F.read_flac(blob)
    assert np.array_equal(out, st.astype(np.int32))
    # truncation under a tiny window still raises FlacError (never the
    # internal _NeedMoreBits, never IndexError)
    import pytest

    with pytest.raises(F.FlacError):
        F.read_flac(blob[:len(blob) // 2])


def test_decode_memory_stays_bounded():
    """The sliding window keeps decode's peak numpy allocation far
    below the whole-stream expansion (~8 bytes of bit array per input
    byte + two position arrays, ~100x input): peak traced memory for a
    6M-sample clip must stay under 200 MB where the old form needed
    ~1 GB+ of position arrays alone."""
    import tracemalloc

    import numpy as np

    from openpolicedata_spark.sources.flac import encode_flac, read_flac

    sig = (6000 * np.sin(np.arange(3_000_000) / 40)).astype(np.int16)
    blob = encode_flac(sig, 44100)
    tracemalloc.start()
    _, _, out = read_flac(blob)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert np.array_equal(out.ravel(), sig.astype(np.int32))
    assert peak < 200 * 1024 * 1024, peak


def test_corrupt_rice_residual_magnitude_raises_not_wraps():
    """Round-7 ADVICE: a corrupt-but-parseable FIXED subframe can carry
    residuals near 2^53 (escape partitions, nb up to 31, or huge Rice
    quotients) whose cumulative-sum reconstruction would WRAP int64
    silently; the decoder must refuse loudly against the bps+order
    bound instead. A well-formed subframe with the same layout still
    decodes."""
    import pytest

    from openpolicedata_spark.sources import flac as F

    def build(res_val):
        bw = F._BitWriter()
        bw.write(0, 1)     # padding bit
        bw.write(9, 6)     # FIXED order 1
        bw.write(0, 1)     # no wasted bits
        bw.write(0, 16)    # warm-up sample
        bw.write(0, 2)     # residual method 0 (4-bit params)
        bw.write(0, 4)     # partition order 0
        bw.write(15, 4)    # param 15 = escape
        bw.write(31, 5)    # 31-bit raw residuals
        for _ in range(15):
            bw.write(res_val & ((1 << 31) - 1), 31)
        return bw.done()

    good = build(1000)
    out = F._subframe(F._Bits(good, 0), 16, 16, F._BitWindow(good))
    assert out.shape == (16,)

    bad = build(1 << 29)   # |res| = 2^29 >> 2^(16+1+1)
    with pytest.raises(F.FlacError, match="residual magnitude"):
        F._subframe(F._Bits(bad, 0), 16, 16, F._BitWindow(bad))


def test_corrupt_nested_cumsum_overflow_raises_not_wraps():
    """Review finding: the per-residual guard alone is insufficient —
    order-4 residuals that each PASS the magnitude check can still
    blow the nested cumulative sums past int64 (bound multiplies by
    ~n^order/order!). The reconstruction now checks each integration
    level against its legit 2^(eff+m+1) bound and refuses loudly."""
    import pytest

    from openpolicedata_spark.sources import flac as F

    bw = F._BitWriter()
    bw.write(0, 1)      # padding bit
    bw.write(12, 6)     # FIXED order 4
    bw.write(0, 1)      # no wasted bits
    for _ in range(4):
        bw.write(0, 16)  # warm-up samples
    bw.write(0, 2)      # residual method 0
    bw.write(0, 4)      # partition order 0
    bw.write(15, 4)     # escape
    bw.write(23, 5)     # 23-bit raw residuals
    n = 4096 - 4
    for _ in range(n):
        bw.write(1 << 21, 23)  # == 2^(16+4+1): passes the res guard
    data = bw.done()
    with pytest.raises(F.FlacError, match="reconstruction overflow"):
        F._subframe(F._Bits(data, 0), 4096, 16, F._BitWindow(data))


def test_corrupt_lpc_overflow_raises_flacerror_not_overflowerror():
    """Second review pass: the LPC branch escaped with OverflowError
    (not FlacError) when a corrupt stream grew the exact Python-int
    recurrence past int64 — violating the junk-fuzz 'FlacError only'
    contract the FIXED branch already honors."""
    import pytest

    from openpolicedata_spark.sources import flac as F

    bw = F._BitWriter()
    bw.write(0, 1)       # padding bit
    bw.write(32 + 7, 6)  # LPC order 8
    bw.write(0, 1)       # no wasted bits
    for _ in range(8):
        bw.write(20000 & 0xFFFF, 16)   # warm-up samples
    bw.write(14, 4)      # precision code -> 15-bit coefficients
    bw.write(0, 5)       # shift 0
    for _ in range(8):
        bw.write(0x3FFF, 15)           # huge positive coefficients
    bw.write(0, 2)       # residual method 0
    bw.write(0, 4)       # partition order 0
    bw.write(15, 4)      # escape
    bw.write(30, 5)      # 30-bit raw residuals
    n = 256 - 8
    for _ in range(n):
        bw.write((1 << 29) - 1, 30)
    data = bw.done()
    with pytest.raises(F.FlacError, match="LPC reconstruction overflow"):
        F._subframe(F._Bits(data, 0), 256, 16, F._BitWindow(data))
