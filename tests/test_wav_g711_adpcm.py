"""G.711 µ-law/A-law + IMA-ADPCM WAV codec tests (sources/wav.py).

Independence strategy (the xls_crypto XorMatrix pattern): the package
GENERATES its G.711 tables from the segment/mantissa formulas; these
tests pin them against HAND-DERIVED spec anchors (worked digit by digit
in comments below, not by running the package code) plus structural
spec properties (segment sizes, step doubling, the two µ-law zeros,
A-law's missing zero). The IMA step/index tables are spec literals that
admit no closed form; they're anchored by first/last entries, growth
bounds, and a hand-decoded vector.

Reference analog: the reference decodes no audio at all
(openpolicedata/data_loaders.py has no media path); this extends the
LLM-pipeline audio ingestion surface the same way flac.py/gif.py did.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from openpolicedata_spark.sources import wav as W


# --------------------------------------------------------------------------
# µ-law decode anchors. Spec formula: u' = ~u; seg = (u'>>4)&7;
# mant = u'&15; mag = ((mant<<3)+0x84)<<seg - 0x84; sign bit of u'.
# --------------------------------------------------------------------------

# Hand-derived rows (code -> linear):
#  0x00: u'=0xFF sign=1 seg=7 mant=15  mag=((120+132)<<7)-132 = 32256-132
#        = 32124, negative                               -> -32124
#  0x80: same magnitude, sign bit clear in u'=0x7F       -> +32124
#  0xFF: u'=0x00 seg=0 mant=0  mag=(0+132)<<0 -132 = 0   ->  0  (plus zero)
#  0x7F: u'=0x80 sign=1 seg=0 mant=0                     -> -0 = 0
#  0xFE: u'=0x01 seg=0 mant=1  mag=(8+132)-132 = 8       -> +8
#  0xF0: u'=0x0F seg=0 mant=15 mag=(120+132)-132 = 120   -> +120
#  0xEF: u'=0x10 seg=1 mant=0  mag=(0+132)<<1 -132 = 132 -> +132
#  0x10: u'=0xEF sign=1 seg=6 mant=15
#        mag=((120+132)<<6)-132 = 16128-132 = 15996      -> -15996
ULAW_ANCHORS = {
    0x00: -32124, 0x80: 32124, 0xFF: 0, 0x7F: 0,
    0xFE: 8, 0xF0: 120, 0xEF: 132, 0x10: -15996,
}

# A-law: a = code ^ 0x55; seg = (a>>4)&7; mant = a&15;
# seg 0: t = (mant<<4)+8; seg>=1: t = ((mant<<4)+0x108)<<(seg-1);
# sign bit SET in a means POSITIVE.
#  0x55: a=0x00 seg=0 mant=0  t=8                        -> -8
#  0xD5: a=0x80 positive                                 -> +8
#  0x2A: a=0x7F seg=7 mant=15 t=(240+264)<<6 = 32256     -> -32256
#  0xAA: a=0xFF positive                                 -> +32256
#  0x54: a=0x01 seg=0 mant=1  t=24                       -> -24
#  0x45: a=0x10 seg=1 mant=0  t=264<<0 = 264             -> -264
#  0xC5: a=0x90 positive seg=1                           -> +264
ALAW_ANCHORS = {
    0x55: -8, 0xD5: 8, 0x2A: -32256, 0xAA: 32256,
    0x54: -24, 0x45: -264, 0xC5: 264,
}


def test_ulaw_table_spec_anchors():
    t = W.ulaw_decode_table()
    for code, val in ULAW_ANCHORS.items():
        assert t[code] == val, (hex(code), int(t[code]), val)


def test_alaw_table_spec_anchors():
    t = W.alaw_decode_table()
    for code, val in ALAW_ANCHORS.items():
        assert t[code] == val, (hex(code), int(t[code]), val)


def test_ulaw_table_structure():
    t = W.ulaw_decode_table().astype(int)
    # sign symmetry: codes 0x80+k mirror codes k
    assert np.array_equal(t[0x80:], -t[:0x80])
    # within the negative half, strictly increasing toward zero
    assert np.all(np.diff(t[:0x80]) > 0)
    # exactly two zeros in the whole table (µ-law's +0/-0)
    assert int((t == 0).sum()) == 2
    # segment step doubling: within each segment the 16 levels are
    # equally spaced, and the spacing doubles per segment (8,16,...,1024)
    neg = -t[:0x80]  # magnitudes, descending code = seg 7 first
    for seg in range(8):
        rows = neg[seg * 16:(seg + 1) * 16][::-1]  # ascending magnitude
        d = np.diff(rows)
        assert np.all(d == d[0])
    spacings = [int(np.diff(neg[s * 16:(s + 1) * 16][::-1])[0])
                for s in range(8)]
    assert spacings == [1024, 512, 256, 128, 64, 32, 16, 8]


def test_alaw_table_structure():
    t = W.alaw_decode_table().astype(int)
    # sign bit (set) = positive: 0x80.. mirrors 0x00.. after the XOR-0x55
    # scramble; check value multiset symmetry instead of index mirroring
    assert sorted(t[t > 0]) == sorted(-t[t < 0])
    assert int((t == 0).sum()) == 0  # A-law has no zero level
    assert t.min() == -32256 and t.max() == 32256
    assert len(np.unique(t)) == 256  # all codes distinct


def test_g711_encoders_exact_on_levels_and_idempotent():
    for enc, table in ((W.linear_to_ulaw, W.ulaw_decode_table()),
                       (W.linear_to_alaw, W.alaw_decode_table())):
        codes = enc(table.astype(np.int32))
        assert np.array_equal(table[codes], table)
        # full-range monotone non-decreasing quantization
        x = np.arange(-32768, 32768, 7, dtype=np.int32)
        q = table[enc(x)].astype(int)
        assert np.all(np.diff(q) >= 0)
        # quantization error bounded by the largest segment step
        assert np.abs(q - x).max() <= 1024


def test_g711_wav_round_trip_idempotent():
    rng = np.random.RandomState(7)
    pcm = rng.randint(-32768, 32768, size=(997, 2)).astype(np.int16)
    for codec in ("ulaw", "alaw"):
        blob = W.encode_wav(pcm, 8000, codec=codec)
        rate, out = W.read_wav(blob)
        assert rate == 8000 and out.shape == pcm.shape
        assert out.dtype == np.int16
        # second trip is the identity on quantized PCM
        rate2, out2 = W.read_wav(W.encode_wav(out, 8000, codec=codec))
        assert np.array_equal(out, out2)


def test_g711_fact_chunk_trims_padding():
    pcm = np.arange(-5, 6, dtype=np.int16)  # 11 frames, odd payload
    blob = W.encode_wav(pcm, 8000, codec="ulaw")
    assert b"fact" in blob
    rate, out = W.read_wav(blob)
    assert out.shape == (11, 1)


# --------------------------------------------------------------------------
# IMA ADPCM
# --------------------------------------------------------------------------

def test_ima_tables_spec_anchors():
    st = W.IMA_STEP_TABLE
    assert len(st) == 89
    assert st[0] == 7 and st[1] == 8 and st[2] == 9
    assert st[88] == 32767 and st[87] == 29794
    assert np.all(np.diff(st) > 0)
    # spec growth: each step ~1.1x the previous (rounded); bound it
    ratio = st[1:].astype(float) / st[:-1].astype(float)
    assert ratio.min() > 1.05 and ratio.max() < 1.18
    assert list(W.IMA_INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_ima_hand_decoded_vector():
    # One mono block, block_align=8: header pred=100 index=0, then 4 data
    # bytes = 8 nibbles: 0x31 -> nibbles 1,3 ; 0x08 -> 8,0 ; 0x00 ; 0x00.
    # Hand decode (step table anchors: st[0]=7, st[2]=9, st[4]=11,
    # st[3]=10, st[1]=8, st[0]=7):
    #  n=1: step=7 diff=7>>3 + 7>>2 = 0+1=1  pred=101 idx=0-1->0
    #  n=3: step=7 diff=0+1+3=4              pred=105 idx=0-1->0
    #  n=8: step=7 diff=0 (sign only)        pred=105 idx=0-1->0
    #  n=0: step=7 diff=0                    pred=105 idx=0-1->0
    #  four more n=0: pred stays 105
    hdr = struct.pack("<hBB", 100, 0, 0)
    data = hdr + bytes([0x31, 0x08, 0x00, 0x00])
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, 8, 4, 2, 9)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, 9)
            + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = W.read_wav(blob)
    assert rate == 8000
    assert list(out.ravel()) == [100, 101, 105, 105, 105, 105, 105, 105, 105]


def test_ima_vectorized_matches_scalar_reference():
    # The package decodes blocks in lockstep numpy; re-decode the same
    # bytes with an independent per-sample scalar loop and require
    # bit-identical output (catches any vectorization/clamp/order bug).
    rng = np.random.RandomState(3)
    x = rng.randint(-32768, 32768, size=(1013, 2)).astype(np.int16)
    ba = 4 * 2 + 4 * 2 * 9  # stereo, 9 groups -> spb=72+1
    blob = W.encode_wav(x, 8000, codec="ima_adpcm", block_align=ba)
    _, out = W.read_wav(blob)
    assert out.shape == x.shape

    pos, data = 12, None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", blob, pos + 4)
        if tag == b"data":
            data = blob[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)

    def step_one(pred, idx, nib):
        step = int(W.IMA_STEP_TABLE[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(W.IMA_INDEX_TABLE[nib & 7])))
        return pred, idx

    ref = []
    for off in range(0, len(data), ba):
        blk = data[off:off + ba]
        chans = []
        for ch in range(2):
            pred = struct.unpack_from("<h", blk, 4 * ch)[0]
            idx = blk[4 * ch + 2]
            seq = [pred]
            body = blk[8:]
            for g in range(len(body) // 8):  # 8 bytes = one group pair
                four = body[g * 8 + 4 * ch: g * 8 + 4 * ch + 4]
                for byte in four:
                    for nib in (byte & 0xF, byte >> 4):
                        pred, idx = step_one(pred, idx, nib)
                        seq.append(pred)
            chans.append(seq)
        ref.extend(zip(*chans))
    ref = np.array(ref[:out.shape[0]], dtype=np.int16)
    assert np.array_equal(out, ref)


def test_ima_tracks_smooth_signal():
    t = np.arange(4000)
    sig = (6000 * np.sin(t / 40)).astype(np.int16)
    blob = W.encode_wav(sig, 16000, codec="ima_adpcm")
    rate, out = W.read_wav(blob)
    assert rate == 16000 and out.shape == (4000, 1)
    # steady-state tracking error far below an LSB of the 4-bit coder's
    # working step for this slope (~150/sample)
    err = np.abs(out.ravel().astype(int) - sig.astype(int))
    assert err.max() < 400 and err.mean() < 40


def test_ima_partial_final_block_and_fact_trim():
    sig = np.arange(-300, 477, dtype=np.int16)  # 777 frames
    blob = W.encode_wav(sig, 8000, codec="ima_adpcm")
    _, out = W.read_wav(blob)
    assert out.shape == (777, 1)


def test_ima_bad_block_align_raises():
    with pytest.raises(W.WavError):
        W._ima_decode_blocks(b"\x00" * 64, 2, 10)


def test_decode_audio_normalizes_g711_and_adpcm():
    from openpolicedata_spark.operators.multimodal import decode_audio
    pcm = (np.arange(400, dtype=np.int16) * 64 - 12800).astype(np.int16)
    for codec in ("ulaw", "alaw", "ima_adpcm"):
        blob = W.encode_wav(pcm, 8000, codec=codec)
        rate, norm = decode_audio(blob, "audio/wav")
        assert rate == 8000
        assert norm.dtype == np.float64 and norm.shape == (400, 1)
        assert np.abs(norm).max() <= 1.0
        # de-normalized values match the direct wav decode exactly
        _, direct = W.read_wav(blob)
        assert np.array_equal(np.rint(norm * 32768.0).astype(np.int16),
                              direct)


def test_g711_exhaustive_parity_with_audioop():
    """EXTERNAL ground truth: decode tables and encoders match CPython's
    audioop (the Sun/CCITT g711.c reference implementation) on every
    code and every int16 input — byte-for-byte. Gated: audioop is
    removed in Python 3.13."""
    audioop = pytest.importorskip("audioop")

    ut, at = W.ulaw_decode_table(), W.alaw_decode_table()
    for table, dec in ((ut, audioop.ulaw2lin), (at, audioop.alaw2lin)):
        ref = np.frombuffer(
            b"".join(dec(bytes([c]), 2) for c in range(256)), "<i2")
        assert np.array_equal(ref, table)
    x = np.arange(-32768, 32768, dtype=np.int32)
    pcm = x.astype("<i2").tobytes()
    assert np.array_equal(
        W.linear_to_ulaw(x),
        np.frombuffer(audioop.lin2ulaw(pcm, 2), np.uint8))
    assert np.array_equal(
        W.linear_to_alaw(x),
        np.frombuffer(audioop.lin2alaw(pcm, 2), np.uint8))


def test_ima_no_fact_truncated_block_trims_to_real_bytes():
    """Round-7 ADVICE: fact is spec-required for compressed WAV but
    real writers omit it; a truncated final block must then yield ONLY
    the frames its real bytes encode — never samples decoded from the
    ceil-pad zeros. The emitted prefix must equal the untruncated
    decode's prefix (per-channel decode depends only on that channel's
    own earlier nibbles)."""
    ba = 256
    sig = ((np.arange(2000) * 17) % 3001 - 1500).astype(np.int16)
    payload, _spb1 = W._ima_encode_blocks(sig.reshape(-1, 1), ba)
    full = W._ima_decode_blocks(payload, 1, ba)

    def wav_no_fact(trunc, nch, align):
        fmt = struct.pack("<HHIIHHHH", 0x11, nch, 8000, 4000, align, 4,
                          2, (align - 4 * nch) * 2 // nch + 1)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(trunc)) + trunc)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for cut in (1, 3, 4, 5, 17, 250, ba - 2):
        trunc = payload[:len(payload) - cut]
        rate, out = W.read_wav(wav_no_fact(trunc, 1, ba))
        n = W._ima_true_frames(len(trunc), 1, ba)
        # true-nibble accounting, mono: header (4B) = 1 frame, then 2/byte
        rem = len(trunc) % ba
        expect_tail = 0 if rem < 4 else 1 + 2 * (rem - 4)
        assert n == (len(trunc) // ba) * 505 + expect_tail
        assert out.shape[0] == n
        assert np.array_equal(out.ravel(), full[:n].ravel())

    # stereo: a frame needs BOTH channels' nibbles — truncating inside
    # channel 0's group of the last round must not add frames
    x = np.stack([sig[:1000], -sig[:1000]], axis=1).astype(np.int16)
    ba2 = 4 * 2 + 4 * 2 * 9
    payload2, _ = W._ima_encode_blocks(x, ba2)
    full2 = W._ima_decode_blocks(payload2, 2, ba2)
    for cut in (1, 2, 5, 7, 9, 12, 15, 70):
        trunc = payload2[:len(payload2) - cut]
        rate, out = W.read_wav(wav_no_fact(trunc, 2, ba2))
        n = W._ima_true_frames(len(trunc), 2, ba2)
        assert out.shape[0] == n
        assert np.array_equal(out, full2[:n])
        # independent accounting: frames limited by channel 1 (its
        # 4-byte group comes SECOND in each 8-byte round)
        rem = len(trunc) % ba2
        if rem >= 8:
            db = rem - 8
            ch1_nibs = (db // 8) * 8 + max(db % 8 - 4, 0) * 2
            assert n == (len(trunc) // ba2) * 73 + 1 + min(ch1_nibs, 72)
