"""mp3 FRAME WALKER (metadata only — PCM decode is gated, FIXTURES.md
F10): hand-computed frame sizes from the public header formula, ID3v2
syncsafe skip, loud gates for every out-of-scope variant."""

import pytest

from openpolicedata_spark.sources import mp3 as M


def frame(br_idx, sr_idx=0, pad=0, fill=b"\x00"):
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0])
    br = M.MP3_BITRATES_KBPS[br_idx]
    rate = M.MP3_SAMPLE_RATES[sr_idx]
    size = 144 * br * 1000 // rate + pad
    return hdr + fill * (size - 4)


def frame_v(ver_bits, layer_bits, br_idx, sr_idx=0, pad=0, fill=b"\x00"):
    """Any version/layer frame, sized by the TEST'S OWN copy of the
    header formulas (so builder and parser are independent)."""
    hdr = bytes([0xFF, 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0])
    vclass = 1 if ver_bits == 3 else 2
    layer = 4 - layer_bits
    br = M.MP3_BITRATE_LADDERS[(vclass, layer)][br_idx]
    rate = M.MP3_SAMPLE_RATES_BY_VERSION[ver_bits][sr_idx]
    if layer == 1:
        size = (12 * br * 1000 // rate + pad) * 4
    else:
        spf = 576 if (layer == 3 and vclass == 2) else 1152
        size = spf // 8 * br * 1000 // rate + pad
    return hdr + fill * (size - 4)


def test_hand_computed_frame_sizes():
    # 128 kbps @ 44100: 144*128000/44100 = 417.95... -> 417 (+pad)
    assert M.parse_frame_header(frame(9), 0) == (417, 128, 44100, 0, 1152)
    assert M.parse_frame_header(frame(9, pad=1), 0) == \
        (418, 128, 44100, 1, 1152)
    # 320 kbps @ 44100 -> 1044 ; 32 kbps @ 48000 -> 96 ; 40 @ 32000 -> 180
    assert M.parse_frame_header(frame(14), 0)[0] == 1044
    assert M.parse_frame_header(frame(1, sr_idx=1), 0) == \
        (96, 32, 48000, 0, 1152)
    assert M.parse_frame_header(frame(2, sr_idx=2), 0) == \
        (180, 40, 32000, 0, 1152)


def test_hand_computed_all_version_layer_combos():
    """Round-9 widening: every MPEG version x layer combination, each
    size computed BY HAND here (ladder value, formula, floor) — the
    builder helper independently re-derives them, and the two must
    agree with the parser."""
    # MPEG-1 Layer I 448 kbps @ 44100 (idx 14): (12*448000//44100)*4
    #   = 121*4 = 484; the padding SLOT is 4 bytes for Layer I
    assert M.parse_frame_header(frame_v(3, 3, 14), 0) == \
        (484, 448, 44100, 0, 384)
    assert M.parse_frame_header(frame_v(3, 3, 14, pad=1), 0)[0] == 488
    # MPEG-1 Layer II 384 kbps @ 44100: 144*384000//44100 = 1253
    assert M.parse_frame_header(frame_v(3, 2, 14), 0) == \
        (1253, 384, 44100, 0, 1152)
    # MPEG-2 Layer III 64 kbps @ 22050 (idx 8 on the v2 ladder):
    #   72*64000//22050 = 208, 576 samples/frame
    assert M.parse_frame_header(frame_v(2, 1, 8), 0) == \
        (208, 64, 22050, 0, 576)
    # MPEG-2.5 Layer III 8 kbps @ 8000 (idx 1, sr_idx 2): 72*8000//8000
    assert M.parse_frame_header(frame_v(0, 1, 1, sr_idx=2), 0) == \
        (72, 8, 8000, 0, 576)
    # MPEG-2 Layer I 256 kbps @ 24000 (idx 14, sr_idx 1):
    #   (12*256000//24000)*4 = 128*4 = 512
    assert M.parse_frame_header(frame_v(2, 3, 14, sr_idx=1), 0) == \
        (512, 256, 24000, 0, 384)
    # MPEG-2.5 Layer II 144 kbps @ 11025 (idx 13): 144*144000//11025
    assert M.parse_frame_header(frame_v(0, 2, 13), 0) == \
        (1880, 144, 11025, 0, 1152)

    # mixed LAYERS at one rate are a walkable stream; duration sums
    # per-frame samples (384 + 1152 @ 44100)
    st_ = M.mp3_stats(frame_v(3, 3, 14) + frame_v(3, 1, 9))
    assert st_["n_frames"] == 2
    assert st_["duration_ms"] == (384 + 1152) * 1000 // 44100
    assert st_["audio_bytes"] == 484 + 417
    # mixed VERSIONS necessarily mix rates (the nine rates are
    # distinct) and still raise
    with pytest.raises(M.Mp3Error, match="mixed sample rates"):
        M.mp3_stats(frame(9) + frame_v(2, 1, 8))


def test_id3v2_syncsafe_skip_and_footer():
    assert M.id3v2_size(b"\xff\xfbxx") == 0
    # size 200 = syncsafe [0,0,1,72]
    tag = b"ID3" + bytes([3, 0, 0, 0, 0, 1, 72]) + b"\x00" * 200
    assert M.id3v2_size(tag) == 210
    # footer flag 0x10 adds 10
    tagf = b"ID3" + bytes([4, 0, 0x10, 0, 0, 1, 72])
    assert M.id3v2_size(tagf + b"\x00" * 210) == 220
    # a set MSB in a size byte is corruption, not a bigger tag
    with pytest.raises(M.Mp3Error, match="syncsafe"):
        M.id3v2_size(b"ID3" + bytes([3, 0, 0, 0, 0, 0x80, 0]))


def test_walk_and_stats_vbr_cbr_and_trailers():
    blob = frame(9) + frame(14, pad=1) + frame(9)
    st = M.mp3_stats(blob)
    assert st["n_frames"] == 3 and st["sample_rate"] == 44100
    assert st["audio_bytes"] == 417 + 1045 + 417 == len(blob)
    assert st["duration_ms"] == 3 * 1152 * 1000 // 44100 == 78
    assert (st["bitrate_min_kbps"], st["bitrate_max_kbps"]) == (128, 320)
    assert st["is_vbr"] is True and st["first_frame_offset"] == 0

    tag = b"ID3" + bytes([3, 0, 0, 0, 0, 0, 42]) + b"\x00" * 42
    id3v1 = b"TAG" + b"\x00" * 125
    st2 = M.mp3_stats(tag + frame(9) + frame(9) + id3v1)
    assert st2["n_frames"] == 2 and st2["is_vbr"] is False
    assert st2["first_frame_offset"] == 52


def test_gates_name_the_variant():
    f = bytearray(frame(9))
    for mutate, msg in (
        (lambda b: b.__setitem__(1, 0xEB), "reserved MPEG version"),
        (lambda b: b.__setitem__(1, 0xF9), "reserved layer"),
        (lambda b: b.__setitem__(2, 0x00), "free-format"),
        (lambda b: b.__setitem__(2, 0xF0), "invalid bitrate"),
        (lambda b: b.__setitem__(2, 0x9C), "reserved sampling"),
        (lambda b: b.__setitem__(0, 0x7F), "lost sync"),
    ):
        b = bytearray(f)
        mutate(b)
        with pytest.raises(M.Mp3Error, match=msg):
            M.parse_frame_header(bytes(b), 0)

    with pytest.raises(M.Mp3Error, match="truncated final frame"):
        M.walk_frames(frame(9)[:-1])
    with pytest.raises(M.Mp3Error, match="no MPEG frames"):
        M.walk_frames(b"ID3" + bytes([3, 0, 0, 0, 0, 0, 0]))
    with pytest.raises(M.Mp3Error, match="mixed sample rates"):
        M.mp3_stats(frame(9) + frame(9, sr_idx=1))
    # mid-stream garbage raises rather than silently resyncing
    with pytest.raises(M.Mp3Error, match="lost sync"):
        M.walk_frames(frame(9) + b"\x00" * 64)


def test_trailing_bytes_policy():
    """After >=1 frame the walk stops cleanly on: <4 remainder bytes,
    a whole OR truncated ID3v1 'TAG' trailer, or an APEv2 footer tag.
    The same bytes with no frame before them still raise, and a 4+
    byte non-TAG remainder is still lost sync."""
    f = frame(9)
    for tail in (b"\x00", b"\xff\xff\xff",              # < 4 bytes
                 b"TAG" + b"\x00" * 125,                # whole ID3v1
                 b"TAG" + b"\x00" * 60,                 # truncated ID3v1
                 b"TAG+" + b"\x00" * 223                # extended ID3v1
                 + b"TAG" + b"\x00" * 125,              #   stacked tag
                 b"LYRICSBEGIN" + b"\x00" * 90          # Lyrics3 stack
                 + b"TAG" + b"\x00" * 125,
                 b"APETAGEX" + b"\x00" * 200):          # APEv2
        st = M.mp3_stats(f + f + tail)
        assert st["n_frames"] == 2 and st["audio_bytes"] == 2 * 417
    with pytest.raises(M.Mp3Error):
        M.walk_frames(b"TAG" + b"\x00" * 60)  # trailer with no frames
    with pytest.raises(M.Mp3Error, match="lost sync"):
        M.walk_frames(f + b"JUNKJUNK")
    # the TAG arm is BOUNDED (<= 355 = TAG+ 227 + ID3v1 128): a stray
    # 'TAG' hiding further valid frames must raise, not silently
    # truncate the stats (review pass 3)
    with pytest.raises(M.Mp3Error, match="lost sync"):
        M.walk_frames(f + b"TAG" + b"\x00" * 125 + f + f + f)


def test_mp3_scan_operator_nulls_and_values(spark):
    from openpolicedata_spark.operators.multimodal import mp3_scan

    blob = frame(9) + frame(14)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, None), (3, bytearray(b"not an mp3"))],
        "media_id long, content binary")
    out = {r.media_id: r for r in mp3_scan(df).collect()}
    assert out[1].n_frames == 2 and out[1].audio_bytes == 417 + 1044
    assert out[1].is_vbr is True
    assert out[2].n_frames is None and out[3].duration_ms is None

    # a non-default id column keeps its name in the output schema
    # (review finding: the hardcoded schema name used to break this)
    df2 = spark.createDataFrame([(7, bytearray(blob))],
                                "doc_id long, content binary")
    got = mp3_scan(df2, id_col="doc_id").collect()
    assert got[0].doc_id == 7 and got[0].n_frames == 2

    # ... and a non-long id TYPE survives Arrow conversion (ADVICE r8:
    # the schema hardcoded `long` even after the name fix)
    df3 = spark.createDataFrame([("clip-a", bytearray(blob))],
                                "doc_id string, content binary")
    got3 = mp3_scan(df3, id_col="doc_id").collect()
    assert got3[0].doc_id == "clip-a" and got3[0].n_frames == 2


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 14), st.integers(0, 1),
                       st.sampled_from([1, 2, 3])),   # (br, pad, layer)
             min_size=1, max_size=12),
    st.sampled_from([3, 2, 0]),  # version bits: MPEG-1 / 2 / 2.5
    st.integers(0, 2),           # sample-rate index
    st.one_of(st.none(), st.integers(0, 300)),  # ID3v2 payload size
    st.booleans(),               # ID3v1 trailer
)
def test_mp3_walk_roundtrip_property(frames_spec, ver_bits, sr_idx,
                                     id3_sz, id3v1):
    """Generative round trip across ALL version/layer combos: any frame
    sequence assembled from the header formulas (random version, random
    per-frame layer/bitrate-index/padding, optional ID3v2 of random
    syncsafe size, optional ID3v1 trailer) walks back to exactly its
    generative parameters — count, offsets, per-frame sizes, duration
    on the chosen clock (summing per-frame samples), VBR flag."""
    parts = []
    off0 = 0
    if id3_sz is not None:
        parts.append(b"ID3" + bytes([3, 0, 0,
                                     (id3_sz >> 21) & 0x7F,
                                     (id3_sz >> 14) & 0x7F,
                                     (id3_sz >> 7) & 0x7F,
                                     id3_sz & 0x7F]) + b"\xee" * id3_sz)
        off0 = 10 + id3_sz
    vclass = 1 if ver_bits == 3 else 2
    sizes, brs, spfs = [], [], []
    for br_idx, pad, layer in frames_spec:
        f = frame_v(ver_bits, 4 - layer, br_idx, sr_idx=sr_idx, pad=pad,
                    fill=b"\xa5")
        sizes.append(len(f))
        brs.append(M.MP3_BITRATE_LADDERS[(vclass, layer)][br_idx])
        spfs.append(384 if layer == 1
                    else 576 if (layer == 3 and vclass == 2) else 1152)
        parts.append(f)
    if id3v1:
        parts.append(b"TAG" + b"\x01" * 125)
    st_ = M.mp3_stats(b"".join(parts))
    rate = M.MP3_SAMPLE_RATES_BY_VERSION[ver_bits][sr_idx]
    assert st_["n_frames"] == len(frames_spec)
    assert st_["first_frame_offset"] == off0
    assert st_["audio_bytes"] == sum(sizes)
    assert st_["sample_rate"] == rate
    assert st_["duration_ms"] == sum(spfs) * 1000 // rate
    assert (st_["bitrate_min_kbps"], st_["bitrate_max_kbps"],
            st_["bitrate_sum_kbps"]) == (min(brs), max(brs), sum(brs))
    assert st_["is_vbr"] == (min(brs) != max(brs))


def free_frame(ver_bits, layer_bits, size, sr_idx=0, pad=0,
               fill=b"\x25"):
    """One FREE-FORMAT frame (br_idx 0) of an EXPLICIT size — the
    test's own builder, independent of the walker's derivation."""
    hdr = bytes([0xFF, 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1,
                 (0 << 4) | (sr_idx << 2) | (pad << 1), 0])
    return hdr + fill * (size - 4)


class TestFreeFormat:
    """Round 10 (verdict item 4): free-format frame size derived from
    the sync-word distance — pure stream arithmetic, the unblocked F10
    sliver."""

    def test_hand_computed_base_and_derived_bitrate(self):
        # MPEG-1 Layer III @44100, base 417 (not on any ladder slot
        # boundary by construction of the padding mix): sizes walk
        # base + pad, bitrate = floor(417*44100/144000) = 127 kbps
        pads = [1, 0, 1, 1, 0]
        data = b"".join(free_frame(3, 1, 417 + p, pad=p) for p in pads)
        fr = M.walk_frames(data)
        assert [f[1] for f in fr] == [417 + p for p in pads]
        assert fr[0][2] == 417 * 44100 // 144000 == 127
        st_ = M.mp3_stats(data)
        assert st_["audio_bytes"] == 5 * 417 + 3
        assert st_["is_vbr"] is False
        # Layer I MPEG-2 @24000: 4-byte slots, base 400 ->
        # floor((400/4)*24000/12000) = 200 kbps
        data = (free_frame(2, 3, 400, sr_idx=1)
                + free_frame(2, 3, 404, sr_idx=1, pad=1)
                + free_frame(2, 3, 400, sr_idx=1))
        fr = M.walk_frames(data)
        assert [f[1] for f in fr] == [400, 404, 400]
        assert fr[0][2] == 200 and fr[0][4] == 384

    def test_payload_ff_bytes_do_not_false_sync(self):
        # 0xFF bytes in the payload whose following byte does NOT
        # complete the stream's 13-bit signature are skipped by the
        # derivation scan
        f1 = free_frame(3, 1, 300, fill=b"\xff")[:4] \
            + b"\xff\x00" * 148   # 0xFF always followed by 0x00
        f2 = free_frame(3, 1, 300)
        fr = M.walk_frames(f1 + f2)
        assert [f[1] for f in fr] == [300, 300]

    def test_single_frame_and_mixed_raise(self):
        with pytest.raises(M.Mp3Error, match="no second matching sync"):
            M.walk_frames(free_frame(3, 1, 417))
        # free frames after fixed frames (and vice versa) are corruption
        with pytest.raises(M.Mp3Error, match="free-format frame after"):
            M.walk_frames(frame(9) + free_frame(3, 1, 417) * 2)
        with pytest.raises(M.Mp3Error, match="fixed-bitrate frame in"):
            M.walk_frames(free_frame(3, 1, 417) * 2 + frame(9))
        # version/layer/rate change mid free-format stream
        with pytest.raises(M.Mp3Error, match="changed version"):
            M.walk_frames(free_frame(3, 1, 417) * 2
                          + free_frame(3, 1, 417, sr_idx=1))
        # the single-header parser still gates free format loudly
        with pytest.raises(M.Mp3Error, match="free-format"):
            M.parse_frame_header(free_frame(3, 1, 417), 0)

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(80, 600),                  # base size (slots for L1)
        st.lists(st.integers(0, 1), min_size=2, max_size=10),  # pads
        st.sampled_from([(3, 1), (3, 2), (3, 3), (2, 1), (2, 3),
                         (0, 1), (0, 2)]),     # (version, layer_bits)
        st.integers(0, 2),                     # sample-rate index
    )
    def test_free_format_roundtrip_property(self, base, pads, vl,
                                            sr_idx):
        """Any constant-base free-format stream (random version/layer/
        rate/base/padding pattern) walks back to its generative sizes
        and the pinned floor-inverse bitrate."""
        ver_bits, layer_bits = vl
        layer = 4 - layer_bits
        slot = 4 if layer == 1 else 1
        base_b = base * slot if layer == 1 else base
        data = b"".join(
            free_frame(ver_bits, layer_bits, base_b + p * slot,
                       sr_idx=sr_idx, pad=p) for p in pads)
        fr = M.walk_frames(data)
        assert [f[1] for f in fr] == [base_b + p * slot for p in pads]
        rate = M.MP3_SAMPLE_RATES_BY_VERSION[ver_bits][sr_idx]
        vclass = 1 if ver_bits == 3 else 2
        spf = (384 if layer == 1
               else 576 if (layer == 3 and vclass == 2) else 1152)
        want_br = ((base_b // 4) * rate // 12000 if layer == 1
                   else base_b * rate // ((spf // 8) * 1000))
        assert all(f[2] == want_br and f[4] == spf for f in fr)
        st_ = M.mp3_stats(data)
        assert st_["n_frames"] == len(pads)
        assert st_["duration_ms"] == len(pads) * spf * 1000 // rate


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_mp3_junk_fuzz_raises_mp3error_only(blob):
    """Arbitrary bytes either parse (only if they happen to form valid
    frames) or raise Mp3Error — never IndexError/struct.error/etc.
    (the FLAC junk-fuzz contract, applied to the walker)."""
    try:
        st_ = M.mp3_stats(blob)
    except M.Mp3Error:
        return
    assert st_["n_frames"] >= 1


def test_free_format_layer1_skips_misaligned_false_sync():
    """Layer I frame sizes are whole 4-byte slots: a matching sync word
    at a non-slot-aligned distance is payload noise, and the derivation
    must skip it and lock onto the real (aligned) next frame."""
    from openpolicedata_spark.sources import mp3

    sr_idx, pad = 0, 0
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (3 << 1) | 1,
                 (0 << 4) | (sr_idx << 2) | (pad << 1), 0x00])
    base = 96 * 4
    payload = bytearray(b"\x01" * (base - 4))
    # plant a fake matching sync at absolute offset 203 (distance 203
    # from frame start: matches all 13 bits but 203 % 4 != 0 — payload
    # noise, not a slot boundary)
    payload[199:203] = hdr
    frames = hdr + bytes(payload) + hdr + b"\x01" * (base - 4)
    assert len(frames) == 2 * base
    out = mp3.walk_frames(frames)
    assert [(o, s) for o, s, *_ in out] == [(0, base), (base, base)]
