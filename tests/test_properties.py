"""Property-based tests (hypothesis) — an upgrade over the reference's
example-only suite (SURVEY §5). Each property batches all generated
examples into ONE Spark job."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(deadline=None, max_examples=15)


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 23), st.integers(0, 59), st.integers(0, 59)),
    min_size=1, max_size=30))
def test_parse_time_roundtrip(spark, hms):
    """Any (h, m, s) rendered as HH:MM:SS, H:MM, or HHMM-int must parse to
    the same seconds-since-midnight."""
    from openpolicedata_spark.functions.datetime import parse_time_expr

    rows = []
    for i, (h, m, s) in enumerate(hms):
        rows.append((i * 3 + 0, f"{h:02d}:{m:02d}:{s:02d}", h * 3600 + m * 60 + s))
        rows.append((i * 3 + 1, f"{h}:{m:02d}", h * 3600 + m * 60))
        rows.append((i * 3 + 2, str(h * 100 + m), h * 3600 + m * 60))
    df = spark.createDataFrame(rows, "id long, v string, want long")
    got = df.select("id", "want",
                    parse_time_expr(F.col("v")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, r


@settings(**SETTINGS)
@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    min_size=0, max_size=80), min_size=1, max_size=25))
def test_fingerprint_whitespace_invariant(spark, texts):
    """The md5 fingerprint is invariant under leading/trailing space and
    whitespace-run collapsing (the normalization contract)."""
    from openpolicedata_spark.functions.text import fingerprint_md5_expr

    rows = [(i, t, f"  {t}  ".replace(" ", "   ")) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    got = df.select(
        (fingerprint_md5_expr(F.col("a")) == fingerprint_md5_expr(F.col("b")))
        .alias("eq")).collect()
    assert all(r.eq for r in got)


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(
    ["WHITE", "W", "BLACK", "B", "ASIAN", "A", "HISPANIC", "ZORBLAX", "???"]),
    min_size=1, max_size=30))
def test_race_lut_no_id_contract(spark, vals):
    """no_id='keep' passes unknown values through (uppercased); 'null'
    nulls them; known codes always map to canonical categories
    (reference no_id handling, _converters.py:592-607)."""
    from openpolicedata_spark.functions import luts

    known = {"WHITE": "WHITE", "W": "WHITE", "BLACK": "BLACK", "B": "BLACK",
             "ASIAN": "ASIAN", "A": "ASIAN", "HISPANIC": "LATINO"}
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v string")
    out = df.select(
        "id", "v",
        luts.race_expr(F.col("v"), no_id="keep").alias("keep"),
        luts.race_expr(F.col("v"), no_id="null").alias("nulled"),
    ).collect()
    for r in out:
        if r.v in known:
            assert r.keep == known[r.v] and r.nulled == known[r.v]
        else:
            assert r.keep == r.v.upper()
            assert r.nulled is None


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.lists(st.integers(0, 9), max_size=4),
              st.lists(st.integers(0, 9), max_size=4)),
    min_size=1, max_size=20))
def test_expand_row_count_property(spark, pairs):
    """expand() emits exactly max(1, max array length) rows per input row
    in 'nan' mode, nulls padded."""
    from openpolicedata_spark.operators.expand import expand

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, a array<int>, b array<int>")
    out = expand(df, ["a", "b"])
    got = {}
    for r in out.collect():
        got[r.id] = got.get(r.id, 0) + 1
    for i, (a, b) in enumerate(pairs):
        assert got[i] == max(1, len(a), len(b)), (i, a, b)


@settings(deadline=None, max_examples=8)
@given(st.lists(st.text(alphabet="ab ", min_size=20, max_size=60),
                min_size=2, max_size=10))
def test_minhash_identical_texts_identical_signatures(spark, texts):
    """Signatures are a pure function of normalized text: duplicated docs
    always collide in every band."""
    from openpolicedata_spark.operators.dedup import minhash_signatures

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(i + 1000, t) for i, t in enumerate(texts)]  # exact dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc_id: tuple(r.minhash)
           for r in minhash_signatures(df, num_hashes=16, shingle_k=2).collect()}
    for i in range(len(texts)):
        if i in sig and i + 1000 in sig:
            assert sig[i] == sig[i + 1000]


@settings(deadline=None, max_examples=60)
@given(
    st.sampled_from(["iso", "yyyymmdd", "mmddyyyy", "yyyyq", "year"]),
    st.dates(min_value=dt.date(2019, 1, 1), max_value=dt.date(2021, 12, 31)),
    st.integers(0, 700),
)
def test_where_builder_superset_property(date_text, start, ndays):
    """For ANY date range and storage format, the generated portal WHERE
    must select a SUPERSET of the exactly-matching rows (pushed filters
    may over-select, never under-select) — and accurate clauses select
    exactly. Pure driver-side: fake-portal evaluator, no Spark."""
    from openpolicedata_spark.sources.portals.testing import FakePortal, eval_where, make_rows
    from openpolicedata_spark.sources.portals.where import (
        DateFormat, Dialect, build_date_where)

    fmt = {"iso": DateFormat.TIMESTAMP, "yyyymmdd": DateFormat.YYYYMMDD_TEXT,
           "mmddyyyy": DateFormat.MMDDYYYY_TEXT, "yyyyq": DateFormat.YYYYQ_TEXT,
           "year": DateFormat.YEAR_NUMERIC}[date_text]
    stop = min(start + dt.timedelta(days=ndays), dt.date(2021, 12, 31))
    rows = make_rows(date_text=date_text)
    iso = make_rows(date_text="iso")
    exact = {
        r["case_id"] for r in iso
        if start.isoformat() <= str(r["incident_date"])[:10] <= stop.isoformat()
    }
    wheres = build_date_where(
        "incident_date",
        dt.datetime(start.year, start.month, start.day),
        dt.datetime(stop.year, stop.month, stop.day),
        fmt, Dialect.SOQL)
    selected = set()
    for w in wheres:
        selected |= {r["case_id"] for r in rows if eval_where(r, w.clause)}
    assert exact <= selected, (fmt, start, stop, sorted(exact - selected)[:5])
    if all(w.accurate for w in wheres) and fmt not in (
            DateFormat.YYYYQ_TEXT, DateFormat.YEAR_NUMERIC):
        # accurate day-precision clauses are EXACT
        assert selected == exact, (fmt, start, stop)


@settings(**SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)),
             min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500),
                       st.integers(0, 100)),
             min_size=0, max_size=25),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join (union-merge window form) equals the brute-force
    definition: latest right row with ts <= left ts per key; null when
    none exists. Random keys/times, including equal timestamps."""
    import datetime as _dt

    from openpolicedata_spark.operators.textpipe import asof_join

    base = _dt.datetime(2024, 1, 1)
    lrows = [(k, base + _dt.timedelta(minutes=m), i)
             for i, (k, m) in enumerate(lefts)]
    rrows = [(k, base + _dt.timedelta(minutes=m), v)
             for (k, m, v) in rights]
    ldf = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(rrows, "k long, ts timestamp, payload long")
    out = {r.lid: (r.asof_ts, r.asof_payload)
           for r in asof_join(ldf, rdf, on="k").collect()}
    assert len(out) == len(lrows)
    for (k, lts, lid) in lrows:
        cand = [(rts, v) for (rk, rts, v) in rrows if rk == k and rts <= lts]
        if not cand:
            assert out[lid] == (None, None), (lid, out[lid])
        else:
            best_ts = max(rts for rts, _ in cand)
            got_ts, got_v = out[lid]
            assert got_ts == best_ts
            # ties on (key, ts): payload must be one of the tied rows'
            # (deterministic: the struct-max, asserted elsewhere)
            assert got_v in {v for rts, v in cand if rts == best_ts}


@settings(**SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 2000)),
             min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 2000),
                       st.integers(0, 600)),
             min_size=1, max_size=10),
    st.sampled_from([60, 300, 1800]),
)
def test_interval_join_matches_bruteforce(spark, facts, ivals, bucket_s):
    """bucketed_interval_join equals the naive containment predicate for
    any bucket width (bucketing is an optimization, never semantics)."""
    import datetime as _dt

    from openpolicedata_spark.operators.scale import bucketed_interval_join

    base = _dt.datetime(2024, 1, 1)
    frows = [(k, base + _dt.timedelta(minutes=m), i)
             for i, (k, m) in enumerate(facts)]
    irows = [(k, base + _dt.timedelta(minutes=s),
              base + _dt.timedelta(minutes=s + dur), j)
             for j, (k, s, dur) in enumerate(ivals)]
    fdf = spark.createDataFrame(frows, "k long, ts timestamp, fid long")
    idf = spark.createDataFrame(
        irows, "k long, start timestamp, end timestamp, iid long")
    got = sorted((r.fid, r.iid) for r in bucketed_interval_join(
        fdf, idf, key="k", bucket_seconds=bucket_s).collect())
    want = sorted(
        (fid, iid)
        for (fk, fts, fid) in frows
        for (ik, s, e, iid) in irows
        if fk == ik and s <= fts < e)
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(st.integers(1, 120), min_size=1, max_size=30),
    st.sampled_from([32, 64, 128]),
)
def test_pack_documents_invariants(spark, doc_lens, target):
    """Greedy packing invariants for any doc-length sequence: bins are
    contiguous starting at 0, every bin but the last holds ≥ target
    tokens once closed, and no bin's START offset crosses a bin boundary
    mid-doc (the cumsum definition)."""
    from openpolicedata_spark.operators.textpipe import pack_documents

    rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate(doc_lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = sorted(pack_documents(docs, target_tokens=target, by="lang").collect(),
                 key=lambda r: r.doc_id)
    # bin of each doc equals floor(prefix_sum / target)
    run = 0
    for r in out:
        assert r.bin_id == run // target, (r, run)
        run += r.n_tokens
    bins = [r.bin_id for r in out]
    assert bins[0] == 0
    assert all(b2 - b1 >= 0 for b1, b2 in zip(bins, bins[1:]))  # monotone


@settings(**SETTINGS)
@given(
    st.integers(1, 60),
    st.tuples(st.integers(2, 12), st.integers(1, 12)),
)
def test_chunk_documents_reconstruction(spark, n_tokens, size_stride):
    """Chunks cover every token: the union of [start, start+len) windows
    equals [0, n); consecutive chunk starts differ by exactly stride."""
    chunk, stride = size_stride
    stride = min(stride, chunk)  # overlap requires stride <= chunk
    from openpolicedata_spark.operators.textpipe import chunk_documents

    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_tokens=chunk, stride=stride).collect(),
                  key=lambda r: r.chunk_id)
    covered = set()
    for r in rows:
        got = r.chunk_text.split(" ")
        start = r.chunk_id * stride
        assert got == toks[start:start + chunk], (r.chunk_id, got)
        covered.update(range(start, start + len(got)))
    assert covered == set(range(n_tokens))


def test_zorder_key_bijective_and_per_axis_monotone(spark):
    """Morton interleave: on the full 32x32 grid the key is a bijection,
    equals the arithmetic definition, and is monotone along each axis
    when the other coordinate is fixed (the property that gives every
    z-range a bounded extent in both dimensions)."""
    from openpolicedata_spark.operators.scale import zorder_key_expr

    bits = 5
    grid = (spark.range(1 << bits).select(F.col("id").alias("x"))
            .crossJoin(spark.range(1 << bits).select(F.col("id").alias("y"))))
    rows = grid.select(
        "x", "y", zorder_key_expr(F.col("x"), F.col("y"), bits).alias("z")
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    zs = {}
    for r in rows:
        assert r.z == morton(r.x, r.y)
        zs[(r.x, r.y)] = r.z
    assert len(set(zs.values())) == len(zs)  # bijection
    for fixed in range(1 << bits):
        xs = [zs[(x, fixed)] for x in range(1 << bits)]
        ys = [zs[(fixed, y)] for y in range(1 << bits)]
        assert xs == sorted(xs) and ys == sorted(ys)


@settings(deadline=None, max_examples=10)
@given(st.lists(
    st.tuples(st.integers(0, 3),                 # user
              st.sampled_from(["view", "click", "purchase", "other"]),
              st.integers(0, 20)),               # ts offset seconds
    min_size=0, max_size=30))
def test_funnel_matches_greedy_reference(spark, events):
    """q92's chained-min funnel must equal the obvious greedy scan:
    earliest view, then earliest later click, then earliest later
    purchase — per user, for arbitrary event soups (incl. ties, missing
    stages, out-of-order arrivals)."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    rows = [(u, t, base + _dt.timedelta(seconds=s)) for u, t, s in events]

    def greedy():
        out = {}
        for u in {r[0] for r in rows}:
            evs = sorted([r for r in rows if r[0] == u], key=lambda r: r[2])
            t1 = min((r[2] for r in evs if r[1] == "view"), default=None)
            if t1 is None:
                continue
            t2 = min((r[2] for r in evs if r[1] == "click" and r[2] > t1),
                     default=None)
            if t2 is None:
                continue
            t3 = min((r[2] for r in evs if r[1] == "purchase" and r[2] > t2),
                     default=None)
            if t3 is None:
                continue
            out[u] = (t1, t2, t3)
        return out

    from openpolicedata_spark.operators.events import funnel

    df = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows] or [(0, "other", base)],
        "user_id long, event_type string, ts timestamp")
    out = funnel(df, ["view", "click", "purchase"])
    got = {r.user_id: (r.t_view, r.t_click, r.t_purchase)
           for r in out.collect()}
    want = greedy() if rows else {}
    assert got == want


# ---------------------------------------------------------------------------
# stdlib parser round-trips (no Spark)
# ---------------------------------------------------------------------------

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-2**40, max_value=2**40),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
            whitelist_characters="&<>'\"",
        ),
        min_size=0, max_size=20),
    st.booleans(),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(_cell, min_size=1, max_size=6),
                min_size=1, max_size=8))
def test_xlsx_writer_reader_roundtrip(rows):
    """Any grid written as a real .xlsx archive parses back cell-exact
    (strings that are pure whitespace or empty serialize as shared
    strings and return verbatim; trailing all-None rows/cols have no XML
    and therefore no coordinates to restore)."""
    from tests.test_native_parsers import make_xlsx

    from openpolicedata_spark.sources.xlsx import read_xlsx

    grids = read_xlsx(make_xlsx({"S": rows}))
    g = grids["S"]
    width = max((max((i for i, v in enumerate(r) if v is not None),
                     default=-1) + 1) for r in rows)
    height = max((ri for ri, r in enumerate(rows)
                  if any(v is not None for v in r)), default=-1) + 1
    if height == 0:
        assert g.empty
        return
    assert g.shape == (height, width)
    for ri in range(height):
        for ci in range(width):
            want = rows[ri][ci] if ci < len(rows[ri]) else None
            got = g.iloc[ri, ci]
            if want is None:
                assert got is None
            else:
                assert got == want and type(got) is type(want)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.lists(st.text(alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"),
        whitelist_characters=" &"), min_size=1, max_size=12),
        min_size=2, max_size=5),
    min_size=2, max_size=6).filter(
        lambda rows: len({len(r) for r in rows}) == 1))
def test_htmltable_render_parse_roundtrip(rows):
    """A rectangular table rendered as plain th/td HTML parses back with
    the first row as header and every cell intact (entities escaped on
    the way in, decoded on the way out)."""
    import html as html_mod

    from openpolicedata_spark.sources.htmltable import read_html_tables

    head = "".join(f"<th>{html_mod.escape(c)}</th>" for c in rows[0])
    body = "".join(
        "<tr>" + "".join(f"<td>{html_mod.escape(c)}</td>" for c in r)
        + "</tr>" for r in rows[1:])
    (t,) = read_html_tables(
        f"<table><tr>{head}</tr>{body}</table>")
    # cell text is stripped on parse (HTML ignores edge whitespace);
    # empty header cells synthesize col_<i> placeholders
    assert list(t.columns) == [
        c.strip() if c.strip() else f"col_{i}"
        for i, c in enumerate(rows[0])]
    assert len(t) == len(rows) - 1
    for ri, r in enumerate(rows[1:]):
        for ci, c in enumerate(r):
            want = c.strip()
            got = t.iloc[ri, ci]
            assert (got is None and want == "") or got == want


# -- codec round trips (pure driver-side; no Spark job) ----------------------

@settings(**SETTINGS)
@given(st.integers(1, 24), st.integers(1, 24), st.booleans(),
       st.booleans(), st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(h, w, gray, interlace, seed):
    """encode_png → decode_png is the identity for ANY uint8 image,
    both interlace modes, gray and RGB."""
    import numpy as np

    from openpolicedata_spark.sources.png import decode_png, encode_png

    r = np.random.default_rng(seed)
    if gray:
        img = r.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_png(encode_png(img[..., None], interlace=interlace))
        assert np.array_equal(out if out.ndim == 2 else out[..., 0], img)
    else:
        img = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_png(encode_png(img, interlace=interlace))
        assert np.array_equal(out, img)


@settings(**SETTINGS)
@given(st.sampled_from([2, 4, 16, 64, 256]), st.integers(1, 40),
       st.integers(1, 40), st.integers(1, 3),
       st.integers(0, 2**32 - 1))
def test_gif_roundtrip_property(n_colors, h, w, n_frames, seed):
    """encode_gif → decode_gif is the identity on index grids for ANY
    palette size / canvas / frame count (GIF is lossless)."""
    import numpy as np

    from openpolicedata_spark.sources.gif import decode_gif, encode_gif

    r = np.random.default_rng(seed)
    steps = np.linspace(0, 255, n_colors).astype(np.uint8)
    pal = np.stack([steps] * 3, axis=1)
    frames = [r.integers(0, n_colors, size=(h, w), dtype=np.uint8)
              for _ in range(n_frames)]
    out, _ = decode_gif(encode_gif(frames, pal))
    assert len(out) == n_frames
    for got, want in zip(out, frames):
        assert np.array_equal(got, pal[want])


@settings(**SETTINGS)
@given(st.sampled_from(["uint8", "int16", "int32", "float32", "float64"]),
       st.integers(1, 200), st.integers(1, 3), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_property(dtype, n, ch, seed):
    import numpy as np

    from openpolicedata_spark.sources.wav import encode_wav, read_wav

    r = np.random.default_rng(seed)
    if dtype == "uint8":
        a = r.integers(0, 256, size=(n, ch)).astype(np.uint8)
    elif dtype == "int16":
        a = r.integers(-2**15, 2**15, size=(n, ch)).astype(np.int16)
    elif dtype == "int32":
        a = r.integers(-2**31, 2**31, size=(n, ch)).astype(np.int32)
    else:
        a = r.uniform(-1, 1, size=(n, ch)).astype(dtype)
    rate, out = read_wav(encode_wav(a, 8000))
    assert rate == 8000 and out.dtype == a.dtype
    assert np.array_equal(out, a)


@settings(**SETTINGS)
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 2**32 - 1))
def test_jpeg_flat_blocks_bit_exact_property(bh, bw, seed):
    """decode(encode(x)) is the IDENTITY for any flat-8x8-block gray
    image under unit quantization (DC-only spectra are integers)."""
    import numpy as np

    from openpolicedata_spark.sources.jpeg import decode_jpeg, encode_jpeg

    r = np.random.default_rng(seed)
    tiles = r.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    img = tiles.repeat(8, axis=0).repeat(8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


@settings(**SETTINGS)
@given(st.sampled_from([1, 4, 8, 24, 32]), st.integers(1, 12),
       st.integers(1, 12), st.booleans(), st.integers(0, 2**32 - 1))
def test_bmp_decode_property(bpp, h, w, top_down, seed):
    import numpy as np

    from openpolicedata_spark.sources.bmp import decode_bmp
    from tests.test_bmp import build_bmp

    r = np.random.default_rng(seed)
    if bpp > 8:
        img = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        want = img
        pal = None
    else:
        n = 1 << bpp if bpp < 8 else 256
        pal = r.integers(0, 256, size=(n, 3), dtype=np.uint8)
        img = r.integers(0, n, size=(h, w), dtype=np.uint8)
        want = pal[img]
    out = decode_bmp(build_bmp(img, bpp=bpp, palette=pal,
                               top_down=top_down))
    assert np.array_equal(out, want)


@settings(**SETTINGS)
@given(st.sampled_from(["ulaw", "alaw"]), st.integers(1, 300),
       st.integers(1, 2), st.integers(0, 2**32 - 1))
def test_g711_quantized_identity_property(codec, n, ch, seed):
    """For ANY int16 input, one G.711 trip quantizes and every further
    trip is the identity (decode levels are fixed points of
    encode∘decode); quantization error is bounded by the largest
    segment step and monotone ordering of inputs is preserved."""
    import numpy as np

    from openpolicedata_spark.sources.wav import encode_wav, read_wav

    r = np.random.default_rng(seed)
    a = r.integers(-2**15, 2**15, size=(n, ch)).astype(np.int16)
    _, q1 = read_wav(encode_wav(a, 8000, codec=codec))
    _, q2 = read_wav(encode_wav(q1, 8000, codec=codec))
    assert np.array_equal(q1, q2)
    assert np.abs(q1.astype(int) - a.astype(int)).max() <= 1024
    order = np.argsort(a[:, 0], kind="stable")
    assert np.all(np.diff(q1[order, 0].astype(int)) >= 0)


@settings(**SETTINGS)
@given(st.integers(1, 600), st.integers(1, 2), st.integers(2, 40),
       st.integers(0, 2**32 - 1))
def test_ima_adpcm_tracks_smooth_signals_property(n, ch, period,
                                                  seed):
    """IMA-ADPCM round trips any smooth (bounded-slope) signal with
    bounded error, for any length (incl. partial final blocks) and
    channel count; output shape/dtype always match the input."""
    import numpy as np

    from openpolicedata_spark.sources.wav import encode_wav, read_wav

    r = np.random.default_rng(seed)
    t = np.arange(n)
    phase = r.uniform(0, 6.28, size=ch)
    amp = r.integers(100, 8000, size=ch)
    sig = np.stack([(amp[c] * np.sin(t / period + phase[c]))
                    for c in range(ch)], axis=1).astype(np.int16)
    rate, out = read_wav(encode_wav(sig, 8000, codec="ima_adpcm"))
    assert rate == 8000 and out.shape == sig.shape
    assert out.dtype == np.int16
    # the coder re-adapts from step 7 at each block start, so the
    # early-transient error is unbounded by design (it can approach the
    # amplitude for steep starts); the TRACKING guarantee is
    # steady-state: once the step has had 32 samples to adapt, error is
    # within a few matched steps of the slope
    if n > 32:
        err = np.abs(out[32:].astype(int) - sig[32:].astype(int)).max()
        bound = max(300, int(8 * amp.max() / period))
        assert err <= bound, (err, bound)


@settings(**SETTINGS)
@given(st.integers(0, 2**32 - 1), st.integers(1, 60))
def test_mojibake_fix_inverts_codec_damage_property(seed, n_words):
    """fix(damage(x)) == x for any text over the recoverable alphabet,
    where damage is the REAL utf-8→cp1252 codec round trip; fix is
    idempotent; score(clean ascii) == 0. (Pure-Python property — the
    Spark expression shares the same MOJIBAKE_MAP literal.)"""
    import random as _rnd

    from openpolicedata_spark.functions.text import MOJIBAKE_CHARS

    r = _rnd.Random(seed)
    words = []
    alphabet = "abc XYZ.,!?" + MOJIBAKE_CHARS
    for _ in range(n_words):
        words.append("".join(r.choice(alphabet)
                             for _ in range(r.randint(1, 8))))
    clean = " ".join(words)
    damaged = clean.encode("utf-8").decode("cp1252")

    def py_fix(s: str) -> str:
        from openpolicedata_spark.functions.text import MOJIBAKE_MAP
        for sig, good in MOJIBAKE_MAP:
            s = s.replace(sig, good)
        return s

    assert py_fix(damaged) == clean
    # NOTE deliberately NOT asserting py_fix(py_fix(...)): the chain is
    # single-pass only — e.g. x = 'â€–' survives one fix (output == x)
    # but a second pass would eat the 'â€“' it contains


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 2),            # key
              st.integers(0, 400_000),      # seconds offset
              st.integers(-50, 50)),        # value
    min_size=1, max_size=40))
def test_gap_fill_locf_laws(spark, obs):
    """LOCF laws on arbitrary event sets: per key the grid is exactly
    contiguous min..max observed buckets, the first bucket is never a
    gap, no output value is NULL, and every gap bucket carries the
    value of the latest earlier observed bucket."""
    from openpolicedata_spark.operators.events import gap_fill

    base = dt.datetime(2024, 1, 1)
    rows = [(k, base + dt.timedelta(seconds=s), float(v))
            for k, s, v in obs]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, value double")
    out = gap_fill(df, key_col="k", ts_col="ts", value_col="value",
                   step_seconds=3600)
    got = sorted((r.k, r.bucket_ts, r.value, r.is_gap)
                 for r in out.collect())
    # python reference
    import collections
    buckets = collections.defaultdict(dict)
    for k, s, v in obs:
        b = s // 3600
        cur = buckets[k].get(b)
        buckets[k][b] = max(cur, float(v)) if cur is not None else float(v)
    want = []
    for k, bs in buckets.items():
        lo, hi = min(bs), max(bs)
        last = None
        for b in range(lo, hi + 1):
            if b in bs:
                last = bs[b]
                want.append((k, base + dt.timedelta(hours=b), last, False))
            else:
                want.append((k, base + dt.timedelta(hours=b), last, True))
    assert got == sorted(want)


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 2),           # key
              st.integers(0, 30),          # day offset (ties allowed)
              st.sampled_from("ABC")),     # value
    min_size=1, max_size=30))
def test_scd2_intervals_tile_and_compress(spark, log):
    """SCD2 laws on arbitrary change logs: per key the intervals TILE
    (each valid_to equals the next valid_from, exactly one open
    current version), consecutive versions always differ, and version
    count equals the reference run-length encoding of the
    (ts, change_id)-ordered value sequence."""
    from openpolicedata_spark.operators.merge import scd2_intervals

    base = dt.datetime(2024, 1, 1)
    rows = [(k, i, base + dt.timedelta(days=d), v)
            for i, (k, d, v) in enumerate(log)]
    df = spark.createDataFrame(rows, "k long, cid long, ts timestamp_ntz, v string")
    # None-safe sort key: an all-tied-timestamp log (e.g. A/B/A at one
    # instant) legitimately yields two versions sharing (k, valid_from,
    # v) where one valid_to is an open NULL — a plain tuple sort would
    # compare None < datetime and raise (hypothesis-found, r13).
    def _vkey(t):
        k, vf, v, vt, cur = t
        return (k, vf, v, vt is None, vt or dt.datetime.min, cur)

    out = sorted(((r.k, r.valid_from, r.v, r.valid_to, r.is_current)
                  for r in scd2_intervals(
                      df, "k", "ts", ["v"],
                      tiebreak_col="cid").collect()), key=_vkey)
    # reference RLE over the ordered log
    import collections
    ordered = collections.defaultdict(list)
    for k, cid, ts, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        seq = ordered[k]
        if not seq or seq[-1][1] != v:
            seq.append((ts, v))
    want = []
    for k, seq in ordered.items():
        for i, (ts, v) in enumerate(seq):
            nxt = seq[i + 1][0] if i + 1 < len(seq) else None
            want.append((k, ts, v, nxt, nxt is None))
    assert out == sorted(want, key=_vkey)
    per_key_current = collections.Counter(k for k, *_ , cur in out if cur)
    assert all(c == 1 for c in per_key_current.values())


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(-1800, 1800), st.integers(-590, 590),
              st.booleans()),
    min_size=2, max_size=25, unique=True))
def test_radius_pairs_equals_brute_force(spark, pts):
    """Grid-blocked degree-metric pairs must equal the O(n²) brute
    force exactly (membership AND distance) for arbitrary point sets —
    including points straddling cell boundaries AND the ±180° seam
    (round 11: seam-flagged points are remapped into
    [176°, 180°] ∪ [−180°, −176°], and the reference measures the
    WRAPPED longitude difference min(|Δ|, 360−|Δ|) in the operator's
    exact IEEE op order, so crossing pairs must match bit-for-bit)."""
    from openpolicedata_spark.operators.geo import radius_pairs

    def _lon(x, seam):
        if not seam:
            return x / 10.0
        # fold into [176, 184) then wrap past 180 to the negative side
        v = 176.0 + ((x + 1800) % 80) / 10.0
        return v - 360.0 if v >= 180.0 else v

    coords = [(_lon(x, s), y / 10.0) for (x, y, s) in pts]
    rows = [(i, lo, la) for i, (lo, la) in enumerate(coords)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    out = {(r.id_a, r.id_b): r.dist
           for r in radius_pairs(df, "id", "lon", "lat",
                                 radius=1.5, metric="degree").collect()}
    import math
    want = {}
    for i, (xi, yi) in enumerate(coords):
        for j in range(i + 1, len(coords)):
            xj, yj = coords[j]
            dlat = yi - yj
            adl = abs(xi - xj)
            wdl = min(adl, 360.0 - adl)
            dd = dlat * dlat + wdl * wdl
            if dd <= 1.5 * 1.5:
                want[(i, j)] = math.sqrt(dd)
    assert set(out) == set(want)
    for k2, v in want.items():
        assert out[k2] == v, (k2, out[k2], v)


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(-1790, 1790), st.integers(-800, 800)),
    min_size=2, max_size=18, unique=True))
def test_radius_pairs_haversine_equals_brute_force(spark, pts):
    """The haversine branch (delegating to scale.radius_join) must find
    exactly the brute-force great-circle pairs — polar latitudes and
    seam-adjacent longitudes included. Pairs within 1e-6 km of the
    radius are exempt from membership (Python libm and the JVM may
    differ in the last ulp); any matched pair's distance must agree to
    1e-9 km."""
    import math

    from openpolicedata_spark.operators.geo import radius_pairs

    R, RADIUS = 6371.0088, 500.0
    rows = [(i, x / 10.0, y / 10.0) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    out = {(r.id_a, r.id_b): r.dist
           for r in radius_pairs(df, "id", "lon", "lat",
                                 radius=RADIUS,
                                 metric="haversine").collect()}

    def hav(p, q):
        lon1, lat1 = p[0] / 10.0, p[1] / 10.0
        lon2, lat2 = q[0] / 10.0, q[1] / 10.0
        a = (math.sin(math.radians(lat2 - lat1) / 2) ** 2
             + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
             * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
        return 2 * R * math.asin(math.sqrt(a))

    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = hav(pts[i], pts[j])
            if abs(d - RADIUS) < 1e-6:
                continue  # boundary ulp exemption
            if d < RADIUS:
                assert (i, j) in out, (pts[i], pts[j], d)
                assert abs(out[(i, j)] - d) < 1e-9, (out[(i, j)], d)
            else:
                assert (i, j) not in out, (pts[i], pts[j], d)


@settings(**SETTINGS)
@given(st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc dd", "", " ", "x",
                              "\t", " \t ", "y\r", "\r"]),
             min_size=0, max_size=6),
    min_size=1, max_size=12), st.integers(1, 3))
def test_dedup_lines_matches_python_reference(spark, docs, min_chars):
    """dedup_lines equals the obvious sequential reference for any
    corpus and min_line_chars: scan docs in id order, keep a line's
    first occurrence, always keep lines with < min_chars
    non-whitespace characters — whitespace pinned to the explicit
    [ \\t\\r\\f] class on BOTH sides (the operator's regex and this
    reference), so tab-only and CR-bearing lines exercise the same
    rule (ADVICE r10: the old space-only reference vacuously agreed
    with a \\s-classed operator)."""
    import re

    from openpolicedata_spark.operators.textpipe import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in dedup_lines(df, min_line_chars=min_chars).collect()}
    seen = set()
    for i, lines in enumerate(docs):
        lines = ("\n".join(lines)).split("\n")   # '' doc -> ['']
        kept = []
        dropped = 0
        for ln in lines:
            exempt = len(re.sub(r"[ \t\r\f]", "", ln)) < min_chars
            if exempt or ln not in seen:
                kept.append(ln)
                if not exempt:
                    seen.add(ln)
            else:
                dropped += 1
        assert got[i] == ("\n".join(kept), len(kept), dropped), (
            i, lines, got[i])


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=24),
       st.sampled_from(["NFC", "NFKC"]))
def test_normalize_unicode_matches_reference_and_is_idempotent(
        spark, texts, form):
    """normalize_unicode == stdlib unicodedata row-for-row on
    arbitrary unicode (surrogates excluded by st.text), and the
    operator composed with itself is a fixpoint — through the Arrow
    stage and the ASCII fast-path mask, not just the library call."""
    import unicodedata

    from openpolicedata_spark.operators.textpipe import normalize_unicode

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    # ONE plan carries both the single and the composed application
    # (still two chained Arrow stages — same composition coverage,
    # half the Spark jobs per hypothesis example)
    once = normalize_unicode(df, "text", form=form)
    both = normalize_unicode(
        once.withColumn("once", F.col("text")), "text", form=form)
    res = {r.id: (r.once, r.text) for r in both.collect()}
    for i, t in rows:
        assert res[i][0] == unicodedata.normalize(form, t), (form, t)
        assert res[i][1] == res[i][0], (form, t)


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=24))
def test_strip_accents_matches_reference_and_is_idempotent(spark,
                                                           texts):
    """strip_accents == NFD-drop-Mn reference row-for-row on
    arbitrary unicode, idempotent through the operator, and
    stripping commutes with NFC normalization (both orders land on
    the same bytes — the pipeline-ordering law)."""
    import unicodedata

    from openpolicedata_spark.operators.textpipe import (
        normalize_unicode,
        strip_accents,
    )

    def ref(t):
        return "".join(c for c in unicodedata.normalize("NFD", t)
                       if unicodedata.category(c) != "Mn")

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    # ONE plan carries the single application, the composed application
    # (idempotence), and the strip∘NFC order (the pipeline-ordering
    # law: normalizing first cannot change what the strip removes —
    # decomposition re-splits any recomposed marks). Same Arrow-stage
    # compositions as three separate collects, one Spark job per
    # hypothesis example instead of three.
    once = strip_accents(df.withColumn("orig", F.col("text")), "text")
    twice = strip_accents(
        once.withColumn("once", F.col("text")), "text")
    chained = strip_accents(
        normalize_unicode(
            twice.withColumn("twice", F.col("text"))
                 .withColumn("text", F.col("orig")),
            "text"),
        "text")
    res = {r.id: (r.once, r.twice, r.text) for r in chained.collect()}
    for i, t in rows:
        assert res[i][0] == ref(t), t
        assert res[i][1] == res[i][0], t
        assert res[i][2] == res[i][0], t
