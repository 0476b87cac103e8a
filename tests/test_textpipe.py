"""Unit tests for operators/textpipe.py — the training-data pipeline ops
(as-of join, packing, chunking, contamination audit, weighted mixing)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.operators.textpipe import (
    asof_join,
    chunk_documents,
    contamination_pairs,
    pack_documents,
    weighted_mix,
)
from openpolicedata_spark.plans import summarize_plan


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:05:00"), 101.0),
            (1, _ts("2024-01-01T09:00:00"), 99.0),   # before any quote
            (2, _ts("2024-01-01T10:00:00"), 200.0),  # key with no quotes
        ],
        "k long, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T10:00:00"), 20.0),  # equal ts → counts (<=)
            (1, _ts("2024-01-01T10:04:00"), 30.0),
        ],
        "k long, ts timestamp, bid double",
    )


def test_asof_backward_semantics(spark, trades, quotes):
    out = asof_join(trades, quotes, on="k")
    got = {(r.k, r.ts): (r.asof_ts, r.asof_bid) for r in out.collect()}
    assert len(got) == 4  # every left row survives exactly once
    # equal timestamp matches (<=)
    assert got[(1, _ts("2024-01-01T10:00:00"))] == (
        _ts("2024-01-01T10:00:00"), 20.0)
    # latest prior quote wins
    assert got[(1, _ts("2024-01-01T10:05:00"))] == (
        _ts("2024-01-01T10:04:00"), 30.0)
    # left row before all right rows → nulls
    assert got[(1, _ts("2024-01-01T09:00:00"))] == (None, None)
    # key absent on the right → nulls
    assert got[(2, _ts("2024-01-01T10:00:00"))] == (None, None)


def test_asof_single_shuffle(spark, trades, quotes):
    s = summarize_plan(asof_join(trades, quotes, on="k"))
    # union-merge: exactly one exchange (the window partitionBy), no join node
    assert s.n_exchanges == 1, s.text
    assert s.n_sortmerge_joins == 0 and s.n_broadcast_joins == 0, s.text


def test_asof_right_cols_subset_and_prefix(spark, trades, quotes):
    out = asof_join(trades, quotes, on="k", right_cols=[], prefix="q_")
    assert set(out.columns) == {"k", "ts", "px", "q_ts"}


def test_pack_documents_greedy_bins(spark):
    # 5 docs of 30 tokens each, target 64 → offsets 0,30,60,90,120
    # → bins 0,0,0,1,1
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 30), "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    out = pack_documents(docs, target_tokens=64, by="lang")
    got = {r.doc_id: (r.bin_id, r.n_tokens) for r in out.collect()}
    assert got == {0: (0, 30), 1: (0, 30), 2: (0, 30), 3: (1, 30), 4: (1, 30)}


def test_pack_documents_partitions_by_group(spark):
    docs = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e f", "fr")],
        "doc_id long, text string, lang string",
    )
    out = pack_documents(docs, target_tokens=4, by="lang")
    got = {(r.lang, r.doc_id): r.bin_id for r in out.collect()}
    # each lang group starts at bin 0
    assert got == {("en", 0): 0, ("fr", 1): 0}


def test_chunk_documents_overlap(spark):
    # 10 tokens, chunk 4, stride 3 → starts 0,3,6 (ceil((10-4)/3)+1 = 3)
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3)
    rows = sorted(out.collect(), key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in rows] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert [r.n_tokens for r in rows] == [4, 4, 4]


def test_chunk_documents_short_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=32, stride=24)
    rows = out.collect()
    # short doc → one partial chunk; empty doc dropped entirely
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].n_tokens == 3


def test_chunk_documents_validates_args(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, stride=0)


def test_contamination_counts(spark):
    # train doc 1 shares its entire 6-token text with bench (2 distinct
    # 5-shingles); train doc 2 shares nothing; train doc 3 too short.
    train = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "q r s t u v"), (3, "a b c")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e f g")],  # contains shingles abcde, bcdef (+cdefg)
        "doc_id long, text string",
    )
    out = contamination_pairs(train, bench, shingle_k=5)
    got = {r.doc_id: r.n_shared for r in out.collect()}
    assert got == {1: 2}


def test_contamination_broadcasts_benchmark(spark):
    train = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(10)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string")
    s = summarize_plan(contamination_pairs(train, bench))
    assert s.n_broadcast_joins >= 1 and s.n_sortmerge_joins == 0, s.text


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 6 tokens, 2 distinct, top bigram "a b"×3 / 5
            (2, "u v w x y z"),      # all distinct, every bigram unique
            (3, "solo"),             # single token: no bigrams
            (4, "  "),               # empty after tokenize: dropped
        ],
        "doc_id long, text string",
    )
    from openpolicedata_spark.operators.textpipe import repetition_stats

    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens == 6
    assert out[1].distinct_ratio == pytest.approx(2 / 6, abs=1e-6)
    assert out[1].top_bigram_frac == pytest.approx(3 / 5, abs=1e-6)
    assert out[2].distinct_ratio == 1.0
    assert out[2].top_bigram_frac == pytest.approx(1 / 5, abs=1e-6)
    assert out[3].n_tokens == 1 and out[3].top_bigram_frac == 0.0


def test_mojibake_fix_real_double_encode_anchor(spark):
    """The repair chain must fix REAL cp1252-in-UTF-8 damage produced by
    the actual codec round trip (not by the map itself), be idempotent,
    and leave clean text untouched; the score counts hits exactly."""
    from pyspark.sql import functions as F

    from openpolicedata_spark.functions.text import (
        MOJIBAKE_CHARS,
        fix_mojibake_expr,
        mojibake_score_expr,
    )

    clean = f"naïve café — “quote” isn’t plain… {MOJIBAKE_CHARS}"
    # genuine damage via the codec itself (excluding '”', whose UTF-8
    # hits cp1252's undefined 0x9D byte)
    damaged = clean.replace("”", "").encode("utf-8").decode("cp1252")
    df = spark.createDataFrame(
        [(1, damaged), (2, "plain ascii text"), (3, None)],
        "id long, t string")
    out = {r.id: r for r in df.select(
        "id",
        fix_mojibake_expr(F.col("t")).alias("fixed"),
        mojibake_score_expr(F.col("t")).alias("score"),
    ).collect()}
    assert out[1].fixed == clean.replace("”", "")
    from openpolicedata_spark.functions.text import MOJIBAKE_MAP
    expected = sum(damaged.count(sig) for sig, _ in MOJIBAKE_MAP)
    assert out[1].score == expected and expected >= 38  # 32 map chars + 6
    assert out[2].fixed == "plain ascii text" and out[2].score == 0
    assert out[3].fixed is None
    # stable on THIS input (no map chars adjacent in a sig-forming
    # way); the chain is single-pass in general — not idempotent on
    # adversarial nestings like 'â€–' (see MOJIBAKE_MAP comment)
    again = df.select(fix_mojibake_expr(
        fix_mojibake_expr(F.col("t"))).alias("f2")).collect()
    assert again[0].f2 == out[1].fixed


def test_chunk_chars_boundaries_and_overlap(spark):
    from pyspark.sql import functions as F

    from openpolicedata_spark.operators.textpipe import chunk_chars

    import pytest

    texts = {
        1: "a" * 50,                 # short: one chunk
        2: "x" * 120,                # exactly chunk_size: one chunk
        3: "".join(chr(97 + i % 26) for i in range(121)),  # one char over
        4: "".join(chr(97 + i % 26) for i in range(500)),
        5: "",                       # empty: one empty chunk
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    rows = chunk_chars(df, chunk_size=120, overlap=24).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == texts[1]
    assert len(by_doc[2]) == 1
    assert len(by_doc[3]) == 2  # 121 chars -> second chunk covers the tail
    assert by_doc[3][1].chunk_text == texts[3][96:]
    assert len(by_doc[5]) == 1 and by_doc[5][0].chunk_len == 0
    # stride/overlap law: chunk k starts at k*96; neighbors share 24 chars
    for r in by_doc[4]:
        start = r.chunk_id * 96
        assert r.chunk_text == texts[4][start:start + 120]
    for a, b in zip(by_doc[4], by_doc[4][1:]):
        assert a.chunk_text[-24:] == b.chunk_text[:24]
    # full coverage: concatenating stride-prefixes + last chunk == doc
    rebuilt = "".join(r.chunk_text[:96] for r in by_doc[4][:-1]) \
        + by_doc[4][-1].chunk_text
    assert rebuilt == texts[4]
    with pytest.raises(ValueError, match="overlap"):
        chunk_chars(df, chunk_size=10, overlap=10)


def test_pii_redact(spark):
    from openpolicedata_spark.functions.text import pii_redact_expr

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com now"),
            (2, "host 192.168.1.17 port"),
            (3, "ssn 123-45-6789 ok"),
            (4, "tel 25-989-741-2988 or (415) 555-0199"),
            (5, "clean text, no pii at all"),
        ],
        "id long, s string",
    )
    got = {r.id: r.red for r in
           df.select("id", pii_redact_expr(F.col("s")).alias("red")).collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "host [IP] port"
    assert got[3] == "ssn [SSN] ok"
    assert got[4] == "tel [PHONE] or [PHONE]"
    assert got[5] == "clean text, no pii at all"


def test_bucketed_interval_join(spark):
    from openpolicedata_spark.operators.scale import bucketed_interval_join

    facts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:15:00"), "in_a"),
            (1, _ts("2024-01-01T11:59:00"), "in_b_edge"),
            (1, _ts("2024-01-01T12:00:00"), "out_exclusive_end"),
            (2, _ts("2024-01-01T10:15:00"), "wrong_key"),
            (1, _ts("2024-01-01T09:00:00"), "before_all"),
        ],
        "k long, ts timestamp, tag string",
    )
    ivals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:30:00"), "A"),
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00"), "B"),
        ],
        "k long, start timestamp, end timestamp, name string",
    )
    out = bucketed_interval_join(facts, ivals, key="k",
                                 bucket_seconds=1800)
    got = sorted((r.tag, r.name) for r in out.collect())
    # in_a falls in both intervals; edge row only in B; end is exclusive
    assert got == [("in_a", "A"), ("in_a", "B"), ("in_b_edge", "B")]
    # left-outer keeps unmatched facts
    left = bucketed_interval_join(facts, ivals, key="k",
                                  bucket_seconds=1800, how="left_outer")
    tags = sorted(r.tag for r in left.collect() if r.name is None)
    assert tags == ["before_all", "out_exclusive_end", "wrong_key"]


def test_weighted_mix_deterministic_and_exact(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i % 2 == 0 else "books") for i in range(200)],
        "doc_id long, source string",
    )
    out = weighted_mix(docs, {"web": 40, "books": 0}, default_pct=0)
    ids = sorted(r.doc_id for r in out.collect())
    expected = [i for i in range(200)
                if i % 2 == 0
                and ((i * 2654435761) % 1_000_000_007) % 100 < 40]
    assert ids == expected
    # deterministic: rerun gives the identical set
    ids2 = sorted(r.doc_id for r in
                  weighted_mix(docs, {"web": 40, "books": 0}).collect())
    assert ids2 == ids


def test_weighted_mix_unbiased_for_structured_ids(spark):
    """ids that are all multiples of 100 (shard-prefixed keyspaces) must
    still sample ≈pct, not 0%/100% — the prime intermediate modulus breaks
    the Z_100 bijection of a bare multiplicative hash."""
    docs = spark.createDataFrame(
        [(i * 100, "web") for i in range(500)], "doc_id long, source string")
    n = weighted_mix(docs, {"web": 50}).count()
    expected = sum(1 for i in range(500)
                   if ((i * 100 * 2654435761) % 1_000_000_007) % 100 < 50)
    assert n == expected and 150 <= n <= 350  # ≈250; degenerate 0/500 fails


def test_weighted_mix_default_pct_and_validation(spark):
    docs = spark.createDataFrame(
        [(i, "other") for i in range(50)], "doc_id long, source string")
    assert weighted_mix(docs, {"web": 50}, default_pct=100).count() == 50
    assert weighted_mix(docs, {"web": 50}, default_pct=0).count() == 0
    with pytest.raises(ValueError):
        weighted_mix(docs, {"web": 101})


def test_remove_boilerplate_lines(spark):
    from openpolicedata_spark.operators.textpipe import (
        remove_boilerplate_lines,
    )

    footer = "copyright city pd"
    docs = [
        (1, f"unique one\n{footer}\nalpha"),
        (2, f"unique two\n{footer}"),
        (3, f"unique three\n{footer}\nalpha"),
        (4, f"unique four\n{footer}\n\nbeta"),
        (5, "unique five"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"]
           for r in remove_boilerplate_lines(
               df, max_doc_frac=0.5).collect()}
    # footer in 4/5 docs (>50%) -> dropped everywhere; 'alpha' in 2/5
    # (40% <= threshold) -> kept; order preserved; empty line kept
    assert out[1] == "unique one\nalpha"
    assert out[2] == "unique two"
    assert out[3] == "unique three\nalpha"
    assert out[4] == "unique four\n\nbeta"
    assert out[5] == "unique five"


def test_remove_boilerplate_lines_all_boiler_doc_empty(spark):
    from openpolicedata_spark.operators.textpipe import (
        remove_boilerplate_lines,
    )

    df = spark.createDataFrame(
        [(i, "same line") for i in range(4)], "doc_id long, text string")
    out = remove_boilerplate_lines(df, max_doc_frac=0.2).collect()
    assert len(out) == 4
    assert all(r["clean_text"] == "" for r in out)


class TestMaskRepeatedSpans:
    def test_masks_shared_span_only(self, spark):
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        shared = "alpha beta gamma delta epsilon"
        rows = [
            (1, f"one two {shared} three"),
            (2, f"{shared} four five six"),
            (3, "seven eight nine ten eleven twelve"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               mask_repeated_spans(df, k=5, min_docs=2).collect()}
        assert out[1]["clean_text"] == "one two three"
        assert out[2]["clean_text"] == "four five six"
        assert out[3]["clean_text"] == "seven eight nine ten eleven twelve"
        assert out[1]["n_kept"] == 3 and out[3]["n_kept"] == 6

    def test_overlapping_spans_union_and_full_mask(self, spark):
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        # doc 2 == doc 1 entirely -> every position covered -> empty
        t = "a b c d e f g"
        df = spark.createDataFrame([(1, t), (2, t), (3, "x y z")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               mask_repeated_spans(df, k=5, min_docs=2).collect()}
        assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
        assert out[2]["clean_text"] == ""
        assert out[3]["clean_text"] == "x y z"

    def test_short_and_empty_docs_pass_through(self, spark):
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        df = spark.createDataFrame(
            [(1, "only four tokens here"), (2, ""), (3, "   ")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               mask_repeated_spans(df, k=5, min_docs=2).collect()}
        assert out[1]["clean_text"] == "only four tokens here"
        assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
        assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0

    def test_min_docs_threshold(self, spark):
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        t = "p q r s t u"
        df = spark.createDataFrame([(1, t), (2, t), (3, t)],
                                   "doc_id long, text string")
        # threshold above the duplication level -> nothing masked
        out = mask_repeated_spans(df, k=5, min_docs=4).collect()
        assert all(r["clean_text"] == "p q r s t u" for r in out)

    def test_shuffle_join_path_matches_broadcast(self, spark):
        """broadcast_cuts=False (the heavily-duplicated-corpus fallback)
        must produce the identical output via the id-shuffle join."""
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        shared = "alpha beta gamma delta epsilon"
        rows = [(1, f"one two {shared} three"), (2, f"{shared} four"),
                (3, "u v w x y z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, mask_repeated_spans(
            df, k=5, min_docs=2, broadcast_cuts=True).collect()))
        b = sorted(map(tuple, mask_repeated_spans(
            df, k=5, min_docs=2, broadcast_cuts=False).collect()))
        assert a == b

    DOCS = [
        (1, "alpha beta gamma delta epsilon zeta eta theta COPY one two "
            "three four five six seven END tail1"),
        (2, "unique stuff here COPY one two three four five six seven "
            "END more unique words after that"),
        (3, "totally different document with nothing shared at all in "
            "it whatsoever right now"),
        (4, "alpha beta gamma delta epsilon zeta eta theta something "
            "else entirely here now ok"),
        (5, "x COPY one two three four five six seven END y"),
    ]

    @classmethod
    def _brute(cls, mode, k=5, min_docs=2):
        """Independent per-doc reference: hash-free span table, survivor
        = min doc_id, positional mask."""
        import collections
        import re

        tok = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in cls.DOCS}
        spans = collections.defaultdict(set)
        for d, ts in tok.items():
            for i in range(len(ts) - k + 1):
                spans[tuple(ts[i:i + k])].add(d)
        hot = {s: min(ds) for s, ds in spans.items() if len(ds) >= min_docs}
        out = {}
        for d, ts in tok.items():
            cut = set()
            for i in range(len(ts) - k + 1):
                s = tuple(ts[i:i + k])
                if s in hot and (mode == "mask_all" or hot[s] != d):
                    cut.update(range(i, i + k))
            kept = [t for j, t in enumerate(ts) if j not in cut]
            out[d] = (" ".join(kept), len(kept))
        return out

    def test_brute_force_equivalence_both_modes(self, spark):
        """mask_all AND keep_first match a from-scratch Python reference
        on a corpus with two dup families, overlap, and a min-id doc
        that must keep everything under keep_first."""
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        for mode in ("mask_all", "keep_first"):
            got = {r.doc_id: (r.clean_text, r.n_kept)
                   for r in mask_repeated_spans(df, mode=mode).collect()}
            assert got == self._brute(mode), mode
        # keep_first keeps the survivor doc intact (doc 1 is min for
        # both families) while mask_all guts it
        kf = {r.doc_id: r.n_kept for r in
              mask_repeated_spans(df, mode="keep_first").collect()}
        ma = {r.doc_id: r.n_kept for r in
              mask_repeated_spans(df, mode="mask_all").collect()}
        assert kf[1] == 18 and ma[1] < kf[1]

    def test_keep_first_identical_docs_one_survivor(self, spark):
        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        t = "a b c d e f g h i j"
        df = spark.createDataFrame([(7, t), (9, t), (11, t)],
                                   "doc_id long, text string")
        out = {r.doc_id: r.clean_text for r in
               mask_repeated_spans(df, mode="keep_first").collect()}
        assert out[7] == "a b c d e f g h i j"
        assert out[9] == "" and out[11] == ""

    def test_unknown_mode_raises(self, spark):
        import pytest

        from openpolicedata_spark.operators.textpipe import mask_repeated_spans

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="mode"):
            mask_repeated_spans(df, mode="keep_last")

    def test_many_nonadjacent_runs_gap_complement(self, spark):
        """Round-9 rewrite pin: the kept-token set is now built as the
        gap COMPLEMENT of the run list (O(runs+kept), replacing the
        O(tokens x runs) per-position exists scan). Adversarial shape:
        many non-coalescing hot runs per doc, with the FIRST and LAST
        tokens inside hot runs so both edge gaps are empty (the guard
        branch), separators of width 1 (minimal interior gaps)."""
        from openpolicedata_spark.operators.textpipe import (
            mask_repeated_spans,
        )

        R = 40

        def doc(d):
            parts = []
            for j in range(R):
                parts.append(f"blk{j} alpha beta gamma delta")
                if j < R - 1:
                    parts.append(f"u{d}x{j}")
            return " ".join(parts)

        df = spark.createDataFrame([(0, doc(0)), (1, doc(1))],
                                   "doc_id long, text string")
        out = {r.doc_id: (r.clean_text, r.n_kept)
               for r in mask_repeated_spans(df, k=5).collect()}
        for d in (0, 1):
            want = " ".join(f"u{d}x{j}" for j in range(R - 1))
            assert out[d] == (want, R - 1)


class TestPackFixedSequences:
    @staticmethod
    def _py_hash(key, seed=""):
        import hashlib

        d = hashlib.md5(f"{seed}:{key}".encode()).digest()
        return int.from_bytes(d[8:16], "little") % (1 << 62)

    def test_matches_python_concat_model(self, spark):
        from openpolicedata_spark.operators.textpipe import pack_fixed_sequences

        rows = [(i, 3 + (i * 5) % 11) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        L = 16
        got = sorted(
            (r["doc_id"], r["seq_id"], r["doc_offset"], r["frag_len"],
             r["seq_offset"])
            for r in pack_fixed_sequences(df, L, "n_tok", "doc_id",
                                          seed="s", n_buckets=5).collect())
        # python model: concat in hash order, cut every L
        order = sorted(rows, key=lambda r: (self._py_hash(r[0], "s"), r[0]))
        want, cum = [], 0
        for doc_id, n in order:
            pos = 0
            while pos < n:
                g = cum + pos
                seq = g // L
                take = min(n - pos, (seq + 1) * L - g)
                want.append((doc_id, seq, pos, take, g - seq * L))
                pos += take
            cum += n
        assert got == sorted(want)
        # invariants: every full sequence holds exactly L tokens
        total = sum(n for _, n in rows)
        per_seq = {}
        for _, seq, _, fl, _ in got:
            per_seq[seq] = per_seq.get(seq, 0) + fl
        for seq, tok in per_seq.items():
            assert tok == L or seq == max(per_seq)
        assert sum(per_seq.values()) == total

    def test_zero_weight_docs_dropped_and_bad_seq_len(self, spark):
        import pytest as _p

        from openpolicedata_spark.operators.textpipe import pack_fixed_sequences

        df = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tok long")
        out = pack_fixed_sequences(df, 4, "n_tok", "doc_id").collect()
        assert {r["doc_id"] for r in out} == {2}
        with _p.raises(ValueError):
            pack_fixed_sequences(df, 0, "n_tok", "doc_id")


class TestBpeTrainApply:
    def test_merge_sequence_hand_computed(self, spark):
        from openpolicedata_spark.operators.textpipe import bpe_train

        df = spark.createDataFrame(
            [(1, "aaab aaab aaab aab aab")], "doc_id long, text string")
        merges = bpe_train(df, n_merges=10)
        assert merges == [("a", "a"), ("aa", "a"), ("aaa", "b"),
                          ("aa", "b")]

    def test_apply_greedy_by_rank_and_unseen_words(self, spark):
        from openpolicedata_spark.operators.textpipe import (
            bpe_apply,
            bpe_train,
        )

        train = spark.createDataFrame(
            [(1, "aaab aaab aaab aab aab")], "doc_id long, text string")
        merges = bpe_train(train, n_merges=10)
        test = spark.createDataFrame(
            [(1, "aaab aab ab zq"), (2, None)], "doc_id long, text string")
        out = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe_apply(test, merges).collect()}
        assert out[1] == ["aaab", "aab", "a", "b", "z", "q"]
        assert out[2] == []

    def test_trains_on_real_docs_and_merges_are_productive(self, spark,
                                                          sf_dir):
        from openpolicedata_spark.operators.textpipe import (
            bpe_apply,
            bpe_train,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        merges = bpe_train(docs, n_merges=50)
        assert len(merges) == 50
        enc = bpe_apply(docs.limit(50), merges)
        from pyspark.sql import functions as F

        stats = enc.select(
            F.size("bpe_tokens").alias("n_bpe"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
            F.length(F.regexp_replace("text", r"\s", "")).alias("n_chars"),
        ).agg(F.sum("n_bpe").alias("b"), F.sum("n_words").alias("w"),
              F.sum("n_chars").alias("c")).first()
        # at least one token per word, and STRICTLY fewer than pure
        # characters — broken merges would degrade to char output
        assert stats["b"] >= stats["w"]
        assert stats["b"] < stats["c"]

    def test_sequential_replace_equals_greedy_encoder(self, spark, sf_dir):
        """q127's boundary-guarded sequential replace chain (the
        SQL-expressible Sennrich form, via the SAME _q127_seg_expr the
        query uses) must segment identically to bpe_apply's rank-greedy
        encoder — checked on ADVERSARIAL boundary words (where an
        unguarded replace merges across symbols: 'there' contains
        'e r' across 'the|r') and word-for-word on real docs."""
        from pyspark.sql import functions as F

        from openpolicedata_spark.functions.text import (
            normalize_text_expr,
            tokens_expr,
        )
        from openpolicedata_spark.operators.textpipe import bpe_apply
        from openpolicedata_spark.workload import (
            _Q127_MERGES,
            _q127_seg_expr,
        )

        def seq_segments(df):
            return {r["doc_id"]: [t for arr in r["segs"] for t in arr]
                    for r in df.select(
                        "doc_id",
                        F.transform(
                            tokens_expr(normalize_text_expr(F.col("text"))),
                            lambda w: F.split(_q127_seg_expr(w), " "))
                        .alias("segs")).collect()}

        adversarial = spark.createDataFrame(
            [(1, "there here were other mother rere ererer ananan"),
             (2, "thththth onon inin thethe")],
            "doc_id long, text string")
        for df in (adversarial,
                   spark.read.parquet(f"{sf_dir}/documents.parquet")
                   .limit(100)):
            greedy = {r["doc_id"]: r["bpe_tokens"]
                      for r in bpe_apply(df, _Q127_MERGES).collect()}
            assert greedy == seq_segments(df)


def _exactsubstr_truth_cuts(docs: dict, k: int) -> dict:
    """Brute-force TRUE ExactSubstr keep-one ground truth (Lee et al.
    2022 removal semantics): enumerate every left-maximal pairwise
    suffix match of length >= k across all (doc, pos) occurrence pairs
    in (doc_id, pos) order; the smaller occurrence survives, the
    larger one's covered positions are cut. The union over all pairs
    cuts every duplicated substring occurrence except its first —
    including WITHIN-document repeats. O(positions^2 * len): fine for
    the scenario corpora."""
    ids = sorted(docs)
    occ = [(d, i) for d in ids for i in range(len(docs[d]))]
    cut = {d: set() for d in ids}
    for a in range(len(occ)):
        d1, p1 = occ[a]
        t1 = docs[d1]
        for b in range(a + 1, len(occ)):
            d2, p2 = occ[b]
            t2 = docs[d2]
            if p1 > 0 and p2 > 0 and t1[p1 - 1] == t2[p2 - 1]:
                continue  # not left-maximal: the extended pair covers it
            m = 0
            while (p1 + m < len(t1) and p2 + m < len(t2)
                   and t1[p1 + m] == t2[p2 + m]):
                m += 1
            if m >= k:
                cut[d2].update(range(p2, p2 + m))
    return cut


def test_keep_first_vs_true_exactsubstr_quantified(spark):
    """Round-7 verdict item 4: measure per-span-survivor keep_first
    against TRUE maximal-substring keep-one on corpora with known
    ground truth. The result is sharper than the docstring's old
    qualitative caveat and is now pinned: the approximation is
    ONE-SIDED — operator cuts are a SUBSET of true cuts (over-cut = 0
    ALWAYS: a hot span in doc d with survivor d' < d is itself a
    pairwise duplicate that truth also cuts), and under-cutting occurs
    EXACTLY on within-survivor-doc repeats (min_docs counts distinct
    docs, and the min doc keeps all its copies while truth keeps only
    the first occurrence). Table recorded in SCALE.md."""
    from collections import Counter

    from openpolicedata_spark.operators.textpipe import mask_repeated_spans

    K = 5

    def blk(name, n):
        return [f"{name}{i}" for i in range(n)]

    U = lambda d, n: [f"u{d}x{i}" for i in range(n)]  # noqa: E731
    C, X, Y = blk("c", 12), blk("x", 6), blk("y", 6)
    S1, S2, B = blk("s", 5), blk("t", 5), blk("b", 8)

    scenarios = {
        "clean_copy": {0: U(0, 8) + C + U(1, 8), 1: U(2, 8) + C + U(3, 8)},
        "chain": {0: U(4, 4) + X + U(5, 4), 1: U(6, 4) + X + Y + U(7, 4),
                  2: U(8, 4) + X + Y + U(9, 4)},
        "prefix_share": {0: U(10, 4) + S1 + U(11, 4),
                         2: U(12, 4) + S1 + S2 + U(13, 4),
                         3: U(14, 4) + S1 + S2 + U(15, 4)},
        "triple": {0: C[:10], 1: C[:10], 2: C[:10], 3: U(16, 10)},
        "within_doc": {0: U(17, 4) + B + U(18, 4) + B + U(19, 4),
                       1: U(20, 4) + B + U(21, 4)},
        "within_doc_only": {0: U(22, 4) + B + U(23, 4) + B + U(24, 4),
                            1: U(25, 12)},
    }
    # randomized small-vocab corpus: dense accidental shared spans;
    # the one-sided property (over-cut == 0) must hold unconditionally
    import random

    rng = random.Random(13)
    scenarios["random_dense"] = {
        d: [rng.choice("abcd") for _ in range(40 + 7 * d)]
        for d in range(8)}

    table = {}
    for name, docs in scenarios.items():
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()],
            "doc_id long, text string")
        out = {r.doc_id: r.clean_text.split() if r.clean_text else []
               for r in mask_repeated_spans(
                   df, k=K, mode="keep_first").collect()}
        truth_cut = _exactsubstr_truth_cuts(docs, K)
        over = under = 0
        for d, toks in docs.items():
            truth_kept = Counter(t for i, t in enumerate(toks)
                                 if i not in truth_cut[d])
            op_kept = Counter(out[d])
            over += sum((truth_kept - op_kept).values())
            under += sum((op_kept - truth_kept).values())
        total = sum(len(t) for t in docs.values())
        table[name] = (total, sum(len(c) for c in truth_cut.values()),
                       over, under)
        assert over == 0, (name, table[name])

    # under-cut is EXACTLY the within-survivor-doc repeats
    assert table["clean_copy"][3] == 0
    assert table["chain"][3] == 0
    assert table["prefix_share"][3] == 0
    assert table["triple"][3] == 0
    assert table["within_doc"][3] == len(B)        # doc0's 2nd B copy
    assert table["within_doc_only"][3] == len(B)   # min_docs: distinct
    print("KEEPFIRST_VS_TRUTH " + repr(table))

    # within_doc=True closes the gap ENTIRELY: occurrence-based
    # hotness + lexicographic (doc, pos) survivor == true
    # maximal-substring keep-one, exactly, on every scenario
    for name, docs in scenarios.items():
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()],
            "doc_id long, text string")
        out = {r.doc_id: r.clean_text.split() if r.clean_text else []
               for r in mask_repeated_spans(
                   df, k=K, mode="keep_first", within_doc=True).collect()}
        truth_cut = _exactsubstr_truth_cuts(docs, K)
        for d, toks in docs.items():
            truth_kept = Counter(t for i, t in enumerate(toks)
                                 if i not in truth_cut[d])
            assert Counter(out[d]) == truth_kept, (name, d)

    import pytest

    with pytest.raises(ValueError, match="within_doc"):
        mask_repeated_spans(
            spark.createDataFrame([(1, "a b c")], "doc_id long, text string"),
            mode="mask_all", within_doc=True)


class TestCdcChunks:
    """Content-defined chunking (round 10): equivalence with an
    independent Python reference, the shift-robustness property that
    motivates CDC over fixed-stride chunkers, and the expression-only
    plan."""

    @staticmethod
    def _ref(text, w=4, mb=4):
        import hashlib

        tk = [x for x in text.split() if x]
        n = len(tk)
        if n == 0:
            return []
        grams = ([" ".join(tk[j:j + w]) for j in range(0, n - w + 1)]
                 if n >= w else [])

        def h64(s):
            d = hashlib.md5(s.encode()).digest()
            return int.from_bytes(d[8:16], "little")

        cuts = [j + 1 for j, g in enumerate(grams)
                if h64(g) % (1 << mb) == 0]
        starts = [s for s in [0] + [j + w - 1 for j in cuts] if s < n]
        out = []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else n
            txt = " ".join(tk[s:e])
            out.append((i, e - s, txt,
                        hashlib.md5(txt.encode()).hexdigest()))
        return out

    def test_matches_python_reference(self, spark):
        import random

        from openpolicedata_spark.operators.textpipe import cdc_chunks

        rnd = random.Random(189)
        texts = {}
        for i in range(60):
            n = rnd.randint(0, 120)
            t = " ".join(rnd.choice(["aa", "bb", "cc", "dd", "ee", "ff"])
                         for _ in range(n))
            if i % 7 == 0:
                t = "  " + t + "   "      # whitespace-run tokenization
            texts[i] = t
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = {}
        for r in cdc_chunks(df).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_idx, r.n_tokens, r.chunk_text, r.chunk_hash))
        for i, t in texts.items():
            assert sorted(got.get(i, [])) == self._ref(t), i
        # chunks reassemble the exact token stream
        for i, t in texts.items():
            toks = [x for x in t.split() if x]
            joined = " ".join(c[2] for c in sorted(got.get(i, [])))
            assert joined == " ".join(toks), i

    def test_shift_robustness_vs_fixed_stride(self, spark):
        """Prepend a sentence: CDC preserves (almost) every downstream
        chunk hash; the fixed-stride chunker preserves NONE — the
        measurable reason this operator exists."""
        from openpolicedata_spark.operators.textpipe import (
            cdc_chunks,
            chunk_documents,
        )

        base = " ".join(f"tok{i}" for i in range(400))
        edited = "inserted new sentence here " + base
        df = spark.createDataFrame([(0, base), (1, edited)],
                                   "doc_id long, text string")
        cdc = {}
        for r in cdc_chunks(df).collect():
            cdc.setdefault(r.doc_id, set()).add(r.chunk_hash)
        shared = len(cdc[0] & cdc[1])
        assert shared >= len(cdc[0]) - 2, (shared, len(cdc[0]))
        fixed = {}
        for r in chunk_documents(df, chunk_tokens=16, stride=16).collect():
            fixed.setdefault(r.doc_id, set()).add(
                __import__("hashlib").md5(
                    r.chunk_text.encode()).hexdigest())
        assert len(fixed[0] & fixed[1]) <= 1   # only luck overlaps

    def test_validation_and_python_free(self, spark):
        import pytest as _pt

        from openpolicedata_spark.operators.textpipe import cdc_chunks
        from tests.test_plans import assert_no_python_in_plan

        df = spark.createDataFrame([(0, "a b c d e")],
                                   "doc_id long, text string")
        with _pt.raises(ValueError, match="window"):
            cdc_chunks(df, window=0)
        with _pt.raises(ValueError, match="mask_bits"):
            cdc_chunks(df, mask_bits=0)
        out = cdc_chunks(df)
        assert_no_python_in_plan(out)
        rows = out.collect()
        assert [r.n_tokens for r in rows] == [5]   # < 2^4 grams: 1 chunk
        # empty and whitespace-only docs emit no rows
        dfe = spark.createDataFrame([(0, ""), (1, "   ")],
                                    "doc_id long, text string")
        assert cdc_chunks(dfe).count() == 0


def test_dedup_lines_first_occurrence_and_reassembly(spark):
    """Corpus-wide line dedup: first (doc, position) keeps the line,
    later copies drop, blanks always survive, docs reassemble in
    original order (empty string when everything was seen before)."""
    from openpolicedata_spark.operators.textpipe import dedup_lines

    rows = [(1, "a\nb\n\nc"),
            (2, "b\nx\n\na"),
            (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
           for r in dedup_lines(df).collect()}
    assert got[1] == ("a\nb\n\nc", 4, 0)
    assert got[2] == ("x\n", 2, 2)     # b and a seen earlier; blank kept
    assert got[3] == ("", 0, 1)


def test_normalize_unicode_laws(spark):
    """textpipe.normalize_unicode (round 13): NFC precomposes
    combining sequences, is idempotent (a Unicode guarantee,
    asserted through the operator), leaves ASCII and NULLs untouched
    via the masked fast path, and NFKC folds compatibility forms NFC
    must preserve (the ligature case). Inputs built from EXPLICIT
    escapes so the decomposed forms are really decomposed."""
    import pytest
    from pyspark.sql import functions as F

    from openpolicedata_spark.operators.textpipe import normalize_unicode

    rows = [(1, "caf\u0065\u0301"),   # e + combining acute -> caf\u00e9
            (2, "plain ascii"),
            (3, None),
            (4, "\ufb01le"),            # fi ligature: NFC keeps it
            (5, "A\u030a")]            # A + combining ring -> \u00c5
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.text for r in
           normalize_unicode(df, "text").collect()}
    assert out[1] == "caf\u00e9" and out[1] != rows[0][1]
    assert out[2] == "plain ascii"
    assert out[3] is None
    assert out[4] == "\ufb01le"         # NFC preserves ligatures
    assert out[5] == "\u00c5" and len(out[5]) == 1
    # idempotence through the operator (composed twice)
    twice = {r.id: r.text for r in normalize_unicode(
        normalize_unicode(df, "text"), "text").collect()}
    assert twice == out
    # NFKC folds the ligature where NFC must not
    nfkc = {r.id: r.text for r in
            normalize_unicode(df, "text", form="NFKC").collect()}
    assert nfkc[4] == "file"
    # out_col leaves the input column intact
    both = normalize_unicode(df, "text", out_col="norm").collect()
    assert {(r.text, r.norm) for r in both if r.id == 1} == {
        ("caf\u0065\u0301", "caf\u00e9")}
    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(df, "text", form="NFX")


def test_strip_accents_laws(spark):
    """textpipe.strip_accents (round 13): precomposed and combining
    spellings strip to the same bytes; non-mark letters (\u00f8,
    \u00df, \u00e6) pass through — it strips accents, it does not
    transliterate (the DuckDB strip_accents contract q234 pins);
    ASCII and NULLs ride the masked fast path; idempotent."""
    from openpolicedata_spark.operators.textpipe import strip_accents

    rows = [(1, "caf\u00e9"),          # precomposed
            (2, "cafe\u0301"),         # combining
            (3, "plain"),
            (4, None),
            (5, "\u00f8\u00df\u00e6x"),  # o-slash, sharp-s, ae
            (6, "A\u030a ring")]       # combining ring
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.text for r in strip_accents(df, "text").collect()}
    assert out[1] == out[2] == "cafe"
    assert out[3] == "plain"
    assert out[4] is None
    assert out[5] == "\u00f8\u00df\u00e6x"   # untouched
    assert out[6] == "A ring"
    twice = {r.id: r.text for r in strip_accents(
        strip_accents(df, "text"), "text").collect()}
    assert twice == out
