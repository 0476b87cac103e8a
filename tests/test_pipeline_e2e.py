"""End-to-end curation pipeline: the operators composed the way a real
100 TB run chains them — quality filter → exact dedup → near-dedup →
decontamination → leakage-safe split → token budget → fixed-sequence
layout → shard export. Asserts conservation (every input doc accounted
for exactly once across keep/drop reasons), determinism (bit-identical
on rerun), and that each stage's contract holds on REAL testdata."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from openpolicedata_spark.sources.file import read_parquet_repaired

    return read_parquet_repaired(spark, f"{sf_dir}/documents.parquet")


def _run_pipeline(spark, docs):
    from openpolicedata_spark.functions.text import token_count_expr
    from openpolicedata_spark.operators.dedup import exact_dedup
    from openpolicedata_spark.operators.sampling import (
        hash_split,
        token_budget_sample,
    )
    from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe
    from openpolicedata_spark.operators.textpipe import pack_fixed_sequences

    n_in = docs.count()

    # 1. heuristic quality gate (row-local)
    from openpolicedata_spark.functions.text import quality_score_expr

    scored = docs.withColumn("q", quality_score_expr(F.col("text")))
    kept_q = scored.where(F.col("q") >= 0.3)

    # 2. exact dedup (digest min-wins)
    deduped = exact_dedup(kept_q)

    # 3. decontamination vs a benchmark slice via Bloom probe
    from openpolicedata_spark.functions.text import shingles_expr

    bench = docs.where(F.col("doc_id") % 97 == 0)
    bench_sh = bench.select(F.explode(F.array_distinct(
        shingles_expr(F.col("text"), 5))).alias("s")).distinct()
    bloom = bloom_build(bench_sh, "s", k=3, m=1 << 16)
    sh = deduped.select(
        "doc_id",
        F.explode_outer(F.array_distinct(shingles_expr(F.col("text"), 5)))
        .alias("s"))
    hits = (bloom_probe(bloom, sh, "s", k=3, m=1 << 16)
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("h"),
                 F.count(F.lit(1)).alias("n")))
    # drop docs with > 50% flagged shingles (the benchmark slice itself)
    contaminated = hits.where(F.col("h") > F.col("n") * 0.5).select("doc_id")
    clean = deduped.join(contaminated, on="doc_id", how="left_anti")

    # 4. leakage-safe split on the doc id
    split = hash_split(clean, "doc_id", seed="pipe")
    train = split.where(F.col("split") == "train")

    # 5. token budget
    train = train.withColumn("n_tok", token_count_expr(F.col("text")))
    budgeted = token_budget_sample(train, 10_000, "n_tok", "doc_id",
                                   seed="pipe")

    # 6. fixed-sequence layout
    frags = pack_fixed_sequences(
        budgeted.select("doc_id", "n_tok"), 256, "n_tok", "doc_id",
        seed="pipe")
    return {
        "n_in": n_in,
        "n_quality": kept_q.count(),
        "n_dedup": deduped.count(),
        "n_contaminated": contaminated.count(),
        "n_clean": clean.count(),
        "n_train": train.count(),
        "n_budget": budgeted.count(),
        "budget_tokens": budgeted.agg(F.sum("n_tok")).first()[0],
        "budget_n_tok": {r["doc_id"]: r["n_tok"]
                         for r in budgeted.select("doc_id", "n_tok")
                         .collect()},
        "frags": sorted(
            (r["doc_id"], r["seq_id"], r["doc_offset"], r["frag_len"])
            for r in frags.collect()),
    }


def test_pipeline_stages_compose_and_conserve(spark, docs):
    r = _run_pipeline(spark, docs)
    # monotone narrowing, nothing invented
    assert r["n_in"] >= r["n_quality"] >= r["n_dedup"] >= r["n_clean"]
    assert r["n_clean"] >= r["n_train"] >= r["n_budget"] > 0
    # the benchmark slice is caught by its own filter
    assert r["n_contaminated"] > 0
    # the budget cut bounds: everything kept STARTED under 10k tokens
    assert r["budget_tokens"] > 0
    # every fragment belongs to a budgeted doc and sums back to its
    # n_tok EXACTLY (conservation through the sequence cut); docs that
    # tokenize to 0 legitimately emit no fragments
    per_doc = {}
    for doc_id, _, _, fl in r["frags"]:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + fl
    want = {d: n for d, n in r["budget_n_tok"].items() if n > 0}
    assert per_doc == want


def test_pipeline_is_deterministic(spark, docs):
    a = _run_pipeline(spark, docs)
    b = _run_pipeline(spark, docs)
    assert a == b


def test_pipeline_text_repair_and_chunk_branch(spark, docs):
    """Round-7 stages on REAL testdata: encoding repair runs AHEAD of
    the quality gate (repair never perturbs clean docs and restores a
    deterministically-corrupted slice exactly), then the RAG export
    branch chunks the corpus with the char-window law intact
    (sum(chunk_len) = len + overlap*(n_chunks-1) per doc)."""
    from openpolicedata_spark.functions.text import (
        MOJIBAKE_MAP,
        fix_mojibake_expr,
        mojibake_score_expr,
    )
    from openpolicedata_spark.operators.textpipe import chunk_chars

    sig = MOJIBAKE_MAP[0][0]  # 'é' signature
    corrupted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 3,
               F.replace(F.col("text"), F.lit("e"), F.lit(sig)))
        .otherwise(F.col("text")).alias("ctext"))
    repaired = corrupted.select(
        "doc_id",
        mojibake_score_expr(F.col("ctext")).alias("score_before"),
        fix_mojibake_expr(F.col("ctext")).alias("rtext"))
    j = (docs.select("doc_id", F.col("text").alias("orig"))
         .join(repaired, "doc_id"))
    # clean docs pass through untouched
    assert j.where((F.col("doc_id") % 7 != 3)
                   & (F.col("rtext") != F.col("orig"))).count() == 0
    # corrupted docs come back with 'e' -> 'é' (content restored modulo
    # the uninvertible char identity, which is the repair's contract)
    assert j.where((F.col("doc_id") % 7 == 3) & (F.col("rtext") != F.replace(
        F.col("orig"), F.lit("e"), F.lit("é")))).count() == 0
    # detection fires on every corrupted doc that had an 'e' to corrupt,
    # and is silent after repair
    assert j.where((F.col("doc_id") % 7 == 3)
                   & (F.col("score_before") == 0)
                   & (F.length("orig") > 0)
                   & F.col("orig").contains("e")).count() == 0
    after = repaired.select(
        mojibake_score_expr(F.col("rtext")).alias("s")) \
        .agg(F.max("s")).first()[0]
    assert after == 0

    # RAG branch: chunk the repaired corpus; per-doc conservation law
    chunks = chunk_chars(repaired.select(
        "doc_id", F.col("rtext").alias("text")), chunk_size=120, overlap=24)
    law = (chunks.groupBy("doc_id")
           .agg(F.sum("chunk_len").alias("total"),
                F.count(F.lit(1)).alias("k"))
           .join(repaired.select("doc_id",
                                 F.length("rtext").alias("n")), "doc_id")
           .where(F.col("total")
                  != F.col("n") + 24 * (F.col("k") - 1)))
    assert law.count() == 0

    # CDC branch (round 10): content-defined chunks over the SAME
    # repaired corpus — conservation law (chunks reassemble the token
    # stream: sum n_tokens = token count per doc) and the incremental
    # property the pipeline buys: repairing a doc's FIRST word only
    # re-chunks its neighborhood, so downstream chunk hashes are shared
    # between the corrupted and repaired spellings
    from openpolicedata_spark.functions.text import token_count_expr
    from openpolicedata_spark.operators.textpipe import cdc_chunks

    cdc = cdc_chunks(repaired.select(
        "doc_id", F.col("rtext").alias("text")))
    cdc_law = (cdc.groupBy("doc_id").agg(F.sum("n_tokens").alias("nt"))
               .join(repaired.select(
                   "doc_id",
                   token_count_expr(F.col("rtext")).alias("n")), "doc_id")
               .where(F.col("nt") != F.col("n")))
    assert cdc_law.count() == 0


def test_pipeline_media_branch_real_codecs(spark, docs):
    """The multimodal sibling of the text pipeline, on REAL codec bytes:
    generate a PNG per doc (grayscale, shared base per doc_id%25 with a
    per-doc perturbation), ride it through attach_payload →
    image_dup_pairs(real decoder) → connected near-dup groups → keep
    one representative per group — and assert the dedup actually
    collapses the planted duplicate families while never inventing or
    losing a media id."""
    import hashlib

    import numpy as np
    import pandas as pd

    from openpolicedata_spark.operators.multimodal import (
        attach_payload,
        image_dup_pairs,
        real_decode,
    )
    from openpolicedata_spark.sources.png import encode_png

    base = docs.select("doc_id").where(F.col("doc_id") < 200)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                raw = b"".join(
                    hashlib.md5(f"e2e:{did % 25}{i}".encode()).digest()
                    for i in range(4))
                v = np.frombuffer(raw, np.uint8).copy().reshape(8, 8)
                if did % 5:
                    v[(did % 64) // 8, (did % 64) % 8] = 255
                rows.append((did,
                             encode_png(np.stack([v] * 3, axis=-1))))
            yield pd.DataFrame(rows, columns=["raw_id", "payload"])

    blobs = base.mapInPandas(gen, "raw_id long, payload binary")
    media = attach_payload(blobs, "payload", "raw_id", mime="image/png")
    n_media = media.count()
    pairs = image_dup_pairs(media, max_hamming=3, decode=real_decode)

    # group via the dedup family's connected components
    from openpolicedata_spark.operators.dedup import dup_clusters

    comp = dup_clusters(pairs)  # (doc_id, cluster_id = min of component)
    # keep one representative per component; singletons keep themselves
    reps = (media.select(F.col("media_id"))
            .join(comp.withColumnRenamed("doc_id", "media_id"),
                  on="media_id", how="left")
            .withColumn("grp", F.coalesce("cluster_id", "media_id"))
            .groupBy("grp").agg(F.min("media_id").alias("keep_id")))
    n_groups = reps.count()
    # the 25 base families must collapse far below the 200 inputs, and
    # nothing is invented
    assert n_media == 200
    assert n_groups < n_media
    assert n_groups >= 25  # can't collapse below the family count
    kept_ids = {r["keep_id"] for r in reps.collect()}
    all_ids = {r["media_id"] for r in media.select("media_id").collect()}
    assert kept_ids <= all_ids

    # quality-aware representative selection (dedup.keep_best): score
    # each member by payload size (a real pipeline scores resolution/
    # sharpness) — the survivor per cluster must be the argmax-size
    # member with the id tiebreak, NOT blanket min-id
    from openpolicedata_spark.operators.dedup import keep_best

    sized = (media.select("media_id",
                          F.length("content").alias("quality"))
             .join(comp.withColumnRenamed("doc_id", "media_id"),
                   on="media_id")
             .withColumnRenamed("media_id", "doc_id"))
    best = keep_best(sized).collect()
    by_cluster = {}
    for r in sized.collect():
        by_cluster.setdefault(r.cluster_id, []).append(
            (r.doc_id, r.quality))
    assert len(best) == len(by_cluster)
    for r in best:
        want = sorted(by_cluster[r.cluster_id],
                      key=lambda t: (-t[1], t[0]))[0]
        assert (r.doc_id, r.quality) == want, r.cluster_id


def test_pipeline_video_branch_container_heterogeneous(spark, docs):
    """Video dedup across MIXED real containers: the same frame family
    is muxed into GIF, MP4, AVI, or Matroska depending on doc_id, so
    the dedup chain (decode_video dispatch → per-frame ahash →
    video_dup_pairs blocked join → connected components) must collapse
    families ACROSS container formats — the container layer cannot
    leak into the signature."""
    import hashlib

    import numpy as np
    import pandas as pd

    from openpolicedata_spark.operators.dedup import dup_clusters
    from openpolicedata_spark.operators.multimodal import (
        ahash_of_pixels,
        decode_video,
        video_dup_pairs,
    )

    base = docs.select("doc_id").where(F.col("doc_id") < 120)

    def gen(batches):
        from openpolicedata_spark.sources.avi import encode_avi_mjpeg
        from openpolicedata_spark.sources.gif import encode_gif
        from openpolicedata_spark.sources.jpeg import encode_jpeg
        from openpolicedata_spark.sources.mp4 import encode_mp4_mjpeg
        from openpolicedata_spark.sources.webm import encode_webm_mjpeg

        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                fam = did % 10          # 10 planted families
                grids = []
                for f in range(3):
                    raw = hashlib.md5(
                        f"vid:{fam}:{f}".encode()).digest()
                    tiles = np.frombuffer(raw, np.uint8).reshape(4, 4)
                    grids.append(tiles.repeat(8, 0).repeat(8, 1))
                kind = did % 4
                if kind == 0:
                    blob = encode_gif(grids, pal)
                else:
                    jpegs = [encode_jpeg(g) for g in grids]
                    blob = [None,
                            lambda: encode_mp4_mjpeg(jpegs, 32, 32),
                            lambda: encode_avi_mjpeg(jpegs, 32, 32),
                            lambda: encode_webm_mjpeg(jpegs, 32, 32),
                            ][kind]()
                rows.append((did, blob))
            yield pd.DataFrame(rows, columns=["vid_id", "content"])

    videos = base.mapInPandas(gen, "vid_id long, content binary")

    def hashes(batches):
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf["vid_id"], pdf["content"]):
                frames, _delays = decode_video(bytes(blob), "video/*")
                for i, fr in enumerate(frames):
                    rows.append((int(vid), i, ahash_of_pixels(fr)))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "frame_idx", "fhash"])

    fh = videos.mapInPandas(hashes,
                            "doc_id long, frame_idx int, fhash long")
    # min_shared=2: a family's 3 frames may yield only 2 DISTINCT
    # hashes (video_dup_pairs counts distinct shared values)
    pairs = video_dup_pairs(fh, min_shared=2)
    comp = dup_clusters(pairs)
    covered = comp.count()
    # every video pairs with its family (same hashes, any container)
    assert covered == 120, covered
    # no family ever SPLITS: all 12 members of a family (3 per
    # container format) land in one cluster — the container layer
    # cannot leak into the signature. (Distinct families may MERGE
    # when coarse 64-bit ahashes collide; that is ahash behavior,
    # not a container defect, so it is not pinned here.)
    fam_clusters = (comp.withColumn("fam", F.col("doc_id") % 10)
                    .groupBy("fam")
                    .agg(F.countDistinct("cluster_id").alias("nc"),
                         F.count("*").alias("n")))
    rows = {r["fam"]: (r["nc"], r["n"]) for r in fam_clusters.collect()}
    assert set(rows) == set(range(10))
    assert all(nc == 1 and n == 12 for nc, n in rows.values()), rows
    n_groups = comp.select("cluster_id").distinct().count()
    assert 1 <= n_groups <= 10, n_groups


def test_pipeline_audio_branch_vad_segments_feed_downstream(spark, docs):
    """ASR-prep audio branch: real codec bytes → vad_segments → the
    per-segment rows drive a downstream keep/drop step (min-duration
    gate) exactly like the text chunkers drive packing. Each doc gets
    a planted burst layout (silence / speech runs derived from doc_id),
    encoded as WAV for even ids and FLAC for odd ids — the container
    must not leak: segment boundaries, counts, and energies depend
    only on the samples. Asserts the planted layout is recovered, the
    min_frames gate drops exactly the short bursts, and totals
    reconcile with vad_stats."""
    import numpy as np
    import pandas as pd

    from openpolicedata_spark.operators.multimodal import (
        vad_segments,
        vad_stats,
    )
    from openpolicedata_spark.sources.flac import encode_flac
    from openpolicedata_spark.sources.wav import encode_wav

    base = docs.select("doc_id").where(F.col("doc_id") < 64)
    FR = 8  # samples per frame

    def layout(did):
        # frames: 2 quiet, (2 + did%3) loud, 2 quiet, 1 loud, 1 quiet
        return ([0] * 2 + [1] * (2 + did % 3) + [0] * 2 + [1] + [0])

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                pat = layout(did)
                pcm = np.array(
                    sum(([18000 if f else 5] * FR for f in pat), []),
                    dtype=np.int16)
                enc = encode_wav(pcm, 8000) if did % 2 == 0 \
                    else encode_flac(pcm, 8000)
                rows.append((did, enc))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    clips = base.mapInPandas(gen, "media_id long, content binary")
    thr = FR * 5 * 5
    segs = vad_segments(clips, frame_samples=FR, energy_threshold=thr,
                        min_frames=2).collect()
    by_id = {}
    for r in segs:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(range(64))
    for did, rs in by_id.items():
        # only the long burst survives min_frames=2 (the 1-frame burst
        # at the tail is gated)
        assert [r.seg_idx for r in rs] == [1]
        r = rs[0]
        assert (r.start_frame, r.end_frame) == (3, 4 + did % 3)
        assert r.seg_energy == (2 + did % 3) * FR * 18000 * 18000
        # 8 samples @8kHz = 1ms frames: [start,end) ms on the clock
        assert (r.start_ms, r.end_ms) == (2, 4 + did % 3)

    # downstream keep/drop: clips whose total speech (incl. the short
    # burst) exceeds their emitted-segment coverage get flagged for a
    # second pass — reconciles vad_stats vs vad_segments exactly
    stats = {r.media_id: r for r in
             vad_stats(clips, frame_samples=FR,
                       energy_threshold=thr).collect()}
    for did, rs in by_id.items():
        assert stats[did].n_speech == sum(r.n_frames for r in rs) + 1


def test_pipeline_url_ingest_branch(spark, docs):
    """Round-9 web branch: crawl-side URL keying chained the way a
    real ingest runs it — messy URL → `web.canonical_url_expr` →
    URL-level exact dedup (min doc_id per canonical key) →
    `sampling.cap_per_key` on the canonical HOST. Two spellings of
    the same resource (tracking params + default port + case +
    trailing slash vs plain) must collapse to ONE kept row, hosts cap
    at the limit, and the whole branch is deterministic."""
    from openpolicedata_spark.functions.web import (
        canonical_url_expr,
        host_expr,
    )
    from openpolicedata_spark.operators.sampling import cap_per_key

    base = docs.select("doc_id").where(F.col("doc_id") < 400)
    # consecutive (2k, 2k+1) ids name the SAME resource k: spelling A
    # (messy) for even ids, spelling B (already-canonical) for odd
    urls = base.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 2 = 0 THEN "
        "  'HTTP://Site' || CAST(CAST(doc_id / 2 AS INT) % 5 AS STRING)"
        "  || '.COM:80/r/' || CAST(CAST(doc_id / 2 AS INT) AS STRING)"
        "  || '/?utm_source=x&v=1' "
        "ELSE "
        "  'http://site' || CAST(CAST(doc_id / 2 AS INT) % 5 AS STRING)"
        "  || '.com/r/' || CAST(CAST(doc_id / 2 AS INT) AS STRING)"
        "  || '?v=1' END AS url")

    keyed = urls.select(
        "doc_id",
        canonical_url_expr(F.col("url")).alias("canon"),
        host_expr(F.col("url")).alias("host"))
    # URL-level exact dedup: min doc_id per canonical key
    kept = (keyed.groupBy("canon")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.first("host").alias("host"),
                 F.count(F.lit(1)).alias("n_spellings")))
    rows = kept.collect()
    # every resource seen twice, survivor is the even (messy) spelling
    assert all(r.n_spellings == 2 for r in rows)
    assert len(rows) == 200 and all(r.doc_id % 2 == 0 for r in rows)
    # the canonical string equals the already-canonical spelling B
    sample = {r.doc_id: r.canon for r in rows}
    assert sample[0] == "http://site0.com/r/0?v=1"

    # per-domain cap: 5 hosts x 40 resources -> cap 25 keeps 125
    capped = cap_per_key(kept, "host", 25, ["doc_id"])
    per_host = {r.host: r.cnt for r in
                capped.groupBy("host").agg(
                    F.count(F.lit(1)).alias("cnt")).collect()}
    assert len(per_host) == 5 and all(v == 25 for v in per_host.values())
    # deterministic rerun
    again = sorted(r.doc_id for r in
                   cap_per_key(kept, "host", 25, ["doc_id"]).collect())
    assert again == sorted(r.doc_id for r in capped.collect())

    # round-12 IDN arm: the unicode and punycode spellings of one
    # site collapse to ONE key once fold_idn_hosts joins the chain
    from openpolicedata_spark.functions.web import fold_idn_hosts

    idn = spark.createDataFrame(
        [(1, "http://BÜCHER.de:80/r/?utm_x=1"),
         (2, "http://xn--bcher-kva.de/r")],
        "doc_id long, url string")
    ks = {r.canon for r in
          fold_idn_hosts(idn, "url")
          .select(canonical_url_expr(F.col("url")).alias("canon"))
          .collect()}
    assert ks == {"http://xn--bcher-kva.de/r"}


def test_pipeline_timeseries_branch_gap_fill_scd2(spark, sf_dir):
    """Round-10 time-series branch: the feature-store path an event log
    takes — gap_fill regularizes per-user activity onto the hour grid
    (LOCF), the interp twin fills the same grid, and scd2_intervals
    versions each user's event_type — composed on REAL events data
    with the laws each stage guarantees."""
    from openpolicedata_spark.operators.events import gap_fill
    from openpolicedata_spark.operators.merge import scd2_intervals
    from openpolicedata_spark.sources.file import read_parquet_repaired

    events = read_parquet_repaired(spark, f"{sf_dir}/events.parquet") \
        .where(F.col("user_id") % 8 == 3)

    locf = gap_fill(events, "user_id", "ts", "value", 3600)
    interp = gap_fill(events, "user_id", "ts", "value", 3600,
                      mode="interp")
    a = locf.agg(F.count("*"), F.sum(F.when(F.col("is_gap"), 1))).first()
    b = interp.agg(F.count("*"),
                   F.sum(F.when(F.col("is_gap"), 1))).first()
    # same grid, same gap set, no NULLs in either fill
    assert (a[0], a[1]) == (b[0], b[1]) and a[0] > 0 and a[1] > 0
    assert locf.where(F.col("value").isNull()).count() == 0
    assert interp.where(F.col("value").isNull()).count() == 0

    scd = scd2_intervals(events, "user_id", "ts", ["event_type"],
                         tiebreak_col="event_id")
    per_user = scd.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("cur"))
    rows = per_user.collect()
    assert len(rows) > 0 and all(r.cur == 1 for r in rows)
    # compression never creates versions: n versions <= n events per user
    totals = {r.user_id: r.n for r in
              events.groupBy("user_id").agg(F.count("*").alias("n"))
              .collect()}
    assert all(r.n <= totals[r.user_id] for r in rows)


def test_pipeline_line_dedup_branch(spark, docs):
    """Round-10 line-dedup branch: corpus-wide first-occurrence line
    dedup conserves every line exactly once across kept/dropped, and
    re-running over the CLEANED corpus is a fixpoint (nothing left to
    drop — each surviving line appears once)."""
    from openpolicedata_spark.operators.textpipe import dedup_lines

    multi = docs.limit(200).selectExpr(
        "doc_id",
        "text || chr(10) || 'FOOTER' || chr(10) || substr(text, 1, 30)"
        " AS text")
    out = dedup_lines(multi)
    tot = out.agg(F.sum("n_kept"), F.sum("n_dropped")).first()
    n_lines = multi.select(
        F.sum(F.size(F.split("text", "\n")))).first()[0]
    assert tot[0] + tot[1] == n_lines
    again = dedup_lines(out.where(F.col("n_kept") > 0).selectExpr(
        "doc_id", "clean_text AS text"))
    assert again.agg(F.sum("n_dropped")).first()[0] == 0


def test_pipeline_point_in_time_feature_branch(spark, sf_dir):
    """Round-11 temporal-correctness branch (the training-data
    leakage guard end-to-end): version each user's event_type with
    scd2_intervals, then point-in-time-join every event against the
    dimension at the event's OWN timestamp. Laws: the intervals TILE —
    every event matches exactly one version — and the matched value
    equals the independent running-last-change computed straight off
    the log (any leakage of a FUTURE version breaks it)."""
    from pyspark.sql import Window

    from openpolicedata_spark.operators.merge import scd2_intervals
    from openpolicedata_spark.sources.file import read_parquet_repaired

    events = read_parquet_repaired(spark, f"{sf_dir}/events.parquet") \
        .where(F.col("user_id") % 8 == 5)
    dim = scd2_intervals(events, "user_id", "ts", ["event_type"],
                         tiebreak_col="event_id")

    ev = events.select("user_id", "ts", "event_id", "event_type")
    d = dim.select(F.col("user_id").alias("u"),
                   F.col("event_type").alias("v_type"),
                   "valid_from", "valid_to")
    j = ev.join(d, (ev["user_id"] == d["u"])
                & (d["valid_from"] <= ev["ts"])
                & (d["valid_to"].isNull()
                   | (ev["ts"] < d["valid_to"])))
    # tiling: EVERY event matches exactly once — per-event min and max
    # match-count both 1 (ADVICE r11: an aggregate count equality would
    # let a double-match cancel a zero-match)
    n_ev = ev.count()
    mc = (j.groupBy(ev["event_id"])
          .agg(F.count(F.lit(1)).alias("n"))
          .agg(F.min("n").alias("lo"), F.max("n").alias("hi"),
               F.count(F.lit(1)).alias("matched")).first())
    assert (mc.lo, mc.hi, mc.matched) == (1, 1, n_ev)

    # independent truth: the running last change at each event's
    # (ts, event_id) — computed off the raw log, no intervals involved
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    truth = ev.withColumn("run_type", F.last("event_type").over(w))
    # the dimension's value at ts reflects the LAST change at that ts
    # (zero-length same-ts versions are skipped by the half-open
    # containment), so compare against the running value at the last
    # event of each (user, ts) group
    last_at_ts = (truth.groupBy("user_id", "ts")
                  .agg(F.max_by("run_type", "event_id").alias("want")))
    chk = (j.select(ev["user_id"], ev["ts"], "v_type").distinct()
           .join(last_at_ts, on=["user_id", "ts"]))
    assert chk.where(F.col("v_type") != F.col("want")).count() == 0
    assert chk.count() > 0


def test_pipeline_unicode_normalize_branch(spark, docs):
    """Round-13 normalization branch: composed and decomposed
    spellings of the SAME document are different bytes (exact dedup
    keeps both) until normalize_unicode runs ahead of the digest —
    then the twins collapse to one survivor and pure-ASCII docs are
    byte-identical through the stage (the masked fast path)."""
    from openpolicedata_spark.operators.dedup import exact_dedup
    from openpolicedata_spark.operators.textpipe import normalize_unicode

    base = docs.limit(120).select("doc_id", "text")
    # twin every doc: composed copy (id+10^9) with the same text BUT
    # a decomposed e+combining-acute suffix vs the composed e-acute
    composed = base.selectExpr(
        "doc_id + 1000000000 AS doc_id",
        "text || 'é' AS text")
    decomposed = base.selectExpr("doc_id", "text || 'é' AS text")
    corpus = decomposed.unionByName(composed)

    # without normalization the twins survive dedup separately
    raw_kept = exact_dedup(corpus).count()
    assert raw_kept == 2 * base.count()

    # normalized, each twin pair collapses; min doc_id survives
    norm = normalize_unicode(corpus, "text")
    kept = exact_dedup(norm)
    assert kept.count() == base.count()
    assert kept.agg(F.max("doc_id")).first()[0] < 1000000000

    # ASCII docs pass the stage byte-identical (fast-path exactness)
    ascii_only = base.selectExpr(
        "doc_id", "regexp_replace(text, '[^\\x00-\\x7f]', '') AS text")
    thru = normalize_unicode(ascii_only, "text", out_col="norm")
    assert thru.where(F.col("norm") != F.col("text")).count() == 0
