#!/usr/bin/env python
"""Round-13 optimization A/B rig: candidate restructures vs the shipped
queries, timed interleaved in ONE session (min of N), plus a row-level
equality check of old vs new output so a restructure can't silently
change what a query computes.

Usage: python tools/ab_candidates.py [--reps 3] [pair-name ...]
"""

import argparse
import os
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


# --------------------------------------------------------------------------
# candidates
# --------------------------------------------------------------------------

def q88_new(spark, sf_dir):
    """Two-level aggregation: (doc_id, token) counts first, then derive
    both the corpus frequency table and the per-doc rollup from that ONE
    aggregate — the tokenize+explode runs once (shared exchange) instead
    of once per branch (guide §2.3 aggregate-before-shuffle, §2.4 shared
    exchange; the old plan shows TWO Generate+scan subtrees because
    column pruning split the 'shared' rebalance exchanges)."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select(
        "doc_id",
        F.explode(tokens_expr(normalize_text_expr(F.col("text")))).alias("token"),
    )
    dt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    freq = dt.groupBy("token").agg(F.sum("cnt").alias("cf"))
    return (
        dt.join(freq, on="token")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.when(F.col("cf") <= 2, F.col("cnt"))
                  .otherwise(F.lit(0).cast("long"))).alias("n_rare"),
        )
        .select(
            "doc_id", "n_tokens", "n_rare",
            F.round(F.col("n_rare") / F.col("n_tokens"), 6).alias("rare_share"),
        )
    )


def q98_new(spark, sf_dir):
    """Token counts ONCE, then both the CMS cells (weighted by count)
    and the top-20 derive from the same aggregate: sum-of-counts per cell
    == count-of-occurrences per cell, so the sketch is identical while
    the tokenize and the 4-way cell explode run over distinct tokens
    instead of every occurrence."""
    from openpolicedata_spark.functions.text import (
        md5lower64_expr,
        normalize_text_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import (
        countmin_lookup,
        _salted,
    )
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = d.select(
        F.explode(F.filter(
            F.split(normalize_text_expr(F.col("text")), " "),
            lambda t: t != "")).alias("token"))
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_cnt"))
    h = _salted(md5lower64_expr)
    depth, width = 4, 512
    rows = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(h(F.col("token"), i), F.lit(width)).alias("bucket"))
        for i in range(depth)
    ])
    cms = (tc.select(F.explode(rows).alias("c"), "true_cnt")
           .groupBy(F.col("c.row").alias("row"),
                    F.col("c.bucket").alias("bucket"))
           .agg(F.sum("true_cnt").alias("cnt")))
    top = (tc.orderBy(F.desc("true_cnt"), F.asc("token")).limit(20))
    return countmin_lookup(cms, top, "token", depth=depth, width=width,
                           hash_fn=md5lower64_expr)


def q100_new(spark, sf_dir):
    """Top-20 via TakeOrdered directly on the bigram counts (no window,
    no full sort of the vocab²-row table); the denominator c_a joins back
    onto just the 20 winners. cab feeds both branches through one
    exchange."""
    from openpolicedata_spark.functions.text import normalize_text_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = F.filter(F.split(normalize_text_expr(F.col("text")), " "),
                    lambda t: t != "")
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    cab = (
        d.select(F.explode(big).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    top = cab.orderBy(F.desc("c_ab"), F.asc("w1"), F.asc("w2")).limit(20)
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    return (
        top.join(ca, on="w1")
        .select("w1", "w2", "c_ab",
                F.round(F.col("c_ab") / F.col("c_a").cast("double"), 6)
                .alias("cond_p"))
    )


def q108_new(spark, sf_dir):
    """One tokenize for the whole query: a single Generate emits the
    bigram stream AND a unigram stream (w2 = NULL marker) so the vocab
    count no longer re-tokenizes the corpus; cab derives from per_doc
    (sum of per-doc multiplicities == corpus count) so the bigram stream
    shuffles once, not twice; per_doc is checkpointed (it is the reused
    intermediate now)."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = tokens_expr(normalize_text_expr(F.col("text")))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    unigrams = F.transform(
        toks, lambda t: F.struct(t.alias("w1"),
                                 F.lit(None).cast("string").alias("w2")))
    both = d.select(
        "doc_id", F.explode(F.concat(bigrams, unigrams)).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    both = both.localCheckpoint(eager=False)
    db = both.where(F.col("w2").isNotNull())
    per_doc = db.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m"))
    cab = per_doc.groupBy("w1", "w2").agg(F.sum("m").alias("c_ab"))
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = both.where(F.col("w2").isNull()).agg(
        F.count_distinct("w1").alias("v"))
    lm = (cab.join(ca, on="w1")
          .crossJoin(F.broadcast(vocab))
          .select("w1", "w2",
                  F.log((F.col("c_ab") + 1)
                        / (F.col("c_a") + F.col("v")).cast("double"))
                  .alias("logp")))
    return (
        per_doc.join(lm, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                (-F.sum((F.col("m") * F.col("logp")).cast("decimal(28,12)"))
                 / F.sum("m")).cast("double"), 6).alias("ce"),
        )
    )


def q108_b(spark, sf_dir):
    """Variant B: keep the vocab branch (parallel tokenize) but derive
    cab from per_doc (sum of per-doc multiplicities == corpus count) and
    drop the localCheckpoint — per_doc's exchange is consumed by both
    the lm chain and the probe join, so AQE's ReuseExchange runs the
    tokenize+zip+explode once WITHOUT a materialization barrier, and the
    (w1,w2) shuffle now carries per_doc rows instead of the full bigram
    stream."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = tokens_expr(normalize_text_expr(F.col("text")))
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    db = d.select("doc_id", F.explode(big).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    per_doc = db.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m"))
    cab = per_doc.groupBy("w1", "w2").agg(F.sum("m").alias("c_ab"))
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = d.select(F.explode(toks).alias("t")).agg(
        F.count_distinct("t").alias("v"))
    lm = (cab.join(ca, on="w1")
          .crossJoin(F.broadcast(vocab))
          .select("w1", "w2",
                  F.log((F.col("c_ab") + 1)
                        / (F.col("c_a") + F.col("v")).cast("double"))
                  .alias("logp")))
    return (
        per_doc.join(lm, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                (-F.sum((F.col("m") * F.col("logp")).cast("decimal(28,12)"))
                 / F.sum("m")).cast("double"), 6).alias("ce"),
        )
    )


def q112_new(spark, sf_dir):
    """Data-independent bucket bounds: the prefix-sum order key is the
    portable hash mod 2^62 — uniform by construction — so equal-width
    cuts of the hash domain replace the approx_percentile planning job
    (one driver job and a GK sketch pass removed; the output is
    invariant to where monotone cuts fall because offsets come from the
    real per-bucket totals)."""
    from openpolicedata_spark.operators.sampling import (
        budget_hash_expr,
        global_running_total,
    )
    from openpolicedata_spark.workload import _read, token_count_expr

    n_buckets = 16
    d = (_read(spark, sf_dir, "documents")
         .select("doc_id", token_count_expr(F.col("text")).alias("n_tok"))
         .withColumn("__h__", budget_hash_expr(F.col("doc_id"), "mix1")))
    step = (1 << 62) // n_buckets
    bounds = [i * step for i in range(1, n_buckets)]
    out = _grt_with_bounds(
        d, "n_tok", "__h__", bounds, tiebreak_cols=("doc_id",),
        out_col="cum_before")
    return out.where(F.col("cum_before") < 20000).drop("__h__")


def _grt_with_bounds(df, weight_col, order_col, bounds, tiebreak_cols=(),
                     out_col="cum_before"):
    """global_running_total with caller-provided monotone cut points —
    candidate form of the sampling operator's fast path."""
    oc = F.col(order_col)

    def bucket_of(ord_col: Column) -> Column:
        b = F.lit(1)
        for v in bounds:
            b = b + F.when(F.lit(v) < ord_col, 1).otherwise(0)
        return b

    slim = df.select(oc.alias("__ord__"), F.col(weight_col).alias("__w__"))
    totals = {
        r["__bucket__"]: r["t"]
        for r in slim.groupBy(bucket_of(F.col("__ord__")).alias("__bucket__"))
        .agg(F.sum("__w__").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(1, len(bounds) + 2):
        offsets.append(acc)
        acc += totals.get(b, 0) or 0
    off = F.element_at(F.array(*[F.lit(o) for o in offsets]),
                       F.col("__bucket__"))
    d = (df.withColumn("__ord__", oc)
         .withColumn("__bucket__", bucket_of(F.col("__ord__"))))
    w = (Window.partitionBy("__bucket__")
         .orderBy(F.col("__ord__").asc(),
                  *[F.col(c).asc() for c in tiebreak_cols])
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        d.withColumn(out_col,
                     off + F.coalesce(F.sum(weight_col).over(w), F.lit(0)))
        .drop("__ord__", "__bucket__")
    )


def q11_new(spark, sf_dir):
    """Join-order fix (guide §3 / TPC-H Q5's textbook plan): reduce
    orders through the selective dim chain (region→nation→customer)
    BEFORE the fact join, so the lineitem⋈orders side carries 1/5 of the
    orders instead of all of them. Same inner-join result."""
    from openpolicedata_spark.workload import _read, _revenue_expr

    l = _read(spark, sf_dir, "lineitem")  # noqa: E741
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    o_asia = o.join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
    return (
        l.join(o_asia, l.l_orderkey == o_asia.o_orderkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def _bitmap_bloom_probe(bloom, keys, key, k=3, m=65536, hash_fn=None,
                        hit_col="bloom_hit"):
    """Candidate bloom_probe: pack the positions table into ONE row
    holding a dense array of m/64 bit-words and test membership with JVM
    bit ops behind a single one-row broadcast cross join — the positions
    subtree is computed once instead of once per probe join, element_at
    on the dense array is O(1) (a map would linear-scan), and duplicate
    positions are harmless (bit_or), so the defensive distinct goes too."""
    from openpolicedata_spark.operators.sketch import _salted

    h = _salted(hash_fn)
    col = F.col(key)
    n_words = (m + 63) // 64
    words = bloom.groupBy(F.shiftright(F.col("pos"), 6).alias("w")).agg(
        F.bit_or(F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
        ).alias("bits"))
    sparse = words.agg(F.collect_list("w").alias("__ws__"),
                       F.collect_list("bits").alias("__bs__"))

    # dense scatter in ONE vectorized kernel (round 14): the previous
    # transform(sequence)+element_at(map) build linear-scanned the map
    # per word — O(n_words x set_words), 30e9 comparisons at m=2^24
    @pandas_udf("array<long>")
    def _scatter(ws: pd.Series, bs: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for w, b in zip(ws, bs):
            a = np.zeros(n_words, dtype=np.int64)
            a[np.asarray(w, dtype=np.int64)] = np.asarray(b, dtype=np.int64)
            out.append(a)
        return pd.Series(out)

    dense = sparse.select(_scatter("__ws__", "__bs__").alias("__bm__"))
    out = keys.crossJoin(F.broadcast(dense))
    hit = F.lit(True)
    pos_cols = []
    for i in range(k):
        pc = f"__pos{i}__"
        pos_cols.append(pc)
        out = out.withColumn(pc, F.pmod(h(col, i), F.lit(m)))
        hit = hit & (F.expr(
            f"(element_at(__bm__, CAST(shiftright({pc}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod({pc}, 64) AS INT)))"
        ) != 0)
    return (out.withColumn(hit_col, F.coalesce(hit, F.lit(False)))
            .drop("__bm__", *pos_cols))


def q111_new(spark, sf_dir):
    """q111 with the bitmap probe (prod xxhash64 variant, as benched)."""
    from openpolicedata_spark.functions.text import shingles_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import bloom_build
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = d.select("doc_id",
                  F.explode(F.array_distinct(shingles_expr(F.col("text"), 5)))
                  .alias("shingle"))
    bench = sh.where(F.col("doc_id") % 7 == 0).select("shingle").distinct()
    train = sh.where(F.col("doc_id") % 7 != 0)
    bloom = bloom_build(bench, "shingle", k=3, m=65536, hash_fn=None)
    probed = _bitmap_bloom_probe(bloom, train, "shingle", k=3, m=65536,
                                 hash_fn=None)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_hits"),
            F.round(F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
                    / F.count(F.lit(1)).cast("double"), 6).alias("hit_share"),
        )
    )


def q108_nockpt(spark, sf_dir):
    """q108 exactly as shipped minus the localCheckpoint barrier — the
    tokenize+zip explode recomputes per branch but the branches run in
    parallel."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = tokens_expr(normalize_text_expr(F.col("text")))
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    db = d.select("doc_id", F.explode(big).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    per_doc = db.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m"))
    cab = db.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = d.select(F.explode(toks).alias("t")).agg(
        F.count_distinct("t").alias("v"))
    lm = (cab.join(ca, on="w1")
          .crossJoin(F.broadcast(vocab))
          .select("w1", "w2",
                  F.log((F.col("c_ab") + 1)
                        / (F.col("c_a") + F.col("v")).cast("double"))
                  .alias("logp")))
    return (
        per_doc.join(lm, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                (-F.sum((F.col("m") * F.col("logp")).cast("decimal(28,12)"))
                 / F.sum("m")).cast("double"), 6).alias("ce"),
        )
    )


def q102_nockpt(spark, sf_dir):
    """q102 minus the localCheckpoint: the regex quality score
    recomputes in the (parallel) percentile-bounds branch."""
    from openpolicedata_spark.workload import _read, quality_score_expr

    d = _read(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", F.round(quality_score_expr(F.col("text")), 6).alias("q"),
    )
    bounds = scored.agg(F.percentile(
        "q", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])).alias("bs"))
    binned = scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "q",
        (F.lit(1) + F.size(F.filter(
            F.col("bs"), lambda b: b < F.col("q")))).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(F.col("q").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1)), 6).alias("avg_q"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
    )


def q111_ckpt(spark, sf_dir):
    """q111 as shipped but with the bloom positions table checkpointed —
    the three probe joins broadcast ONE computed positions table instead
    of three copies of the whole bench-shingle subtree."""
    from openpolicedata_spark.functions.text import shingles_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = d.select("doc_id",
                  F.explode(F.array_distinct(shingles_expr(F.col("text"), 5)))
                  .alias("shingle"))
    bench = sh.where(F.col("doc_id") % 7 == 0).select("shingle").distinct()
    train = sh.where(F.col("doc_id") % 7 != 0)
    bloom = bloom_build(bench, "shingle", k=3, m=65536,
                        hash_fn=None).localCheckpoint(eager=False)
    probed = bloom_probe(bloom, train, "shingle", k=3, m=65536,
                         hash_fn=None)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_hits"),
            F.round(F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
                    / F.count(F.lit(1)).cast("double"), 6).alias("hit_share"),
        )
    )


# --------------------------------------------------------------------------
# rig
# --------------------------------------------------------------------------

PAIRS = {
    # name -> (old_query_name_in_workload_or_fn, new_fn)
    "q88": ("q88_rare_token_share", q88_new),
    "q98": ("q98_countmin_freq", q98_new),
    "q100": ("q100_bigram_lm", q100_new),
    "q108": ("q108_perplexity_filter", q108_new),
    "q108b": ("q108_perplexity_filter", q108_b),
    "q112": ("q112_token_budget", q112_new),
    "q108nc": ("q108_perplexity_filter", q108_nockpt),
    "q102nc": ("q102_curriculum_bins", q102_nockpt),
    "q111ck": ("q111_bloom_decontaminate_prod", q111_ckpt),
    "q11": ("q11_star_join", q11_new),
    "q111": ("q111_bloom_decontaminate_prod", q111_new),
}


def _rows_equal(a: DataFrame, b: DataFrame) -> bool:
    pa = a.toPandas().sort_values(by=sorted(a.columns)).reset_index(drop=True)
    pb = b.toPandas().sort_values(by=sorted(b.columns)).reset_index(drop=True)
    pa = pa[sorted(pa.columns)]
    pb = pb[sorted(pb.columns)]
    if list(pa.columns) != list(pb.columns) or len(pa) != len(pb):
        return False
    return pa.equals(pb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from openpolicedata_spark import get_spark, workload

    spark = get_spark(app_name="opdspark-ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(x: pd.Series) -> pd.Series:
        import numpy as _np
        return x + _np.int64(0)
    spark.range(1000).repartition(64).select(_warm("id")).collect()

    names = args.names or list(PAIRS)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = None
    for nm in names:
        old_name, new_fn = PAIRS[nm]
        old_fn = (old_name if callable(old_name)
                  else getattr(workload, old_name))
        if warm_dir:
            # equality check at the small SF first
            if not _rows_equal(old_fn(spark, warm_dir), new_fn(spark, warm_dir)):
                print(f"{nm}: MISMATCH at sf0.001 — skipping", flush=True)
                continue
            # codegen warm-up
            for fn in (old_fn, new_fn):
                fn(spark, warm_dir).count()
        else:
            for fn in (old_fn, new_fn):
                fn(spark, sf_dir).count()
        t_old = t_new = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            old_fn(spark, sf_dir).count()
            t_old = min(t_old, time.perf_counter() - t0)
            t0 = time.perf_counter()
            new_fn(spark, sf_dir).count()
            t_new = min(t_new, time.perf_counter() - t0)
        # equality at the benched SF too (skipped at sf1: row-level
        # toPandas of fact-scale outputs is the slow part, and equality
        # is already proven at sf0.001+sf0.1)
        eq = (_rows_equal(old_fn(spark, sf_dir), new_fn(spark, sf_dir))
              if warm_dir else None)
        print(f"{nm}: old={t_old:.3f}s new={t_new:.3f}s "
              f"({t_old / t_new:.2f}x) rows_equal={eq}", flush=True)




def q28_nomat(spark, sf_dir):
    """q28 prod with materialize=False: the Arrow signature stage
    recomputes per branch (banding + verify) but without the checkpoint
    barrier."""
    from openpolicedata_spark.operators.dedup import minhash_lsh_dup_pairs
    from openpolicedata_spark.workload import _docs_with_dups

    return minhash_lsh_dup_pairs(
        _docs_with_dups(spark, sf_dir), num_hashes=32, bands=8,
        shingle_k=3, jaccard_threshold=0.8, token_hash="xxhash64",
        materialize=False,
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _minhash_pairs_explode_melt(df, token_hash):
    """minhash_lsh_dup_pairs with the verify melt built by ONE
    explode(array(id_a, id_b)) instead of unionByName of two cand
    projections: cand is NOT materialized, so the union form evaluates
    the whole banding->buckets->pairs->distinct subtree once per branch
    (two identical Union arms in the q28 plan, 2 extra Exchanges). The
    explode form is the same row multiset from a single cand subtree
    (guide 2.4: remove duplicated subtrees/exchanges)."""
    from openpolicedata_spark.operators.dedup import (
        band_hash_col,
        bucket_pairs,
        check_banding,
        shingle_minhash,
    )

    num_hashes, bands, shingle_k, jaccard_threshold = 32, 8, 3, 0.8
    rows_per_band = check_banding(num_hashes, bands)
    ms = shingle_minhash(df, "text", "doc_id", num_hashes, shingle_k, 42,
                         token_hash=token_hash)
    ms = ms.localCheckpoint(eager=False)
    banded = ms.select(
        F.col("doc_id"),
        band_hash_col(F.col("minhash"), bands, rows_per_band)
        .alias("band_id", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cand = bucket_pairs(
        buckets, "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))
    sh = ms.select(F.col("doc_id").alias("__sid__"), F.col("__sh__"))
    melted = (
        cand.select(
            "id_a", "id_b",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__sid__"))
        .join(sh, on="__sid__")
    )
    per_pair = melted.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__sid__") == F.col("id_a"),
                     F.col("__sh__"))).alias("sh_a"),
        F.max(F.when(F.col("__sid__") == F.col("id_b"),
                     F.col("__sh__"))).alias("sh_b"),
    )
    return (
        per_pair.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q28_explode_melt(spark, sf_dir):
    from openpolicedata_spark.workload import _docs_with_dups
    return _minhash_pairs_explode_melt(
        _docs_with_dups(spark, sf_dir), token_hash="xxhash64")


def _minhash_pairs_union_melt(df, token_hash):
    """The PRE-r13 union-of-two-projections verify melt (the shipped
    form until commit 850a1e6) — kept as the A/B contrast so the melt
    decision can be re-measured at other scales."""
    from openpolicedata_spark.operators.dedup import (
        band_hash_col,
        bucket_pairs,
        check_banding,
        shingle_minhash,
    )

    num_hashes, bands = 32, 8
    rows_per_band = check_banding(num_hashes, bands)
    ms = shingle_minhash(df, "text", "doc_id", num_hashes, 3, 42,
                         token_hash=token_hash)
    ms = ms.localCheckpoint(eager=False)
    banded = ms.select(
        F.col("doc_id"),
        band_hash_col(F.col("minhash"), bands, rows_per_band)
        .alias("band_id", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cand = bucket_pairs(
        buckets, "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))
    sh = ms.select(F.col("doc_id").alias("__sid__"), F.col("__sh__"))
    melted = (
        cand.select("id_a", "id_b", F.col("id_a").alias("__sid__"))
        .unionByName(cand.select("id_a", "id_b",
                                 F.col("id_b").alias("__sid__")))
        .join(sh, on="__sid__")
    )
    per_pair = melted.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__sid__") == F.col("id_a"),
                     F.col("__sh__"))).alias("sh_a"),
        F.max(F.when(F.col("__sid__") == F.col("id_b"),
                     F.col("__sh__"))).alias("sh_b"),
    )
    return (
        per_pair.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q28_union_melt(spark, sf_dir):
    from openpolicedata_spark.workload import _docs_with_dups
    return _minhash_pairs_union_melt(
        _docs_with_dups(spark, sf_dir), token_hash="xxhash64")


def _dup_clusters_variant(pairs, edges_explode=True, edges_ckpt=False,
                          max_iterations=20, compress=True):
    """dup_clusters copy with (a) edges built by ONE explode of the
    symmetric struct pair instead of unionByName (the pairs subtree is
    unmaterialized and re-evaluates per branch AND per loop iteration),
    and (b) optional eager localCheckpoint of the loop-invariant edges
    (joined every round; today the pairs subtree re-runs every round)."""
    id_a, id_b = "id_a", "id_b"
    if edges_explode:
        edges = (
            pairs.select(F.explode(F.array(
                F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
            )).alias("__e__"))
            .select("__e__.src", "__e__.dst")
            .distinct()
        )
    else:
        edges = (
            pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
            .unionByName(pairs.select(F.col(id_b).alias("src"),
                                      F.col(id_a).alias("dst")))
            .distinct()
        )
    if edges_ckpt:
        edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for it in range(max_iterations):
        neighbor_min = (
            edges.join(labels, on=[edges.dst == labels.node])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        prop = (
            labels.join(neighbor_min, on=[labels.node == neighbor_min.src],
                        how="left")
            .select(
                F.col("node"),
                F.col("label").alias("__orig__"),
                F.least(F.col("label"),
                        F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        if compress and it >= 2:
            lab2 = prop.select(F.col("node").alias("__pn__"),
                               F.col("label").alias("__pl__"))
            prop = (
                prop.join(lab2, on=[prop["label"] == lab2["__pn__"]],
                          how="left")
                .select(
                    "node", "__orig__",
                    F.least(F.col("label"),
                            F.coalesce("__pl__", F.col("label")))
                    .alias("label"),
                )
            )
        new_labels = prop.select(
            "node", "label", (F.col("label") < F.col("__orig__"))
            .alias("changed"))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        raise RuntimeError("no convergence")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def _q186_pairs(spark, sf_dir):
    from openpolicedata_spark.workload import _read
    d = _read(spark, sf_dir, "documents").select("doc_id")
    return (
        d.select(F.col("doc_id").alias("id_a"))
        .join(d.select(F.col("doc_id").alias("id_b")),
              F.col("id_b") == F.col("id_a") + F.lit(1))
        .where(F.col("id_a") % 16 != 15)
    )


def q186_em(spark, sf_dir):
    return _dup_clusters_variant(_q186_pairs(spark, sf_dir),
                                 edges_explode=True, edges_ckpt=False)


def q186_ck(spark, sf_dir):
    return _dup_clusters_variant(_q186_pairs(spark, sf_dir),
                                 edges_explode=True, edges_ckpt=True)


def q186_ck2(spark, sf_dir):
    return _dup_clusters_variant(_q186_pairs(spark, sf_dir),
                                 edges_explode=False, edges_ckpt=True)


def q34_new(spark, sf_dir):
    """binary_features without the fake_decode mean-pixel column the
    query immediately discards (mapInPandas output can't be pruned by
    Catalyst — guide §4.1: don't compute what you throw away)."""
    import hashlib
    from typing import Iterator

    from openpolicedata_spark.operators.multimodal import attach_payload
    from openpolicedata_spark.workload import _read

    d = _read(spark, sf_dir, "documents")
    media = attach_payload(d, "text", "doc_id", mime="text/plain")

    def compute(batches):
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": content.map(
                    lambda b: len(b) if b is not None else None),
                "digest": content.map(
                    lambda b: hashlib.md5(b).hexdigest()
                    if b is not None else None),
            })

    return media.select("media_id", "content").mapInPandas(
        compute, schema="media_id long, byte_len long, digest string")


def q108_pd(spark, sf_dir):
    """Checkpoint AFTER the (doc,w1,w2) aggregation: the raw bigram
    stream shuffles once, the checkpointed intermediate is the compact
    per-doc count table, and cab/ca derive from it."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = tokens_expr(normalize_text_expr(F.col("text")))
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    db = d.select("doc_id", F.explode(big).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    per_doc = db.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")).localCheckpoint(eager=False)
    cab = per_doc.groupBy("w1", "w2").agg(F.sum("m").alias("c_ab"))
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab = d.select(F.explode(toks).alias("t")).agg(
        F.count_distinct("t").alias("v"))
    lm = (cab.join(ca, on="w1")
          .crossJoin(F.broadcast(vocab))
          .select("w1", "w2",
                  F.log((F.col("c_ab") + 1)
                        / (F.col("c_a") + F.col("v")).cast("double"))
                  .alias("logp")))
    return (
        per_doc.join(lm, on=["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                (-F.sum((F.col("m") * F.col("logp")).cast("decimal(28,12)"))
                 / F.sum("m")).cast("double"), 6).alias("ce"),
        )
    )


def q88_ck(spark, sf_dir):
    """q88 with the (doc_id, token) counts aggregated once and
    checkpointed — freq and the per-doc rollup both read the compact
    table; tokenize runs once, the token stream shuffles once."""
    from openpolicedata_spark.functions.text import (
        normalize_text_expr,
        tokens_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select(
        "doc_id",
        F.explode(tokens_expr(normalize_text_expr(F.col("text")))).alias("token"),
    )
    dt = (tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
          .localCheckpoint(eager=False))
    freq = dt.groupBy("token").agg(F.sum("cnt").alias("cf"))
    return (
        dt.join(freq, on="token")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.when(F.col("cf") <= 2, F.col("cnt"))
                  .otherwise(F.lit(0).cast("long"))).alias("n_rare"),
        )
        .select(
            "doc_id", "n_tokens", "n_rare",
            F.round(F.col("n_rare") / F.col("n_tokens"), 6).alias("rare_share"),
        )
    )


def q98_ck(spark, sf_dir):
    """q98 with token counts aggregated once and checkpointed — cms
    (weighted cells) and top-20 both read the compact table."""
    from openpolicedata_spark.functions.text import (
        md5lower64_expr,
        normalize_text_expr,
    )
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import countmin_lookup, _salted
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = d.select(
        F.explode(F.filter(
            F.split(normalize_text_expr(F.col("text")), " "),
            lambda t: t != "")).alias("token"))
    tc = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("true_cnt"))
          .localCheckpoint(eager=False))
    h = _salted(md5lower64_expr)
    depth, width = 4, 512
    rows = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(h(F.col("token"), i), F.lit(width)).alias("bucket"))
        for i in range(depth)
    ])
    cms = (tc.select(F.explode(rows).alias("c"), "true_cnt")
           .groupBy(F.col("c.row").alias("row"),
                    F.col("c.bucket").alias("bucket"))
           .agg(F.sum("true_cnt").alias("cnt")))
    top = tc.orderBy(F.desc("true_cnt"), F.asc("token")).limit(20)
    return countmin_lookup(cms, top, "token", depth=depth, width=width,
                           hash_fn=md5lower64_expr)


def q100_ck(spark, sf_dir):
    """q100 with the bigram counts checkpointed; top-20 via TakeOrdered,
    c_a joined back onto the winners."""
    from openpolicedata_spark.functions.text import normalize_text_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = F.filter(F.split(normalize_text_expr(F.col("text")), " "),
                    lambda t: t != "")
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    cab = (
        d.select(F.explode(big).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    top = cab.orderBy(F.desc("c_ab"), F.asc("w1"), F.asc("w2")).limit(20)
    ca = cab.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    return (
        top.join(ca, on="w1")
        .select("w1", "w2", "c_ab",
                F.round(F.col("c_ab") / F.col("c_a").cast("double"), 6)
                .alias("cond_p"))
    )


def q105_ck(spark, sf_dir):
    """q105 with ONE distinct (source, token) aggregate checkpointed —
    the linear-count occupancy AND the exact distinct count both derive
    from it, so the tokenize+explode runs once instead of once per
    branch (2 Generate subtrees -> 1) and the token stream shuffles
    once (the truth branch already paid a full distinct-token shuffle)."""
    from openpolicedata_spark.functions.text import md5lower64_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import linear_count
    from openpolicedata_spark.functions.text import normalize_text_expr
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = d.select(
        "source",
        F.explode(F.filter(
            F.split(normalize_text_expr(F.col("text")), " "),
            lambda t: t != "")).alias("token"))
    st = toks.distinct().localCheckpoint(eager=False)
    est = linear_count(st, "token", group_by=["source"], m=4096,
                       hash_fn=md5lower64_expr)
    truth = st.groupBy("source").agg(
        F.count(F.lit(1)).alias("true_distinct"))
    return est.join(truth, on="source")


def q114_em(spark, sf_dir):
    """knn_graph with the symmetrization built by ONE explode of the
    (src,dst)/(dst,src) struct pair instead of unionByName of two pairs
    projections: embedding_dup_pairs checkpoints only the banded INDEX,
    so the bucket self-join + pair distinct + cosine verify above it
    re-evaluates once per union branch (same pattern as q28's melt and
    dup_clusters' edges)."""
    from openpolicedata_spark.operators.similarity import (
        embedding_dup_pairs,
    )
    from openpolicedata_spark.workload import _read, make_random_planes

    emb = _read(spark, sf_dir, "embeddings")
    planes = make_random_planes(64, num_planes=8)
    pairs = embedding_dup_pairs(emb, planes, threshold=-1.0,
                                vec_col="embedding", id_col="vec_id",
                                bands=1, max_bucket_size=None)
    pairs = pairs.select("id_a", "id_b",
                         F.round("cosine", 6).alias("score"))
    sym = pairs.select(
        F.explode(F.array(
            F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
        )).alias("__e__"), "score",
    ).select("__e__.src", "__e__.dst", "score")
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .withColumn("rank", F.col("rank").cast("int"))
    )


PAIRS["q114em"] = ("q114_knn_graph", q114_em)
PAIRS["q105ck"] = ("q105_linear_count", q105_ck)
PAIRS["q88ck"] = ("q88_rare_token_share", q88_ck)
PAIRS["q98ck"] = ("q98_countmin_freq", q98_ck)
PAIRS["q100ck"] = ("q100_bigram_lm", q100_ck)
PAIRS["q108pd"] = ("q108_perplexity_filter", q108_pd)
PAIRS["q34"] = ("q34_multimodal_features", q34_new)
PAIRS["q28nm"] = ("q28_minhash_pairs_prod", q28_nomat)
PAIRS["q28em"] = ("q28_minhash_pairs_prod", q28_explode_melt)
PAIRS["q28um"] = ("q28_minhash_pairs_prod", q28_union_melt)
PAIRS["q186em"] = ("q186_chain_clusters", q186_em)
PAIRS["q186ck"] = ("q186_chain_clusters", q186_ck)
PAIRS["q186ck2"] = ("q186_chain_clusters", q186_ck2)



def q186_old(spark, sf_dir):
    """The PRE-r13 dup_clusters edge build (union of two pairs
    projections, no edge checkpoint) — the shipped form until commit
    850a1e6; kept as the A/B contrast for other scales."""
    return _dup_clusters_variant(_q186_pairs(spark, sf_dir),
                                 edges_explode=False, edges_ckpt=False)


PAIRS["q186old"] = ("q186_chain_clusters", q186_old)

def q100_tk(spark, sf_dir):
    """Session-3 combination of the two separately-rejected q100 forms:
    checkpoint cab (computed ONCE), global top-20 via TakeOrdered (heap,
    no full sort/exchange of the bigram table), and the denominator
    c_a aggregated from cab FILTERED to the 20 winners' w1 keys
    (broadcast semi-filter) instead of a w1 window over every distinct
    bigram. Same rows: c_a is an order-independent integer sum and the
    top-20 tiebreak is total."""
    from openpolicedata_spark.functions.text import norm_tokens_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents"))
    toks = norm_tokens_expr(F.col("text"))
    n = F.size(toks)
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array())
    cab = (
        d.select(F.explode(big).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    top = cab.orderBy(F.desc("c_ab"), F.asc("w1"), F.asc("w2")).limit(20)
    ca = (cab.join(F.broadcast(top.select("w1").distinct()), on="w1")
          .groupBy("w1").agg(F.sum("c_ab").alias("c_a")))
    return (
        top.join(F.broadcast(ca), on="w1")
        .select("w1", "w2", "c_ab",
                F.round(F.col("c_ab") / F.col("c_a").cast("double"), 6)
                .alias("cond_p"))
    )


PAIRS["q100tk"] = ("q100_bigram_lm", q100_tk)




def q114_old(spark, sf_dir):
    """PRE-r13-session-3 knn_graph form (unionByName symmetrize) for the
    sf1 contrast against the shipped explode form — the union evaluates
    the unmaterialized banded-index+cosine-verify subtree once per
    branch."""
    from openpolicedata_spark.operators.similarity import (
        embedding_dup_pairs,
    )
    from openpolicedata_spark.workload import _read, make_random_planes

    emb = _read(spark, sf_dir, "embeddings")
    planes = make_random_planes(64, num_planes=8)
    pairs = embedding_dup_pairs(emb, planes, threshold=-1.0,
                                vec_col="embedding", id_col="vec_id",
                                bands=1, max_bucket_size=None)
    pairs = pairs.select("id_a", "id_b",
                         F.round("cosine", 6).alias("score"))
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "score"
    ).unionByName(pairs.select(
        F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "score"))
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .withColumn("rank", F.col("rank").cast("int"))
    )


PAIRS["q114old"] = ("q114_knn_graph", q114_old)


# ---------------------------------------------------------------------------
# session 4: mapInArrow boundary for the minhash signature stage
# ---------------------------------------------------------------------------

def _shingle_minhash_arrow(df, text_col, id_col, num_hashes, shingle_k,
                           seed, token_hash):
    """shingle_minhash with the Arrow kernel run via mapInArrow instead of
    a pandas_udf: identical per-doc numpy math, but the JVM<->Python
    boundary moves list<int64> cells as ONE values buffer + offsets array
    (zero-copy numpy view) instead of materializing a python ndarray
    object per row on input and re-inferring each list cell from a pandas
    object column on output (guide 4.2: offsets re-slicing)."""
    from openpolicedata_spark.functions.text import norm_tokens_expr
    from openpolicedata_spark.operators.dedup import (
        _MERSENNE_31,
        _hash_coeffs,
        _token_hash_expr,
        rebalance,
    )

    coeffs = _hash_coeffs(num_hashes, seed)
    k = shingle_k
    M = _MERSENNE_31

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        A = np.array([c[0] for c in coeffs], dtype=np.int64)[:, None]
        B = np.array([c[1] for c in coeffs], dtype=np.int64)[:, None]
        H = A.shape[0]
        sentinel = np.full(H, M, dtype=np.int64)
        empty = np.empty(0, dtype=np.int64)
        P = np.uint64(0x9E3779B97F4A7C15)
        powers = P ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        u30, u27, u31 = np.uint64(30), np.uint64(27), np.uint64(31)
        m1, m2 = np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB)
        uM = np.uint64(M)

        for b in batches:
            n = b.num_rows
            ids = b.column(0)
            la = b.column(1)
            off = la.offsets.to_numpy()
            vals = la.values.to_numpy(zero_copy_only=False).view(np.uint64)
            valid = (np.ones(n, dtype=bool) if la.null_count == 0
                     else ~np.asarray(la.is_null()))
            mh_flat = np.empty(n * H, dtype=np.int64)
            sh_parts = []
            sh_off = np.empty(n + 1, dtype=np.int32)
            sh_off[0] = 0
            for i in range(n):
                t = vals[off[i]:off[i + 1]] if valid[i] else empty
                n_sh = t.size - (k - 1)
                if n_sh <= 0:
                    sh_parts.append(empty)
                    sh_off[i + 1] = sh_off[i]
                    mh_flat[i * H:(i + 1) * H] = sentinel
                    continue
                acc = t[0:n_sh] * powers[0]
                for j in range(1, k):
                    acc = acc + t[j:j + n_sh] * powers[j]
                x = acc.copy()
                x ^= x >> u30
                x *= m1
                x ^= x >> u27
                x *= m2
                x ^= x >> u31
                uniq = np.unique(x)
                hv = (uniq % uM).astype(np.int64)
                sh_parts.append(uniq.view(np.int64))
                sh_off[i + 1] = sh_off[i] + uniq.size
                mh_flat[i * H:(i + 1) * H] = ((A * hv + B) % M).min(axis=1)
            sh_vals = (np.concatenate(sh_parts) if sh_parts
                       else np.empty(0, np.int64))
            sh_arr = pa.ListArray.from_arrays(
                pa.array(sh_off, type=pa.int32()), pa.array(sh_vals))
            mh_off = np.arange(0, (n + 1) * H, H, dtype=np.int32)
            mh_arr = pa.ListArray.from_arrays(
                pa.array(mh_off, type=pa.int32()), pa.array(mh_flat))
            yield pa.RecordBatch.from_arrays(
                [ids, sh_arr, mh_arr], names=["__id__", "__sh__", "minhash"])

    toked = rebalance(
        df.select(F.col(id_col),
                  norm_tokens_expr(F.col(text_col)).alias("__toks__")))
    th = F.transform(F.col("__toks__"),
                     lambda t: _token_hash_expr(t, token_hash))
    thdf = toked.select(F.col(id_col), th.alias("__th__"))
    id_dt = thdf.schema[id_col].dataType.simpleString()
    out = thdf.mapInArrow(
        kernel,
        f"__id__ {id_dt}, __sh__ array<bigint>, minhash array<bigint>")
    return out.withColumnRenamed("__id__", id_col)


def _minhash_pairs_arrowmap(df, token_hash):
    """q28 prod pipeline with the signature stage from
    _shingle_minhash_arrow; everything downstream identical to
    minhash_lsh_dup_pairs."""
    from openpolicedata_spark.operators.dedup import (
        band_hash_col,
        bucket_pairs,
        check_banding,
    )

    num_hashes, bands, shingle_k = 32, 8, 3
    rows_per_band = check_banding(num_hashes, bands)
    ms = _shingle_minhash_arrow(df, "text", "doc_id", num_hashes,
                                shingle_k, 42, token_hash)
    ms = ms.localCheckpoint(eager=False)
    banded = ms.select(
        F.col("doc_id"),
        band_hash_col(F.col("minhash"), bands, rows_per_band)
        .alias("band_id", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cand = bucket_pairs(
        buckets, "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))
    sh = ms.select(F.col("doc_id").alias("__sid__"), F.col("__sh__"))
    melted = (
        cand.select(
            "id_a", "id_b",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__sid__"))
        .join(sh, on="__sid__")
    )
    per_pair = melted.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__sid__") == F.col("id_a"),
                     F.col("__sh__"))).alias("sh_a"),
        F.max(F.when(F.col("__sid__") == F.col("id_b"),
                     F.col("__sh__"))).alias("sh_b"),
    )
    return (
        per_pair.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q28_arrowmap(spark, sf_dir):
    from openpolicedata_spark.workload import _docs_with_dups
    return _minhash_pairs_arrowmap(
        _docs_with_dups(spark, sf_dir).select("doc_id", "text"), "xxhash64")


PAIRS["q28am"] = ("q28_minhash_pairs_prod", q28_arrowmap)


def _shingle_minhash_pandas(df, text_col, id_col, num_hashes, shingle_k,
                            seed, token_hash):
    """The PRE-session-4 pandas_udf signature stage, preserved verbatim
    for future re-contrast (the q186old/q114old precedent): after §9
    shipped, the registered q28 runs the mapInArrow stage, so q28am
    compares shipped-vs-shipped; THIS is the old boundary form."""
    from openpolicedata_spark.functions.text import norm_tokens_expr
    from openpolicedata_spark.operators.dedup import (
        _MERSENNE_31,
        _hash_coeffs,
        _token_hash_expr,
        rebalance,
    )
    from pyspark.sql.functions import pandas_udf
    import numpy as np

    coeffs = _hash_coeffs(num_hashes, seed)
    A = np.array([c[0] for c in coeffs], dtype=np.int64)[:, None]
    B = np.array([c[1] for c in coeffs], dtype=np.int64)[:, None]
    sentinel = np.full(A.shape[0], _MERSENNE_31, dtype=np.int64)
    empty = np.empty(0, dtype=np.int64)
    P = np.uint64(0x9E3779B97F4A7C15)
    powers = P ** np.arange(shingle_k - 1, -1, -1, dtype=np.uint64)

    def _avalanche(x):
        import numpy as np
        x = x.copy()
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    @pandas_udf("struct<shingles: array<long>, minhash: array<long>>")
    def mh(ths: pd.Series) -> pd.DataFrame:
        import numpy as np
        shingles_out, minhash_out = [], []
        for th in ths:
            t = np.asarray(th, dtype=np.int64).view(np.uint64)
            n_sh = t.size - (shingle_k - 1)
            if n_sh <= 0:
                shingles_out.append(empty)
                minhash_out.append(sentinel)
                continue
            acc = t[0:n_sh] * powers[0]
            for j in range(1, shingle_k):
                acc = acc + t[j:j + n_sh] * powers[j]
            uniq = np.unique(_avalanche(acc))
            hv = (uniq % np.uint64(_MERSENNE_31)).astype(np.int64)
            shingles_out.append(uniq.view(np.int64))
            minhash_out.append(((A * hv + B) % _MERSENNE_31).min(axis=1))
        return pd.DataFrame({"shingles": shingles_out, "minhash": minhash_out})

    toked = rebalance(
        df.select(F.col(id_col),
                  norm_tokens_expr(F.col(text_col)).alias("__toks__")))
    th = F.transform(F.col("__toks__"),
                     lambda t: _token_hash_expr(t, token_hash))
    return (
        toked.select(F.col(id_col), th.alias("__th__"))
        .select(F.col(id_col), mh(F.col("__th__")).alias("__ms__"))
        .select(F.col(id_col), F.col("__ms__.shingles").alias("__sh__"),
                F.col("__ms__.minhash").alias("minhash"))
    )


def q28_pandas_sig(spark, sf_dir):
    """q28 prod with the OLD pandas_udf signature boundary (everything
    downstream identical) — expected ratio < 1 vs the shipped form."""
    from openpolicedata_spark.operators.dedup import (
        band_hash_col,
        bucket_pairs,
        check_banding,
    )
    from openpolicedata_spark.workload import _docs_with_dups

    df = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    num_hashes, bands = 32, 8
    rows_per_band = check_banding(num_hashes, bands)
    ms = _shingle_minhash_pandas(df, "text", "doc_id", num_hashes, 3, 42,
                                 "xxhash64").localCheckpoint(eager=False)
    banded = ms.select(
        F.col("doc_id"),
        band_hash_col(F.col("minhash"), bands, rows_per_band)
        .alias("band_id", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cand = bucket_pairs(
        buckets, "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))
    sh = ms.select(F.col("doc_id").alias("__sid__"), F.col("__sh__"))
    melted = (
        cand.select(
            "id_a", "id_b",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__sid__"))
        .join(sh, on="__sid__")
    )
    per_pair = melted.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__sid__") == F.col("id_a"),
                     F.col("__sh__"))).alias("sh_a"),
        F.max(F.when(F.col("__sid__") == F.col("id_b"),
                     F.col("__sh__"))).alias("sh_b"),
    )
    return (
        per_pair.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


PAIRS["q28ps"] = ("q28_minhash_pairs_prod", q28_pandas_sig)


def q34_builtin(spark, sf_dir):
    """q34 with the no-decode feature path computed by JVM built-ins:
    byte_len IS octet_length and digest IS md5 — with the fake decode
    already skipped (r13 session 1) nothing in the function needs Python,
    so the mapInPandas boundary itself is removable (guide 4.1: prefer
    built-ins; the with_decode=True path keeps the Python stage for the
    real codecs)."""
    from openpolicedata_spark.operators.multimodal import attach_payload
    from openpolicedata_spark.workload import _read

    d = _read(spark, sf_dir, "documents")
    media = attach_payload(d, "text", "doc_id", mime="text/plain")
    return media.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.octet_length(F.col("content")).cast("long").alias("byte_len"),
        F.md5(F.col("content")).alias("digest"),
    )


PAIRS["q34bi"] = ("q34_multimodal_features", q34_builtin)


def q34_pandas(spark, sf_dir):
    """The PRE-session-4 q34 no-decode path (mapInPandas with per-row
    len/md5 maps), preserved verbatim for re-contrast after §8 shipped
    the built-ins form into the registered query."""
    import hashlib

    from openpolicedata_spark.operators.multimodal import attach_payload
    from openpolicedata_spark.workload import _read

    def compute(batches):
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": content.map(
                    lambda b: len(b) if b is not None else None),
                "digest": content.map(
                    lambda b: hashlib.md5(b).hexdigest()
                    if b is not None else None),
            })

    d = _read(spark, sf_dir, "documents")
    media = attach_payload(d, "text", "doc_id", mime="text/plain")
    return (media.select("media_id", "content")
            .mapInPandas(compute,
                         schema="media_id long, byte_len long, digest string")
            .select("media_id", "byte_len", "digest"))


PAIRS["q34ps"] = ("q34_multimodal_features", q34_pandas)


def simhash_old(spark, sf_dir):
    from openpolicedata_spark.operators.dedup import simhash_signatures
    from openpolicedata_spark.workload import _docs_with_dups
    return simhash_signatures(_docs_with_dups(spark, sf_dir))


def simhash_reduceat(spark, sf_dir):
    """simhash vote kernel batch-vectorized: ONE (total_tokens, 64) bit
    expansion + np.add.reduceat per Arrow batch instead of a per-doc
    python loop (np.add.reduceat has a real fast path, unlike the
    minimum.reduceat that sank the minhash attempt)."""
    from openpolicedata_spark.functions.text import normalize_text_expr
    from openpolicedata_spark.operators.dedup import (
        _token_hash_expr,
        rebalance,
    )
    from openpolicedata_spark.workload import _docs_with_dups
    from pyspark.sql.functions import pandas_udf

    num_bits = 64

    def make_udf():
        import numpy as np

        shifts = np.arange(num_bits, dtype=np.uint64)
        powers = (np.uint64(1) << shifts)

        @pandas_udf("long")
        def sh(hs: pd.Series) -> pd.Series:
            import numpy as np
            n = len(hs)
            lens = np.empty(n, dtype=np.int64)
            parts = []
            for i, h in enumerate(hs):
                if h is None:
                    lens[i] = 0
                    continue
                a = np.asarray(h, dtype=np.int64)
                lens[i] = a.size
                if a.size:
                    parts.append(a)
            if not parts:
                return pd.Series(np.zeros(n, dtype=np.int64))
            allh = np.concatenate(parts).view(np.uint64)
            bits = ((allh[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            # empty docs would alias the next doc's reduceat boundary:
            # reduceat over non-empty offsets only, scatter back (empty
            # doc = zero votes = signature 0, the spec's no-votes case)
            nz = lens > 0
            off_nz = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=off_nz[1:])
            v = np.add.reduceat(2 * bits - 1, off_nz, axis=0)
            sig_nz = ((v > 0).astype(np.uint64) * powers).sum(axis=1)
            out = np.zeros(n, dtype=np.uint64)
            out[nz] = sig_nz
            return pd.Series(out.view(np.int64))

        return sh

    sh = make_udf()
    return (
        rebalance(_docs_with_dups(spark, sf_dir))
        .select(
            F.col("doc_id"),
            F.transform(
                F.array_distinct(
                    F.filter(F.split(normalize_text_expr(F.col("text")), " "),
                             lambda t: t != "")
                ),
                lambda t: _token_hash_expr(t, "xxhash64"),
            ).alias("__h__"),
        )
        .select(F.col("doc_id"), sh(F.col("__h__")).alias("sim"))
    )


PAIRS["simhashra"] = (simhash_old, simhash_reduceat)




def _q111_at_m(spark, sf_dir, m, bitmap):
    """q111 pipeline (prod xxhash64) at a caller-chosen filter width m:
    the round-14 item-6 probe — at m=65536 the 3-broadcast-join probe
    won (r13 table); the verdict asks where the crossover sits when m
    grows past 2^20 (positions table ~ 3x|bench shingles| regardless of
    m, the packed bitmap m/64 longs regardless of the bench size)."""
    from openpolicedata_spark.functions.text import shingles_expr
    from openpolicedata_spark.operators.dedup import rebalance
    from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe
    from openpolicedata_spark.workload import _read

    d = rebalance(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = d.select("doc_id",
                  F.explode(F.array_distinct(shingles_expr(F.col("text"), 5)))
                  .alias("shingle"))
    bench = sh.where(F.col("doc_id") % 7 == 0).select("shingle").distinct()
    train = sh.where(F.col("doc_id") % 7 != 0)
    bloom = bloom_build(bench, "shingle", k=3, m=m, hash_fn=None)
    probe = _bitmap_bloom_probe if bitmap else bloom_probe
    probed = probe(bloom, train, "shingle", k=3, m=m, hash_fn=None)
    return (
        probed.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_hits"),
            F.round(F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
                    / F.count(F.lit(1)).cast("double"), 6).alias("hit_share"),
        )
    )


PAIRS["q111m20"] = (
    lambda s, d: _q111_at_m(s, d, 1 << 20, bitmap=False),
    lambda s, d: _q111_at_m(s, d, 1 << 20, bitmap=True),
)
PAIRS["q111m24"] = (
    lambda s, d: _q111_at_m(s, d, 1 << 24, bitmap=False),
    lambda s, d: _q111_at_m(s, d, 1 << 24, bitmap=True),
)



def _reliable_dir(spark):
    """Idempotent reliable-checkpoint dir for the round-14 item-5 probe."""
    spark.sparkContext.setCheckpointDir("/tmp/opd_reliable_ckpt")


def q28_reliable(spark, sf_dir):
    """q28 prod with the signature materialization swapped from
    localCheckpoint (executor-local, lost with the executor) to a
    RELIABLE .checkpoint() (checkpoint-dir-backed, survives executor
    loss) - the round-14 item-5 loss-semantics alternative, measured."""
    from openpolicedata_spark.operators.dedup import (
        band_hash_col, bucket_pairs, check_banding, shingle_minhash)
    from openpolicedata_spark.workload import _docs_with_dups

    _reliable_dir(spark)
    num_hashes, bands, shingle_k, thresh = 32, 8, 3, 0.8
    rows_per_band = check_banding(num_hashes, bands)
    ms = shingle_minhash(_docs_with_dups(spark, sf_dir), "text", "doc_id",
                         num_hashes, shingle_k, 42, token_hash="xxhash64")
    ms = ms.checkpoint(eager=False)
    banded = ms.select(
        F.col("doc_id"),
        band_hash_col(F.col("minhash"), bands, rows_per_band)
        .alias("band_id", "band_hash"))
    buckets = (banded.groupBy("band_id", "band_hash")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
               .where(F.size("ids") > 1))
    cand = bucket_pairs(
        buckets, "ids",
        lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))
    sh = ms.select(F.col("doc_id").alias("__sid__"), F.col("__sh__"))
    melted = (cand.select(
        "id_a", "id_b",
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("__sid__"))
        .join(sh, on="__sid__"))
    per_pair = melted.groupBy("id_a", "id_b").agg(
        F.max(F.when(F.col("__sid__") == F.col("id_a"),
                     F.col("__sh__"))).alias("sh_a"),
        F.max(F.when(F.col("__sid__") == F.col("id_b"),
                     F.col("__sh__"))).alias("sh_b"))
    return (per_pair.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")))
        .where(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def _dup_clusters_reliable(pairs, max_iterations=20, compress=True):
    """_dup_clusters_variant with every materialization RELIABLE
    (.checkpoint()) instead of localCheckpoint - same math."""
    id_a, id_b = "id_a", "id_b"
    edges = (
        pairs.select(F.explode(F.array(
            F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
            F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
        )).alias("__e__"))
        .select("__e__.src", "__e__.dst")
        .distinct()
    ).checkpoint(eager=True)
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for it in range(max_iterations):
        neighbor_min = (edges.join(labels, on=[edges.dst == labels.node])
                        .groupBy("src").agg(F.min("label").alias("nmin")))
        prop = (labels.join(neighbor_min,
                            on=[labels.node == neighbor_min.src], how="left")
                .select(F.col("node"), F.col("label").alias("__orig__"),
                        F.least(F.col("label"),
                                F.coalesce("nmin", F.col("label")))
                        .alias("label")))
        if compress and it >= 2:
            lab2 = prop.select(F.col("node").alias("__pn__"),
                               F.col("label").alias("__pl__"))
            prop = (prop.join(lab2, on=[prop["label"] == lab2["__pn__"]],
                              how="left")
                    .select("node", "__orig__",
                            F.least(F.col("label"),
                                    F.coalesce("__pl__", F.col("label")))
                            .alias("label")))
        new_labels = prop.select(
            "node", "label",
            (F.col("label") < F.col("__orig__")).alias("changed"))
        new_labels = new_labels.checkpoint(eager=True)
        changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        raise RuntimeError("no convergence")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def q186_reliable(spark, sf_dir):
    _reliable_dir(spark)
    return _dup_clusters_reliable(_q186_pairs(spark, sf_dir))


def _q186_shipped(spark, sf_dir):
    from openpolicedata_spark.operators.dedup import dup_clusters
    return dup_clusters(_q186_pairs(spark, sf_dir))


PAIRS["q28rel"] = ("q28_minhash_pairs_prod", q28_reliable)
PAIRS["q186rel"] = (_q186_shipped, q186_reliable)



if __name__ == "__main__":
    main()
