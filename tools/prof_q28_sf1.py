#!/usr/bin/env python
"""q28 stage decomposition + band-bucket skew audit (round-14 VERDICT
item 3, guide §1/§2.5).

Splits the q28 prod pipeline into its four stages and times each with
the noop sink (guide §1.4), plus a bucket-size/pair-count audit so the
sf0.1 -> sf1 growth can be attributed: irreducible output growth
(candidate pairs really grow superlinearly on a duplicate-heavy corpus)
vs an avoidable skew/straggler (one hot bucket stalling a task).

Usage: python tools/prof_q28_sf1.py [sf_dir] [--reps 3]
"""

import argparse
import os
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, build, reps):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"q28sf1: {label}")
        t0 = time.perf_counter()
        noop(build())
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {best:.3f}s", flush=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from openpolicedata_spark import get_spark, workload
    from openpolicedata_spark.operators.dedup import (
        band_hash_col,
        bucket_pairs,
        check_banding,
        shingle_minhash,
    )

    spark = get_spark(app_name="opdspark-q28-sf1")
    spark.range(1000).selectExpr("sum(id)").collect()

    num_hashes, bands, shingle_k, thresh = 32, 8, 3, 0.8
    rows_per_band = check_banding(num_hashes, bands)

    def docs():
        return workload._docs_with_dups(spark, args.sf_dir)

    def ms():
        return shingle_minhash(docs(), "text", "doc_id", num_hashes,
                               shingle_k, 42, token_hash="xxhash64")

    def banded(m):
        return m.select(
            F.col("doc_id"),
            band_hash_col(F.col("minhash"), bands, rows_per_band)
            .alias("band_id", "band_hash"))

    def buckets(m):
        return (banded(m).groupBy("band_id", "band_hash")
                .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
                .where(F.size("ids") > 1))

    def cand(m):
        return bucket_pairs(
            buckets(m), "ids",
            lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b")))

    print(f"== {args.sf_dir} ==", flush=True)

    # ---- audit: bucket-size distribution + candidate/output counts ----
    m0 = ms().localCheckpoint(eager=False)
    bstats = (buckets(m0).select(F.size("ids").alias("b"))
              .agg(F.count("*").alias("n_buckets"),
                   F.max("b").alias("max_b"),
                   F.expr("percentile(b, 0.5)").alias("med_b"),
                   F.expr("percentile(b, 0.99)").alias("p99_b"),
                   F.sum(F.expr("b*(b-1)/2")).alias("pairs_incl_dup"))
              ).collect()[0]
    n_cand = cand(m0).count()
    full = workload.q28_minhash_pairs_prod(spark, args.sf_dir)
    n_out = full.count()
    print(f"  buckets={bstats['n_buckets']} max={bstats['max_b']} "
          f"med={bstats['med_b']} p99={bstats['p99_b']} "
          f"pairs_incl_dup={int(bstats['pairs_incl_dup'])} "
          f"distinct_cand={n_cand} output_pairs={n_out}", flush=True)

    # ---- stage timings (each builds from scratch; noop sink) ----
    timed(spark, "A signature (shingle_minhash, no ckpt)", ms, args.reps)
    timed(spark, "B banding+buckets", lambda: buckets(ms()), args.reps)
    timed(spark, "C candidates (pairs+distinct)", lambda: cand(ms()),
          args.reps)

    def fullq():
        return workload.q28_minhash_pairs_prod(spark, args.sf_dir)

    timed(spark, "D full query (verify included)", fullq, args.reps)


if __name__ == "__main__":
    main()
