#!/usr/bin/env python
"""Round-13 session-3 A/B: fused tokenizer (shipped: one split on \\s+ of
trim(lower(x))) vs the pre-session two-pass normalize-then-split
composition. The OLD side is built with norm_tokens_expr monkeypatched
back to the two-pass form at CONSTRUCTION time; construction is lazy, so
each DataFrame keeps its own expressions.

Interleaved min-of-N in ONE session; row equality at the warm SF when
available (skipped at sf1 — equality is proven at sf0.001/sf0.01/sf0.1
plus the full oracle batteries)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: F401
from pyspark.sql import functions as F


def _rows_equal(a, b):
    pa = a.toPandas().sort_values(by=sorted(a.columns)).reset_index(drop=True)
    pb = b.toPandas().sort_values(by=sorted(b.columns)).reset_index(drop=True)
    pa, pb = pa[sorted(pa.columns)], pb[sorted(pb.columns)]
    return list(pa.columns) == list(pb.columns) and len(pa) == len(pb) and pa.equals(pb)


def _two_pass_tokens(c):
    # tokens_expr(normalize_text_expr(c)) verbatim — the pre-session form
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), r"\s+"),
        lambda t: t != "")


class two_pass:
    """Patch every module alias of norm_tokens_expr to the old form."""

    def __enter__(self):
        import openpolicedata_spark.functions.text as T
        import openpolicedata_spark.operators.dedup as D
        import openpolicedata_spark.operators.textpipe as TP
        import openpolicedata_spark.workload as W
        self.saved = [(m, m.norm_tokens_expr) for m in (T, D, TP, W)]
        for m, _ in self.saved:
            m.norm_tokens_expr = _two_pass_tokens

    def __exit__(self, *a):
        for m, fn in self.saved:
            m.norm_tokens_expr = fn


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    from openpolicedata_spark import get_spark, workload as W

    names = sys.argv[1:] or [
        "q28_minhash_pairs_prod", "q88_rare_token_share",
        "q100_bigram_lm", "q108_perplexity_filter",
        "q98_countmin_freq", "q105_linear_count", "q32_language_id",
    ]
    spark = get_spark(app_name="ab-fused-tokens")
    spark.range(1000).selectExpr("sum(id)").collect()

    have_warm = os.path.isdir(warm_dir)
    for nm in names:
        fn = getattr(W, nm)
        if have_warm:
            with two_pass():
                old_small = fn(spark, warm_dir)
            new_small = fn(spark, warm_dir)
            if not _rows_equal(old_small, new_small):
                print(f"{nm}: MISMATCH at {warm_dir} — skip", flush=True)
                continue
        with two_pass():
            old_df = fn(spark, sf_dir)
        new_df = fn(spark, sf_dir)
        # codegen warm
        wd = warm_dir if have_warm else sf_dir
        with two_pass():
            fn(spark, wd).count()
        fn(spark, wd).count()
        t_old = t_new = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            with two_pass():
                d = fn(spark, sf_dir)
            d.count()
            t_old = min(t_old, time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t_new = min(t_new, time.perf_counter() - t0)
        eq = _rows_equal(old_df, new_df) if have_warm else None
        print(f"{nm}: old(two-pass)={t_old:.3f}s new(fused)={t_new:.3f}s "
              f"({t_old/t_new:.2f}x) rows_equal={eq}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
