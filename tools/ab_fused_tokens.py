#!/usr/bin/env python
"""Round-13 session-3 A/B: fused tokenizer (split once on \\s+ of
trim(lower(x))) vs the two-pass normalize-then-split composition, on the
affected bench queries. The NEW side is built with normalize_text_expr
monkeypatched to lower() at CONSTRUCTION time only — composed with
tokens_expr (filter(split(trim(.), \\s+), != '')) that is exactly the
fused form; fingerprint users are not in the test set and the patch is
reverted before the old side builds.

Interleaved min-of-N in ONE session; row equality at sf0.001 and sf0.1.
"""

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


class patched:
    """Patch every module alias of normalize_text_expr to lower()."""

    def __enter__(self):
        import openpolicedata_spark.functions.text as T
        import openpolicedata_spark.operators.dedup as D
        import openpolicedata_spark.operators.textpipe as TP
        import openpolicedata_spark.workload as W
        self.saved = [(m, m.normalize_text_expr) for m in (T, D, TP, W)]
        for m, _ in self.saved:
            m.normalize_text_expr = lambda c: F.lower(c)

    def __exit__(self, *a):
        for m, fn in self.saved:
            m.normalize_text_expr = fn


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

    for nm in names:
        fn = getattr(W, nm)
        old_small = fn(spark, warm_dir)
        with patched():
            new_small = fn(spark, warm_dir)
        if not _rows_equal(old_small, new_small):
            print(f"{nm}: MISMATCH at sf0.001 — skip", flush=True)
            continue
        old_df = fn(spark, sf_dir)
        with patched():
            new_df = fn(spark, sf_dir)
        # codegen warm
        fn(spark, warm_dir).count()
        with patched():
            fn(spark, warm_dir).count()
        t_old = t_new = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t_old = min(t_old, time.perf_counter() - t0)
            t0 = time.perf_counter()
            with patched():
                d = fn(spark, sf_dir)
            d.count()
            t_new = min(t_new, time.perf_counter() - t0)
        eq = _rows_equal(old_df, new_df)
        print(f"{nm}: old={t_old:.3f}s new={t_new:.3f}s "
              f"({t_old/t_new:.2f}x) rows_equal={eq}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
