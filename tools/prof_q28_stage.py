#!/usr/bin/env python
"""Round-13 session-3 profiler: where does q28's signature stage spend
its time? Stages the pipeline piecewise (noop-style count actions on the
output columns) and then profiles the Arrow kernel's numpy sections on
the REAL sf0.1 token-hash arrays pulled to the driver.

Sections:
  A. JVM tokenize variants (current normalize+split vs fused split)
  B. + token-hash HOF
  C. + full Arrow kernel
  D. kernel-internal numpy section timings (driver-side, same arrays)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd  # noqa: F401
from pyspark.sql import functions as F


def timed(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:8.3f}s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from openpolicedata_spark import get_spark
    from openpolicedata_spark.functions.text import (
        normalize_text_expr, tokens_expr)
    from openpolicedata_spark.operators.dedup import (
        _hash_coeffs, _minhash_shingle_kernel, _token_hash_expr, rebalance,
        _MERSENNE_31)
    from openpolicedata_spark.workload import _docs_with_dups

    spark = get_spark(app_name="prof-q28")
    spark.range(1000).selectExpr("sum(id)").collect()

    d = _docs_with_dups(spark, sf_dir).select("doc_id", "text")
    print(f"docs: {d.count()}", flush=True)

    # ---- A. tokenize variants -------------------------------------------
    def tok_current():
        t = rebalance(d.select(
            F.col("doc_id"),
            tokens_expr(normalize_text_expr(F.col("text"))).alias("t")))
        t.select(F.sum(F.size("t"))).collect()

    def tok_fused():
        # split(trim(lower(x)), \s+) + filter "" — same token multiset,
        # one fewer full-text regexp pass (no collapse-then-split)
        t = rebalance(d.select(
            F.col("doc_id"),
            F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                     lambda s: s != "").alias("t")))
        t.select(F.sum(F.size("t"))).collect()

    timed("A1 tokenize current (normalize+split)", tok_current)
    timed("A2 tokenize fused (split only)", tok_fused)

    # token equality between the two forms
    a = d.select("doc_id", tokens_expr(normalize_text_expr(F.col("text"))).alias("t"))
    b = d.select("doc_id", F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                                    lambda s: s != "").alias("t"))
    neq = (a.alias("a").join(b.alias("b"), on="doc_id")
           .where(~(F.col("a.t") == F.col("b.t"))).count())
    print(f"token-equality: {neq} mismatched docs (must be 0)", flush=True)

    # ---- B. + token hash -------------------------------------------------
    def tokhash(tok_expr):
        def run():
            t = rebalance(d.select(F.col("doc_id"), tok_expr.alias("t")))
            th = t.select("doc_id", F.transform(
                F.col("t"), lambda x: _token_hash_expr(x, "xxhash64")).alias("th"))
            th.select(F.sum(F.size("th"))).collect()
        return run

    timed("B1 +tokenhash current", tokhash(tokens_expr(normalize_text_expr(F.col("text")))))
    timed("B2 +tokenhash fused", tokhash(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda s: s != "")))

    # ---- C. + kernel -------------------------------------------------------
    coeffs = _hash_coeffs(64, 42)
    kernel = _minhash_shingle_kernel(coeffs, 5)

    def full(tok_expr):
        def run():
            t = rebalance(d.select(F.col("doc_id"), tok_expr.alias("t")))
            th = t.select("doc_id", F.transform(
                F.col("t"), lambda x: _token_hash_expr(x, "xxhash64")).alias("th"))
            ms = th.mapInArrow(
                kernel,
                "__id__ bigint, __sh__ array<bigint>, minhash array<bigint>")
            ms.select(F.sum(F.size("minhash")), F.sum(F.size("__sh__"))).collect()
        return run

    timed("C1 full signature stage current", full(tokens_expr(normalize_text_expr(F.col("text")))))
    timed("C2 full signature stage fused", full(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda s: s != "")))

    # ---- D. kernel-internal numpy sections (driver-side) ------------------
    t = d.select(F.col("doc_id"), tokens_expr(normalize_text_expr(F.col("text"))).alias("t"))
    th = t.select("doc_id", F.transform(
        F.col("t"), lambda x: _token_hash_expr(x, "xxhash64")).alias("th"))
    pdf = th.toPandas()
    arrays = [np.asarray(x, dtype=np.int64).view(np.uint64) for x in pdf["th"]]
    n_tok = sum(a.size for a in arrays)
    print(f"D: {len(arrays)} docs, {n_tok} tokens", flush=True)

    A = np.array([c[0] for c in coeffs], dtype=np.int64)[:, None]
    B = np.array([c[1] for c in coeffs], dtype=np.int64)[:, None]
    P = np.uint64(0x9E3779B97F4A7C15)
    k = 5
    powers = P ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    M = _MERSENNE_31

    def _avalanche(x):
        x = x.copy()
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    # stage the per-doc loop so each numpy section is timed separately
    accs = []

    def sec_poly():
        accs.clear()
        for tarr in arrays:
            n_sh = tarr.size - (k - 1)
            if n_sh <= 0:
                accs.append(None)
                continue
            acc = tarr[0:n_sh] * powers[0]
            for j in range(1, k):
                acc = acc + tarr[j:j + n_sh] * powers[j]
            accs.append(acc)

    uniqs = []

    def sec_unique():
        uniqs.clear()
        for acc in accs:
            if acc is None:
                uniqs.append(None)
                continue
            uniqs.append(np.unique(_avalanche(acc)))

    hvs = []

    def sec_mod():
        hvs.clear()
        for u in uniqs:
            if u is None:
                hvs.append(None)
                continue
            hvs.append((u % np.uint64(M)).astype(np.int64))

    mins = []

    def sec_universal():
        mins.clear()
        for hv in hvs:
            if hv is None:
                mins.append(None)
                continue
            mins.append(((A * hv + B) % M).min(axis=1))

    timed("D1 polynomial rolling hash", sec_poly, reps=5)
    timed("D2 avalanche+unique", sec_unique, reps=5)
    timed("D3 hv = uniq %% M", sec_mod, reps=5)
    timed("D4 universal (A*hv+B)%%M .min", sec_universal, reps=5)

    # Mersenne-fold alternative for D4 (and D3) — correctness + speed
    def fold_mod_i64(x):
        # x : int64 >= 0, < 2^62. returns x mod M via 2^31 ≡ 1 (mod M)
        y = (x >> 31) + (x & M)          # < 2^31 + 2^31 = 2^32
        y = (y >> 31) + (y & M)          # <= M + 1
        return np.where(y >= M, y - M, y)

    def sec_universal_fold():
        mins.clear()
        for hv in hvs:
            if hv is None:
                mins.append(None)
                continue
            mins.append(fold_mod_i64(A * hv + B).min(axis=1))

    timed("D4' universal via mersenne fold", sec_universal_fold, reps=5)

    # bit-identical?
    sec_universal()
    ref = [m.copy() if m is not None else None for m in mins]
    sec_universal_fold()
    ok = all((r is None and m is None) or np.array_equal(r, m)
             for r, m in zip(ref, mins))
    print(f"D4' fold == %% : {ok}", flush=True)

    def fold_mod_u64(x):
        # x : uint64. 2^31 ≡ 1 (mod M): fold three times (64→34→32→31 bits)
        MU = np.uint64(M)
        y = (x >> np.uint64(31)) + (x & MU)
        y = (y >> np.uint64(31)) + (y & MU)
        y = (y >> np.uint64(31)) + (y & MU)
        return np.where(y >= MU, y - MU, y)

    def sec_mod_fold():
        hvs.clear()
        for u in uniqs:
            if u is None:
                hvs.append(None)
                continue
            hvs.append(fold_mod_u64(u).astype(np.int64))

    sec_mod()
    ref_hv = [h.copy() if h is not None else None for h in hvs]
    timed("D3' hv via mersenne fold", sec_mod_fold, reps=5)
    sec_mod_fold()
    ok = all((r is None and h is None) or np.array_equal(r, h)
             for r, h in zip(ref_hv, hvs))
    print(f"D3' fold == %% : {ok}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
