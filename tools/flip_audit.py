#!/usr/bin/env python
"""Broadcast-to-SMJ flip audit (round-14 VERDICT item 4, guide §3.1).

q11's star and q92's funnel carry BroadcastHashJoin plans because every
build side is tiny at test scale. At 100 TB those sides (customer, the
per-user frontier) outgrow the broadcast cap, so the plans MUST degrade
gracefully to shuffle joins rather than OOM. This rig forces the flip
with spark.sql.autoBroadcastJoinThreshold=-1 (the size-estimate path a
huge dimension would take) in the SAME session and proves:

  1. the flipped plan is SortMergeJoin-based (no BroadcastHashJoin, no
     cartesian surprise) — executed plan captured to
     plans/r14/<q>_smjflip.txt (collect first: AQE finalizes strategies
     at runtime);
  2. output row-equality between the default and flipped runs;
  3. the wall-clock cost of the flip at this SF (interleaved min-of-N).

Usage: python tools/flip_audit.py [sf_dir] [--reps 3]
"""

import argparse
import io
import contextlib
import os
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESH_KEYS = [
    "spark.sql.autoBroadcastJoinThreshold",
    # AQE re-derives broadcast decisions from runtime sizes with its own
    # threshold; force both or the flip silently un-flips at AQE time
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from openpolicedata_spark import get_spark, workload

    spark = get_spark(app_name="opdspark-flip-audit")
    spark.range(1000).selectExpr("sum(id)").collect()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    queries = {
        "q11_star_join": workload.q11_star_join,
        "q92_funnel": workload.q92_funnel,
    }

    def set_thresh(v: str) -> None:
        for k in THRESH_KEYS:
            spark.conf.set(k, v)

    defaults = {k: spark.conf.get(k, None) for k in THRESH_KEYS}

    for name, fn in queries.items():
        # warm codegen both configs
        for v in (None, "-1"):
            if v:
                set_thresh(v)
            fn(spark, args.sf_dir).count()
            for k, d in defaults.items():
                (spark.conf.unset(k) if d is None
                 else spark.conf.set(k, d))

        t_def = t_flip = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            t_def = min(t_def, time.perf_counter() - t0)
            set_thresh("-1")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            t_flip = min(t_flip, time.perf_counter() - t0)
            for k, d in defaults.items():
                (spark.conf.unset(k) if d is None
                 else spark.conf.set(k, d))

        # row equality default vs flipped
        a = fn(spark, args.sf_dir).toPandas()
        set_thresh("-1")
        flipped = fn(spark, args.sf_dir)
        b = flipped.toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        eq = a.equals(b)

        # executed (final adaptive) plan of the flipped form
        flipped.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            flipped.explain("formatted")
        plan = buf.getvalue()
        for k, d in defaults.items():
            (spark.conf.unset(k) if d is None
             else spark.conf.set(k, d))
        out = os.path.join(plans_dir, f"{name}_smjflip.txt")
        with open(out, "w") as f:
            f.write(plan)
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_cart = plan.count("Cartesian") + plan.count("BroadcastNestedLoop")
        print(f"{name}: default={t_def:.3f}s flipped={t_flip:.3f}s "
              f"({t_flip / t_def:.2f}x cost) rows_equal={eq} "
              f"flipped_plan: BHJ={n_bhj} SMJ={n_smj} cartesian={n_cart} "
              f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
