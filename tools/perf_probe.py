#!/usr/bin/env python
"""Round-13 optimization measurement harness (guide §1).

Times each bench query in isolation with BOTH the bench action (count —
comparability with BENCH_r*.json) and the noop sink (computes every
column, guide §1.4), and captures .explain("formatted") to
plans/r13/<query>_<tag>.txt so plan claims are checkable offline.

Usage:
    python tools/perf_probe.py [--tag before|after] [--plans-only]
                               [--reps N] [query-prefix ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

import argparse
import json
import os
import re
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf resolves 'pd.Series' from module globals)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="*", default=[])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("OPD_PLANS_ROUND", "r14"))
    os.makedirs(plans_dir, exist_ok=True)

    from openpolicedata_spark import get_spark, workload

    spark = get_spark(app_name="opdspark-perf-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(x: pd.Series) -> pd.Series:
        import numpy as _np
        return x + _np.int64(0)
    spark.range(1000).repartition(64).select(_warm("id")).collect()

    qs = workload.queries()
    qs["q28_minhash_pairs"] = workload.q28_minhash_pairs_prod
    qs["q111_bloom_decontaminate"] = workload.q111_bloom_decontaminate_prod

    names = [n for n in BENCH_QUERIES
             if not args.prefixes or any(n.startswith(p) for p in args.prefixes)]

    # codegen warm-up at sf0.001 (bench.py discipline)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        # plan capture (fresh frame per the collected-frame double-count
        # gotcha; this is the PRE-execution adaptive plan)
        from openpolicedata_spark.plans import formatted_plan
        df = fn(spark, sf_dir)
        plan = formatted_plan(df)
        with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)
        if args.plans_only:
            print(f"# {name}: plan written", file=sys.stderr)
            continue

        spark.sparkContext.setJobDescription(f"probe:{name}")
        t_count, t_noop = float("inf"), float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t_count = min(t_count, time.perf_counter() - t0)
        if not args.no_noop:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                (fn(spark, sf_dir).write.format("noop")
                 .mode("overwrite").save())
                t_noop = min(t_noop, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)

        ex = len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M))
        py = len(re.findall(
            r"^\s*\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|MapInArrow)", plan, re.M))
        results[name] = {
            "count_s": round(t_count, 3),
            "noop_s": (None if args.no_noop else round(t_noop, 3)),
            "exchanges": ex, "py_nodes": py,
        }
        print(f"# {name}: count={t_count:.3f}s "
              f"noop={'-' if args.no_noop else f'{t_noop:.3f}s'} "
              f"exch={ex} py={py}", file=sys.stderr)

    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
