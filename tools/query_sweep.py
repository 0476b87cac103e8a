#!/usr/bin/env python
"""Time EVERY declared query at a given SF (min of N full-output hash
aggregates, codegen-warmed at sf0.001 like bench.py) and print a sorted
JSON report.

The bench covers 28 headline queries; the driver re-runs all declared
queries, so slow non-bench queries are optimization targets too. Usage:

    python tools/query_sweep.py [sf_dir] [--reps 2] [--only prefix ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=[])
    ap.add_argument("--out", default="/tmp/query_sweep.json")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from openpolicedata_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2,
                      app_name="opdspark-query-sweep")
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(x: pd.Series) -> pd.Series:
        import numpy as _np
        return x + _np.int64(0)

    spark.range(1000).repartition(64).select(_warm("id")).collect()

    qs = entrymod.queries()
    # bench.py parity: time the production variants where the registered
    # query deliberately uses a slower oracle-portable primitive, so the
    # sweep doesn't flag the md5 oracle forms as false optimization targets
    from openpolicedata_spark import workload as _wl
    if "q28_minhash_pairs" in qs:
        qs["q28_minhash_pairs"] = _wl.q28_minhash_pairs_prod
    if "q111_bloom_decontaminate" in qs:
        qs["q111_bloom_decontaminate"] = _wl.q111_bloom_decontaminate_prod
    names = [n for n in qs
             if not args.only or any(n.startswith(s) for s in args.only)]

    reps = max(1, args.reps)

    def timed_action(df) -> None:
        # NOT .count(): Catalyst join-eliminates unique-key left joins under
        # count() (CLAUDE.md gotcha), so queries whose expensive work feeds
        # only projected columns would measure ~nothing. An aggregate of a
        # hash over every output column forces the full plan; fall back to
        # count() only for output types xxhash64 can't take (maps).
        try:
            df.selectExpr("count(1)", "sum(xxhash64(*))").collect()
        except Exception:
            df.count()

    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR",
        os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"))
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if os.path.isdir(warm_dir):
            try:
                timed_action(fn(spark, warm_dir))
            except Exception as exc:
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)
        best = float("inf")
        # each rep wrapped individually: an exception on a later rep must
        # not discard a successful earlier rep's measurement
        last_exc = None
        for _ in range(reps):
            try:
                t0 = time.perf_counter()
                timed_action(fn(spark, args.sf_dir))
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:
                last_exc = exc
        if best == float("inf"):
            print(f"FAIL {name}: {type(last_exc).__name__}: {last_exc}",
                  file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(best, 3)
        print(f"{name}\t{timings[name]}", flush=True)

    ranked = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    with open(args.out, "w") as f:
        json.dump(ranked, f, indent=1)
    print(json.dumps({"total": round(sum(v for v in timings.values()
                                         if v > 0), 2),
                      "n": len(timings)}))
    print("top 25:")
    for i, (n, v) in enumerate(ranked.items()):
        if i >= 25:
            break
        print(f"  {n}\t{v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
