#!/usr/bin/env python
"""Scale-up experiment: materialize an ~sf1 dataset (10 shifted-id copies
of sf0.1) under /tmp and run bench.py against it, giving a measured
scaling curve for SCALE.md (10x data on the same 32 cores).

Usage:
    python tools/scale_experiment.py            # build + print bench cmd
    SPARK_GRAFT_SF_DIR=/tmp/opdspark_sf1 python bench.py

Only PRIMARY keys (and self-contained grouping keys like events.user_id)
are shifted per copy — foreign keys into the unshifted dimension tables
(o_custkey, l_suppkey, l_partkey) keep their values so referential
integrity holds and every join query processes all 10 copies. Each
document text appears 10x — a realistic duplication rate for the dedup
operators. Dimension tables are copied as-is.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/opdspark_sf1"
SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10_000_000

FACT_TABLES = {
    "lineitem": ["l_orderkey"],          # matches shifted o_orderkey
    "orders": ["o_orderkey"],            # o_custkey stays: FK to customer
    "events": ["event_id", "user_id"],   # user_id is self-contained
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    from pyspark.sql import functions as F

    from openpolicedata_spark import get_spark
    from openpolicedata_spark.sources.file import read_parquet_repaired

    spark = get_spark(app_name="opdspark-scaleup")
    for t, idcols in FACT_TABLES.items():
        df = read_parquet_repaired(spark, f"{SRC}/{t}.parquet")
        copies = None
        for k in range(COPIES):
            shifted = df
            for c in idcols:
                shifted = shifted.withColumn(c, F.col(c) + F.lit(k * SHIFT))
            copies = shifted if copies is None else copies.unionByName(shifted)
        copies.write.mode("overwrite").parquet(f"{OUT_DIR}/{t}.parquet")
        print(f"# {t}: x{COPIES}")
    for t in DIM_TABLES:
        read_parquet_repaired(spark, f"{SRC}/{t}.parquet") \
            .write.mode("overwrite").parquet(f"{OUT_DIR}/{t}.parquet")
    print(f"# done. Run: SPARK_GRAFT_SF_DIR={OUT_DIR} python bench.py")


if __name__ == "__main__":
    main()
