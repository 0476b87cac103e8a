"""Profile q156 at sf0.1: driver-side construction/analysis time vs
execution time, plus F.lit nested-literal behavior probes."""
import sys
import time

sys.path.insert(0, ".")

from openpolicedata_spark.session import get_spark
from openpolicedata_spark import workload as W

spark = get_spark(master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

import numpy as np
from pyspark.sql import functions as F

# --- probe: what does F.lit do with ndarray / nested list?
try:
    c = F.lit(np.array([1.0, 2.0, 3.0]))
    print("lit(1d ndarray) ok:", c)
except Exception as e:
    print("lit(1d ndarray) FAIL:", e)
try:
    c = F.lit(np.array([[1.0, 2.0], [3.0, 4.0]]))
    print("lit(2d ndarray) ok:", c)
except Exception as e:
    print("lit(2d ndarray) FAIL:", type(e).__name__, str(e)[:120])
try:
    t0 = time.time()
    c = F.lit([[1.0, 2.0], [3.0, 4.0]])
    print("lit(nested list) ok (%.3fs):" % (time.time() - t0), c)
except Exception as e:
    print("lit(nested list) FAIL:", type(e).__name__, str(e)[:120])

# is an all-literal SQL array constant-folded? check optimized plan
df = spark.range(1).selectExpr(
    "element_at(element_at(array(array(1.0d, 2.0d), array(3.0d, 4.0d)),"
    " CAST(id AS INT) + 1), 1) AS x")
print(df._jdf.queryExecution().optimizedPlan().toString()[:400])

sf = "/root/testdata/sf0.1"

for name in ("q151_ivfpq_search", "q156_ivfpq_residual"):
    fn = getattr(W, name)
    for trial in range(3):
        t0 = time.time()
        d = fn(spark, sf)
        t1 = time.time()
        rows = d.collect()
        t2 = time.time()
        print(f"{name} trial{trial}: build+analyze {t1-t0:.2f}s "
              f"exec {t2-t1:.2f}s rows {len(rows)}")
