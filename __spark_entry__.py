"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in openpolicedata_spark.workload; each query maps to
an operator family from SURVEY.md §2 (see the section headers there).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openpolicedata_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary aggregate over lineitem via the
    catalog/Source path) on /root/testdata/sf0.001."""
    return workload.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
