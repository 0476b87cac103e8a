"""Bucketed-join and skew-salting tests with plan assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.operators.scale import (
    salted_agg,
    salted_broadcast_join,
    write_bucketed,
)
from openpolicedata_spark.plans import summarize_plan


@pytest.fixture(scope="module")
def skewed(spark):
    # one dominant key: 9000 rows of key 0, 100 each of keys 1..10
    base = spark.range(9000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select(
        (F.col("id") % 10 + 1).alias("k"), F.col("id").alias("v"))
    return base.unionByName(tail)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {(r.k): (r.n, r.s) for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                     F.sum("v").alias("s")).collect()}
    salted = salted_agg(
        skewed, ["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        merges={"n": F.sum, "s": F.sum},
    )
    got = {(r.k): (r.n, r.s) for r in salted.collect()}
    assert got == plain


def test_salted_broadcast_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(11)],
                                "k long, name string")
    plain = skewed.join(dim, on="k").groupBy("name").count()
    expected = {r.name: r["count"] for r in plain.collect()}
    out = salted_broadcast_join(skewed, dim, on="k").groupBy("name").count()
    got = {r.name: r["count"] for r in out.collect()}
    assert got == expected
    # the join itself must be a broadcast (big side never shuffles to join)
    s = summarize_plan(salted_broadcast_join(skewed, dim, on="k"))
    assert s.n_broadcast_joins >= 1 and s.n_sortmerge_joins == 0


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key by the same bucket count join
    without ANY exchange — the co-located join that replaces the multi-TB
    shuffle at scale."""
    left = spark.range(1000).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"),
                                     (F.col("id") * 3).alias("b"))
    write_bucketed(left, "t_left_bkt", "k", buckets=8)
    write_bucketed(right, "t_right_bkt", "k", buckets=8)
    j = spark.table("t_left_bkt").join(spark.table("t_right_bkt"), on="k")
    s = summarize_plan(j)
    assert s.n_exchanges == 0, s.text
    assert j.count() == 1000
    spark.sql("DROP TABLE IF EXISTS t_left_bkt")
    spark.sql("DROP TABLE IF EXISTS t_right_bkt")
