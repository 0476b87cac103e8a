"""Size-aware join-key discovery (operators/discovery.py): exact vs
sketch containment paths and the auto-routing probe. The workload pins
each path's values against its own DuckDB oracle (q122 exact, q123
sketch); these tests pin the ROUTING — VERDICT r3/r4: large inputs must
take the sketch path by default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.operators.discovery import (
    exact_containment,
    join_key_discovery,
    probe_distinct_counts,
    sketch_containment,
)


def _frames(spark):
    dim = spark.range(100).select(F.col("id").alias("pk"))
    fact = (spark.range(1000)
            .select((F.col("id") % 100).alias("fk"),
                    (F.col("id") + 5000).alias("rowid")))
    return [("dim.pk", dim, "pk"), ("fact.fk", fact, "fk"),
            ("fact.rowid", fact, "rowid")]


def test_exact_containment_ranks_pk_fk(spark):
    out = {(r["src_a"], r["src_b"]): r
           for r in exact_containment(_frames(spark)).collect()}
    pair = out[("dim.pk", "fact.fk")]
    assert pair["n_common"] == 100
    assert pair["containment_a"] == 1.0 and pair["containment_b"] == 1.0
    # disjoint ranges never emit a pair (inner join on value)
    assert ("dim.pk", "fact.rowid") not in out


def test_sketch_agrees_with_exact_on_ranking(spark):
    cols = _frames(spark)
    sk = {(r["src_a"], r["src_b"]): r["est_jaccard"]
          for r in sketch_containment(cols, k=64).collect()}
    # PK/FK pair: identical value sets → jaccard estimate 1.0 exactly
    assert sk[("dim.pk", "fact.fk")] == 1.0
    # disjoint pair: sketch still emits it, but estimates ~0
    assert sk.get(("dim.pk", "fact.rowid"), 0.0) <= 0.05


def test_probe_distinct_counts_one_scan_per_table(spark):
    cols = _frames(spark)
    est = probe_distinct_counts(cols)
    assert set(est) == {"dim.pk", "fact.fk", "fact.rowid"}
    assert 90 <= est["dim.pk"] <= 110
    assert 900 <= est["fact.rowid"] <= 1100


def test_auto_routes_small_to_exact_large_to_sketch(spark):
    cols = _frames(spark)
    small = join_key_discovery(cols, mode="auto", exact_max_distinct=10_000)
    assert "containment_a" in small.columns          # exact path
    big = join_key_discovery(cols, mode="auto", exact_max_distinct=500)
    assert "est_jaccard" in big.columns              # sketch path
    # the sketch plan must not contain the exact path's value self-join:
    # no exchange/join key named 'val' anywhere (the sketch pipeline
    # hashes straight to 'h' and shuffles only (src, h) pairs)
    from openpolicedata_spark.plans import summarize_plan

    assert "val#" not in summarize_plan(big).text
    with pytest.raises(ValueError, match="unknown mode"):
        join_key_discovery(cols, mode="banana")


def test_workload_q122_q123_still_route_through_operator(spark, sf_dir):
    from openpolicedata_spark.workload import (
        q122_join_discovery,
        q123_sketch_containment,
    )

    exact = q122_join_discovery(spark, sf_dir)
    assert "containment_a" in exact.columns
    sk = q123_sketch_containment(spark, sf_dir)
    assert "est_jaccard" in sk.columns
    # orders↔lineitem orderkey containment: every lineitem order exists
    row = {(r["src_a"], r["src_b"]): r for r in exact.collect()}[
        ("lineitem.l_orderkey", "orders.o_orderkey")]
    assert row["containment_a"] == 1.0
