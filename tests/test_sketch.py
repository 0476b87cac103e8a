"""Sketch operators (operators/sketch.py) + the round-3 additions to
similarity/dedup/sampling: CountMin bounds, linear-count behavior,
power-iteration convergence, edit-distance blocking recall, stratified
sample exactness."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from openpolicedata_spark.operators.sketch import (
    countmin_lookup,
    countmin_table,
    linear_count,
)


@pytest.fixture(scope="module")
def words(spark):
    # zipf-ish: 'a' x50, 'b' x20, 'c' x5, singles d..m
    rows = ([("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5
            + [(chr(ord("d") + i),) for i in range(10)])
    return spark.createDataFrame(rows, "token string")


def test_countmin_never_underestimates_and_is_tight_when_wide(spark, words):
    cms = countmin_table(words, "token", depth=4, width=1024)
    keys = words.distinct()
    est = {r["token"]: r["cm_est"]
           for r in countmin_lookup(cms, keys, "token", depth=4,
                                    width=1024).collect()}
    true = {r["token"]: r["count"]
            for r in words.groupBy("token").count().collect()}
    for tok, t in true.items():
        assert est[tok] >= t          # CMS one-sided error
    # width 1024 >> 13 keys: collisions effectively impossible
    assert est == true


def test_countmin_overestimates_under_collision_pressure(spark, words):
    # width 2 forces collisions: estimates stay upper bounds
    cms = countmin_table(words, "token", depth=2, width=2)
    est = countmin_lookup(cms, words.distinct(), "token", depth=2,
                          width=2).collect()
    true = {r["token"]: r["count"]
            for r in words.groupBy("token").count().collect()}
    assert all(r["cm_est"] >= true[r["token"]] for r in est)


def test_countmin_unseen_key_estimates_from_sketch_not_null(spark, words):
    cms = countmin_table(words, "token", depth=4, width=1024)
    unseen = spark.createDataFrame([("zzz-never-seen",)], "token string")
    (row,) = countmin_lookup(cms, unseen, "token", depth=4,
                             width=1024).collect()
    assert row["cm_est"] == 0


def test_countmin_sketch_is_bounded_rows(spark, words):
    cms = countmin_table(words, "token", depth=3, width=8)
    assert cms.count() <= 3 * 8


def test_linear_count_exact_when_sparse_and_null_when_saturated(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    (row,) = linear_count(df, "k", m=4096).collect()
    # occupancy ~100/4096: estimate within a few % of truth
    assert row["occupied"] <= 100
    assert abs(row["distinct_est"] - 100) < 5
    # m=4: 100 keys saturate every bucket -> NULL (sketch overflow signal)
    (sat,) = linear_count(df, "k", m=4).collect()
    assert sat["occupied"] == 4 and sat["distinct_est"] is None


def test_linear_count_grouped(spark):
    rows = [("s1", f"k{i}") for i in range(50)] + [("s2", "only")] * 10
    df = spark.createDataFrame(rows, "src string, k string")
    got = {r["src"]: r for r in
           linear_count(df, "k", group_by=["src"], m=1024).collect()}
    assert got["s2"]["occupied"] == 1
    assert abs(got["s2"]["distinct_est"] - 1.0) < 0.01
    assert abs(got["s1"]["distinct_est"] - 50) < 3


def test_power_iteration_finds_dominant_direction(spark):
    # rank-1-dominated data: vectors mostly along u = (1, 0, 0, 0)
    rows = [([10.0, 0.1 * (i % 3), 0.0, 0.0],) for i in range(40)]
    rows += [([0.0, 1.0, 0.5, 0.0],)]  # one off-axis vector
    df = spark.createDataFrame(rows, "embedding array<double>")
    from openpolicedata_spark.operators.similarity import power_iteration

    v = power_iteration(df, iters=8)
    assert abs(abs(v[0]) - 1.0) < 0.01   # converges to ±e1
    assert all(abs(x) < 0.1 for x in v[1:])
    assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9


def test_power_iteration_step_decimal_matches_float_path(spark):
    rows = [([float(i), float(-i), 0.5],) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    from openpolicedata_spark.operators.similarity import power_iteration_step

    v = [0.5, 0.25, -1.0]
    f = {r["pos"]: r["w"] for r in
         power_iteration_step(df, v).collect()}
    d = {r["pos"]: r["w"] for r in
         power_iteration_step(df, v, decimal_sums=True).collect()}
    for pos in f:
        assert abs(f[pos] - d[pos]) < 1e-6


def test_edit_distance_pairs_finds_small_edits_and_caps_buckets(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base),
        (2, base.replace("lazy", "hazy")),          # 3 edits (3 repeats)
        (3, base + "extra tail words here"),        # within max_dist
        (4, "completely different document about police data " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from openpolicedata_spark.operators.dedup import edit_distance_pairs

    pairs = {(r["id_a"], r["id_b"]): r["edit_dist"]
             for r in edit_distance_pairs(df, max_dist=25).collect()}
    assert pairs[(1, 2)] == 3
    assert (1, 3) in pairs
    assert not any(4 in p for p in pairs)
    # degenerate block: every doc identical prefix+length; cap drops it
    many = spark.createDataFrame(
        [(i, base) for i in range(10)], "doc_id long, text string")
    capped = edit_distance_pairs(many, max_dist=25, max_bucket_size=5)
    assert capped.count() == 0


def test_edit_distance_pairs_rejects_bad_bucket_config(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    from openpolicedata_spark.operators.dedup import edit_distance_pairs

    with pytest.raises(ValueError, match="length_bucket"):
        edit_distance_pairs(df, max_dist=100, length_bucket=64)


def test_stratified_sample_exact_and_stable(spark):
    rows = ([("en", i) for i in range(100)]
            + [("fr", 100 + i) for i in range(3)])
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    from openpolicedata_spark.operators.sampling import stratified_sample

    out = stratified_sample(df, ["lang"], 10, "doc_id", seed="s1")
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang == {"en": 10, "fr": 3}   # exact n, short strata whole
    # determinism: same seed -> same ids; different seed -> different set
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in
            stratified_sample(df, ["lang"], 10, "doc_id", seed="s1").collect()}
    ids3 = {r["doc_id"] for r in
            stratified_sample(df, ["lang"], 10, "doc_id", seed="s2").collect()}
    assert ids1 == ids2
    assert ids1 != ids3


class TestBloom:
    def test_no_false_negatives_and_determinism(self, spark):
        from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe

        build = spark.range(100).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"))
        bloom = bloom_build(build, "key", k=3, m=1 << 16)
        probe = spark.range(200).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"))
        out = bloom_probe(bloom, probe, "key", k=3, m=1 << 16)
        got = {r["key"]: r["bloom_hit"] for r in out.collect()}
        # members always hit
        assert all(got[f"k{i}"] for i in range(100))
        # with m=65536 >> 300 set bits, non-members overwhelmingly miss
        misses = sum(not got[f"k{i}"] for i in range(100, 200))
        assert misses >= 95
        # probe preserves the row count (joins match at most one position)
        assert out.count() == 200
        got2 = {r["key"]: r["bloom_hit"]
                for r in bloom_probe(bloom, probe, "key", k=3, m=1 << 16).collect()}
        assert got == got2

    def test_tiny_filter_false_positives(self, spark):
        """m=16 with 3x20 set bits saturates -> non-members collide (the
        classic FP mode); still no false negatives."""
        from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe

        build = spark.range(20).select(F.col("id").cast("string").alias("key"))
        bloom = bloom_build(build, "key", k=3, m=16)
        probe = spark.range(40).select(F.col("id").cast("string").alias("key"))
        got = {r["key"]: r["bloom_hit"]
               for r in bloom_probe(bloom, probe, "key", k=3, m=16).collect()}
        assert all(got[str(i)] for i in range(20))
        assert sum(got[str(i)] for i in range(20, 40)) > 0  # FPs happen

    def test_probe_side_never_shuffles(self, spark):
        from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe
        from openpolicedata_spark.plans import summarize_plan

        build = spark.range(50).select(F.col("id").cast("string").alias("key"))
        bloom = bloom_build(build, "key", k=3, m=1 << 12)
        # materialize the filter so its own build shuffle is out of the plan
        bloom = bloom.localCheckpoint(eager=True)
        probe = spark.range(500).select(F.col("id").cast("string").alias("key"))
        s = summarize_plan(bloom_probe(bloom, probe, "key", k=3, m=1 << 12))
        assert s.n_broadcast_joins == 3
        # the defensive distinct on the (tiny) positions side costs up to
        # k bloom-side shuffles; the PROBE lineage must stay shuffle-free
        # — every shuffle exchange partitions on the bloom 'pos' column,
        # never on the probe 'key'
        import re

        for m_ in re.finditer(r"hashpartitioning\(([a-zA-Z_]+)#", s.text):
            assert m_.group(1) == "pos", s.text
        assert s.n_exchanges <= 3, s.text

    def test_portable_hash_matches_duckdb(self, spark):
        """With hash_fn=md5lower64_expr and power-of-two m, DuckDB replays
        the exact positions set."""
        import duckdb

        from openpolicedata_spark.functions.text import md5lower64_expr
        from openpolicedata_spark.operators.sketch import bloom_build

        build = spark.range(30).select(F.col("id").cast("string").alias("key"))
        bloom = bloom_build(build, "key", k=3, m=1 << 10,
                            hash_fn=md5lower64_expr)
        got = sorted(r["pos"] for r in bloom.collect())
        want = sorted(r[0] for r in duckdb.sql("""
            SELECT DISTINCT CAST(
                md5_number_lower(CAST(r.range AS VARCHAR) || ':' || CAST(i AS VARCHAR))
                % 1024 AS BIGINT) AS pos
            FROM range(30) t(i), range(3) r
        """).fetchall())
        assert got == want


class TestBottomK:
    def test_jaccard_and_cardinality_estimates(self, spark):
        from openpolicedata_spark.operators.sketch import (
            bottomk_estimates,
            bottomk_signature,
        )

        a = spark.range(0, 2000).select(F.col("id").cast("string").alias("v"))
        b = spark.range(1000, 3000).select(
            F.col("id").cast("string").alias("v"))
        k = 256
        sa = [r["h"] for r in bottomk_signature(a, "v", k).collect()]
        sb = [r["h"] for r in bottomk_signature(b, "v", k).collect()]
        est = bottomk_estimates(sa, sb, k)
        # true jaccard = 1000/3000
        assert abs(est["jaccard"] - 1 / 3) < 0.08
        assert abs(est["n_a"] - 2000) / 2000 < 0.2
        assert abs(est["n_union"] - 3000) / 3000 < 0.2

    def test_exact_when_small_and_mergeable(self, spark):
        from openpolicedata_spark.operators.sketch import (
            bottomk_estimates,
            bottomk_signature,
        )

        a = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
        sa = [r["h"] for r in bottomk_signature(a, "v", 256).collect()]
        est = bottomk_estimates(sa, sa, 256)
        assert est["jaccard"] == 1.0 and est["n_a"] == 50.0
        # mergeability: signature of a union == bottom-k of concatenated sigs
        b = spark.range(25, 75).select(F.col("id").cast("string").alias("v"))
        sb = [r["h"] for r in bottomk_signature(b, "v", 256).collect()]
        su = [r["h"] for r in bottomk_signature(
            a.unionByName(b), "v", 256).collect()]
        assert sorted(set(sa) | set(sb))[:256] == su

    def test_takeordered_plan(self, spark):
        from openpolicedata_spark.operators.sketch import bottomk_signature
        from openpolicedata_spark.plans import formatted_plan

        df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
        t = formatted_plan(bottomk_signature(df, "v", 64))
        assert "TakeOrderedAndProject" in t


def test_q123_estimates_track_q122_exact(spark, sf_dir):
    """The sketch containment estimates must track the exact pairwise
    jaccards from q122 within bottom-k error (k=128)."""
    from openpolicedata_spark import workload

    exact = {(r["src_a"], r["src_b"]):
             r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
             for r in workload.queries()["q122_join_discovery"](
                 spark, sf_dir).collect()}
    est = {(r["src_a"], r["src_b"]): r["est_jaccard"]
           for r in workload.queries()["q123_sketch_containment"](
               spark, sf_dir).collect()}
    assert set(est) == set(exact)
    for pair, j in exact.items():
        assert abs(est[pair] - j) < 0.15, (pair, j, est[pair])


    def test_probe_survives_duplicate_positions(self, spark):
        """ADVICE r3: a caller-unioned filter (bloomA ∪ bloomB without
        distinct) carries duplicate positions; the probe must still
        preserve the probe-side row count and hit set."""
        from openpolicedata_spark.operators.sketch import bloom_build, bloom_probe

        build = spark.range(50).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"))
        bloom = bloom_build(build, "key", k=3, m=1 << 16)
        dirty = bloom.union(bloom).union(bloom)  # 3x duplicated positions
        probe = spark.range(100).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"))
        clean_out = bloom_probe(bloom, probe, "key", k=3, m=1 << 16)
        dirty_out = bloom_probe(dirty, probe, "key", k=3, m=1 << 16)
        assert dirty_out.count() == 100  # no fan-out
        want = {r["key"]: r["bloom_hit"] for r in clean_out.collect()}
        got = {r["key"]: r["bloom_hit"] for r in dirty_out.collect()}
        assert got == want
