"""Deterministic sampling / splitting / ordering for training-data curation.

Everything here is keyed on a portable content hash (md5 of a stable key
rendered as lowercase hex — identical in Spark, DuckDB, Trino, pandas), not
on `rand()`: reruns, retried tasks, and other engines reproduce the exact
same assignment, which is what makes train/val/test membership auditable.

All operators are narrow (no shuffle) except where a global order is
genuinely requested; those use TakeOrderedAndProject (per-partition heaps)
rather than a full sort.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_hash_expr(key: Column, seed: str = "") -> Column:
    """2-hex-digit bucket in ['00'..'ff'] from the md5 of the key (plus an
    optional seed prefix). Lexicographic comparison of lowercase hex equals
    numeric comparison of the first byte, so thresholds are plain string
    literals and every engine agrees."""
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 2)


def _thresholds(weights: Sequence[float]) -> list[str]:
    """Cumulative weight boundaries as 2-digit hex strings over 256
    buckets. A cumulative weight that rounds to the full 256 must absorb
    EVERY bucket including 'ff' — capping it at 'ff' with the strict
    `bucket < bound` comparison would leak the 0xff bucket (~1/256 of
    keys) into the next split even at weight 0. 'g' sorts after every
    hex digit, so it is the lexicographic +infinity for 2-hex buckets."""
    total = float(sum(weights))
    bounds, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        v = int(round(acc * 256))
        bounds.append("g" if v >= 256 else format(v, "02x"))
    return bounds


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Sequence[str] = ("train", "val", "test"),
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first byte of
    md5(seed || key), split = interval of the cumulative weights.

    Row-local (no shuffle, no state); assignment depends only on the key,
    so adding or removing OTHER rows never reassigns a document — the
    property that keeps eval sets stable as a 100 TB corpus grows.
    Reference has no analog (beyond-reference training-pipeline operator).
    """
    if len(splits) != len(weights):
        raise ValueError("splits and weights must align")
    b = split_hash_expr(F.col(key_col), seed)
    expr = F.lit(splits[-1])
    for name, bound in reversed(list(zip(splits[:-1], _thresholds(weights)))):
        expr = F.when(b < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def shuffle_key_expr(key: Column, seed: str = "epoch0") -> Column:
    """Deterministic per-epoch shuffle key: md5(seed || ':' || key).
    Changing `seed` reshuffles; the same seed replays the same order."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))


def train_shuffle(df: DataFrame, key_col: str, seed: str = "epoch0",
                  key_out: str = "shuffle_key") -> DataFrame:
    """Global deterministic shuffle for training-order randomization:
    ORDER BY md5(seed:key). Spark executes this as a range-partitioned
    distributed sort (sampled boundaries), so no single task ever holds
    the corpus; writers downstream preserve the order per output file."""
    return (df.withColumn(key_out, shuffle_key_expr(F.col(key_col), seed))
            .orderBy(key_out))


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Compaction: keep the single latest row per key, ordered by
    `order_cols` (last wins; ties broken by the later columns — make the
    last one unique for determinism).

    One `max_by(struct(*row), struct(*order))` aggregation: the map-side
    partial keeps one candidate row per key per partition, so the shuffle
    carries |keys| rows, not |rows| — the scale-right shape for upsert-log
    compaction, vs. the window row_number formulation which sorts every
    group's full history after a full-width shuffle."""
    cols = df.columns
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(
            F.struct(*[c for c in cols if c not in key_cols]),
            F.struct(*[F.col(c) for c in order_cols])).alias("__row__"))
        .select(*key_cols, "__row__.*")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_n: int,
    order_cols: Sequence[str],
    keep_rank: bool = False,
) -> DataFrame:
    """Per-key row cap — the domain-cap step of web-corpus pipelines
    (CCNet/Gopher keep at most N pages per registered domain so one
    crawler-friendly site cannot dominate the mixture): deterministic
    survivors are the first `max_n` rows per key ordered by
    `order_cols` (strings or Column expressions, e.g. a .desc(); make
    the last one unique — the id — so ties cannot flip under
    partitioning).

    One exchange on the key + in-partition sort (the row_number
    window). Unlike `latest_per_key` (max_by, N=1, map-side combined)
    a general N needs the sort; at 100 TB the key is the natural
    partition column so AQE's skew split handles mega-domains, and the
    output is immediately co-partitioned for the next per-domain
    stage. `keep_rank=True` retains the 1-based rank column
    `key_rank`."""
    if max_n <= 0:
        raise ValueError(f"max_n must be positive, got {max_n}")
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols])
    out = (df.withColumn("key_rank", F.row_number().over(w))
           .where(F.col("key_rank") <= max_n))
    return out if keep_rank else out.drop("key_rank")


def budget_hash_expr(key: Column, seed: str = "") -> Column:
    """Non-negative portable numeric shuffle key: md5lower64(seed:key)
    taken mod 2^62. The power-of-two modulus makes Spark's signed
    `pmod` equal DuckDB's unsigned `md5_number_lower % 2^62` (2^62
    divides 2^64, so the signed reinterpretation cancels), giving both
    engines the SAME numeric sort order — unlike the raw signed long,
    whose sign bit reorders rows relative to an unsigned engine."""
    from openpolicedata_spark.functions.text import md5lower64_expr

    return F.pmod(
        md5lower64_expr(F.concat(F.lit(seed), F.lit(":"), key.cast("string"))),
        F.lit(1 << 62))


def global_running_total(
    df: DataFrame,
    weight_col: str,
    order_col: str | Column,
    tiebreak_cols: Sequence[str] = (),
    n_buckets: int = 64,
    out_col: str = "cum_before",
    bounds: Optional[Sequence[float]] = None,
) -> DataFrame:
    """EXCLUSIVE global running total of `weight_col` in (`order_col`,
    `tiebreak_cols`) order — without the single-task global window that
    `SUM() OVER (ORDER BY …)` plans (Spark puts an un-PARTITION BY'd
    window on ONE partition; at 100 TB that task never finishes).

    Distributed prefix-sum in three bounded steps:
    1. APPROXIMATE percentile boundaries of `order_col` (GK sketch —
       bounded aggregation state; `F.percentile` keeps a per-distinct-
       value map whose single-task final merge is O(N) on an
       all-distinct hash key, the very bottleneck this operator removes)
       split the order into contiguous ranges. The OUTPUT never depends
       on where the cuts fall: offsets come from the real per-bucket
       totals below, so any monotone cut is correct — approximation
       costs only balance, never the answer;
    2. per-bucket weight totals (map-side-combined agg, `n_buckets`
       rows) become exclusive bucket offsets via one tiny collect
       (bounded driver state, like any range-partitioner plan) — both
       planning jobs run on a checkpointed SLIM (order, weight)
       projection, so the full rows and the order-key expression are
       touched once, in the output pass;
    3. a window PARTITIONED by bucket computes the within-bucket
       exclusive cumsum; `offset[bucket] + within` is the global total.
    The only full-data shuffle is the bucket window, and the hash-
    uniform `order_col` keeps buckets even. Size `n_buckets` ≈ cluster
    cores. `order_col` must be numeric; equal order values never
    straddle buckets (boundaries compare strictly), and `tiebreak_cols`
    order rows within an equal-value run deterministically."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    if bounds is not None:
        # Caller-provided monotone cut points (data-INDEPENDENT). The
        # output never depends on where cuts fall — offsets come from the
        # real per-bucket totals below — so a caller whose order key is
        # uniform BY CONSTRUCTION (budget_hash_expr's md5 mod 2^62) can
        # hand over equal-width cuts of the hash domain and skip the
        # whole approx_percentile planning job: one driver job and one
        # GK-sketch pass over (order, weight) removed (r13 optimization;
        # measured 1.11-1.15x on q112 at sf0.1 — at 100 TB it is a full
        # data pass that no longer runs). Balance, not correctness, is
        # the caller's burden. No checkpoint either: slim now feeds only
        # the totals job.
        bounds = list(bounds)
        n_buckets = len(bounds) + 1
        slim = df.select(oc.alias("__ord__"),
                         F.col(weight_col).alias("__w__"))
    elif n_buckets > 1:
        slim = df.select(oc.alias("__ord__"),
                         F.col(weight_col).alias("__w__"))
        slim = slim.localCheckpoint(eager=False)
        row = slim.agg(F.approx_percentile(
            "__ord__",
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
            F.lit(10000),
        ).alias("__bs__")).first()
        bounds = list(row["__bs__"] or [])
    else:
        bounds = []
        slim = df.select(oc.alias("__ord__"),
                         F.col(weight_col).alias("__w__"))

    def bucket_of(ord_col: Column) -> Column:
        if not bounds:
            return F.lit(1)
        b = F.lit(1)
        for v in bounds:
            b = b + F.when(F.lit(v) < ord_col, 1).otherwise(0)
        return b

    totals = {
        r["__bucket__"]: r["t"]
        for r in slim.groupBy(bucket_of(F.col("__ord__")).alias("__bucket__"))
        .agg(F.sum("__w__").alias("t")).collect()
    }
    offsets, acc = [], 0
    for b in range(1, n_buckets + 1):
        offsets.append(acc)
        acc += totals.get(b, 0) or 0
    # keep the collected python numerics as-is: int weights stay exact
    # longs, float weights must NOT truncate through int()
    off = F.element_at(F.array(*[F.lit(o) for o in offsets]),
                       F.col("__bucket__"))
    d = (df.withColumn("__ord__", oc)
         .withColumn("__bucket__", bucket_of(F.col("__ord__"))))
    w = (Window.partitionBy("__bucket__")
         .orderBy(F.col("__ord__").asc(),
                  *[F.col(c).asc() for c in tiebreak_cols])
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        d.withColumn(out_col,
                     off + F.coalesce(F.sum(weight_col).over(w), F.lit(0)))
        .drop("__ord__", "__bucket__")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    weight_col: str,
    key_col: str,
    seed: str = "",
    n_buckets: int = 64,
    cum_col: str = "cum_before",
) -> DataFrame:
    """Deterministic token-budget subsample: order the corpus by the
    portable hash of `key_col` (an unbiased, rerun-stable shuffle) and
    keep documents until their cumulative `weight_col` (token count)
    fills `budget` — the "give me exactly ~N tokens of this corpus"
    primitive behind every training-mix recipe. A document is kept iff
    the tokens BEFORE it in hash order leave room for it to start
    (`cum_before < budget`), so the output overshoots by at most one
    document and membership is stable under reruns and engines.

    Built on `global_running_total` (bucketed distributed prefix sum) —
    no single-task window, no driver materialization beyond `n_buckets`
    offsets. The order key is md5 mod 2^62 — uniform by construction —
    so the bucket cuts are EQUAL-WIDTH slices of the hash domain passed
    straight in (`bounds=`): the operator's approx_percentile planning
    job never runs (r13; one driver job + one full (order, weight) pass
    removed, output bit-identical since offsets come from real bucket
    totals)."""
    d = df.withColumn("__h__", budget_hash_expr(F.col(key_col), seed))
    out = global_running_total(
        d, weight_col, "__h__", tiebreak_cols=(key_col,),
        n_buckets=n_buckets, out_col=cum_col,
        bounds=_hash_domain_bounds(n_buckets))
    return out.where(F.col(cum_col) < budget).drop("__h__")


def _hash_domain_bounds(n_buckets: int) -> list[int]:
    """Equal-width interior cut points of budget_hash_expr's [0, 2^62)
    domain — the data-independent bounds for hash-ordered prefix sums."""
    step = (1 << 62) // max(n_buckets, 1)
    return [i * step for i in range(1, n_buckets)]


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_col: str,
    seed: str = "",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exact-size deterministic stratified sample: the `n_per_stratum`
    rows with the smallest md5(seed:key) per stratum (ties impossible for
    distinct keys; the key itself is the final tiebreak). Unlike
    `df.sampleBy` (Bernoulli — approximate counts, rand()-seeded per
    task) this yields exactly min(n, |stratum|) rows per stratum and the
    SAME rows on every rerun and every engine.

    Shape: one shuffle on the strata key for the per-stratum top-n
    window. For strata small enough to matter (the usual case: sampling
    k docs per source/language for eval or annotation), the window sort
    is per-group and the output is Σ min(n, |s|) rows. A skewed mega-
    stratum still sorts only within itself; cap via pre-filter if a
    stratum approaches executor memory."""
    from pyspark.sql import Window

    h = shuffle_key_expr(F.col(key_col), seed)
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(key_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n_per_stratum)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    weight_col: str,
    key_col: str,
    seed: str = "epoch0",
    n_shards: int = 64,
) -> DataFrame:
    """Export a curated corpus as deterministic TRAINING SHARDS — the
    last step of the pipeline, shaped for a data loader:

    - shard assignment = portable hash of the key mod `n_shards` —
      SEED-INDEPENDENT (stable under reruns, corpus growth, and epoch
      changes, like `hash_split`), so re-exporting an epoch rewrites the
      same membership with a new order and shard-level bookkeeping
      (caches, size budgets) survives across epochs;
    - WITHIN each shard, rows are written in the per-epoch shuffle order
      (`shuffle_key_expr(seed)`) — a loader streaming shard files in
      order replays the exact same example sequence every run, and a new
      `seed` reshuffles the order only;
    - layout: `path/shard=N/*.parquet` via partitionBy — one write job,
      each task sorts only its own shard (`repartition(shard)` +
      `sortWithinPartitions`), nothing global.

    Returns the MANIFEST (shard, n_docs, n_tokens) that was also written
    to `path/_manifest` — the loader's unit of bookkeeping (length-aware
    sampling, resumable epochs). Shard sizes concentrate tightly
    (multinomial with uniform hash) so per-shard token budgets stay
    within a few percent of corpus/n_shards."""
    # a NULL key hashes to a NULL shard, which partitionBy would silently
    # divert into __HIVE_DEFAULT_PARTITION__ — invisible to the manifest
    # and to any loader globbing shard=N/. Fail loudly instead: a doc
    # with no identity has no stable shard membership. The check is a
    # null-pushdown limit-1 scan, negligible next to the export itself.
    if df.where(F.col(key_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"write_training_shards: {key_col!r} contains NULLs; "
            "drop or repair them before exporting shards")
    d = (
        df.withColumn(
            "shard",
            F.pmod(budget_hash_expr(F.col(key_col), "shard"),
                   F.lit(n_shards)).cast("int"))
        .withColumn("__sk__", shuffle_key_expr(F.col(key_col), seed))
    )
    (
        # repartitionByRange: ~1:1 shard→task (plain hash-repartition of
        # 64 distinct ids leaves ~1/e of the tasks empty and the busiest
        # writing 2-3 shards); the in-partition sort still leads with
        # shard for the boundary tasks that straddle two ids
        d.repartitionByRange(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__sk__")
        .drop("__sk__")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    )
    # manifest from the WRITTEN shards, not a second source scan: the
    # column-pruned read touches only the weight column + the partition
    # value, and the manifest can never diverge from what was written
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(weight_col).alias("n_tokens"))
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        path.rstrip("/") + "/_manifest")
    return manifest


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    seed: str = "",
    es_col: str = "es_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, one pass —
    Efraimidis–Spirakis A-Res with the deterministic hash in place of
    rand(): u = (h+1)/2^62 ∈ (0,1] from the portable key hash, priority
    = -ln(u)/w, keep the k SMALLEST priorities (equivalent to the
    classic largest-u^(1/w) form). Inclusion probability rises with
    weight; membership is a pure function of (key, seed), so reruns,
    retries, and other engines draw the SAME sample — rand()-based
    reservoirs can't promise any of that.

    Shape: priorities are row-local; `orderBy().limit(k)` plans
    TakeOrderedAndProject (per-partition k-heaps + driver merge — no
    sort shuffle), so the cost is one scan at any corpus size. Rows
    with weight <= 0 or a NULL key are excluded (a NULL key hashes to a
    NULL priority, which Spark's ASC sort would otherwise place FIRST —
    promoting exactly the rows with no valid priority)."""
    h = budget_hash_expr(F.col(key_col), seed)
    u = (h + 1).cast("double") / F.lit(float(1 << 62))
    pri = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where((F.col(weight_col) > 0) & F.col(key_col).isNotNull())
        .withColumn(es_col, pri)
        .orderBy(F.asc(es_col), F.asc(key_col))
        .limit(k)
    )
