"""Distributed frequency / cardinality sketches.

Beyond-reference scale operators (the reference is a loader library; a
100 TB curation pipeline needs streaming-friendly frequency estimates).
Both sketches here are DETERMINISTIC — bucket assignment is a pure hash
expression — so an external SQL oracle can replay them bit-for-bit,
unlike rand()-seeded or JVM-internal sketch implementations
(`approx_count_distinct`'s HLL++ registers aren't portable).

Design at scale:

- `countmin_table` is ONE shuffle on (row, bucket) keys — `depth`×`width`
  cells regardless of corpus size (the map side partially aggregates, so
  the wire carries at most depth×width rows per task). The sketch table
  itself is tiny (depth×width ≤ a few thousand rows) and BROADCASTS into
  any lookup join.
- `countmin_lookup` never shuffles the key side: estimates join the
  broadcast sketch `depth` times cheaper — as one exploded broadcast
  join — and take the min across rows.
- `linear_count` is the classic Whang/Vander-Zanden/Taylor linear-time
  probabilistic counting bitmap: m buckets, V = empty fraction,
  n̂ = -m·ln(V). One shuffle carrying at most m distinct buckets per
  group; exact for small cardinalities, ~1-2% error near m, and fully
  portable (the estimate is a closed-form expression over a distinct
  count).

Hashing: `xxhash64` (JVM-native) by default; pass
``hash_fn=md5lower64_expr`` for the engine-portable variant the DuckDB
oracles replay (functions/text.py:108).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_hash(col: Column, salt: int) -> Column:
    return F.xxhash64(col, F.lit(salt))


def _salted(hash_fn: Optional[Callable[[Column], Column]]):
    """Adapt a one-arg portable hash into the (col, salt) form by
    prefixing the salt into the hashed string."""
    if hash_fn is None:
        return _default_hash

    def h(col: Column, salt: int) -> Column:
        return hash_fn(F.concat(F.lit(f"{salt}:"), col.cast("string")))

    return h


def countmin_table(
    df: DataFrame,
    key: str | Column,
    depth: int = 4,
    width: int = 1024,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Build a Count-Min sketch as a (row, bucket, cnt) table.

    Each input key increments `depth` cells, one per hash row:
    ``bucket_i = h_i(key) mod width``. The groupBy's map-side combine
    collapses every task to ≤ depth×width rows before the exchange, so
    the shuffle cost is bounded by the sketch size, not the data size.
    """
    col = F.col(key) if isinstance(key, str) else key
    h = _salted(hash_fn)
    rows = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(h(col, i), F.lit(width)).alias("bucket"))
        for i in range(depth)
    ])
    return (
        df.select(F.explode(rows).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_lookup(
    cms: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: Optional[Callable[[Column], Column]] = None,
    est_col: str = "cm_est",
) -> DataFrame:
    """Estimate each key's frequency from a `countmin_table` sketch:
    min over the `depth` cells the key maps to. Missing cells count 0
    (a key never seen estimates 0, not null). The sketch broadcasts —
    the keys side never shuffles for the join; the per-key min is a
    map-side-combined groupBy on the key itself."""
    col = F.col(key)
    h = _salted(hash_fn)
    rows = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(h(col, i), F.lit(width)).alias("bucket"))
        for i in range(depth)
    ])
    exploded = keys.select(
        *keys.columns, F.explode(rows).alias("c")
    ).select(*keys.columns, F.col("c.row").alias("row"),
             F.col("c.bucket").alias("bucket"))
    joined = exploded.join(F.broadcast(cms), on=["row", "bucket"],
                           how="left")
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col))
    )


def bloom_build(
    df: DataFrame,
    key: str | Column,
    k: int = 3,
    m: int = 65536,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Build a Bloom filter as a distinct-positions table: each build key
    sets `k` bits ``pos_i = h_i(key) mod m``; the filter is the set of
    set positions (≤ min(k·|keys|, m) rows — far smaller than the keyed
    data, and broadcastable into probes).

    A positions TABLE instead of a packed bitmap keeps the filter a
    first-class DataFrame: unionable across builds (bloom union = set
    union), persistable as parquet, and replayable by an external SQL
    oracle — none of which the JVM-internal `bloom_filter_agg` bytes
    offer. Deterministic for a fixed hash_fn. Use a power-of-two `m`
    so signed pmod matches unsigned mod across engines."""
    col = F.col(key) if isinstance(key, str) else key
    h = _salted(hash_fn)
    poss = F.array(*[F.pmod(h(col, i), F.lit(m)) for i in range(k)])
    return df.select(F.explode(poss).alias("pos")).distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key: str,
    k: int = 3,
    m: int = 65536,
    hash_fn: Optional[Callable[[Column], Column]] = None,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Probe a `bloom_build` filter: a key is a (possible) member iff ALL
    `k` of its positions are set. Classic Bloom semantics — no false
    negatives, false positives when unrelated keys happen to cover all k
    positions (rate ≈ (1 - e^{-k·n/m})^k).

    Shape: `k` broadcast LEFT joins against the (distinct, tiny)
    positions table — the probe side NEVER shuffles and its row count
    never changes (each join matches at most one position row). This is
    the decontamination shape for 100 TB: the benchmark/eval side builds
    a small filter once; the training corpus streams past it map-side."""
    h = _salted(hash_fn)
    col = F.col(key)
    out = keys
    hit = F.lit(True)
    # defensively dedupe the (tiny) positions side: a caller-unioned
    # filter (bloomA.union(bloomB)) carries duplicate positions, and a
    # duplicated position would FAN OUT every probe row that hashes to
    # it — the probe side's row count must never change
    bloom = bloom.select("pos").distinct()
    for i in range(k):
        b = bloom.select(F.col("pos").alias(f"__p{i}__"),
                         F.lit(1).alias(f"__m{i}__"))
        out = out.join(F.broadcast(b),
                       F.pmod(h(col, i), F.lit(m)) == F.col(f"__p{i}__"),
                       "left")
        hit = hit & F.col(f"__m{i}__").isNotNull()
    return out.withColumn(hit_col, hit).drop(
        *[c for i in range(k) for c in (f"__p{i}__", f"__m{i}__")])


def linear_count(
    df: DataFrame,
    key: str | Column,
    group_by: Sequence[str] = (),
    m: int = 4096,
    hash_fn: Optional[Callable[[Column], Column]] = None,
    est_col: str = "distinct_est",
) -> DataFrame:
    """Linear-counting distinct estimate, optionally per group:
    ``n̂ = -m · ln(1 - occupied/m)``. Deterministic (hash-bucket bitmap
    via a distinct count), so an oracle replays it exactly; when every
    bucket fills (occupied == m) the estimate is NULL — the sketch is
    saturated and `m` must grow. The shuffle carries at most m buckets
    per group (distinct is map-side partial)."""
    col = F.col(key) if isinstance(key, str) else key
    h = _salted(hash_fn)
    bucket = F.pmod(h(col, 0), F.lit(m))
    gb = list(group_by)
    occupied = (
        df.select(*gb, bucket.alias("__b__"))
        .groupBy(*gb)
        .agg(F.count_distinct("__b__").alias("occupied"))
    )
    est = F.when(
        F.col("occupied") < F.lit(m),
        F.round(-F.lit(float(m))
                * F.log(F.lit(1.0) - F.col("occupied") / F.lit(float(m))), 6),
    )
    return occupied.select(*gb, "occupied", est.alias(est_col))


def bottomk_signature(
    df: DataFrame,
    key: str | Column,
    k: int = 256,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Bottom-k sketch of a column's VALUE SET: the k smallest hash
    values over the distinct values, mapped into [0, 2^62) so the order
    is portable (power-of-two pmod — signed Spark == unsigned oracle).
    `orderBy().limit(k)` plans TakeOrderedAndProject: per-partition
    heaps + driver merge, never a full sort. Mergeable: the bottom-k of
    a union is the bottom-k of the concatenated signatures — so
    per-partition/per-day signatures roll up without touching the data
    again. The k-bounded signature replaces exact distincts in
    join-discovery (q122) and cardinality estimation at 100 TB."""
    col = F.col(key) if isinstance(key, str) else key
    h = _salted(hash_fn)
    return (
        df.select(F.pmod(h(col, 0), F.lit(1 << 62)).alias("h"))
        .distinct()
        .orderBy(F.asc("h"))
        .limit(k)
    )


def bottomk_estimates(sig_a, sig_b, k: int) -> dict:
    """Driver-side estimates from two collected bottom-k signatures
    (each a list of ints from `bottomk_signature` — 2k longs of driver
    state, the whole point of sketching):

    - jaccard  ≈ |bottomk(A∪B) ∩ sigA ∩ sigB| / min(k, |union sketch|)
    - n_a/n_b/n_union ≈ (k-1)·2^62 / h_k (order-statistic cardinality;
      exact count when the set is smaller than k).
    Deterministic for a fixed hash."""
    M = float(1 << 62)
    a, b = sorted(sig_a), sorted(sig_b)
    sa, sb = set(a), set(b)
    union = sorted(sa | sb)[:k]
    shared = sum(1 for h in union if h in sa and h in sb)
    denom = min(k, len(union)) or 1

    def card(s):
        if len(s) < k:
            return float(len(s))
        return (k - 1) * M / float(s[k - 1])

    return {
        "jaccard": shared / denom,
        "n_a": card(a),
        "n_b": card(b),
        "n_union": card(union),
    }
