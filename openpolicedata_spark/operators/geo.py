"""Distributed spatial SELF-join over plain lon/lat double columns.

The general two-sided radius join lives in `operators/scale.radius_join`
(grid blocking, latitude-adaptive longitude fan-out, antimeridian wrap).
This module adds the SELF-join form an incident-clustering /
nearby-duplicate pipeline runs — `radius_pairs` — with the two things
the two-sided operator doesn't carry:

- a `max_cell_size` density cap, the same skew discipline as every
  LSH-family blocker in operators/dedup (a degenerate cell — one plaza
  with a million geocoded reports — would otherwise explode candidates
  quadratically; dropping it is LOUD in the contract, exactly like the
  LSH bucket caps, and the cap replays in the q197 oracle's HAVING);
- a `metric='degree'` verify whose every comparison is IEEE BASIC
  arithmetic (subtract/multiply/compare — bit-deterministic on any
  engine), so a SQL oracle replays pair MEMBERSHIP exactly. Haversine
  matches only to ~1 ulp — fine for reporting a distance, not for
  deciding threshold membership in an exact-hash gate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative km per degree of latitude on the WGS84 sphere used by
# haversine_km_expr (pi * 6371.0088 / 180 = 111.195): any denominator
# <= the true value makes the cap cell at least radius-wide
_KM_PER_DEG_FLOOR = 111.0


def radius_pairs(
    df: DataFrame,
    id_col: str,
    lon_col: str,
    lat_col: str,
    radius: float,
    metric: str = "haversine",
    max_cell_size: Optional[int] = None,
) -> DataFrame:
    """All pairs of rows within `radius` of each other (`id_a < id_b`,
    plus the distance) — grid-cell blocking → neighbor-cell candidate
    join → exact verify, with an optional per-cell density cap
    (round 10; see the module doc for how this splits against
    `scale.radius_join`).

    metric='haversine': `radius` in km, `dist` in km; the pair
    generation DELEGATES to `scale.radius_join` (latitude-adaptive
    fan-out, antimeridian wrap — polar and seam-adjacent points pair
    correctly). metric='degree': `radius` in degrees, `dist` in
    degrees; a flat 9-neighbor candidate join verified with plain
    squared differences — the bit-exact-oracle path (no antimeridian
    wrap: a ±180°-crossing pair is missed, pinned limitation).

    The cap runs BEFORE pairing in both metrics, on the same
    radius-sized grid blocking uses: one (cx, cy) count aggregate with
    map-side partials, cells above `max_cell_size` drop entirely
    (documented recall loss, mirroring the LSH bucket caps — at 100 TB
    one degenerate cell is the difference between a bounded join and a
    quadratic blow-up; worst-case candidates per surviving cell are
    max_cell_size²)."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    if metric not in ("haversine", "degree"):
        raise ValueError(f"unknown metric {metric!r}")
    if max_cell_size is not None and max_cell_size < 1:
        raise ValueError(f"max_cell_size must be >= 1, got {max_cell_size}")
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")
    cell = float(radius) if metric == "degree" \
        else radius / _KM_PER_DEG_FLOOR
    pts = df.select(
        F.col(id_col),
        lon.alias("__lon__"),
        lat.alias("__lat__"),
        F.floor(lon / F.lit(cell)).cast("int").alias("__cx__"),
        F.floor(lat / F.lit(cell)).cast("int").alias("__cy__"),
    )
    if max_cell_size is not None:
        ok = (pts.groupBy("__cx__", "__cy__")
              .agg(F.count(F.lit(1)).alias("__n__"))
              .where(F.col("__n__") <= max_cell_size)
              .drop("__n__"))
        pts = pts.join(ok, on=["__cx__", "__cy__"])

    if metric == "haversine":
        from openpolicedata_spark.operators.scale import radius_join

        p = pts.select(F.col(id_col), F.col("__lon__").alias(lon_col),
                       F.col("__lat__").alias(lat_col))
        joined = radius_join(p, p, radius_km=float(radius),
                             lon_col=lon_col, lat_col=lat_col,
                             suffix="_r")
        return (joined
                .where(F.col(id_col) < F.col(id_col + "_r"))
                .select(F.col(id_col).alias("id_a"),
                        F.col(id_col + "_r").alias("id_b"),
                        F.col("distance_km").alias("dist")))

    offsets = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("__o__")
    a = pts.select(
        F.col(id_col).alias("id_a"),
        F.col("__lon__").alias("__alon__"),
        F.col("__lat__").alias("__alat__"),
        "__cx__", "__cy__", offsets,
    ).select(
        "id_a", "__alon__", "__alat__",
        (F.col("__cx__") + F.col("__o__.dx")).alias("__jx__"),
        (F.col("__cy__") + F.col("__o__.dy")).alias("__jy__"),
    )
    b = pts.select(
        F.col(id_col).alias("id_b"),
        F.col("__lon__").alias("__blon__"),
        F.col("__lat__").alias("__blat__"),
        F.col("__cx__").alias("__jx__"),
        F.col("__cy__").alias("__jy__"),
    )
    cand = a.join(b, on=["__jx__", "__jy__"]).where(
        F.col("id_a") < F.col("id_b"))
    # plain products, not pow(): x*x is one IEEE rounding on every
    # engine, so threshold membership is bit-deterministic
    dlat = F.col("__alat__") - F.col("__blat__")
    dlon = F.col("__alon__") - F.col("__blon__")
    dd = dlat * dlat + dlon * dlon
    return (cand.where(dd <= F.lit(float(radius) * float(radius)))
            .select("id_a", "id_b", F.sqrt(dd).alias("dist")))
