"""Distributed spatial operators over plain lon/lat double columns.

The reference hands geometry to driver-bound geopandas (socrata.py:
476-504, arcgis_class.py:516-546); at scale the engine keeps points as
columns and runs spatial joins the same way it runs LSH dedup: BLOCK on
a grid cell, candidate-join only neighboring cells, verify exactly —
one shuffle on small integer keys instead of a cross join
(functions/geo.grid_cell_expr documents the pattern; this module is the
operator). Same skew discipline as every LSH-family blocker in
operators/dedup: a `max_cell_size` cap drops degenerate cells LOUDLY in
the contract (documented recall loss) instead of letting one mega-cell
OOM an executor.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openpolicedata_spark.functions.geo import haversine_km_expr

# conservative km per degree of latitude on the WGS84 sphere used by
# haversine_km_expr (pi * 6371.0088 / 180 = 111.195): any denominator
# <= the true value makes the cell wider than the radius, never narrower
_KM_PER_DEG_FLOOR = 111.0


def radius_pairs(
    df: DataFrame,
    id_col: str,
    lon_col: str,
    lat_col: str,
    radius: float,
    metric: str = "haversine",
    max_cell_size: Optional[int] = None,
    lat_cap_deg: float = 66.0,
) -> DataFrame:
    """All pairs of rows within `radius` of each other — the spatial
    self-join every incident-clustering / nearby-duplicate pipeline
    needs, built like the LSH blockers: grid-cell blocking → 9-neighbor
    candidate join → exact distance verify (round 10).

    metric='haversine': `radius` in km, verified with the great-circle
    formula; cells are Δlat = r/111.0, Δlon = r/(111.0·cos(lat_cap))
    degrees — conservative (cell ≥ radius) for every |lat| ≤
    `lat_cap_deg`, and rows beyond the cap RAISE via an in-plan
    assert_true (the longitude shrink makes neighbor cells too narrow
    near the poles; a polar corpus needs a polar-cap partition, not a
    silent wrong answer). metric='degree': `radius` in degrees,
    verified with plain squared-difference arithmetic — every
    comparison is IEEE basic ops, so a SQL oracle replays membership
    BIT-EXACTLY (haversine matches only to ~1 ulp — fine for values,
    not for threshold membership). Neither metric wraps the
    antimeridian (pinned limitation: a ±180°-crossing pair is missed;
    shift the frame upstream if the corpus lives there).

    Plan shape: one (cx, cy) count aggregate (map-side combined) when
    capped, then ONE equi-join on integer cell keys with a 9-offset
    explode on the build side — each surviving pair matches exactly
    once (the offset between its cells is unique), `id_a < id_b`
    halves it, and the verify predicate runs only on candidates.
    Worst-case candidate volume per cell is max_cell_size², the same
    bound the LSH bucket caps enforce."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    if metric not in ("haversine", "degree"):
        raise ValueError(f"unknown metric {metric!r}")
    if max_cell_size is not None and max_cell_size < 1:
        raise ValueError(f"max_cell_size must be >= 1, got {max_cell_size}")
    lon, lat = F.col(lon_col).cast("double"), F.col(lat_col).cast("double")
    if metric == "degree":
        d_lat = d_lon = float(radius)
        guard = lat
    else:
        d_lat = radius / _KM_PER_DEG_FLOOR
        d_lon = radius / (_KM_PER_DEG_FLOOR
                          * math.cos(math.radians(lat_cap_deg)))
        guard = F.when(
            F.abs(lat) <= F.lit(float(lat_cap_deg)), lat
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"radius_pairs: |lat| > lat_cap_deg={lat_cap_deg} at "
                  f"{id_col}="), F.col(id_col).cast("string"),
            F.lit(" - widen lat_cap_deg or partition the polar cap"))))
    pts = df.select(
        F.col(id_col),
        lon.alias("__lon__"),
        guard.alias("__lat__"),
        F.floor(lon / F.lit(d_lon)).cast("int").alias("__cx__"),
        F.floor(guard / F.lit(d_lat)).cast("int").alias("__cy__"),
    )
    if max_cell_size is not None:
        ok = (pts.groupBy("__cx__", "__cy__")
              .agg(F.count(F.lit(1)).alias("__n__"))
              .where(F.col("__n__") <= max_cell_size)
              .drop("__n__"))
        pts = pts.join(ok, on=["__cx__", "__cy__"])
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
    if metric == "degree":
        # plain products, not pow(): x*x is one IEEE rounding on every
        # engine, so threshold membership is bit-deterministic
        dlat = F.col("__alat__") - F.col("__blat__")
        dlon = F.col("__alon__") - F.col("__blon__")
        dd = dlat * dlat + dlon * dlon
        return (cand.where(dd <= F.lit(float(radius) * float(radius)))
                .select("id_a", "id_b", F.sqrt(dd).alias("dist")))
    d = haversine_km_expr(F.col("__alon__"), F.col("__alat__"),
                          F.col("__blon__"), F.col("__blat__"))
    return (cand.where(d <= F.lit(float(radius)))
            .select("id_a", "id_b", d.alias("dist")))
