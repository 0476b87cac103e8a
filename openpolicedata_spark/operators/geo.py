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

Both metrics wrap the antimeridian (round 11): the longitude grid is a
RING of N cells covering the full 360° (cell 0 and cell N−1 are
neighbors via pmod), and the degree verify measures the WRAPPED
longitude difference min(|Δlon|, 360−|Δlon|) — still one subtract /
abs / min per pair, all exactly-rounded IEEE ops, so the oracle replay
stays bit-exact. A pair at lon +179.9 / −179.9 is 0.2° apart in both
the blocking and the verify. The haversine branch always had the wrap
via scale.radius_join; its density-cap grid is additionally
latitude-adaptive here (ADVICE r10): each latitude band scales its
cell WIDTH by 1/cos(band edge nearer the pole), so cap cells stay at
least radius-wide in ground km at every latitude — without this, a
degenerate dense site at 70°N would straddle ~3 narrower cells and
dilute the count the cap keys on (pair correctness was never affected;
the cap is the skew guard).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# conservative km per degree of LATITUDE on the WGS84 sphere used by
# haversine_km_expr (pi * 6371.0088 / 180 = 111.195): any denominator
# <= the true value makes the cap cell at least radius-TALL everywhere;
# widths are corrected per latitude band (see module doc)
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
    degrees with the longitude difference WRAPPED modulo 360
    (min(|Δlon|, 360−|Δlon|) — round 11; a ±180°-crossing pair is
    found and measured across the seam); blocking is a ring of
    ceil-width cells joined through pmod'd neighbor offsets, and every
    comparison stays IEEE basic arithmetic — the bit-exact-oracle path.

    The cap runs BEFORE pairing in both metrics, on the same
    radius-sized ring grid blocking uses (latitude-adaptive widths in
    haversine mode): one (cx, cy) count aggregate with map-side
    partials, cells above `max_cell_size` drop entirely (documented
    recall loss, mirroring the LSH bucket caps — at 100 TB one
    degenerate cell is the difference between a bounded join and a
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
    cy = F.floor(lat / F.lit(cell)).cast("int")
    if metric == "degree":
        # ring of N cells, each 360/N >= radius degrees wide: a pair
        # within the (wrapped) radius is at most one ring step apart.
        # floor((lon+180)/cw) pmod N — plain add/divide/floor, the
        # exact op order the oracle replays
        n_cells = max(1, int(360.0 // cell))
        cw = 360.0 / n_cells
        cx = F.pmod(F.floor((lon + F.lit(180.0)) / F.lit(cw)),
                    F.lit(n_cells)).cast("int")
    else:
        # latitude-adaptive ring (cap-grid only — pairing delegates):
        # per band, N = floor(360·cos(edge)/cell) cells, edge = the
        # band boundary nearer the pole, so each cell spans >= cell
        # degrees / cos = >= radius km of ground at every latitude in
        # the band; near the poles cos→0 collapses the band to 1 cell
        edge = F.least(
            F.greatest(F.abs(cy.cast("double") * F.lit(cell)),
                       F.abs((cy.cast("double") + F.lit(1.0))
                             * F.lit(cell))),
            F.lit(90.0))
        cos_edge = F.greatest(F.cos(F.radians(edge)), F.lit(0.0))
        nb = F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.lit(360.0) * cos_edge / F.lit(cell)))
        cx = F.pmod(
            F.floor((lon + F.lit(180.0)) * nb.cast("double")
                    / F.lit(360.0)),
            nb).cast("int")
    pts = df.select(
        F.col(id_col),
        lon.alias("__lon__"),
        lat.alias("__lat__"),
        cx.alias("__cx__"),
        cy.alias("__cy__"),
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

    # ring neighbors: pmod'd x offsets make cell 0 adjacent to cell
    # N-1 (the seam). For N >= 3 the three offsets hit three DISTINCT
    # cells so every candidate pair appears exactly once; for a ring
    # of 1-2 cells (radius > 120°) the offsets {0..N-1} cover the
    # whole ring, still one match per pair.
    dxs = (-1, 0, 1) if n_cells >= 3 else tuple(range(n_cells))
    offsets = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in dxs for dy in (-1, 0, 1)])).alias("__o__")
    a = pts.select(
        F.col(id_col).alias("id_a"),
        F.col("__lon__").alias("__alon__"),
        F.col("__lat__").alias("__alat__"),
        "__cx__", "__cy__", offsets,
    ).select(
        "id_a", "__alon__", "__alat__",
        F.pmod(F.col("__cx__") + F.col("__o__.dx"),
               F.lit(n_cells)).alias("__jx__"),
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
    # engine, so threshold membership is bit-deterministic; the
    # longitude difference wraps the seam via abs (exact), one
    # correctly-rounded 360−|Δ| subtract, and min (exact compare) —
    # determinism is untouched
    dlat = F.col("__alat__") - F.col("__blat__")
    adl = F.abs(F.col("__alon__") - F.col("__blon__"))
    wdl = F.least(adl, F.lit(360.0) - adl)
    dd = dlat * dlat + wdl * wdl
    return (cand.where(dd <= F.lit(float(radius) * float(radius)))
            .select("id_a", "id_b", F.sqrt(dd).alias("dist")))
