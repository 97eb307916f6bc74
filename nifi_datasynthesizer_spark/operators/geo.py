"""Geospatial operators: grid-blocked proximity joins.

The commuter/zip side of the reference generates GPS data
(drive/GeoPoint.java, ZipSampler's near-point mode); at analysis time
the matching question is "which points are close to each other" — a
self-join that is quadratic unless blocked.  The classic scale shape
is grid-cell blocking: hash every point to a cell of edge ≈ radius,
join each point's 3×3 neighborhood against cell occupants, verify
exact distance.  Shuffle key is the cell id (uniform for spread-out
points); candidates scale with local density, never corpus².

Exactness across engines: coordinates quantize to integer
micro-degrees; distance is integer equirectangular —
``dlat² + ((dlon · coslat_q) div 1024)²`` with ``coslat_q`` a
90-entry literal table of ``floor(cos(deg) · 1024)`` — so DuckDB
replays every pair bit-exactly (haversine's sin/cos at query time
would drift by engine libm).  At city scales the equirectangular
error vs haversine is < 0.5% — blocking-grade, like every geohash
system.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UDEG = 1_000_000

# floor(cos(deg + 0.5) * 1024) for deg 0..89 — the per-degree
# longitude-compression factor, 1024-scaled so the adjustment is one
# integer multiply + shift-like div
_COSLAT_Q = [math.floor(math.cos(math.radians(d + 0.5)) * 1024)
             for d in range(90)]


def near_pairs(points: DataFrame, radius_udeg: int = 50_000,
               id_col: str = "pid", lat_col: str = "lat",
               lon_col: str = "lon") -> DataFrame:
    """Unordered pairs (a < b) of points within ``radius_udeg``
    micro-degrees (equirectangular), via cell blocking.

    Cell edge = radius.  Latitude delta of a qualifying pair is ≤
    radius → ±1 cell in y; the longitude DELTA however passes the
    compressed-distance filter up to ``radius / cos(lat)`` raw
    micro-degrees — 1.56·radius at 50°N — so x needs ±2 cells (a
    0.9/2.4-cell pair differs by 2 indexes).  The left side explodes
    to its 5×3 neighborhood (15 rows — constant amplification), the
    right side stays put, and the equi-join on (cx, cy) finds each
    candidate exactly once.  One shuffle on the cell id.  The ±2
    bound holds for |lat| ≤ 60° (1/cos ≤ 2); widen ``xr`` for polar
    data.
    """
    lat_u = F.floor(F.col(lat_col) * UDEG).cast("long")
    lon_u = F.floor(F.col(lon_col) * UDEG).cast("long")
    q = points.select(F.col(id_col).alias("pid"),
                      lat_u.alias("lat_u"), lon_u.alias("lon_u"))
    cx = F.floor(F.col("lon_u") / radius_udeg).cast("long")
    cy = F.floor(F.col("lat_u") / radius_udeg).cast("long")
    cells = q.select("pid", "lat_u", "lon_u",
                     cx.alias("cx"), cy.alias("cy"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-2, -1, 0, 1, 2) for dy in (-1, 0, 1)])).alias("o")
    left = (cells.select("pid", "lat_u", "lon_u", "cx", "cy", off)
            .select(F.col("pid").alias("a"),
                    F.col("lat_u").alias("lat_a"),
                    F.col("lon_u").alias("lon_a"),
                    (F.col("cx") + F.col("o.dx")).alias("cx"),
                    (F.col("cy") + F.col("o.dy")).alias("cy")))
    right = cells.select(F.col("pid").alias("b"),
                         F.col("lat_u").alias("lat_b"),
                         F.col("lon_u").alias("lon_b"), "cx", "cy")
    cand = (left.join(right, ["cx", "cy"])
            .filter(F.col("a") < F.col("b")))
    ctab = "array(" + ",".join(f"{v}L" for v in _COSLAT_Q) + ")"
    # band = mean |lat| in whole degrees (clamped); adj_dlon compresses
    # longitude by the band's cosine.  All-integer and engine-exact:
    # cell blocking bounds |Δ| ≤ 2·radius so every product stays well
    # under 2⁶³; the div takes an abs() first because integer division
    # truncates toward zero in Spark but floors in DuckDB — signs must
    # never reach it.
    dist2 = F.expr(
        f"(lat_a - lat_b) * (lat_a - lat_b) + "
        f"((abs(lon_a - lon_b) * element_at({ctab}, "
        f"CAST(LEAST(FLOOR(abs(lat_a + lat_b) / {2 * UDEG}), 89) AS INT)"
        f" + 1)) div 1024) * "
        f"((abs(lon_a - lon_b) * element_at({ctab}, "
        f"CAST(LEAST(FLOOR(abs(lat_a + lat_b) / {2 * UDEG}), 89) AS INT)"
        f" + 1)) div 1024)")
    out = cand.withColumn("dist2_udeg", dist2)
    return (out.filter(F.col("dist2_udeg")
                       <= F.lit(radius_udeg * radius_udeg).cast("long"))
            .select("a", "b", "dist2_udeg"))


def grid_density(points: DataFrame, cell_udeg: int = 50_000,
                 lat_col: str = "lat", lon_col: str = "lon",
                 min_points: int = 1) -> DataFrame:
    """Per-grid-cell point density — the governance read BEFORE a
    proximity join or geo partitioning decision: near_pairs' candidate
    volume is Σ n_c² over cells, so one cheap GROUP BY over the SAME
    cell ids predicts (and bounds) the expensive join, and the dense
    tail tells you which cells need salting at 100 TB.  The cell
    function is shared with :func:`near_pairs` (floor of integer
    micro-degrees over the cell edge — engine-exact, no trig), so the
    readout is exact for the join it plans, not an approximation of
    it.  One narrow pass + one aggregation on the cell key; no joins,
    no explode.  ``min_points`` drops singleton cells (the usual
    noise floor at corpus scale).
    """
    lat_u = F.floor(F.col(lat_col) * UDEG).cast("long")
    lon_u = F.floor(F.col(lon_col) * UDEG).cast("long")
    cells = points.select(
        F.floor(lon_u / cell_udeg).cast("long").alias("cx"),
        F.floor(lat_u / cell_udeg).cast("long").alias("cy"))
    return (cells.groupBy("cx", "cy")
            .agg(F.count("*").alias("n_points"))
            .filter(F.col("n_points") >= min_points))
