"""Geospatial primitives (SURVEY.md §2.2-K analytics extension):
great-circle distance and the grid-bucketed spatial candidate join —
the standard "points within ~R of each other" shape every analytics
engine grows (DuckDB spatial, PostGIS, Sedona), expressed with plain
Columns so Catalyst sees an equi-join.

Scale design: a naive radius join is all-pairs. The grid join assigns
every point to an integer (lat, lon) cell sized to the search radius,
EXPLODES one side to its 3x3 neighbor cells, and equi-joins on the
cell key — candidate count is bounded by local density times nine, the
same bounded-cell argument as the embedding grid join in
operators/similarity.py. Selection stays pure INTEGER logic (cell
adjacency), so cross-engine float determinism only enters through the
reported distance column, never through which pairs exist: JVM and
libm trig differ by ulps, and a float radius predicate would flip
borderline pairs between engines (the q75 ln() lesson applied to
geometry).

Haversine uses the standard formula on a spherical Earth
(R = 6371.0088 km, the IUGG mean radius).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between degree coordinates."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dp) * F.sin(dp)
        + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer grid cell of a degree coordinate (floor semantics)."""
    return (
        F.floor(lat / cell_deg).cast("int"),
        F.floor(lon / cell_deg).cast("int"),
    )


def grid_candidates(
    left: DataFrame,
    right: DataFrame,
    cell_deg: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    r_lat_col: str | None = None,
    r_lon_col: str | None = None,
) -> DataFrame:
    """Grid-bucketed candidate pairs: every LEFT row joins RIGHT rows
    in its own or any of the 8 neighboring cells. The LEFT side
    explodes x9 (a bounded constant); the join is a plain equi-join on
    the integer cell key, shuffled/broadcast by Catalyst like any
    other. Columns of both inputs survive with their names (callers
    alias beforehand, so the two sides' names must not collide).

    ``lat_col``/``lon_col`` name the LEFT coordinates. The RIGHT
    coordinates default to ``f"r_{lat_col}"``/``f"r_{lon_col}"`` (the
    alias convention q420 uses); pass ``r_lat_col``/``r_lon_col``
    explicitly when the right side uses different names.

    Semantics note: cell adjacency is computed on raw degree values —
    there is NO antimeridian wraparound, so pairs straddling ±180°
    longitude are never candidates (acceptable for the synthetic and
    most terrestrial fixtures; a production caller covering the
    antimeridian should shift longitudes or duplicate the seam cells).
    """
    if r_lat_col is None:
        r_lat_col = f"r_{lat_col}"
    if r_lon_col is None:
        r_lon_col = f"r_{lon_col}"
    lcy, lcx = grid_cell(F.col(lat_col), F.col(lon_col), cell_deg)
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    lhs = left.withColumn("__o", F.explode(offsets)).select(
        "*",
        (lcy + F.col("__o.dy")).alias("__cy"),
        (lcx + F.col("__o.dx")).alias("__cx"),
    ).drop("__o")
    rcy, rcx = grid_cell(F.col(r_lat_col), F.col(r_lon_col), cell_deg)
    rhs = right.select(
        "*", rcy.alias("__cy"), rcx.alias("__cx")
    )
    return lhs.join(rhs, ["__cy", "__cx"]).drop("__cy", "__cx")
