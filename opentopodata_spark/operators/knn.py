"""Spatial kNN join (SURVEY.md J5, north-rule requirement).

k nearest spatial anchors (tile centers, dataset seeds, POIs) for every
query point. Two plans:

* ``knn_join``: broadcast the anchor table (it is a tile index — small),
  score every (point, anchor) pair with a codegen'd distance expression,
  window top-k per point. No shuffle on the points side except the
  window's hash partition on point id — at 10^12 points that is one
  exchange, unavoidable for an exact per-point top-k.
* ``knn_join_gridded``: the scale path when anchors are NOT broadcastable:
  both sides key by a degree grid cell (the same floor math as tile
  assignment, SURVEY.md S3); points probe their cell + 8 neighbors
  (k-ring expansion via explode), equi-join on cell, then exact distance
  + top-k. This is the H3 k-ring pattern with a lat/lon grid as the
  deterministic, dependency-free cell function.

Distances: squared equirectangular degrees by default (monotonic with
true distance for small extents, bit-reproducible) or haversine meters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sq_degree_dist", "haversine_m", "knn_join", "knn_join_gridded", "grid_cell"]

EARTH_RADIUS_M = 6371008.8


def sq_degree_dist(lat1, lon1, lat2, lon2):
    return (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)


def haversine_m(lat1, lon1, lat2, lon2):
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_join(
    points: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    point_id: str = "point_id",
    anchor_id: str = "anchor_id",
    metric: str = "sqdeg",
    round_to: int = 6,
) -> DataFrame:
    """(point_id, anchor_id, rank, dist) — k nearest anchors per point.

    points: (point_id, lat, lon); anchors: (anchor_id, lat, lon),
    broadcast. Ties break on anchor_id.
    """
    dist_fn = sq_degree_dist if metric == "sqdeg" else haversine_m
    a = F.broadcast(
        anchors.select(
            F.col(anchor_id).alias("anchor_id"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
        )
    )
    p = points.select(
        F.col(point_id).alias("point_id"), "lat", "lon"
    )
    scored = p.crossJoin(a).withColumn(
        "dist",
        F.round(dist_fn(F.col("lat"), F.col("lon"), F.col("alat"), F.col("alon")), round_to),
    )
    w = Window.partitionBy("point_id").orderBy(
        F.col("dist").asc(), F.col("anchor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("point_id", "anchor_id", "rank", "dist")
    )


def grid_cell(lat, lon, cell_deg: float):
    """Deterministic lat/lon grid cell id (single long). The poor-man's
    H3: floor to a cell_deg grid, pack (iy, ix) into one long."""
    iy = F.floor(lat / F.lit(cell_deg)).cast("long")
    ix = F.floor(lon / F.lit(cell_deg)).cast("long")
    return (iy + F.lit(100000)) * F.lit(1000000) + (ix + F.lit(100000))


def knn_join_gridded(
    points: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    cell_deg: float = 1.0,
    point_id: str = "point_id",
    anchor_id: str = "anchor_id",
    metric: str = "sqdeg",
    round_to: int = 6,
) -> DataFrame:
    """Grid-blocked kNN for non-broadcastable anchor sets.

    Each point probes its cell's 3x3 k-ring; correctness requires the
    true k-th neighbor within cell_deg of the point (choose cell_deg >=
    expected kNN radius; enlarge ring for sparse anchor sets).
    """
    dist_fn = sq_degree_dist if metric == "sqdeg" else haversine_m
    a = anchors.select(
        F.col(anchor_id).alias("anchor_id"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
        grid_cell(F.col("lat"), F.col("lon"), cell_deg).alias("cell"),
    )
    ring = F.array(*[F.lit(dy * 1000000 + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    p = points.select(
        F.col(point_id).alias("point_id"),
        "lat",
        "lon",
        F.explode(
            F.transform(
                ring,
                lambda d: grid_cell(F.col("lat"), F.col("lon"), cell_deg) + d,
            )
        ).alias("cell"),
    )
    scored = p.join(a, ["cell"]).withColumn(
        "dist",
        F.round(dist_fn(F.col("lat"), F.col("lon"), F.col("alat"), F.col("alon")), round_to),
    )
    w = Window.partitionBy("point_id").orderBy(
        F.col("dist").asc(), F.col("anchor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("point_id", "anchor_id", "rank", "dist")
    )
