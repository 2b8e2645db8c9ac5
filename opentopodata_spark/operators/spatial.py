"""S2-indexed spatial operators: cell encoding, point-in-polygon joins.

North-rule surface (BASELINE.json): "H3/S2 index, point-in-polygon, kNN,
raster<->vector". Cell ids come from the pure-numpy S2 implementation
(opentopodata_spark.s2 — parity-checked against canonical S2 ids) inside
Arrow-batched pandas UDFs; joins are cell equi-joins with exact
refinement, the standard spatial-join shape at cluster scale:

    points  -> s2 cell per point                (narrow, vectorized UDF)
    polygons -> covering cell set               (driver/broadcast, small)
    equi-join on cell                           (hash join, broadcastable)
    exact ray-cast refinement                   (vectorized pandas UDF)

The polygon side is assumed broadcastable (10^2..10^6 cover cells);
points never shuffle — the reference's J2 coverage join generalized from
rectangles to arbitrary polygons (SURVEY.md J2).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import s2

__all__ = [
    "with_s2_cell",
    "s2_cell_udf",
    "points_in_polygon_mask",
    "polygon_cover_cells",
    "point_in_polygon_join",
    "polygons_from_geojson",
    "polygons_from_df",
]


def polygons_from_geojson(path_or_obj) -> list[dict]:
    """Real-world polygon input: a GeoJSON FeatureCollection (or bare
    Feature / Polygon) -> the engine's [{"polygon_id", "lats", "lons"}]
    shape. Outer rings only (holes are rejected loudly rather than
    silently mis-joined); MultiPolygon parts become ``id#k`` entries.
    Accepts a path (GeoJSON, ESRI Shapefile ``.shp``, or GeoPackage
    ``.gpkg`` — see vector.load_features) or an already-parsed
    mapping."""
    import os as _os

    if isinstance(path_or_obj, (str, bytes, _os.PathLike)):
        from .. import vector as _vector

        obj = _vector.load_features(path_or_obj)
    else:
        obj = path_or_obj

    def _feature_list(o):
        t = o.get("type")
        if t == "FeatureCollection":
            return o["features"]
        if t == "Feature":
            return [o]
        if t in ("Polygon", "MultiPolygon"):
            return [{"type": "Feature", "geometry": o, "properties": {}}]
        raise ValueError(f"unsupported GeoJSON type '{t}'")

    out = []
    for i, feat in enumerate(_feature_list(obj)):
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        pid = props.get("polygon_id")
        if pid is None:
            pid = props.get("id")
        if pid is None:
            pid = feat.get("id")
        if pid is None:  # explicit None checks: 0 / "" are VALID ids
            pid = i
        pid = str(pid)
        gtype = geom.get("type")
        if gtype == "Polygon":
            parts = [(pid, geom["coordinates"])]
        elif gtype == "MultiPolygon":
            parts = [
                (f"{pid}#{k}", rings)
                for k, rings in enumerate(geom["coordinates"])
            ]
        else:
            raise ValueError(f"unsupported geometry type '{gtype}'")
        for part_id, rings in parts:
            if len(rings) > 1:
                raise ValueError(
                    f"polygon '{part_id}' has interior rings (holes); the "
                    "PIP join supports outer rings only"
                )
            ring = rings[0]
            # GeoJSON closes the ring by repeating the first vertex
            if len(ring) > 1 and ring[0] == ring[-1]:
                ring = ring[:-1]
            out.append({
                "polygon_id": part_id,
                "lons": [float(v[0]) for v in ring],
                "lats": [float(v[1]) for v in ring],
            })
    return out


def polygons_from_df(polygons: DataFrame, max_polygons: int = 100_000) -> list[dict]:
    """DataFrame (polygon_id, lats array<double>, lons array<double>) ->
    driver-side polygon list. The polygon side of a PIP join is the
    SMALL side by design (it broadcasts as cover cells); the cap turns a
    mistaken large input into a loud error instead of a driver OOM."""
    n = polygons.limit(max_polygons + 1).count()
    if n > max_polygons:
        raise ValueError(
            f"polygon side has more than {max_polygons} rows — this join "
            "broadcasts polygons; repartition the problem (e.g. cover-cell "
            "join per polygon batch) instead"
        )
    return [
        {"polygon_id": r["polygon_id"], "lats": list(r["lats"]),
         "lons": list(r["lons"])}
        for r in polygons.select("polygon_id", "lats", "lons").collect()
    ]


def s2_cell_udf(level: int):
    """pandas UDF: (lat, lon) -> S2 cell id at ``level`` as a signed long
    (bit-cast of the uint64 id — sign is irrelevant for equality joins)."""

    @F.pandas_udf(LongType())
    def cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        ids = s2.cell_ids(
            lat.to_numpy(dtype=np.float64), lon.to_numpy(dtype=np.float64), level
        )
        return pd.Series(ids.view(np.int64))

    return cell


def with_s2_cell(
    df: DataFrame, level: int = 12, lat_col: str = "lat", lon_col: str = "lon",
    out_col: str = "s2_cell",
) -> DataFrame:
    return df.withColumn(out_col, s2_cell_udf(level)(F.col(lat_col), F.col(lon_col)))


def points_in_polygon_mask(lats, lons, poly_lats, poly_lons) -> np.ndarray:
    """Vectorized even-odd ray cast (points x one polygon) -> bool mask.

    Crossing rule: ((y1 > lat) != (y2 > lat)) AND
    lon < (x2-x1)*(lat-y1)/(y2-y1) + x1 — the exact same IEEE double
    expression the DuckDB oracle SQL uses, so results are bit-identical.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    inside = np.zeros(lats.shape, dtype=bool)
    n = len(poly_lats)
    for k in range(n):
        y1, x1 = float(poly_lats[k]), float(poly_lons[k])
        y2, x2 = float(poly_lats[(k + 1) % n]), float(poly_lons[(k + 1) % n])
        if y1 == y2:
            continue
        crosses = (y1 > lats) != (y2 > lats)
        with np.errstate(invalid="ignore", divide="ignore"):
            xint = (x2 - x1) * (lats - y1) / (y2 - y1) + x1
        inside ^= crosses & (lons < xint)
    return inside


def polygon_cover_cells(
    poly_lats, poly_lons, level: int, with_interior: bool = False
):
    """Covering S2 cell set for a polygon via the recursive POLYGON-aware
    region coverer (s2.polygon_cover_cells): a guaranteed SUPERSET of
    every cell containing a polygon point (the exact PIP refinement
    drops false candidates), with memory O(|cover|). Unlike a bbox
    cover, cells disjoint from a concave polygon are dropped during the
    recursion, and cells proven fully interior are flagged — their
    points skip refinement entirely (VERDICT r02 #9). With
    ``with_interior`` returns (cell_ids, interior_mask); else ids only."""
    ids, interior = s2.polygon_cover_cells(poly_lats, poly_lons, level)
    return (ids, interior) if with_interior else ids


def point_in_polygon_join(
    points: DataFrame,
    polygons: list[dict],
    level: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(point rows) x (polygons) -> rows augmented with polygon_id for
    every polygon containing the point (inner join semantics).

    ``polygons``: [{"polygon_id": ..., "lats": [...], "lons": [...]}] —
    driver-side list (the polygon side of a PIP join is small; the cover
    table broadcast is the scalable shape).
    """
    spark = points.sparkSession
    cover_rows = []
    for p in polygons:
        cells, interior = polygon_cover_cells(
            p["lats"], p["lons"], level, with_interior=True
        )
        for c, itr in zip(cells, interior):
            cover_rows.append(
                (int(np.uint64(c).view(np.int64)), p["polygon_id"], bool(itr))
            )
    cover = F.broadcast(
        spark.createDataFrame(
            cover_rows, "s2_cell long, polygon_id string, _interior boolean"
        )
    )

    pts = with_s2_cell(points, level, lat_col, lon_col)
    cand = pts.join(cover, "s2_cell", "inner")

    polys = {p["polygon_id"]: (list(p["lats"]), list(p["lons"])) for p in polygons}

    @F.pandas_udf("boolean")
    def refine(lat: pd.Series, lon: pd.Series, pid: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64)
        lo = lon.to_numpy(dtype=np.float64)
        out = np.zeros(len(la), dtype=bool)
        for p, (pla, plo) in polys.items():
            m = (pid == p).to_numpy()
            if m.any():
                out[m] = points_in_polygon_mask(la[m], lo[m], pla, plo)
        return pd.Series(out)

    # interior cells are pre-answered by the cover; only boundary-cell
    # candidates pay the exact ray cast
    return cand.where(
        F.col("_interior")
        | refine(F.col(lat_col), F.col(lon_col), F.col("polygon_id"))
    ).drop("s2_cell", "_interior")


def slippy_tile_cols(lat_col, lon_col, zoom: int):
    """Web-Mercator slippy-map tile coordinates (the OSM/XYZ pyramid the
    overview/tile sinks serve into): returns (tile_x, tile_y, quadkey)
    Columns for ``zoom``. Pure codegen'd arithmetic — the standard
    formulas x = floor((lon+180)/360 * 2^z) and
    y = floor((1 - asinh(tan(lat))/pi)/2 * 2^z), latitude clamped to the
    Web-Mercator band (+-85.05112878). The quadkey is the Bing-style
    base-4 string (bit i of x and y interleaved per level) — the key
    that makes a tile's ancestors its string prefixes, so pyramid
    rollups are `substr` groupBys."""
    if not 0 <= zoom <= 30:
        raise ValueError("zoom must be in [0, 30]")
    n = F.lit(float(2**zoom))
    lat = F.least(F.greatest(lat_col, F.lit(-85.05112878)),
                  F.lit(85.05112878))
    lat_r = F.radians(lat)
    tx = F.floor((lon_col + 180.0) / 360.0 * n).cast("long")
    # asinh(tan(phi)) = ln(tan(phi) + sec(phi)); F.asinh exists
    ty = F.floor(
        (1.0 - F.asinh(F.tan(lat_r)) / F.lit(math.pi)) / 2.0 * n
    ).cast("long")
    # clamp the lon=180 / lat=-85.05.. edge into the last tile
    tx = F.least(F.greatest(tx, F.lit(0)), F.lit(2**zoom - 1))
    ty = F.least(F.greatest(ty, F.lit(0)), F.lit(2**zoom - 1))
    if zoom == 0:
        qk = F.lit("")
    else:
        digits = [
            (F.shiftrightunsigned(tx, z - 1 - i) % 2
             + (F.shiftrightunsigned(ty, z - 1 - i) % 2) * 2).cast("int")
            for z in [zoom] for i in range(zoom)
        ]
        qk = F.concat(*[d.cast("string") for d in digits])
    return tx, ty, qk


def with_slippy_tile(
    df: DataFrame, zoom: int, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    """Attach (tile_x, tile_y, quadkey) for ``zoom`` — the equi-join /
    groupBy key for XYZ tile pyramids; ancestors at zoom z' < z are
    substr(quadkey, 1, z'), so one keying serves every pyramid level."""
    tx, ty, qk = slippy_tile_cols(F.col(lat_col), F.col(lon_col), zoom)
    return df.withColumn("tile_x", tx).withColumn("tile_y", ty).withColumn(
        "quadkey", qk
    )
