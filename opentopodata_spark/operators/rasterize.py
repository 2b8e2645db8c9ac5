"""Rasterize: vector->raster aggregation of a point stream onto a grid.

The inverse-direction half of the north rule's "raster<->vector" item
(operators/zonal.py is raster->vector). Turns a 10^12-row point stream
into a regular raster grid: each point lands in the cell containing it,
cells aggregate (count / sum / min / max / mean), and the cell stream can
be materialized as GeoTIFF tiles written executor-side.

Scale shape:

    points -> (row, col) cell keys      narrow column exprs (floor math,
                                        whole-stage codegen, no Python)
    groupBy(row, col)                   THE wide shuffle, map-side combine
                                        (partial aggregation) so shuffle
                                        volume is O(occupied cells), not
                                        O(points)
    cells -> (tile_iy, tile_ix)         narrow
    groupBy(tile) + applyInPandas       tiny second shuffle (O(cells));
                                        each task assembles one tile array
                                        and writes one GeoTIFF

Cell assignment matches the raster model used everywhere else in this
repo (geotiff.Raster affine, north-up): col = floor((lon-x0)/sx),
row = floor((y0-lat)/sy) — a point exactly on a cell boundary belongs to
the cell below/right, i.e. IEEE floor semantics, identical in Spark and
any SQL engine.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GridSpec", "rasterize_points", "write_raster_tiles"]


class GridSpec:
    """North-up target grid: x = x0 + col*sx, y = y0 - row*sy."""

    def __init__(self, x0: float, y0: float, sx: float, sy: float,
                 width: int, height: int):
        if sx <= 0 or sy <= 0:
            raise ValueError("sx and sy must be positive")
        if width < 1 or height < 1:
            raise ValueError("width and height must be >= 1")
        self.x0, self.y0 = float(x0), float(y0)
        self.sx, self.sy = float(sx), float(sy)
        self.width, self.height = int(width), int(height)


def rasterize_points(
    points: DataFrame,
    grid: GridSpec,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str | None = None,
) -> DataFrame:
    """Aggregate points onto ``grid`` cells.

    Returns one row per OCCUPIED cell:
      row, col, n_points[, vsum, vmin, vmax, vmean]
    (value stats only when ``value_col`` is given; vmean rounded to 6dp).
    Out-of-grid points are dropped (the standard rasterize contract).

    Pure column expressions end-to-end — the only Python is none; the
    single wide shuffle carries partially-aggregated cells.
    """
    col = F.floor((F.col(lon_col) - F.lit(grid.x0)) / F.lit(grid.sx))
    row = F.floor((F.lit(grid.y0) - F.col(lat_col)) / F.lit(grid.sy))
    df = (
        points.withColumn("row", row.cast("long"))
        .withColumn("col", col.cast("long"))
        .where(
            (F.col("row") >= 0) & (F.col("row") < grid.height)
            & (F.col("col") >= 0) & (F.col("col") < grid.width)
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col is not None:
        v = F.col(value_col)
        aggs += [
            F.sum(v).alias("vsum"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            # NULL-valued points count toward n_points but not the value
            # stats; the mean must divide by the non-NULL count to stay
            # consistent with vsum/vmin/vmax
            F.count(v).alias("_n_values"),
        ]
    out = df.groupBy("row", "col").agg(*aggs)
    if value_col is not None:
        out = out.withColumn(
            "vmean",
            F.when(F.col("_n_values") > 0,
                   F.round(F.col("vsum") / F.col("_n_values"), 6)),
        ).drop("_n_values")
    return out


def write_raster_tiles(
    cells: DataFrame,
    grid: GridSpec,
    out_dir: str,
    *,
    value_col: str = "n_points",
    tile_px: int = 1024,
    dtype: str = "float32",
    nodata: float = -9999.0,
    epsg: int | None = 4326,
    skip_existing: bool = False,
) -> DataFrame:
    """Materialize a cell stream (output of :func:`rasterize_points`) as
    GeoTIFF tiles of ``tile_px`` x ``tile_px`` cells, one file per
    occupied tile, written EXECUTOR-side (out_dir must be shared storage
    on a real cluster — same contract as any Spark file sink).

    Returns the manifest DataFrame (tile_iy, tile_ix, path, n_cells,
    x0, y0) — also the lineage record for resume (a tile listed in the
    manifest is complete: files appear atomically via rename). With
    ``skip_existing=True`` tiles whose output file already exists are
    not rewritten (crash resume; the aggregation upstream still runs —
    it feeds the cell stream — but the write is skipped).

    The per-tile regroup is a TINY shuffle: its input is occupied cells
    (already aggregated), not points.
    """
    if tile_px < 1:
        raise ValueError("tile_px must be >= 1")
    g = grid
    os.makedirs(out_dir, exist_ok=True)
    # defensive in-grid filter: rasterize_points guarantees it, but this
    # sink accepts any cell stream and an out-of-grid row would otherwise
    # fault the tile task with a bare IndexError
    cells = cells.where(
        (F.col("row") >= 0) & (F.col("row") < g.height)
        & (F.col("col") >= 0) & (F.col("col") < g.width)
    )
    keyed = cells.withColumn(
        "tile_iy", (F.col("row") / tile_px).cast("long")
    ).withColumn("tile_ix", (F.col("col") / tile_px).cast("long"))

    schema = (
        "tile_iy long, tile_ix long, path string, n_cells long, "
        "x0 double, y0 double"
    )

    def write_tile(key, pdf):
        from .. import geotiff

        iy, ix = int(key[0]), int(key[1])
        r_off, c_off = iy * tile_px, ix * tile_px
        h = min(tile_px, g.height - r_off)
        w = min(tile_px, g.width - c_off)
        arr = np.full((h, w), nodata, dtype=np.dtype(dtype))
        rr = pdf["row"].to_numpy(dtype=np.int64) - r_off
        cc = pdf["col"].to_numpy(dtype=np.int64) - c_off
        arr[rr, cc] = pdf[value_col].to_numpy(dtype=np.dtype(dtype))
        tx0 = g.x0 + c_off * g.sx
        ty0 = g.y0 - r_off * g.sy
        path = os.path.join(out_dir, f"tile_{iy}_{ix}.tif")
        if not (skip_existing and os.path.exists(path)):
            tmp = path + f".tmp{os.getpid()}"
            geotiff.write_geotiff(
                tmp, arr, x0=tx0, y0=ty0, sx=g.sx, sy=g.sy, epsg=epsg,
                nodata=nodata,
            )
            os.replace(tmp, path)  # atomic publish
        return pd.DataFrame(
            [(iy, ix, path, len(pdf), tx0, ty0)],
            columns=["tile_iy", "tile_ix", "path", "n_cells", "x0", "y0"],
        )

    return keyed.groupBy("tile_iy", "tile_ix").applyInPandas(write_tile, schema)
