"""Contour extraction: raster tiles -> iso-elevation line segments.

Raster->vector in LINE form (gdal_contour's job): marching squares over
pixel centers, one segment list per (cell, level). Distribution reuses
the terrain stencil's shape — per-tile work units with a 1-pixel halo
READ from neighboring tiles — because a marching-squares cell whose
top-left pixel sits on the tile's last row/column spans into the
neighbor. Ownership rule: a cell belongs to the tile containing its
top-left pixel, so every cell is computed exactly once on seamless tile
grids and the output is segment-identical to a single-process run over
the whole mosaic (tests/test_contours.py). Tile conventions with shared
edge pixels (SRTM) compute seam cells twice with IDENTICAL IEEE inputs;
``dedupe=True`` removes those exact duplicates with one small distinct
over the segment stream (segments, not pixels — tiny).

Marching-squares conventions (all public/standard):
  inside  = value >= level
  interp  = linear along the crossed edge, t = (L - v0) / (v1 - v0)
  saddles = resolved by the cell-center mean (the common
            marching-squares disambiguation)
  NaN     = any NaN corner skips the cell (nodata holes break contours,
            gdal_contour behavior)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .terrain import _fill_halo, _open_cached

__all__ = ["grid_contour_segments", "contour_tiles"]

SEGMENT_SCHEMA = "level double, x1 double, y1 double, x2 double, y2 double"

# case -> list of (edge_a, edge_b) segments; bits: TL=8 TR=4 BR=2 BL=1;
# edges: 0=top 1=right 2=bottom 3=left; saddles (5, 10) handled separately
_CASES: dict[int, list[tuple[int, int]]] = {
    1: [(3, 2)], 2: [(2, 1)], 3: [(3, 1)], 4: [(0, 1)],
    6: [(0, 2)], 7: [(3, 0)], 8: [(0, 3)], 9: [(0, 2)],
    11: [(0, 1)], 12: [(3, 1)], 13: [(2, 1)], 14: [(3, 2)],
}


def grid_contour_segments(
    padded: np.ndarray, levels, x0: float, y0: float, sx: float, sy: float
) -> np.ndarray:
    """NaN-padded (h+2, w+2) pixel-center values -> (n, 5) float64 array
    of (level, x1, y1, x2, y2). Cells are the 2x2 neighborhoods whose
    top-left is an interior pixel; (x0, y0) is the raster's outer
    upper-left edge (the usual GeoTIFF convention)."""
    a = padded[1:-1, 1:-1]   # TL corner value of each cell
    b = padded[1:-1, 2:]     # TR
    c = padded[2:, 2:]       # BR
    d = padded[2:, 1:-1]     # BL
    h, w = a.shape
    ok = np.isfinite(a) & np.isfinite(b) & np.isfinite(c) & np.isfinite(d)
    rows_idx, cols_idx = np.nonzero(ok)
    if rows_idx.size == 0:
        return np.empty((0, 5))
    av, bv = a[rows_idx, cols_idx], b[rows_idx, cols_idx]
    cv, dv = c[rows_idx, cols_idx], d[rows_idx, cols_idx]
    # world coords of each cell's TL pixel center
    xtl = x0 + (cols_idx + 0.5) * sx
    ytl = y0 - (rows_idx + 0.5) * sy

    out = []

    def edge_points(sel, edge, level):
        """Interpolated crossing point on ``edge`` for selected cells."""
        A, B, C, D = av[sel], bv[sel], cv[sel], dv[sel]
        X, Y = xtl[sel], ytl[sel]
        if edge == 0:    # top: TL -> TR
            t = (level - A) / (B - A)
            return X + t * sx, Y
        if edge == 1:    # right: TR -> BR
            t = (level - B) / (C - B)
            return X + sx, Y - t * sy
        if edge == 2:    # bottom: BL -> BR
            t = (level - D) / (C - D)
            return X + t * sx, Y - sy
        t = (level - A) / (D - A)  # left: TL -> BL
        return X, Y - t * sy

    for level in levels:
        L = float(level)
        case = (
            (av >= L).astype(np.int8) * 8 + (bv >= L).astype(np.int8) * 4
            + (cv >= L).astype(np.int8) * 2 + (dv >= L).astype(np.int8)
        )
        for cs, segs in _CASES.items():
            sel = case == cs
            if not sel.any():
                continue
            for ea, eb in segs:
                x1, y1 = edge_points(sel, ea, L)
                x2, y2 = edge_points(sel, eb, L)
                out.append(np.column_stack(
                    [np.full(x1.shape, L), x1, y1, x2, y2]
                ))
        for cs in (5, 10):  # saddles: TR+BL / TL+BR
            sel = case == cs
            if not sel.any():
                continue
            center = (av[sel] + bv[sel] + cv[sel] + dv[sel]) / 4.0
            hi = center >= L
            full = np.nonzero(sel)[0]
            for branch, pairs in (
                (hi, [(0, 3), (2, 1)] if cs == 5 else [(0, 1), (2, 3)]),
                (~hi, [(0, 1), (2, 3)] if cs == 5 else [(0, 3), (2, 1)]),
            ):
                if not branch.any():
                    continue
                sub = np.zeros(sel.shape, dtype=bool)
                sub[full[branch]] = True
                for ea, eb in pairs:
                    x1, y1 = edge_points(sub, ea, L)
                    x2, y2 = edge_points(sub, eb, L)
                    out.append(np.column_stack(
                        [np.full(x1.shape, L), x1, y1, x2, y2]
                    ))
    if not out:
        return np.empty((0, 5))
    return np.concatenate(out)


def contour_tiles(
    spark: SparkSession,
    tiles: list[tuple[int, int, str]],
    levels,
    *,
    dedupe: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed contour extraction over a regular tile grid.
    ``tiles``: (iy, ix, path) rows (tiles.tile_index_rows shape). Returns
    the segment DataFrame (level, x1, y1, x2, y2). The per-tile stencil
    never shuffles pixels; the only exchange is the optional exact-
    duplicate drop for shared-edge tile conventions (segment stream,
    tiny next to the raster)."""
    levels = [float(v) for v in levels]
    by_key = {(int(iy), int(ix)): p for iy, ix, p in tiles}

    def process(batches):
        for batch in batches:
            parts = []
            for t in batch.itertuples(index=False):
                key = (int(t.tile_iy), int(t.tile_ix))
                own = _open_cached(t.path)
                padded = np.full((own.height + 2, own.width + 2), np.nan)
                padded[1:-1, 1:-1] = own.read_block(
                    0, own.height, 0, own.width
                )
                nbrs = [
                    by_key[k]
                    for k in (
                        (key[0] + dy, key[1] + dx)
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                        if (dy, dx) != (0, 0)
                    )
                    if k in by_key
                ]
                _fill_halo(padded, own, nbrs)
                segs = grid_contour_segments(
                    padded, levels, own.x0, own.y0, own.sx, own.sy
                )
                if segs.size:
                    parts.append(segs)
            data = np.concatenate(parts) if parts else np.empty((0, 5))
            yield pd.DataFrame(
                data, columns=["level", "x1", "y1", "x2", "y2"]
            )

    pdf = spark.createDataFrame(
        [(int(iy), int(ix), p) for iy, ix, p in tiles],
        "tile_iy long, tile_ix long, path string",
    )
    n = num_partitions or max(
        1, min(len(tiles), spark.sparkContext.defaultParallelism)
    )
    out = pdf.repartition(n).mapInPandas(process, SEGMENT_SCHEMA)
    # Coordinates round to 1e-9 deg (~0.1 mm): a tile computes x/y from
    # ITS affine, so the same geometric point differs by ulps between a
    # tile-local and a whole-mosaic (or neighbor-tile) evaluation;
    # rounding makes output deterministic across tilings and lets the
    # shared-edge duplicates collapse exactly.
    out = out.select(*(F.round(F.col(c), 9).alias(c) for c in
                       ("level", "x1", "y1", "x2", "y2")))
    if dedupe:
        out = out.dropDuplicates()
    return out
