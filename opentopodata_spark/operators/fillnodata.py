"""Distributed NODATA void filling: gdal_fillnodata's core, Spark-first.

The classic DEM prep step (SRTM ships with voids; the reference's
dataset docs walk users through GDAL-prepped sources whose voids were
filled upstream). Each NODATA cell is interpolated by INVERSE DISTANCE
WEIGHTING over the nearest valid cell along each of the 8 compass
rays, searching at most ``max_distance`` pixels (euclidean along the
ray: k steps axially = k, diagonally = k*sqrt(2)); a cell no ray can
reach stays NODATA. ``smoothing_iterations`` optional 3x3-mean passes
afterwards touch ONLY filled cells (GDAL's -si flag). Semantics are
pinned here because GDALFillNodata's exact search is
implementation-defined; this module's rule is deterministic and
layout-independent.

Scale shape: one map over the tiles, ZERO shuffles — the cross-tile
dependency is bounded by ``max_distance + smoothing_iterations``
pixels, so each task reads that halo from its 8 grid neighbours
(the terrain/hydrology halo-is-read-not-exchanged pattern) and the
8-direction scans are whole-array numpy (column-index
maximum.accumulate for axis rays, skewed-array accumulate for
diagonal rays — never a per-hole Python loop).

Reference note: the reference serves GDAL-prepped datasets
(/root/reference/docs/datasets/ walks gdalwarp/gdal_translate prep);
void filling is the standard upstream step for SRTM-family sources.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (plan helpers)

from ..oracle import _open_cached
from .polygonize import _grid_geometry, _normalize_grid

__all__ = ["fill_kernel", "fillnodata_tiles", "fillnodata_sequential"]

_SQRT2 = float(np.sqrt(2.0))


def _nearest_left(a: np.ndarray):
    """(value, steps) of the nearest valid cell strictly LEFT of each
    cell along its row; steps = +inf where the row has none."""
    h, w = a.shape
    valid = np.isfinite(a)
    col = np.arange(w, dtype=np.int64)[None, :]
    idx = np.where(valid, col, np.int64(-1))
    near = np.maximum.accumulate(idx, axis=1)
    # a valid cell's "near" is itself; shift so the scan is STRICT
    near = np.concatenate(
        [np.full((h, 1), -1, np.int64), near[:, :-1]], axis=1
    )
    steps = np.where(near >= 0, col - near, np.int64(0)).astype(np.float64)
    steps[near < 0] = np.inf
    vals = np.take_along_axis(a, np.maximum(near, 0), axis=1)
    vals = np.where(near >= 0, vals, np.nan)
    return vals, steps


def _skew(a: np.ndarray, anti: bool):
    """Shear rows so one diagonal family becomes columns: cells sharing
    c - r (anti=False: the ``\\`` diagonals) or c + r (anti=True: ``/``)
    land in one column; stepping up a column steps along the ray."""
    h, w = a.shape
    rows = np.arange(h, dtype=np.int64)[:, None]
    cols = np.arange(w, dtype=np.int64)[None, :]
    j = (cols + rows) if anti else (cols - rows + (h - 1))
    out = np.full((h, w + h - 1), np.nan)
    out[np.broadcast_to(rows, (h, w)), j] = a
    return out, j


def _unskew(skewed: np.ndarray, j: np.ndarray, h: int, w: int):
    rows = np.arange(h, dtype=np.int64)[:, None]
    return skewed[np.broadcast_to(rows, (h, w)), j]


def _ray_scan(a: np.ndarray, dy: int, dx: int):
    """(value, euclidean_distance) of the nearest valid cell strictly
    along the (dy, dx) ray from each cell."""
    if dy == 0:  # pure horizontal
        b = a if dx < 0 else a[:, ::-1]
        v, s = _nearest_left(b)
        if dx > 0:
            v, s = v[:, ::-1], s[:, ::-1]
        return v, s
    if dx == 0:  # pure vertical == horizontal on the transpose
        b = a.T if dy < 0 else a.T[:, ::-1]
        v, s = _nearest_left(b)
        if dy > 0:
            v, s = v[:, ::-1], s[:, ::-1]
        return v.T, s.T
    # diagonal: skew so the ray family is vertical, then scan "up"
    # (transpose -> left). Ray toward (dy=-1) means the predecessor is
    # ABOVE in the skewed column; dy=+1 scans from the bottom (flip).
    h, w = a.shape
    anti = (dy * dx) < 0  # (-1,+1)/(+1,-1) share c + r
    b = a if dy < 0 else a[::-1]
    sk, j = _skew(b, anti=anti if dy < 0 else not anti)
    v, s = _nearest_left(sk.T)
    v, s = _unskew(v.T, j, h, w), _unskew(s.T, j, h, w)
    if dy > 0:
        v, s = v[::-1], s[::-1]
    return v, s * _SQRT2


def fill_kernel(
    arr: np.ndarray,
    max_distance: float,
    smoothing_iterations: int = 0,
    domain: np.ndarray | None = None,
) -> np.ndarray:
    """IDW-fill NODATA (NaN) cells of ``arr`` per the module contract.
    Returns a new array; valid cells pass through untouched.

    ``domain``: optional bool mask of cells that EXIST in the raster —
    the distributed path passes it so a tile's halo cells that fall
    OUTSIDE the mosaic extent are never treated as fillable holes
    (without it, a border tile would fill its phantom halo and the
    smoothing window would read values the real mosaic does not have).
    """
    if max_distance <= 0:
        raise ValueError("max_distance must be > 0 pixels")
    hole = ~np.isfinite(arr)
    if domain is not None:
        hole = hole & domain
    if not hole.any():
        out = arr.astype(np.float64, copy=True)
    else:
        wsum = np.zeros(arr.shape)
        vsum = np.zeros(arr.shape)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                v, d = _ray_scan(arr, dy, dx)
                ok = hole & np.isfinite(v) & (d <= max_distance)
                w = np.where(ok, 1.0 / np.where(ok, d, 1.0), 0.0)
                wsum += w
                vsum += np.where(ok, w * v, 0.0)
        out = arr.astype(np.float64, copy=True)
        fillable = hole & (wsum > 0)
        out[fillable] = vsum[fillable] / wsum[fillable]
    for _ in range(int(smoothing_iterations)):
        # 3x3 NaN-aware mean, applied ONLY at originally-hole cells.
        # CONTRACT: the sum accumulates over the window in ROW-MAJOR
        # order as sequential float64 adds (never a library reduction,
        # whose pairwise order is implementation-defined) so the
        # sequential twin can reproduce it bit-for-bit.
        padded = np.pad(out, 1, constant_values=np.nan)
        s = np.zeros(out.shape)
        cnt = np.zeros(out.shape)
        for r in (0, 1, 2):
            for c in (0, 1, 2):
                win = padded[r:r + out.shape[0], c:c + out.shape[1]]
                fin = np.isfinite(win)
                s = s + np.where(fin, win, 0.0)
                cnt = cnt + fin
        filled = hole & np.isfinite(out)
        with np.errstate(invalid="ignore"):
            mean = s / cnt
        out[filled] = mean[filled]
    return out


def _read_padded(by_key, key, th, tw, pad):
    """Tile ``key`` plus a ``pad``-pixel halo from its 8 grid
    neighbours (uniform non-overlapping grid: pure slicing)."""
    if pad >= min(th, tw):
        raise ValueError(
            f"halo {pad} px does not fit inside one {tw}x{th} tile —"
            " lower max_distance/smoothing or use bigger tiles"
        )
    iy, ix = key
    out = np.full((th + 2 * pad, tw + 2 * pad), np.nan)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            p = by_key.get((iy + dy, ix + dx))
            if p is None:
                continue
            nb = _open_cached(p)
            block = nb.read_block(0, th, 0, tw)
            # neighbour's pixel (r, c) lands at padded
            # (pad + dy*th + r, pad + dx*tw + c); clip to the window
            r0 = pad + dy * th
            c0 = pad + dx * tw
            sr0, sr1 = max(0, -r0), min(th, out.shape[0] - r0)
            sc0, sc1 = max(0, -c0), min(tw, out.shape[1] - c0)
            if sr0 < sr1 and sc0 < sc1:
                out[r0 + sr0:r0 + sr1, c0 + sc0:c0 + sc1] = \
                    block[sr0:sr1, sc0:sc1]
    return out


def fillnodata_tiles(
    spark: SparkSession,
    tiles: list[tuple[int, int, str]],
    out_dir: str,
    *,
    max_distance: float = 16.0,
    smoothing_iterations: int = 0,
    nodata: float = -9999.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fill NODATA voids across a uniform non-overlapping tile grid and
    write float32 GeoTIFF tiles under ``out_dir``. Zero shuffles: each
    task reads a (max_distance + smoothing) halo from its neighbours.
    Returns the manifest (tile_iy, tile_ix, path, n_filled,
    n_unfilled, checksum)."""
    from .. import geotiff

    if not tiles:
        raise ValueError("fillnodata_tiles needs at least one tile")
    tiles, orig_of = _normalize_grid(tiles)
    th, tw, _gw = _grid_geometry(tiles)
    pad = int(np.ceil(max_distance)) + int(smoothing_iterations)
    if pad >= min(th, tw):
        raise ValueError(
            f"halo {pad} px does not fit inside one {tw}x{th} tile —"
            " lower max_distance/smoothing or use bigger tiles"
        )
    by_key = {(iy, ix): p for iy, ix, p in tiles}
    n_ty = max(iy for iy, _ix, _p in tiles) + 1
    n_tx = max(ix for _iy, ix, _p in tiles) + 1
    os.makedirs(out_dir, exist_ok=True)
    bkey = spark.sparkContext.broadcast(by_key)
    borig = spark.sparkContext.broadcast(orig_of)

    def process(batches):
        for b in batches:
            rows = []
            for t in b.itertuples(index=False):
                key = (int(t.tile_iy), int(t.tile_ix))
                own = _open_cached(t.path)
                padded = _read_padded(bkey.value, key, th, tw, pad)
                # domain = padded cells inside the grid bounding box
                # (the twin's mosaic extent); missing INTERIOR tiles
                # stay in-domain as fillable holes, cells beyond the
                # mosaic edge do not exist
                gr = key[0] * th + np.arange(-pad, th + pad)
                gc = key[1] * tw + np.arange(-pad, tw + pad)
                domain = (
                    ((gr >= 0) & (gr < n_ty * th))[:, None]
                    & ((gc >= 0) & (gc < n_tx * tw))[None, :]
                )
                filled = fill_kernel(
                    padded, max_distance, smoothing_iterations,
                    domain=domain,
                )[pad:pad + th, pad:pad + tw]
                core = padded[pad:pad + th, pad:pad + tw]
                was_hole = ~np.isfinite(core)
                n_filled = int((was_hole & np.isfinite(filled)).sum())
                n_unfilled = int((was_hole & ~np.isfinite(filled)).sum())
                arr = np.where(
                    np.isfinite(filled), filled, nodata
                ).astype(np.float32)
                ci = own.crs
                oiy, oix = borig.value[key]  # caller's keys on outputs
                dst = os.path.join(
                    out_dir, f"fill_{oiy}_{oix}.tif"
                )
                tmp = dst + f".tmp{os.getpid()}"
                geotiff.write_geotiff(
                    tmp, arr, x0=own.x0, y0=own.y0, sx=own.sx,
                    sy=own.sy, epsg=(ci.epsg if ci else None),
                    wkt=(ci.wkt if ci and not ci.epsg else None),
                    nodata=nodata,
                )
                os.replace(tmp, dst)
                fin = np.isfinite(filled)
                checksum = round(
                    float(arr[fin].astype(np.float64).sum()), 3
                )
                rows.append((
                    oiy, oix, dst, n_filled, n_unfilled, checksum
                ))
            yield pd.DataFrame(rows, columns=[
                "tile_iy", "tile_ix", "path", "n_filled", "n_unfilled",
                "checksum",
            ])

    pdf = spark.createDataFrame(
        tiles, "tile_iy long, tile_ix long, path string"
    )
    n = num_partitions or max(
        1, min(len(tiles), spark.sparkContext.defaultParallelism)
    )
    return pdf.repartition(n).mapInPandas(
        process,
        "tile_iy long, tile_ix long, path string, n_filled long,"
        " n_unfilled long, checksum double",
    )


def fillnodata_sequential(
    tiles: list[tuple[int, int, str]],
    *,
    max_distance: float = 16.0,
    smoothing_iterations: int = 0,
) -> list[tuple[int, int, int, int, float]]:
    """Single-process INDEPENDENT twin: stitch the mosaic and fill each
    hole by a naive per-cell walk along the 8 rays (no accumulate
    scans, no skewing — a different implementation shape), then the
    same documented IDW + smoothing rule. Returns sorted (tile_iy,
    tile_ix, n_filled, n_unfilled, checksum) rows in the CALLER's
    keys."""
    tiles, orig_of = _normalize_grid(tiles)
    th, tw, _gw = _grid_geometry(tiles)
    n_ty = max(iy for iy, _ix, _p in tiles) + 1
    n_tx = max(ix for _iy, ix, _p in tiles) + 1
    H, W = n_ty * th, n_tx * tw
    a = np.full((H, W), np.nan)
    for iy, ix, p in tiles:
        r = _open_cached(p)
        a[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw] = r.read_block(
            0, th, 0, tw
        )
    out = a.copy()
    holes = np.argwhere(~np.isfinite(a))
    for r, c in holes:
        wsum = vsum = 0.0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                step = _SQRT2 if dy and dx else 1.0
                k = 1
                while k * step <= max_distance:
                    rr, cc = r + dy * k, c + dx * k
                    if not (0 <= rr < H and 0 <= cc < W):
                        break
                    if np.isfinite(a[rr, cc]):
                        w = 1.0 / (k * step)
                        wsum += w
                        vsum += w * a[rr, cc]
                        break
                    k += 1
        if wsum > 0:
            out[r, c] = vsum / wsum
    hole_mask = ~np.isfinite(a)
    for _ in range(int(smoothing_iterations)):
        padded = np.pad(out, 1, constant_values=np.nan)
        new = out.copy()
        for r, c in np.argwhere(hole_mask & np.isfinite(out)):
            # row-major sequential adds — the module's pinned contract
            s = 0.0
            n = 0
            for wr in range(3):
                for wc in range(3):
                    v = padded[r + wr, c + wc]
                    if np.isfinite(v):
                        s = s + v
                        n += 1
            new[r, c] = s / n
        out = new
    rows = []
    for iy, ix, _p in sorted(tiles):
        core_a = a[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
        core_o = out[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
        was = ~np.isfinite(core_a)
        fin = np.isfinite(core_o)
        stored = core_o[fin].astype(np.float32).astype(np.float64)
        oiy, oix = orig_of[(iy, ix)]
        rows.append((
            oiy, oix,
            int((was & fin).sum()), int((was & ~fin).sum()),
            round(float(stored.sum()), 3),
        ))
    return sorted(rows)
