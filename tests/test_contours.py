"""Contour (marching squares) tests: analytic exactness on a linear
ramp, segment-level seam invariance vs a single-process mosaic run,
saddle disambiguation, NaN holes, and SRTM shared-edge dedup."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import contours

pytestmark = pytest.mark.usefixtures("raster_root")


def _pad(arr):
    p = np.full((arr.shape[0] + 2, arr.shape[1] + 2), np.nan)
    p[1:-1, 1:-1] = arr
    return p


def test_linear_ramp_exact():
    # z = x over pixel centers x = 0.5..5.5 (sx=1): the z=3 contour is the
    # vertical line x=3, crossed by every horizontal cell edge row
    z = np.tile(np.arange(6, dtype=np.float64) + 0.5, (4, 1))
    segs = contours.grid_contour_segments(_pad(z), [3.0], 0.0, 4.0, 1.0, 1.0)
    assert segs.shape[0] == 3  # 3 interior cell rows
    assert np.allclose(segs[:, [1, 3]], 3.0)  # x1 == x2 == 3.0
    ys = np.sort(np.concatenate([segs[:, 2], segs[:, 4]]))
    # vertical segments spanning pixel-center rows 0.5..3.5
    assert ys[0] == 0.5 and ys[-1] == 3.5


def test_saddle_disambiguation():
    # TL=0 TR=10 / BL=10 BR=0 (case 5); center mean = 5 decides
    z = np.array([[0.0, 10.0], [10.0, 0.0]])
    def matches(segs, expected):
        got = segs[np.lexsort(segs[:, 1:].T[::-1])][:, 1:]
        exp = np.asarray(sorted(expected))
        return got.shape == exp.shape and np.allclose(got, exp, atol=1e-12)

    # L=4 <= center: diagonal band -> (top,left) + (bottom,right)
    hi = contours.grid_contour_segments(_pad(z), [4.0], 0.0, 2.0, 1.0, 1.0)
    assert matches(hi, [
        (0.9, 1.5, 0.5, 1.1),   # top(x=0.5+0.4) -> left(y=1.5-0.4)
        (1.1, 0.5, 1.5, 0.9),   # bottom(x=0.5+0.6) -> right(y=1.5-0.6)
    ])
    # L=6 > center: two corner blobs -> (top,right) + (bottom,left)
    lo = contours.grid_contour_segments(_pad(z), [6.0], 0.0, 2.0, 1.0, 1.0)
    assert matches(lo, [
        (1.1, 1.5, 1.5, 1.1),   # TR blob
        (0.9, 0.5, 0.5, 0.9),   # BL blob
    ])


def test_nan_hole_breaks_contour():
    z = np.tile(np.arange(6, dtype=np.float64) + 0.5, (5, 1))
    z[2, 3] = np.nan  # hole adjacent to the z=3 line
    segs = contours.grid_contour_segments(_pad(z), [3.0], 0.0, 5.0, 1.0, 1.0)
    # cells with TL at rows 1,2 columns 2,3 are killed -> fewer than 4 rows
    assert 0 < segs.shape[0] < 4


def _tile_grid(tmp_path, n_ty, n_tx, side, res=0.05):
    rng = np.random.default_rng(9)
    H, W = n_ty * side, n_tx * side
    yy = 2.0 - (np.arange(H) + 0.5) * res
    xx = 5.0 + (np.arange(W) + 0.5) * res
    mosaic = (
        50.0 * np.sin(xx[None, :] * 3.0) + 40.0 * np.cos(yy[:, None] * 4.0)
        + rng.normal(0, 0.5, (H, W))
    )
    tiles = []
    for ty in range(n_ty):
        for tx in range(n_tx):
            path = os.path.join(str(tmp_path), f"c_{ty}_{tx}.tif")
            geotiff.write_geotiff(
                path,
                mosaic[ty * side:(ty + 1) * side, tx * side:(tx + 1) * side],
                x0=5.0 + tx * side * res, y0=2.0 - ty * side * res,
                sx=res, sy=res, epsg=4326,
            )
            tiles.append((n_ty - 1 - ty, tx, path))
    return tiles, mosaic


def test_distributed_equals_mosaic(spark, tmp_path):
    tiles, mosaic = _tile_grid(tmp_path, 2, 2, 30)
    levels = [-30.0, 0.0, 45.0]
    got = contours.contour_tiles(spark, tiles, levels).collect()
    expected = contours.grid_contour_segments(
        _pad(mosaic), levels, 5.0, 2.0, 0.05, 0.05
    )
    g = {tuple(r) for r in ((s["level"], s["x1"], s["y1"], s["x2"], s["y2"])
                            for s in got)}
    e = {tuple(r) for r in np.round(expected, 9)}
    # identical segment SET to 1e-9 deg (the operator's output rounding;
    # tile-local vs mosaic affines differ by ulps)
    assert g == e and len(e) > 50


def test_srtm_shared_edge_dedup(spark, raster_root):
    paths = sorted(glob.glob(
        os.path.join(raster_root, "test-srtm90m-subset", "*.tif")
    ))
    tiles = [(0, 10, paths[0]), (0, 11, paths[1])]
    deduped = contours.contour_tiles(spark, tiles, [1614.5]).count()
    raw = contours.contour_tiles(
        spark, tiles, [1614.5], dedupe=False
    ).count()
    assert 0 < deduped < raw  # seam-column duplicates removed exactly
