"""Terrain derivative (distributed stencil) tests.

The load-bearing assertion: stitched distributed per-tile output ==
single-process whole-mosaic computation, i.e. tile seams are invisible.
The kernel itself is pinned by analytic-plane cases (exact closed-form
slope/aspect)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import terrain

pytestmark = pytest.mark.usefixtures("raster_root")


def test_kernel_plane_slope_aspect():
    # z = a*x_east + b*y_north over a 1-unit grid; pad so interior exists
    a, b = 0.3, -0.2
    n = 8
    x = np.arange(n + 2) * 1.0
    y = -(np.arange(n + 2)) * 1.0  # rows southward
    z = a * x[None, :] + b * y[:, None]
    slope = terrain.terrain_kernel(z, 1.0, 1.0, "slope")
    aspect = terrain.terrain_kernel(z, 1.0, 1.0, "aspect")
    exp_slope = np.degrees(np.arctan(np.hypot(a, b)))
    exp_aspect = np.degrees(np.arctan2(-a, -b)) % 360.0
    assert np.allclose(slope, exp_slope, atol=1e-9)
    assert np.allclose(aspect, exp_aspect, atol=1e-9)
    # pure-north downhill: b > 0 means z grows northward -> downslope south
    z2 = 0.1 * y[:, None] + 0.0 * x[None, :]
    asp2 = terrain.terrain_kernel(np.ascontiguousarray(z2), 1.0, 1.0, "aspect")
    assert np.allclose(asp2, 180.0)


def test_kernel_flat_and_nan():
    z = np.full((6, 6), 7.0)
    assert np.all(terrain.terrain_kernel(z, 1.0, 1.0, "slope") == 0.0)
    assert np.all(np.isnan(terrain.terrain_kernel(z, 1.0, 1.0, "aspect")))
    z[2, 2] = np.nan  # NaN poisons every 3x3 window touching it
    s = terrain.terrain_kernel(z, 1.0, 1.0, "slope")
    assert np.isnan(s[0:3, 0:3]).all() and np.isfinite(s[3, 3])
    hs = terrain.terrain_kernel(np.full((5, 5), 3.0), 1.0, 1.0, "hillshade")
    # flat terrain hillshade = 255 * cos(zenith) at default altitude 45
    assert np.all(hs == np.round(255.0 * np.cos(np.radians(45.0))))


def _make_tile_grid(tmp_path, n_ty=2, n_tx=2, side=40, res=0.025):
    """Non-overlapping (n_ty x n_tx) tile grid over an analytic surface;
    returns (tiles, mosaic) where mosaic is the full stitched array."""
    rng = np.random.default_rng(5)
    H, W = n_ty * side, n_tx * side
    yy = 1.0 + (np.arange(H) + 0.5) * -res  # top edge at lat 1.0 southward
    xx = 10.0 + (np.arange(W) + 0.5) * res
    mosaic = (
        100.0 * np.sin(xx[None, :] * 7.0) * np.cos(yy[:, None] * 9.0)
        + rng.normal(0, 1.0, (H, W))
    )
    tiles = []
    for ty in range(n_ty):
        for tx in range(n_tx):
            arr = mosaic[ty * side:(ty + 1) * side, tx * side:(tx + 1) * side]
            path = os.path.join(str(tmp_path), f"t_{ty}_{tx}.tif")
            geotiff.write_geotiff(
                path, arr.astype(np.float64), x0=10.0 + tx * side * res,
                y0=1.0 - ty * side * res, sx=res, sy=res, epsg=4326,
            )
            # iy decreases southward in tile_index convention (northing)
            tiles.append((n_ty - 1 - ty, tx, path))
    return tiles, mosaic


@pytest.mark.parametrize("kind", ["slope", "aspect", "hillshade", "tpi",
                                  "tri", "tri_wilson", "roughness"])
def test_seamless_vs_mosaic(spark, tmp_path, kind):
    tiles, mosaic = _make_tile_grid(tmp_path)
    out_dir = str(tmp_path / f"out_{kind}")
    manifest = terrain.terrain_tiles(
        spark, tiles, out_dir, kind=kind, scale=111120.0, dtype="float64"
    ).collect()
    assert all(m["error"] is None for m in manifest)
    # single-process mosaic expectation (NaN halo at the outer border)
    H, W = mosaic.shape
    padded = np.full((H + 2, W + 2), np.nan)
    padded[1:-1, 1:-1] = mosaic
    expected = terrain.terrain_kernel(padded, 0.025, 0.025, kind, scale=111120.0)
    side = 40
    for m in manifest:
        r = geotiff.open_raster(m["path"])
        ty = 1 - m["tile_iy"]  # invert back to array row order
        tx = m["tile_ix"]
        exp = expected[ty * side:(ty + 1) * side, tx * side:(tx + 1) * side]
        got = r.read_block(0, side, 0, side)  # nodata -> NaN
        assert np.array_equal(got, exp, equal_nan=True), (kind, ty, tx)
        assert m["n_valid"] == int(np.isfinite(exp).sum())
    # interior seam rows must be fully valid (halo worked)
    assert np.isfinite(expected[side - 1:side + 1, 1:-1]).all()


def test_overlapping_srtm_seam(spark, raster_root, tmp_path):
    """SRTM convention: tiles share an edge column. The shared column must
    be valid and identical in both tiles' outputs (halo located by exact
    affine arithmetic, overlap handled naturally)."""
    paths = sorted(glob.glob(os.path.join(raster_root, "test-srtm90m-subset", "*.tif")))
    tiles = [(0, 10, paths[0]), (0, 11, paths[1])]
    out_dir = str(tmp_path / "srtm_slope")
    manifest = {m["tile_ix"]: m for m in terrain.terrain_tiles(
        spark, tiles, out_dir, kind="slope", scale=111120.0, dtype="float64"
    ).collect()}
    west = geotiff.open_raster(manifest[10]["path"])
    east = geotiff.open_raster(manifest[11]["path"])
    # lon=11 pixel-center column: last col of west tile, first col of east.
    # Interior rows only: the top/bottom rows have no north/south neighbor
    # tile, so they are NODATA by the mosaic-border contract.
    w_col = west.read_block(1, west.height - 1, west.width - 1, west.width)
    e_col = east.read_block(1, east.height - 1, 0, 1)
    assert np.isfinite(w_col).all() and np.isfinite(e_col).all()
    assert np.array_equal(w_col, e_col)


def test_missing_neighbor_border_is_nodata(spark, tmp_path):
    tiles, _ = _make_tile_grid(tmp_path, n_ty=1, n_tx=1, side=16)
    out = terrain.terrain_tiles(
        spark, tiles, str(tmp_path / "solo"), kind="slope", dtype="float64"
    ).collect()
    r = geotiff.open_raster(out[0]["path"])
    b = r.read_block(0, 16, 0, 16)
    assert np.isnan(b[0, :]).all() and np.isnan(b[:, -1]).all()
    assert np.isfinite(b[1:-1, 1:-1]).all()


def test_resume_skip_existing(spark, tmp_path):
    """Crash-resume: run on a subset, then a full run with skip_existing
    must not rewrite the finished tiles yet return an identical, complete
    manifest (n_valid + checksum re-derived from the stored files)."""
    tiles, _ = _make_tile_grid(tmp_path, n_ty=2, n_tx=2, side=24)
    out_dir = str(tmp_path / "resume")
    first = terrain.terrain_tiles(
        spark, tiles, out_dir, kind="slope", scale=111120.0, dtype="float64"
    ).collect()
    # simulate a crash that lost half the outputs
    lost = sorted(os.listdir(out_dir))[:2]
    for f in lost:
        os.remove(os.path.join(out_dir, f))
    kept_mtimes = {
        f: os.path.getmtime(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    }
    second = terrain.terrain_tiles(
        spark, tiles, out_dir, kind="slope", scale=111120.0, dtype="float64",
        skip_existing=True,
    ).collect()
    key = lambda m: (m["tile_iy"], m["tile_ix"])  # noqa: E731
    a = {key(m): (m["n_valid"], m["checksum"]) for m in first}
    b = {key(m): (m["n_valid"], m["checksum"]) for m in second}
    assert a == b and len(b) == 4
    for f, mt in kept_mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, f)) == mt  # untouched
    assert sorted(os.listdir(out_dir)) == sorted(
        list(kept_mtimes) + lost
    )


def test_kernel_neighborhood_stats_goldens():
    """gdaldem tpi/tri/roughness semantics on a hand-computed window."""
    z = np.full((3, 3), np.nan)
    z = np.array([[1.0, 2.0, 3.0],
                  [4.0, 5.0, 6.0],
                  [7.0, 8.0, 9.0]])
    # single interior pixel: neighbors 1,2,3,4,6,7,8,9 around center 5
    tpi = terrain.terrain_kernel(z, 1.0, 1.0, "tpi")
    assert tpi.shape == (1, 1) and abs(tpi[0, 0] - 0.0) < 1e-12
    tri = terrain.terrain_kernel(z, 1.0, 1.0, "tri")
    # Riley: sqrt(sum (c-n)^2) = sqrt(16+9+4+1+1+4+9+16) = sqrt(60)
    assert abs(tri[0, 0] - np.sqrt(60.0)) < 1e-12
    triw = terrain.terrain_kernel(z, 1.0, 1.0, "tri_wilson")
    assert abs(triw[0, 0] - (4 + 3 + 2 + 1 + 1 + 2 + 3 + 4) / 8.0) < 1e-12
    rough = terrain.terrain_kernel(z, 1.0, 1.0, "roughness")
    assert abs(rough[0, 0] - 8.0) < 1e-12
    # a plane has TPI exactly 0 everywhere (center == neighborhood mean)
    x = np.arange(8) * 1.0
    zp = 0.7 * x[None, :] - 0.4 * x[:, None]
    assert np.allclose(terrain.terrain_kernel(zp, 1.0, 1.0, "tpi"), 0.0,
                       atol=1e-12)
    # NaN poisons the window for all four modes
    zn = np.full((6, 6), 2.0)
    zn[2, 2] = np.nan
    for kind in ("tpi", "tri", "tri_wilson", "roughness"):
        out = terrain.terrain_kernel(zn, 1.0, 1.0, kind)
        assert np.isnan(out[0:3, 0:3]).all() and np.isfinite(out[3, 3])
