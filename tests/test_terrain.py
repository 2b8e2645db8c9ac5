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


class TestGradientAlgsAndHillshadeModes:
    """Zevenbergen-Thorne stencil + multidirectional/combined shading."""

    def test_zt_exact_where_horn_biases(self):
        # z = x*y^2: ZT central differences are exact (dz/dx = y^2,
        # dz/dy = 2xy); Horn's row-averaged dz/dx biases by sy^2/2
        s = 0.5
        xs = np.arange(7) * s
        ys = np.arange(7) * s
        z = xs[None, :] * (ys[::-1][:, None] ** 2)  # row 0 = north
        dzdx, dzdy = terrain.zevenbergen_thorne_derivatives(
            z, s, s, 1.0
        )
        hx, _hy = terrain.horn_derivatives(z, s, s, 1.0)
        yy = ys[::-1][1:-1][:, None] ** 2
        assert np.allclose(dzdx, np.broadcast_to(yy, dzdx.shape),
                           atol=1e-12)
        xx = xs[1:-1][None, :]
        yv = ys[::-1][1:-1][:, None]
        assert np.allclose(dzdy, 2.0 * xx * yv, atol=1e-12)
        assert np.allclose(hx - dzdx, s * s / 2.0, atol=1e-12)

    def test_zt_plane_matches_horn(self):
        z = (np.arange(6)[None, :] * 2.0
             + np.arange(6)[:, None] * -3.0) * 1.0
        for kind in ("slope", "aspect", "hillshade"):
            a = terrain.terrain_kernel(z, 1.0, 1.0, kind, alg="horn")
            b = terrain.terrain_kernel(z, 1.0, 1.0, kind,
                                       alg="zevenbergen_thorne")
            assert np.allclose(a, b, atol=1e-9), kind

    def test_zt_nan_discipline_includes_corners(self):
        z = np.ones((5, 5))
        z[0, 0] = np.nan  # corner of the 3x3 window of cell (1,1)
        out = terrain.terrain_kernel(z, 1.0, 1.0, "slope",
                                     alg="zevenbergen_thorne")
        assert np.isnan(out[0, 0])
        assert np.isfinite(out[2, 2])

    def test_multidirectional_flat_equals_standard(self):
        z = np.full((6, 6), 100.0)
        std = terrain.terrain_kernel(z, 1.0, 1.0, "hillshade",
                                     altitude=37.0)
        multi = terrain.terrain_kernel(
            z, 1.0, 1.0, "hillshade_multidirectional", altitude=37.0
        )
        assert np.array_equal(std, multi)
        assert std[2, 2] == np.round(
            255.0 * np.cos(np.radians(90.0 - 37.0))
        )

    def test_multidirectional_blend_identity(self):
        # scalar replay of the 4-azimuth sin^2 blend for one cell
        rng = np.random.default_rng(5)
        z = rng.uniform(0, 50, (5, 5))
        out = terrain.terrain_kernel(
            z, 1.0, 1.0, "hillshade_multidirectional",
            altitude=45.0,
        )
        dzdx, dzdy = terrain.horn_derivatives(z, 1.0, 1.0, 1.0)
        i, j = 1, 2
        slope = np.arctan(np.hypot(dzdx[i, j], dzdy[i, j]))
        up = np.arctan2(dzdx[i, j], dzdy[i, j])
        zen = np.radians(45.0)
        acc = 0.0
        for az_deg in (225.0, 270.0, 315.0, 360.0):
            az = np.radians(az_deg)
            w = np.sin(up - az) ** 2
            acc += w * (np.cos(zen) * np.cos(slope)
                        + np.sin(zen) * np.sin(slope)
                        * np.cos(az - up))
        assert out[i, j] == np.round(
            255.0 * np.clip(acc / 2.0, 0.0, 1.0)
        )

    def test_combined_attenuates_steep(self):
        # flat: combined == standard; steep wall: darker
        flat = np.full((5, 5), 10.0)
        assert np.array_equal(
            terrain.terrain_kernel(flat, 1.0, 1.0, "hillshade"),
            terrain.terrain_kernel(flat, 1.0, 1.0,
                                   "hillshade_combined"),
        )
        wall = np.arange(5, dtype=np.float64)[None, :] * 50.0
        wall = np.broadcast_to(wall, (5, 5)).copy()
        std = terrain.terrain_kernel(wall, 1.0, 1.0, "hillshade",
                                     azimuth=90.0)
        comb = terrain.terrain_kernel(wall, 1.0, 1.0,
                                      "hillshade_combined",
                                      azimuth=90.0)
        assert (comb[1:-1, 1:-1] < std[1:-1, 1:-1]).all()

    def test_bad_alg_refused(self):
        with pytest.raises(ValueError, match="alg"):
            terrain.terrain_kernel(np.ones((3, 3)), 1.0, 1.0, "slope",
                                   alg="evans")


@pytest.mark.parametrize("kind,alg", [
    ("hillshade_multidirectional", "horn"),
    ("hillshade_combined", "horn"),
    ("slope", "zevenbergen_thorne"),
    ("hillshade", "zevenbergen_thorne"),
])
def test_seamless_vs_mosaic_new_modes(spark, tmp_path, kind, alg):
    tiles, mosaic = _make_tile_grid(tmp_path)
    out_dir = str(tmp_path / f"out_{kind}_{alg}")
    manifest = terrain.terrain_tiles(
        spark, tiles, out_dir, kind=kind, alg=alg, scale=111120.0,
        dtype="float64",
    ).collect()
    assert all(m["error"] is None for m in manifest)
    H, W = mosaic.shape
    padded = np.full((H + 2, W + 2), np.nan)
    padded[1:-1, 1:-1] = mosaic
    expected = terrain.terrain_kernel(
        padded, 0.025, 0.025, kind, scale=111120.0, alg=alg
    )
    side = 40
    for m in manifest:
        r = geotiff.open_raster(m["path"])
        ty = 1 - m["tile_iy"]
        tx = m["tile_ix"]
        exp = expected[ty * side:(ty + 1) * side,
                       tx * side:(tx + 1) * side]
        got = r.read_block(0, side, 0, side)
        assert np.array_equal(got, exp, equal_nan=True), (kind, ty, tx)
