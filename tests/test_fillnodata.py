"""Distributed NODATA void filling (gdal_fillnodata core).

Anchors: exact goldens (constant patch, linear ramp's IDW identity),
max_distance truncation, cross-seam holes, distributed == the naive
per-cell sequential twin (incl. smoothing iterations), refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import fillnodata


def _tile_grid(tmp_path, z_full, th, tw, nodata=-9999.0):
    H, W = z_full.shape
    assert H % th == 0 and W % tw == 0
    tiles = []
    for iy in range(H // th):
        for ix in range(W // tw):
            sub = z_full[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
            p = str(tmp_path / f"t_{iy}_{ix}.tif")
            geotiff.write_geotiff(
                p, np.where(np.isfinite(sub), sub, nodata)
                .astype(np.float32),
                x0=ix * tw * 0.01, y0=10.0 - iy * th * 0.01,
                sx=0.01, sy=0.01, epsg=4326, nodata=nodata,
            )
            tiles.append((iy, ix, p))
    return tiles


def _run(spark, tiles, out_dir, **kw):
    rows = fillnodata.fillnodata_tiles(
        spark, tiles, str(out_dir), **kw
    ).collect()
    return sorted(
        (r.tile_iy, r.tile_ix, r.n_filled, r.n_unfilled, r.checksum)
        for r in rows
    ), {(r.tile_iy, r.tile_ix): r.path for r in rows}


class TestGolden:
    def test_constant_patch_fills_exactly(self, spark, tmp_path):
        z = np.full((8, 8), 42.0)
        z[3:5, 3:5] = np.nan
        tiles = _tile_grid(tmp_path, z, 8, 8)
        stats, paths = _run(spark, tiles, tmp_path / "o", max_distance=4.0)
        assert stats == [(0, 0, 4, 0, 42.0 * 64)]
        r = geotiff.open_raster(paths[(0, 0)])
        got = r.read_block(0, 8, 0, 8)
        assert np.allclose(got, 42.0)

    def test_single_hole_on_plane_is_exact(self, spark, tmp_path):
        # z = 2x + 3y: every ray pair (d, -d) averages to the center
        # value, so IDW reproduces the plane exactly at a 1-cell hole
        yy, xx = np.mgrid[0:8, 0:8].astype(float)
        z = 2 * xx + 3 * yy
        want = z[4, 4]
        z[4, 4] = np.nan
        tiles = _tile_grid(tmp_path, z, 8, 8)
        _stats, paths = _run(spark, tiles, tmp_path / "o", max_distance=4.0)
        got = geotiff.open_raster(paths[(0, 0)]).read_block(0, 8, 0, 8)
        assert abs(got[4, 4] - want) < 1e-5

    def test_max_distance_truncates(self, spark, tmp_path):
        z = np.full((16, 16), 7.0)
        z[2:14, 2:14] = np.nan  # 12x12 hole: center > 2 px from data
        tiles = _tile_grid(tmp_path, z, 16, 16)
        stats, paths = _run(
            spark, tiles, tmp_path / "o", max_distance=2.0
        )
        (iy, ix, n_filled, n_unfilled, _cs), = stats
        assert n_filled > 0 and n_unfilled > 0
        got = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert not np.isfinite(got[8, 8])      # unreachable center
        assert np.isclose(got[2, 8], 7.0)      # 2 px from the rim
        assert n_filled + n_unfilled == 144


class TestTwinEquality:
    def test_cross_seam_hole_matches_twin(self, spark, tmp_path):
        rng = np.random.default_rng(5)
        z = np.cumsum(rng.normal(0, 1, (40, 40)), axis=1) + 100.0
        z[18:22, 15:30] = np.nan  # straddles the 2x2 tile cross
        z[rng.random((40, 40)) < 0.05] = np.nan
        tiles = _tile_grid(tmp_path, z, 20, 20)
        stats, _ = _run(spark, tiles, tmp_path / "o", max_distance=6.0)
        exp = fillnodata.fillnodata_sequential(tiles, max_distance=6.0)
        assert stats == exp

    def test_smoothing_matches_twin(self, spark, tmp_path):
        rng = np.random.default_rng(6)
        z = 50.0 + 10 * np.sin(np.arange(40) / 4.0)[None, :] \
            + rng.normal(0, 1, (40, 40))
        z[10:14, 18:23] = np.nan
        tiles = _tile_grid(tmp_path, z, 20, 20)
        stats, _ = _run(
            spark, tiles, tmp_path / "o",
            max_distance=5.0, smoothing_iterations=2,
        )
        exp = fillnodata.fillnodata_sequential(
            tiles, max_distance=5.0, smoothing_iterations=2
        )
        assert stats == exp


class TestValidation:
    def test_halo_must_fit_in_tile(self, spark, tmp_path):
        z = np.zeros((8, 8))
        tiles = _tile_grid(tmp_path, z, 4, 4)
        with pytest.raises(ValueError, match="halo"):
            fillnodata.fillnodata_tiles(
                spark, tiles, str(tmp_path / "o"), max_distance=4.0
            )

    def test_nonpositive_distance_refused(self):
        with pytest.raises(ValueError, match="max_distance"):
            fillnodata.fill_kernel(np.zeros((2, 2)), 0.0)

    def test_empty_tiles_refused(self, spark, tmp_path):
        with pytest.raises(ValueError, match="at least one"):
            fillnodata.fillnodata_tiles(spark, [], str(tmp_path / "o"))
