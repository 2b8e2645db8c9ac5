"""Distributed proximity rasters (gdal_proximity core).

Anchors: exact goldens (single target, pixel vs geo anisotropy),
max_distance cutoff, cross-seam targets, distributed == the brute
window-scan sequential twin, refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import proximity


def _tile_grid(tmp_path, k_full, th, tw, res=0.01):
    H, W = k_full.shape
    tiles = []
    for iy in range(H // th):
        for ix in range(W // tw):
            sub = k_full[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
            p = str(tmp_path / f"t_{iy}_{ix}.tif")
            geotiff.write_geotiff(
                p, np.where(np.isfinite(sub), sub, -9999.0)
                .astype(np.float32),
                x0=ix * tw * res, y0=10.0 - iy * th * res,
                sx=res, sy=res, epsg=4326, nodata=-9999.0,
            )
            tiles.append((iy, ix, p))
    return tiles


def _run(spark, tiles, out_dir, tv, md, **kw):
    rows = proximity.proximity_tiles(
        spark, tiles, str(out_dir), tv, md, **kw
    ).collect()
    return sorted(
        (r.tile_iy, r.tile_ix, r.n_within, r.checksum) for r in rows
    ), {(r.tile_iy, r.tile_ix): r.path for r in rows}


class TestGolden:
    def test_single_target_distances(self, spark, tmp_path):
        k = np.zeros((8, 8))
        k[4, 4] = 1.0
        tiles = _tile_grid(tmp_path, k, 8, 8)
        _s, paths = _run(spark, tiles, tmp_path / "o", [1.0], 3.0)
        d = geotiff.open_raster(paths[(0, 0)]).read_block(0, 8, 0, 8)
        assert d[4, 4] == 0.0
        assert d[4, 5] == 1.0 and d[3, 4] == 1.0
        assert np.isclose(d[3, 3], np.sqrt(2.0), atol=1e-6)
        assert np.isclose(d[2, 5], np.sqrt(5.0), atol=1e-6)
        assert not np.isfinite(d[0, 0])  # sqrt(32) > 3 -> nodata

    def test_geo_units_are_anisotropic(self, spark, tmp_path):
        # 0.01-degree pixels: geo distances scale by resolution
        k = np.zeros((8, 8))
        k[4, 4] = 1.0
        tiles = _tile_grid(tmp_path, k, 8, 8)
        _s, paths = _run(
            spark, tiles, tmp_path / "o", [1.0], 0.025,
            dist_units="geo",
        )
        d = geotiff.open_raster(paths[(0, 0)]).read_block(0, 8, 0, 8)
        assert np.isclose(d[4, 6], 0.02, atol=1e-6)
        assert not np.isfinite(d[4, 7])  # 0.03 > 0.025

    def test_nodata_cells_get_distances_but_are_not_targets(
        self, spark, tmp_path
    ):
        k = np.zeros((8, 8))
        k[2, 2] = np.nan
        k[2, 3] = 7.0
        tiles = _tile_grid(tmp_path, k, 8, 8)
        _s, paths = _run(spark, tiles, tmp_path / "o", [7.0], 6.0)
        d = geotiff.open_raster(paths[(0, 0)]).read_block(0, 8, 0, 8)
        assert d[2, 2] == 1.0  # the NODATA cell still gets a distance
        assert d[2, 3] == 0.0


class TestTwinEquality:
    def test_cross_seam_targets_match_twin(self, spark, tmp_path):
        rng = np.random.default_rng(17)
        k = np.where(rng.random((40, 40)) < 0.03, 1.0, 0.0)
        k[rng.random((40, 40)) < 0.04] = np.nan
        tiles = _tile_grid(tmp_path, k, 20, 20)
        got, _ = _run(spark, tiles, tmp_path / "o", [1.0], 7.0)
        exp = proximity.proximity_sequential(tiles, [1.0], 7.0)
        assert got == exp

    def test_geo_twin(self, spark, tmp_path):
        rng = np.random.default_rng(19)
        k = np.where(rng.random((40, 40)) < 0.02, 2.0, 0.0)
        tiles = _tile_grid(tmp_path, k, 20, 20)
        got, _ = _run(
            spark, tiles, tmp_path / "o", [2.0], 0.08,
            dist_units="geo",
        )
        exp = proximity.proximity_sequential(
            tiles, [2.0], 0.08, dist_units="geo"
        )
        assert got == exp


class TestValidation:
    def test_empty_targets_refused(self):
        with pytest.raises(ValueError, match="target_values"):
            proximity.proximity_kernel(np.zeros((2, 2)), [], 1.0)

    def test_bad_units_refused(self):
        with pytest.raises(ValueError, match="dist_units"):
            proximity.proximity_kernel(
                np.zeros((2, 2)), [1], 1.0, dist_units="furlong"
            )

    def test_halo_must_fit(self, spark, tmp_path):
        k = np.zeros((8, 8))
        tiles = _tile_grid(tmp_path, k, 4, 4)
        with pytest.raises(ValueError, match="halo"):
            proximity.proximity_tiles(
                spark, tiles, str(tmp_path / "o"), [1.0], 5.0
            )
