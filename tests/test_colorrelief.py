"""gdaldem color-relief twin tests.

Anchors: vectorized kernel == the per-pixel scalar reference on random
grids for all three modes; ramp-parse refusals; distributed tiles ==
the sequential twin md5-for-md5; nv / transparency semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff, png
from opentopodata_spark.operators import colorrelief as cr

RAMP = """
# test ramp
0 0 0 255
500 0 255 0
1000 255 255 0 200
nv 10 20 30 40
"""


class TestKernel:
    @pytest.mark.parametrize("mode", ["interpolate", "nearest", "exact"])
    def test_matches_scalar_reference(self, mode):
        entries, nv = cr.parse_color_ramp(RAMP)
        rng = np.random.default_rng(7)
        a = rng.uniform(-200, 1300, (13, 17))
        a[rng.random((13, 17)) < 0.1] = np.nan
        a[0, 0] = 0.0
        a[0, 1] = 500.0  # exact hits
        got = cr.color_kernel(a, entries, nv, mode)
        for r in range(13):
            for c in range(17):
                want = cr._scalar_color(float(a[r, c]), entries, nv, mode)
                assert tuple(got[r, c]) == tuple(want), (mode, r, c, a[r, c])

    def test_interpolate_midpoint(self):
        entries, nv = cr.parse_color_ramp("0 0 0 0 0\n10 100 200 50 64\n")
        out = cr.color_kernel(np.array([[5.0]]), entries, nv)
        assert tuple(out[0, 0]) == (50, 100, 25, 32)  # all 4 channels mid

    def test_clamping_and_nv(self):
        entries, nv = cr.parse_color_ramp(RAMP)
        a = np.array([[-999.0, 99999.0, np.nan]])
        out = cr.color_kernel(a, entries, nv)
        assert tuple(out[0, 0]) == (0, 0, 255, 255)
        assert tuple(out[0, 1]) == (255, 255, 0, 200)
        assert tuple(out[0, 2]) == (10, 20, 30, 40)

    def test_exact_mode_transparent_miss(self):
        entries, _nv = cr.parse_color_ramp("100 1 2 3\n")
        out = cr.color_kernel(
            np.array([[100.0, 101.0]]), entries, None, "exact"
        )
        assert tuple(out[0, 0]) == (1, 2, 3, 255)
        assert tuple(out[0, 1]) == (0, 0, 0, 0)


class TestRampParsing:
    def test_empty_refused(self):
        with pytest.raises(ValueError, match="no elevation"):
            cr.parse_color_ramp("# only comments\nnv 0 0 0\n")

    def test_bad_line_refused(self):
        with pytest.raises(ValueError, match="bad color ramp"):
            cr.parse_color_ramp("100 1 2\n")

    def test_out_of_range_refused(self):
        with pytest.raises(ValueError, match="out of range"):
            cr.parse_color_ramp("100 0 0 300\n")

    def test_duplicate_elevation_refused(self):
        with pytest.raises(ValueError, match="duplicate"):
            cr.parse_color_ramp("5 0 0 0\n5 1 1 1\n")


class TestTiles:
    def test_distributed_matches_twin_md5(self, spark, tmp_path):
        rng = np.random.default_rng(29)
        z = rng.uniform(-100, 1200, (60, 60)).astype(np.float32)
        z[10:20, 10:20] = np.nan
        tiles = []
        for iy in range(2):
            for ix in range(2):
                sub = z[iy * 30:(iy + 1) * 30, ix * 30:(ix + 1) * 30]
                p = str(tmp_path / f"t_{iy}_{ix}.tif")
                geotiff.write_geotiff(
                    p, np.where(np.isfinite(sub), sub, -9999.0),
                    x0=ix * 0.3, y0=10.0 - iy * 0.3,
                    sx=0.01, sy=0.01, epsg=4326, nodata=-9999.0,
                )
                tiles.append((iy, ix, p))
        got = sorted(
            (r.tile_iy, r.tile_ix, r.n_valid, r.md5)
            for r in cr.colorrelief_tiles(
                spark, tiles, str(tmp_path / "o"), RAMP
            ).collect()
        )
        exp = cr.colorrelief_sequential(tiles, RAMP)
        assert got == exp
        # PNG decodes back to the kernel's RGBA for one tile
        row = got[0]
        blob = open(str(tmp_path / "o" / "relief_0_0.png"), "rb").read()
        rgba = png.decode_png(blob)
        entries, nv = cr.parse_color_ramp(RAMP)
        r0 = geotiff.open_raster(tiles[0][2])
        want = cr.color_kernel(
            r0.read_block(0, 30, 0, 30), entries, nv
        )
        assert np.array_equal(rgba, want)
        assert row[3] is not None

    def test_bad_mode_refused(self, spark, tmp_path):
        p = str(tmp_path / "a.tif")
        geotiff.write_geotiff(p, np.zeros((2, 2), np.int16), x0=0, y0=1,
                              sx=0.01, sy=0.01, epsg=4326)
        with pytest.raises(ValueError, match="mode"):
            cr.colorrelief_tiles(
                spark, [(0, 0, p)], str(tmp_path / "o"), "0 1 2 3\n",
                mode="psychedelic",
            )
