"""NTv2 datum-shift grids (opentopodata_spark.ntv2 + crs.register_ntv2).

The reference reaches grid-based datum corrections through PROJ's grid
catalog; this engine reads the same public .gsb format directly. Pins:
writer/reader round trip, NTv2's positive-west node conventions,
bilinear interpolation against a numpy reference, fixed-point inverse,
subgrid nesting (densest wins), outside-coverage passthrough, and the
crs registry (grid supersedes the built-in Helmert, cache invalidation,
projected coordinates move by the expected amount).
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import crs, ntv2


def _flat_grid(tmp_path, dlat_sec=1.8, dlon_west_sec=-2.4,
               name="flat.gsb"):
    """Constant-shift grid over lat [49, 52], lon [-3, 1]."""
    nrows, ncols = 7, 9
    p = str(tmp_path / name)
    ntv2.write_gsb(
        p,
        s_lat_deg=49.0, n_lat_deg=52.0, w_lon_deg=-3.0, e_lon_deg=1.0,
        lat_inc_deg=0.5, lon_inc_deg=0.5,
        lat_shift_sec=np.full((nrows, ncols), dlat_sec),
        lon_shift_sec_west=np.full((nrows, ncols), dlon_west_sec),
    )
    return p


class TestGridIO:
    def test_round_trip_and_conventions(self, tmp_path):
        p = _flat_grid(tmp_path)
        g = ntv2.NTv2Grid.load(p)
        assert len(g.subgrids) == 1
        sg = g.subgrids[0]
        assert sg.lat_shift.shape == (7, 9)
        assert sg.s_lat == pytest.approx(49.0 * 3600)
        assert sg.e_lon == pytest.approx(-1.0 * 3600)  # east edge, +west
        assert sg.w_lon == pytest.approx(3.0 * 3600)
        # constant +1.8" lat, -2.4" WEST lon == +2.4" EAST
        la, lo = g.forward(np.array([50.0]), np.array([-1.0]))
        assert la[0] == pytest.approx(50.0 + 1.8 / 3600, abs=1e-9)
        assert lo[0] == pytest.approx(-1.0 + 2.4 / 3600, abs=1e-9)
        # inverse recovers the source to sub-millimeter
        la2, lo2 = g.inverse(la, lo)
        assert la2[0] == pytest.approx(50.0, abs=1e-11)
        assert lo2[0] == pytest.approx(-1.0, abs=1e-11)

    def test_not_ntv2_is_loud(self, tmp_path):
        p = str(tmp_path / "x.gsb")
        with open(p, "wb") as f:
            f.write(b"garbage" * 40)
        with pytest.raises(ntv2.NTv2Error, match="not an NTv2"):
            ntv2.NTv2Grid.load(p)

    def test_bilinear_matches_numpy_reference(self, tmp_path):
        rng = np.random.RandomState(4)
        nrows, ncols = 7, 9
        lat_s = rng.uniform(-2, 2, (nrows, ncols))
        lon_w = rng.uniform(-2, 2, (nrows, ncols))
        p = str(tmp_path / "var.gsb")
        ntv2.write_gsb(
            p, s_lat_deg=49.0, n_lat_deg=52.0, w_lon_deg=-3.0,
            e_lon_deg=1.0, lat_inc_deg=0.5, lon_inc_deg=0.5,
            lat_shift_sec=lat_s, lon_shift_sec_west=lon_w,
        )
        g = ntv2.NTv2Grid.load(p)
        pts_lat = rng.uniform(49.05, 51.95, 40)
        pts_lon = rng.uniform(-2.95, 0.95, 40)
        dlat, dlon = g.shift(pts_lat, pts_lon)
        # independent bilinear in grid coordinates
        lat32 = lat_s.astype("<f4").astype(np.float64)
        lon32 = lon_w.astype("<f4").astype(np.float64)
        fr = (pts_lat - 49.0) / 0.5
        fc = (-pts_lon - (-1.0)) / 0.5  # positive-west axis from E edge
        r0 = np.floor(fr).astype(int)
        c0 = np.floor(fc).astype(int)
        dr, dc = fr - r0, fc - c0
        want_lat = (lat32[r0, c0] * (1 - dr) * (1 - dc)
                    + lat32[r0 + 1, c0] * dr * (1 - dc)
                    + lat32[r0, c0 + 1] * (1 - dr) * dc
                    + lat32[r0 + 1, c0 + 1] * dr * dc) / 3600.0
        want_lon = -(lon32[r0, c0] * (1 - dr) * (1 - dc)
                     + lon32[r0 + 1, c0] * dr * (1 - dc)
                     + lon32[r0, c0 + 1] * (1 - dr) * dc
                     + lon32[r0 + 1, c0 + 1] * dr * dc) / 3600.0
        np.testing.assert_allclose(dlat, want_lat, atol=1e-12)
        np.testing.assert_allclose(dlon, want_lon, atol=1e-12)

    def test_outside_coverage_passes_through(self, tmp_path):
        g = ntv2.NTv2Grid.load(_flat_grid(tmp_path))
        la, lo = g.forward(np.array([10.0, 50.0]), np.array([100.0, 0.0]))
        assert (la[0], lo[0]) == (10.0, 100.0)  # untouched
        assert la[1] != 50.0  # covered point shifted

    def test_densest_subgrid_wins(self, tmp_path):
        coarse = ntv2.NTv2Grid.load(_flat_grid(tmp_path, dlat_sec=1.0,
                                               name="c.gsb"))
        fine = ntv2.NTv2Grid.load(
            _flat_grid(tmp_path, dlat_sec=5.0, name="f.gsb"))
        fine.subgrids[0].lat_inc /= 5  # pretend it's denser
        fine.subgrids[0].lon_inc /= 5
        # rebuild a composite: NTv2 children refine parents
        both = ntv2.NTv2Grid(
            [coarse.subgrids[0], fine.subgrids[0]], "composite")
        # the fine grid's extents are in its own (unchanged) header
        # terms, so interpolate() uses its own inc — constant shift, so
        # only SELECTION matters: densest (fine, 5") must win
        dlat, _ = both.shift(np.array([50.0]), np.array([-1.0]))
        assert dlat[0] * 3600 == pytest.approx(5.0, abs=1e-9)


class TestCrsRegistry:
    def test_grid_replaces_helmert(self, tmp_path):
        p = _flat_grid(tmp_path, dlat_sec=0.0, dlon_west_sec=0.0,
                       name="zero.gsb")
        lats = np.array([51.0])
        lons = np.array([-1.5])
        x_h, y_h = crs.reproject_latlons(lats, lons, epsg=27700)
        try:
            crs.register_ntv2(27700, p)  # zero grid supersedes Helmert
            x_g, y_g = crs.reproject_latlons(lats, lons, epsg=27700)
        finally:
            crs.unregister_ntv2(27700)
        # zero shift + Helmert stripped: result equals the PURE Airy TM
        # projection of the unshifted coordinates -> differs from the
        # Helmert path by the (real, ~100 m) OSGB36 datum offset
        d = float(np.hypot(x_g - x_h, y_g - y_h)[0])
        assert 50.0 < d < 500.0
        # after unregister the Helmert path is back (cache invalidated)
        x_b, y_b = crs.reproject_latlons(lats, lons, epsg=27700)
        assert float(x_b[0]) == float(x_h[0])
        assert float(y_b[0]) == float(y_h[0])

    def test_grid_shift_moves_projected_coords_as_expected(self, tmp_path):
        # +1.8" lat on a WGS84-datum TM grid (2193 has no Helmert):
        # northing moves by ~1.8" of meridian arc (~55.6 m)
        nrows, ncols = 7, 9
        p = str(tmp_path / "nz.gsb")
        ntv2.write_gsb(
            p, s_lat_deg=-45.0, n_lat_deg=-42.0, w_lon_deg=168.0,
            e_lon_deg=172.0, lat_inc_deg=0.5, lon_inc_deg=0.5,
            lat_shift_sec=np.full((nrows, ncols), 1.8),
            lon_shift_sec_west=np.zeros((nrows, ncols)),
        )
        lats, lons = np.array([-43.5]), np.array([170.0])
        x0, y0 = crs.reproject_latlons(lats, lons, epsg=2193)
        try:
            # direction 'to_wgs84': WGS84 -> local runs the INVERSE
            crs.register_ntv2(2193, p)
            x1, y1 = crs.reproject_latlons(lats, lons, epsg=2193)
            # round trip through the registered transformer
            lo2, la2 = crs.unproject_xys(x1, y1, epsg=2193)
            assert la2[0] == pytest.approx(-43.5, abs=1e-9)
            assert lo2[0] == pytest.approx(170.0, abs=1e-9)
        finally:
            crs.unregister_ntv2(2193)
        dy = float(y1[0] - y0[0])
        assert dy == pytest.approx(-55.6, abs=1.0)  # inverse: -1.8" lat
        # 3 deg from the central meridian, grid convergence couples a
        # small easting change into a pure-latitude shift (~2 m here)
        assert abs(float(x1[0] - x0[0])) < 5.0
