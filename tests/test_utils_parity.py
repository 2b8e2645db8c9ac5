"""Ports of /root/reference/tests/test_utils.py golden cases to this engine's
crs / utilmath / geodesic modules."""

from decimal import Decimal

import numpy as np
import pytest

from opentopodata_spark import crs, geodesic
from opentopodata_spark.utilmath import (
    base_floor,
    decimal_base_floor,
    fill_na,
    safe_is_nan,
    tile_index_floor,
)


class TestReprojectLatlons:
    def test_wgs84_identity(self):
        lats = np.array([10.5, -80.0, 0.0])
        lons = np.array([120.8, 0.0, -179.9])
        xs, ys = crs.reproject_latlons(lats, lons, epsg=4326)
        np.testing.assert_array_equal(xs, lons)
        np.testing.assert_array_equal(ys, lats)

    def test_utm_golden(self):
        # reference tests/test_utils.py:21-29
        xs, ys = crs.reproject_latlons(np.array([10.5]), np.array([120.8]), epsg=32651)
        assert np.allclose(xs[0], 259212, rtol=1e-5)
        assert np.allclose(ys[0], 1161538, rtol=1e-5)

    def test_epsg_wkt_equivalence(self):
        lats = np.array([47.6, 50.1])
        lons = np.array([9.4, 3.3])
        x1, y1 = crs.reproject_latlons(lats, lons, epsg=3035)
        x2, y2 = crs.reproject_latlons(lats, lons, wkt=crs.ETRS89_LAEA_WKT)
        np.testing.assert_allclose(x1, x2, atol=1e-6)
        np.testing.assert_allclose(y1, y2, atol=1e-6)

    def test_both_args_raises(self):
        with pytest.raises(ValueError):
            crs.reproject_latlons([0], [0], epsg=32651, wkt="x")
        with pytest.raises(ValueError):
            crs.reproject_latlons([0], [0])

    def test_invalid_epsg_range(self):
        with pytest.raises(ValueError):
            crs.reproject_latlons([0], [0], epsg=100)

    def test_transformer_cache(self):
        t1 = crs.get_transformer(epsg=32651)
        t2 = crs.get_transformer(epsg=32651)
        assert t1 is t2


class TestFloors:
    def test_base_floor(self):
        assert base_floor(5.6) == 5
        assert base_floor(-5.6) == -6
        np.testing.assert_array_equal(base_floor([7.9, -0.1], 2), [6.0, -2.0])

    def test_decimal_base_floor(self):
        # reference tests/test_utils.py:92-99
        assert decimal_base_floor(5.6, Decimal("0.25")) == Decimal("5.5")
        assert decimal_base_floor(-5.1, 5) == Decimal("-10")
        assert decimal_base_floor(5.6, 1) == Decimal("5")
        assert decimal_base_floor(-0.001, 1) == Decimal("-1")

    def test_decimal_base_floor_invalid_base(self):
        with pytest.raises(ValueError):
            decimal_base_floor(5.6, 0.25)  # float base rejected

    def test_tile_index_floor_matches_decimal(self):
        # the engine's long tile index must agree with the Decimal floor
        xs = [5.6, -5.1, -0.001, 0.0, 11.999999, 1000000.5, -1000000.5]
        for base in (Decimal(1), Decimal(5), Decimal("0.25"), Decimal(1000000)):
            idx = tile_index_floor(np.array(xs), float(base))
            for x, i in zip(xs, idx):
                assert Decimal(int(i)) * base == decimal_base_floor(x, base), (x, base)


class TestNaN:
    def test_safe_is_nan(self):
        assert safe_is_nan(float("nan"))
        assert safe_is_nan(np.nan)
        assert not safe_is_nan(None)
        assert not safe_is_nan(1.0)
        assert not safe_is_nan("nan")

    def test_fill_na(self):
        out = fill_na([1.0, np.nan, None, 3], -9999)
        assert out == [1.0, -9999, None, 3]
        out = fill_na([np.nan], None)
        assert out == [None]


class TestSamplePointsOnPath:
    def test_n2_returns_endpoints(self):
        lats, lons = geodesic.sample_points_on_path([1.5, 2.5, 9], [0.1, 0.2, 0.3], 2)
        assert lats == [1.5, 9] and lons == [0.1, 0.3]

    def test_endpoints_exact(self):
        lats, lons = geodesic.sample_points_on_path([10, 20], [100, 120], 7)
        assert lats[0] == 10 and lons[0] == 100
        assert lats[-1] == 20 and lons[-1] == 120
        assert len(lats) == 7

    def test_even_spacing(self):
        lats, lons = geodesic.sample_points_on_path([0, 2], [0, 2], 9)
        ds = [
            geodesic.inverse(lats[i], lons[i], lats[i + 1], lons[i + 1])["s12"]
            for i in range(8)
        ]
        assert max(ds) - min(ds) < 1.0  # meters

    def test_over_pole(self):
        # reference tests/test_utils.py:161-185 — shortest route crosses pole
        lats, lons = geodesic.sample_points_on_path([89.999, 89.999], [-120, 60], 3)
        assert lats[1] > 89.999  # midpoint at/over the pole

    def test_dateline(self):
        lats, lons = geodesic.sample_points_on_path([0, 0], [179.5, -179.5], 3)
        # midpoint sits on the dateline, not at lon 0
        assert abs(abs(lons[1]) - 180) < 0.01

    def test_multi_vertex_path(self):
        lats, lons = geodesic.sample_points_on_path([0, 1, 1], [0, 0, 1], 11)
        assert len(lats) == 11
        assert (lats[0], lons[0]) == (0, 0)
        assert (lats[-1], lons[-1]) == (1, 1)


class TestGeodesicAccuracy:
    def test_published_example(self):
        # GeographicLib's documented JFK->LHR example
        r = geodesic.inverse(40.6, -73.8, 51.6, -0.5)
        assert abs(r["s12"] - 5551759.4003) < 0.01
        assert abs(r["azi1"] - 51.19888) < 1e-4

    def test_direct_inverse_roundtrip(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            lat1, lat2 = rng.uniform(-80, 80, 2)
            lon1, lon2 = rng.uniform(-179, 179, 2)
            inv = geodesic.inverse(lat1, lon1, lat2, lon2)
            d = geodesic.direct(lat1, lon1, inv["azi1"], inv["s12"])
            assert abs(d["lat2"] - lat2) < 1e-6
            dlon = (d["lon2"] - lon2 + 180) % 360 - 180
            assert abs(dlon) < 1e-6
