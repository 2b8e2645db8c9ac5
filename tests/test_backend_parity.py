"""Ports of /root/reference/tests/test_backend.py golden cases to the
engine's oracle (single-process reference-semantics implementation).

These pin interpolation values, NODATA-adjacency behavior, out-of-bounds
handling, cross-CRS equivalence, and multi-dataset priority coalescing —
the Spark pipeline is separately differential-tested against this oracle.
"""

import math
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff, oracle


@pytest.fixture(scope="module", params=["plain", "compressed"])
def datasets(request, raster_root, compressed_raster_root):
    """Every golden/differential case in this module runs twice: once on the
    plain fixture corpus and once on the DEFLATE/LZW compressed+tiled one —
    the decode paths must be value-identical."""
    from opentopodata_spark import config

    root = raster_root if request.param == "plain" else compressed_raster_root
    return config.load_datasets(os.path.join(root, "test-config.yaml"))


@pytest.fixture(scope="module")
def etopo_band(datasets):
    r = geotiff.open_raster(datasets["etopo1deg"].tile_path)
    return np.asarray(r.band)


def from_path(ds_or_path, lats, lons, method):
    path = ds_or_path if isinstance(ds_or_path, str) else ds_or_path.tile_path
    return oracle.get_elevation_from_path(lats, lons, path, method)


class TestSingleFileGoldens:
    # reference tests/test_backend.py:117-164
    def test_upper_left_corner(self, datasets, etopo_band):
        z = from_path(datasets["etopo1deg"], [90], [-180], "bilinear")
        assert z[0] == pytest.approx(float(etopo_band[0, 0]), abs=1e-9)

    def test_lower_right_corner(self, datasets, etopo_band):
        z = from_path(datasets["etopo1deg"], [-90], [180], "bilinear")
        assert z[0] == pytest.approx(float(etopo_band[-1, -1]), abs=1e-9)

    def test_nearest(self, datasets, etopo_band):
        z = from_path(datasets["etopo1deg"], [89.51], [-179.51], "nearest")
        assert z[0] == pytest.approx(float(etopo_band[0, 0]), abs=1e-9)

    def test_bilinear_closed_form(self, datasets, etopo_band):
        # reference tests/test_backend.py:139-155
        zz = etopo_band.astype(np.float64)
        x, y = 0.4, 0.3  # row frac, col frac
        expected = (
            zz[0, 0] * (1 - x) * (1 - y)
            + zz[1, 0] * x * (1 - y)
            + zz[0, 1] * (1 - x) * y
            + zz[1, 1] * x * y
        )
        z = from_path(datasets["etopo1deg"], [89.6], [-179.7], "bilinear")
        assert z[0] == pytest.approx(expected, rel=1e-12)

    @pytest.mark.parametrize(
        "lat,lon",
        [(90.1, 0), (-90.1, 0), (0, 180.1), (0, -180.1), (91, 181)],
    )
    def test_out_of_bounds_none(self, datasets, lat, lon):
        z = from_path(datasets["etopo1deg"], [lat], [lon], "bilinear")
        assert z[0] is None

    def test_half_pixel_edge_valid(self, datasets):
        # extent is pixel centers: +/-90 lat, +/-180 lon are exactly valid
        z = from_path(datasets["etopo1deg"], [90, -90], [180, -180], "nearest")
        assert all(v is not None for v in z)


class TestNodataGoldens:
    # reference tests/test_backend.py:166-225 on the fully-pinned 3x3 fixture
    def test_corner_value(self, datasets):
        z = from_path(datasets["nodata"], [0], [0], "bilinear")
        assert z[0] == 4

    def test_nodata_cell_bilinear(self, datasets):
        z = from_path(datasets["nodata"], [0], [2], "bilinear")
        assert math.isnan(z[0])

    def test_nearest_snaps_to_valid(self, datasets):
        z = from_path(datasets["nodata"], [1], [0.49], "nearest")
        assert z[0] == 3

    def test_nearest_snaps_to_nodata(self, datasets):
        z = from_path(datasets["nodata"], [1], [0.51], "nearest")
        assert math.isnan(z[0])

    def test_bilinear_between_valid(self, datasets):
        z = from_path(datasets["nodata"], [2], [0.5], "bilinear")
        assert z[0] == 1.5

    def test_bilinear_touching_nodata(self, datasets):
        z = from_path(datasets["nodata"], [1], [0.5], "bilinear")
        assert math.isnan(z[0])

    def test_cubic_on_nodata(self, datasets):
        z = from_path(datasets["nodata"], [0], [2], "cubic")
        assert math.isnan(z[0])

    def test_all_pinned_values(self, datasets):
        # integer-degree centers read back the raw array
        vals = from_path(
            datasets["nodata"], [2, 2, 2, 1, 0], [0, 1, 2, 0, 0], "bilinear"
        )
        assert vals == [2, 1, 0, 3, 4]


class TestEudemGoldens:
    def test_water_is_nan(self, datasets):
        # reference tests/test_backend.py:227-234
        eu = datasets["eudemsubset"]
        paths = eu.location_paths([44.969186], [-3.152424])
        z = oracle.get_elevation_from_path([44.969186], [-3.152424], paths[0], "nearest")
        assert math.isnan(z[0])

    def test_land_is_finite(self, datasets):
        eu = datasets["eudemsubset"]
        paths = eu.location_paths([47.625765], [9.418759])
        z = oracle.get_elevation_from_path([47.625765], [9.418759], paths[0], "bilinear")
        assert z[0] is not None and math.isfinite(z[0])

    def test_epsg_wkt_dataset_equivalence(self, datasets):
        # reference tests/test_backend.py:258-309 (WKT-only CRS path)
        lats = [47.625765, 46.0, 48.5]
        lons = [9.418759, 8.0, 11.2]
        z1, _ = oracle.get_elevation(lats, lons, [datasets["eudemsubset"]], "bilinear")
        z2, _ = oracle.get_elevation(lats, lons, [datasets["eudemnoepsg"]], "bilinear")
        for a, b in zip(z1, z2):
            assert a == pytest.approx(b, abs=1e-6)


class TestTiledDataset:
    def test_oob_of_tiles(self, datasets):
        # reference tests/test_backend.py:251-256
        z, _ = oracle.get_elevation(
            [1.5, -0.5, 0.5, 0.5], [10.5, 11.5, 9.5, 12.5],
            [datasets["srtm90subset"]], "bilinear",
        )
        assert z == [None, None, None, None]

    def test_wgs84_bounds_pruning(self, datasets):
        # reference tests/test_backend.py:278-283
        z, names = oracle.get_elevation(
            [70], [10.5], [datasets["srtm90subset"]], "bilinear"
        )
        assert z == [None]
        assert names == ["srtm90subset"]  # fallback name

    def test_utm_vs_4326_equivalence(self, datasets):
        # reference tests/test_backend.py:266-276 (np.allclose, not exact)
        lats = [0.3, 0.7, 0.5, 0.25, 0.85]
        lons = [10.3, 11.7, 11.01, 10.6, 11.2]
        z1, _ = oracle.get_elevation(lats, lons, [datasets["srtm90subset"]], "bilinear")
        z2, _ = oracle.get_elevation(lats, lons, [datasets["srtm90utm"]], "bilinear")
        np.testing.assert_allclose(z1, z2, atol=2.0)

    def test_dataset_vs_path_equivalence(self, datasets):
        # reference tests/test_backend.py:238-249
        srtm = datasets["srtm90subset"]
        lats, lons = [0.1, 0.2], [10.7, 10.8]
        via_ds = oracle.get_elevation_for_single_dataset(lats, lons, srtm, "bilinear")
        path = srtm.location_paths(lats, lons)[0]
        via_path = oracle.get_elevation_from_path(lats, lons, path, "bilinear")
        assert via_ds == via_path


class TestGetElevationMulti:
    # reference tests/test_backend.py:312-350
    def _multi(self, datasets):
        return [
            datasets["nodata"],
            datasets["eudemsubset"],
            datasets["srtm90subset"],
            datasets["etopo1deg"],
        ]

    def test_priority_attribution(self, datasets):
        lats = [47.625765, 0.1, 70.0, 1.0]
        lons = [9.418759, 10.5, 150.0, 1.0]
        z, names = oracle.get_elevation(lats, lons, self._multi(datasets), "bilinear")
        assert names == ["eudemsubset", "srtm90subset", "etopo1deg", "etopo1deg"]
        assert all(v is not None and math.isfinite(v) for v in z)

    def test_first_dataset_wins(self, datasets):
        # (2, 0.5) resolves in the nodata raster -> 1.5, attribution nodata
        z, names = oracle.get_elevation([2], [0.5], self._multi(datasets), "bilinear")
        assert z == [1.5]
        assert names == ["nodata"]

    def test_nodata_falls_through_with_null_nodata_value(self, datasets):
        # (1, 0.5) hits NODATA in the first raster; with nodata_value=None
        # NaN -> None -> falls to the next covering dataset (etopo).
        z, names = oracle.get_elevation([1], [0.5], self._multi(datasets), "bilinear")
        assert names == ["etopo1deg"]
        assert z[0] is not None and math.isfinite(z[0])

    def test_nodata_value_int_stops_fallthrough(self, datasets):
        # code-is-spec divergence (SURVEY.md §7 hard part 4): a non-null
        # nodata_value is applied per dataset, so the first NODATA hit
        # resolves the point.
        z, names = oracle.get_elevation(
            [1], [0.5], self._multi(datasets), "bilinear", nodata_value=-9999
        )
        assert z == [-9999]
        assert names == ["nodata"]

    def test_nodata_value_nan_stops_fallthrough(self, datasets):
        z, names = oracle.get_elevation(
            [1], [0.5], self._multi(datasets), "bilinear", nodata_value=float("nan")
        )
        assert math.isnan(z[0])
        assert names == ["nodata"]

    def test_attribution_is_last_attempted(self, datasets):
        # a global-bounds dataset that returns None still claims attribution
        # (reference backend.py:280-282 sets dataset_name unconditionally)
        z, names = oracle.get_elevation(
            [89.9999], [0.0], [datasets["nodata"], datasets["srtm90subset"]], "nearest"
        )
        assert z == [None]
        assert names == ["nodata"]

    def test_fallback_name_when_no_bbox_matches(self, datasets):
        # no dataset's wgs84_bounds contains the point -> last dataset name
        z, names = oracle.get_elevation(
            [70.0], [10.5], [datasets["srtm90subset"]], "nearest"
        )
        assert z == [None]
        assert names == ["srtm90subset"]

    def test_early_rows_keep_order(self, datasets):
        lats = [0.1, 47.625765, 0.2]
        lons = [10.5, 9.418759, 11.5]
        z, names = oracle.get_elevation(lats, lons, self._multi(datasets), "nearest")
        assert names == ["srtm90subset", "eudemsubset", "srtm90subset"]
