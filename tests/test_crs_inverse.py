"""Inverse projections + derived dataset coverage (registry-level P4).

The inverses exist so the registry build can turn raster/tile extents in
a file CRS into conservative WGS84 coverage boxes (tiles.py
derived_wgs84_bounds) — the engine's automatic version of the
reference's "set wgs84_bounds for performance" advice
(/root/reference/docs/notes/multiple-datasets.md)."""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import crs, tiles
from opentopodata_spark.config import load_datasets


@pytest.mark.parametrize("epsg", [3035, 3857, 32633, 32733])
def test_inverse_roundtrip(epsg):
    rng = np.random.default_rng(3)
    lats = rng.uniform(-60, 70, 200)
    lons = rng.uniform(-30, 60, 200)
    x, y = crs.reproject_latlons(lats, lons, epsg=epsg)
    lon2, lat2 = crs.unproject_xys(x, y, epsg=epsg)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)


def test_inverse_laea_wkt():
    lats = np.array([40.0, 55.5, 68.2])
    lons = np.array([-5.0, 14.0, 30.0])
    x, y = crs.reproject_latlons(lats, lons, wkt=crs.ETRS89_LAEA_WKT)
    lon2, lat2 = crs.unproject_xys(x, y, wkt=crs.ETRS89_LAEA_WKT)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)


def test_inverse_4326_identity():
    lon, lat = crs.unproject_xys(np.array([1.5]), np.array([2.5]), epsg=4326)
    assert lon[0] == 1.5 and lat[0] == 2.5


@pytest.mark.parametrize("epsg", [4258, 4269, 4267, 4171, 4283])
def test_geographic_crs_identity_family(epsg):
    """Non-4326 geographic CRSs (NAD83, ETRS89, ...) behave as identity
    (their modern realizations are WGS84-coincident at DEM scale)."""
    lats = np.array([45.0, -12.5])
    lons = np.array([-120.0, 133.0])
    x, y = crs.reproject_latlons(lats, lons, epsg=epsg)
    np.testing.assert_array_equal(np.asarray(x), lons)
    np.testing.assert_array_equal(np.asarray(y), lats)


# Regional sample boxes so round-trips exercise each grid where it's valid.
_NATIONAL_CASES = [
    (2193, (-47.5, -34.0), (166.0, 178.5)),   # NZTM2000
    (27700, (49.9, 60.8), (-8.0, 1.7)),       # British National Grid
    (25830, (36.0, 62.0), (-6.0, 0.0)),       # ETRS89 / UTM 30N
    (25833, (36.0, 70.0), (12.0, 18.0)),      # ETRS89 / UTM 33N
    (26910, (32.0, 60.0), (-126.0, -120.0)),  # NAD83 / UTM 10N
    (28355, (-44.0, -10.0), (144.0, 150.0)),  # GDA94 / MGA 55
]


@pytest.mark.parametrize("epsg,lat_range,lon_range", _NATIONAL_CASES)
def test_national_grid_roundtrip(epsg, lat_range, lon_range):
    rng = np.random.default_rng(11)
    lats = rng.uniform(*lat_range, 200)
    lons = rng.uniform(*lon_range, 200)
    x, y = crs.reproject_latlons(lats, lons, epsg=epsg)
    lon2, lat2 = crs.unproject_xys(x, y, epsg=epsg)
    np.testing.assert_allclose(lat2, lats, atol=1e-6)
    np.testing.assert_allclose(lon2, lons, atol=1e-6)


def test_osgb_worked_example():
    """OS's published worked example (OSGB36 geographic -> grid):
    52d39'27.2531\"N 1d43'4.5177\"E -> E 651409.903 N 313177.270.
    Input here is OSGB36 itself, so drive the bare projection (no datum
    shift) — this pins the Airy params, lat0=49 handling, and k0."""
    tm = crs.TransverseMercator(
        *crs._AIRY1830, lat0_deg=49.0, lon0_deg=-2.0, k0=0.9996012717,
        false_easting=400000.0, false_northing=-100000.0,
    )
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = tm.forward(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 651409.903) < 0.01
    assert abs(y[0] - 313177.270) < 0.01


def test_osgb_datum_shift_magnitude():
    """EPSG:27700 includes the WGS84->OSGB36 Helmert: around London the
    shift is ~120 m; without it, grid refs would be off by that much."""
    x, y = crs.reproject_latlons(np.array([51.5074]), np.array([-0.1278]), epsg=27700)
    # Trafalgar Square-ish: TQ (530000, 180000) neighborhood
    assert abs(x[0] - 530000) < 1500 and abs(y[0] - 180400) < 1500
    bare = crs.TransverseMercator(
        *crs._AIRY1830, lat0_deg=49.0, lon0_deg=-2.0, k0=0.9996012717,
        false_easting=400000.0, false_northing=-100000.0,
    )
    x2, y2 = bare.forward(np.array([-0.1278]), np.array([51.5074]))
    shift = float(np.hypot(x[0] - x2[0], y[0] - y2[0]))
    assert 80.0 < shift < 160.0


def test_nztm_anchor():
    """NZTM natural origin (lat 0, lon 173) maps exactly to the false
    origin — pins lon0/FE/FN; Wellington lands in the right 100 m."""
    x, y = crs.reproject_latlons(np.array([0.0]), np.array([173.0]), epsg=2193)
    assert abs(x[0] - 1600000.0) < 1e-6 and abs(y[0] - 10000000.0) < 1e-6
    x, y = crs.reproject_latlons(np.array([-41.2889]), np.array([174.7772]), epsg=2193)
    assert abs(x[0] - 1748814) < 100 and abs(y[0] - 5427648) < 100


def test_etrs89_utm_matches_wgs84_utm():
    """ETRS89/UTM and NAD83/UTM differ from WGS84/UTM only by the GRS80
    ellipsoid — the same point projects within millimeters."""
    lats = np.array([52.0, 48.3])
    lons = np.array([9.0, 10.5])
    x1, y1 = crs.reproject_latlons(lats, lons, epsg=25832)
    x2, y2 = crs.reproject_latlons(lats, lons, epsg=32632)
    np.testing.assert_allclose(x1, x2, atol=0.01)
    np.testing.assert_allclose(y1, y2, atol=0.01)


def test_unknown_epsg_still_raises():
    with pytest.raises(crs.CRSError):
        crs.reproject_latlons(np.array([0.0]), np.array([0.0]), epsg=2154)


def _write_nztm_tiles(root):
    """Two NZTM (EPSG:2193) 100 km tiles with projected-corner filenames —
    the EU-DEM pattern (filename_epsg != 4326) on a new national grid.
    DEFLATE-tiled layout so the new-CRS path also runs the block reader."""
    import os

    from opentopodata_spark import geotiff

    d = os.path.join(root, "nztm-tiles")
    os.makedirs(d, exist_ok=True)
    px = 1000.0
    for northing in (5300000, 5400000):
        x0, y0 = 1700000.0, northing + 100000.0
        xs = x0 + (np.arange(100) + 0.5) * px
        ys = y0 - (np.arange(100) + 0.5) * px
        X, Y = np.meshgrid(xs, ys)
        grid = (200.0 + 150.0 * np.sin(X / 3.0e4) + 90.0 * np.cos(Y / 4.0e4)).astype(
            np.float32
        )
        geotiff.write_geotiff(
            os.path.join(d, f"N{northing}E1700000.tif"), grid,
            x0=x0, y0=y0, sx=px, sy=px, epsg=2193, nodata=-9999,
            compression="deflate", predictor=3, tile_size=(32, 32),
        )
    return d


def _write_osgb_single(root):
    import os

    from opentopodata_spark import geotiff

    d = os.path.join(root, "osgb-dem")
    os.makedirs(d, exist_ok=True)
    px = 600.0
    x0, y0 = 440000.0, 220000.0  # SE England, 100x100 @600m
    xs = x0 + (np.arange(100) + 0.5) * px
    ys = y0 - (np.arange(100) + 0.5) * px
    X, Y = np.meshgrid(xs, ys)
    grid = (50.0 + 40.0 * np.sin(X / 2.0e4) + 30.0 * np.cos(Y / 2.5e4)).astype(
        np.float32
    )
    geotiff.write_geotiff(
        os.path.join(d, "osgb.tif"), grid, x0=x0, y0=y0, sx=px, sy=px,
        epsg=27700, nodata=-9999, compression="lzw",
    )
    return d


def test_new_crs_elevation_differential(spark, tmp_path):
    """End-to-end differential on the NEW CRSs: a tiled NZTM dataset
    (projected filename corners) + an OSGB single-file dataset, Spark
    resolver vs the single-process oracle, bit-identical."""
    import math
    import os

    from opentopodata_spark import config, oracle
    from opentopodata_spark.operators import elevation

    root = str(tmp_path)
    nz_dir = _write_nztm_tiles(root)
    uk_dir = _write_osgb_single(root)
    cfg = os.path.join(root, "cfg.yaml")
    with open(cfg, "w") as f:
        f.write(
            "datasets:\n"
            f"- name: nztm\n  path: {nz_dir}/\n"
            "  filename_epsg: 2193\n  filename_tile_size: 100000\n"
            f"- name: osgb\n  path: {uk_dir}/\n"
        )
    dsets = config.load_datasets(cfg)
    ordered = [dsets["nztm"], dsets["osgb"]]

    rng = np.random.default_rng(5)
    lats = np.concatenate([
        rng.uniform(-42.5, -40.8, 60),   # NZTM tiles area
        rng.uniform(51.2, 51.9, 60),     # OSGB raster area
        rng.uniform(-10.0, 10.0, 20),    # out of both -> null
    ])
    lons = np.concatenate([
        rng.uniform(174.2, 175.3, 60),
        rng.uniform(-1.4, 0.4, 60),
        rng.uniform(-20.0, 20.0, 20),
    ])
    pts = spark.createDataFrame(
        [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(lats, lons))],
        "point_id long, lat double, lon double",
    )
    res = elevation.ElevationResolver(spark, ordered, "bilinear").resolve(pts)
    rows = {r.point_id: r for r in res.collect()}
    e, names = oracle.get_elevation(lats, lons, ordered, "bilinear")
    assert len(rows) == len(lats)
    resolved = 0
    for i in range(len(lats)):
        r = rows[i]
        eo, no = e[i], names[i]
        if eo is None:
            assert r.elevation is None, (i, r.elevation, eo)
        else:
            assert r.elevation == eo, (i, r.elevation, eo)
            resolved += 1
        assert r.dataset == no, (i, r.dataset, no)
    assert resolved >= 60  # both coverage areas actually hit
    assert {r.dataset for r in rows.values() if r.elevation is not None} == {
        "nztm", "osgb",
    }


def test_derived_bounds_cover_rasters(raster_root, datasets):
    """Every dataset's derived box must contain its rasters' true extent
    (conservative: pruning may only drop points that would be OOB-null)."""
    import os

    for name, ds in datasets.items():
        if not hasattr(ds, "wgs84_bounds") or not hasattr(ds, "kind"):
            continue
        d = tiles.derived_wgs84_bounds(ds)
        if d is None:
            continue
        left, bottom, right, top = d
        assert -180 <= left < right <= 180
        assert -90 <= bottom < top <= 90


def test_registry_rows_intersect_config(raster_root, datasets):
    """nodata + eudemsubset have global config bounds but small rasters:
    the registry must carry much tighter derived boxes for them, while
    etopo1deg (a global raster) stays global."""
    from opentopodata_spark.config import resolve_dataset_names

    ordered = resolve_dataset_names("multi_eudem_etopo1", datasets)
    rows = {r[0]: r for r in tiles.dataset_registry_rows(ordered)}
    _, _, _, nl, nb, nr, nt, *_ = rows["nodata"]
    assert (nr - nl) < 90 and (nt - nb) < 90  # tiny raster, tight box
    _, _, _, el, eb, er, et, *_ = rows["eudemsubset"]
    assert (er - el) < 180  # LAEA inverse gave a regional box
    _, _, _, gl, gb, gr, gt, *_ = rows["etopo1deg"]
    assert gl <= -179 and gr >= 179  # global raster stays global


def test_registry_srtm_bbox_still_honors_config(raster_root, datasets):
    """Config-provided wgs84_bounds stay binding (intersection, never
    widened): srtm90subset is configured to (10..12, 0..1)."""
    from opentopodata_spark.config import resolve_dataset_names

    ordered = resolve_dataset_names("srtm90subset", datasets)
    (_, _, _, left, bottom, right, top, *_rest), = tiles.dataset_registry_rows(ordered)
    assert left >= 10.0 and right <= 12.0
    assert bottom >= 0.0 and top <= 1.0
