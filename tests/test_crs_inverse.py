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
