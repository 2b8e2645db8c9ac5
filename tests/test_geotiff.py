import numpy as np
import pytest

from opentopodata_spark import geotiff


def test_roundtrip_float32(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5
    p = str(tmp_path / "t.tif")
    geotiff.write_geotiff(p, arr, x0=-0.5, y0=2.5, sx=1.0, sy=1.0, epsg=4326, nodata=9999)
    r = geotiff.open_raster(p)
    assert r.width == 4 and r.height == 3
    assert r.crs.epsg == 4326 and r.crs.is_epsg_code
    assert r.nodata == 9999
    np.testing.assert_array_equal(np.asarray(r.band), arr)
    b = r.bounds
    assert (b.left, b.bottom, b.right, b.top) == (-0.5, -0.5, 3.5, 2.5)
    assert r.res == (1.0, 1.0)


def test_out_of_range_nodata_uint8_no_deprecation(tmp_path):
    """A sentinel nodata outside the pixel dtype's range (-9999 on uint8)
    must wrap modularly without tripping NumPy's out-of-bound-scalar
    deprecation — that warning becomes a hard error on newer NumPy."""
    import warnings

    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # one all-wrapped-sentinel block so the sparse path runs too
    arr[:, :] = np.array(-9999).astype(np.uint8, casting="unsafe")[()]
    p = str(tmp_path / "u8.tif")
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        geotiff.write_geotiff(
            p, arr, x0=0, y0=3, sx=1.0, sy=1.0, epsg=4326,
            nodata=-9999, sparse_ok=True,
        )
        r = geotiff.open_raster(p)
        np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_roundtrip_int16_projected(tmp_path):
    arr = (np.arange(6, dtype=np.int16) - 3).reshape(2, 3)
    p = str(tmp_path / "utm.tif")
    geotiff.write_geotiff(p, arr, x0=600000, y0=110000, sx=92.45, sy=92.45,
                          epsg=32632, nodata=-32768)
    r = geotiff.open_raster(p)
    assert r.crs.epsg == 32632
    assert r.dtype.kind == "i"
    np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_wkt_only_crs(tmp_path):
    from opentopodata_spark.crs import ETRS89_LAEA_WKT

    arr = np.ones((2, 2), dtype=np.float32)
    p = str(tmp_path / "wkt.tif")
    geotiff.write_geotiff(p, arr, x0=0, y0=100, sx=50, sy=50, epsg=None,
                          wkt=ETRS89_LAEA_WKT)
    r = geotiff.open_raster(p)
    assert not r.crs.is_epsg_code
    assert "Lambert_Azimuthal_Equal_Area" in r.crs.wkt


def test_fractional_index():
    r = geotiff.Raster(path="x", width=3, height=3, dtype=np.dtype("f4"),
                       nodata=None, crs=geotiff.CRSInfo(epsg=4326),
                       x0=-0.5, y0=2.5, sx=1.0, sy=1.0, _data=np.zeros((3, 3)))
    rows, cols = r.index([0.0, 0.49], [0.0, 1.0])
    np.testing.assert_allclose(rows, [2.5, 1.5])
    np.testing.assert_allclose(cols, [0.5, 0.99])


def test_hgt(tmp_path):
    side = 121
    arr = (np.arange(side * side) % 1000).astype(">i2").reshape(side, side)
    p = str(tmp_path / "N00E010.hgt")
    arr.tofile(p)
    r = geotiff.open_raster(p)
    assert r.width == side and r.height == side
    assert r.crs.epsg == 4326
    assert r.nodata == -32768
    res = 1.0 / (side - 1)
    assert abs(r.x0 - (10 - res / 2)) < 1e-12
    assert abs(r.y0 - (1 + res / 2)) < 1e-12
    np.testing.assert_array_equal(np.asarray(r.band)[:2, :2], arr[:2, :2])


def test_open_garbage(tmp_path):
    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as f:
        f.write(b"this is not a tiff at all")
    with pytest.raises(geotiff.RasterOpenError):
        geotiff.open_raster(p)
