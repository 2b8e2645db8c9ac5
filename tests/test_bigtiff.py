"""BigTIFF (TIFF magic 43, 64-bit offsets) coverage.

Every real-world DEM mosaic over 4 GB ships as BigTIFF (GDAL's
BIGTIFF=IF_SAFER default); the reference reads them transparently through
rasterio (/root/reference/opentopodata/backend.py:103). The codec here
emits small-but-valid BigTIFF files so the 64-bit header / 20-byte-IFD /
LONG8 reader path is exercised byte-for-byte against the classic layout.
"""

import struct
import zipfile

import numpy as np
import pytest

from opentopodata_spark import geotiff


def _terrain(h, w, dtype):
    rng = np.random.default_rng(11)
    base = rng.integers(-200, 3000, size=(h, w)).astype(np.float64)
    if np.dtype(dtype).kind == "f":
        return (base + rng.random((h, w))).astype(dtype)
    return base.astype(dtype)


VARIANTS = [
    # (dtype, compression, predictor, layout kwargs)
    (np.float32, "none", 1, {}),
    (np.float32, "deflate", 3, {"tile_size": (16, 16)}),
    (np.float32, "lzw", 1, {"rows_per_strip": 7}),
    (np.int16, "deflate", 2, {"rows_per_strip": 9}),
    (np.int16, "lzw", 2, {"tile_size": (32, 16)}),
    (np.int32, "deflate", 1, {"tile_size": (16, 32)}),
    (np.float64, "deflate", 3, {}),
]


@pytest.mark.parametrize("dtype,compression,predictor,layout", VARIANTS)
def test_bigtiff_matches_classic(tmp_path, dtype, compression, predictor, layout):
    """The same grid written classic and BigTIFF reads back identically:
    metadata, full band, and windowed reads."""
    arr = _terrain(45, 53, dtype)
    kw = dict(
        x0=-0.5, y0=44.5, sx=1.0, sy=1.0, epsg=4326, nodata=-32768,
        compression=compression, predictor=predictor, **layout,
    )
    pc = str(tmp_path / "classic.tif")
    pb = str(tmp_path / "big.tif")
    geotiff.write_geotiff(pc, arr, **kw)
    geotiff.write_geotiff(pb, arr, bigtiff=True, **kw)

    head = open(pb, "rb").read(8)
    assert struct.unpack("<H", head[2:4])[0] == 43  # really BigTIFF on disk

    rc = geotiff.open_raster(pc)
    rb = geotiff.open_raster(pb)
    for att in ("width", "height", "nodata", "x0", "y0", "sx", "sy", "crs"):
        assert getattr(rc, att) == getattr(rb, att), att
    np.testing.assert_array_equal(np.asarray(rb.band), arr)
    win_b, origin_b = rb.read_window(3, 40, 2, 30)
    win_c, origin_c = rc.read_window(3, 40, 2, 30)
    assert origin_b == origin_c
    np.testing.assert_array_equal(win_b, win_c)


def test_bigtiff_projected_wkt(tmp_path):
    from opentopodata_spark.crs import ETRS89_LAEA_WKT

    arr = _terrain(20, 20, np.float32)
    p = str(tmp_path / "laea.tif")
    geotiff.write_geotiff(
        p, arr, x0=4000000, y0=3000000, sx=100, sy=100, epsg=None,
        wkt=ETRS89_LAEA_WKT, compression="deflate", tile_size=(16, 16),
        bigtiff=True,
    )
    r = geotiff.open_raster(p)
    assert not r.crs.is_epsg_code
    assert "Lambert_Azimuthal_Equal_Area" in r.crs.wkt
    np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_bigtiff_interpolation_parity(tmp_path):
    """Sampling through the BigTIFF block reader is value-identical to the
    classic memmap path for all three interpolation kernels."""
    from opentopodata_spark import interpolate

    rng = np.random.default_rng(5)
    arr = _terrain(50, 60, np.float32)
    arr[5:8, 30:34] = 9999  # nodata patch
    kw = dict(x0=-0.5, y0=49.5, sx=1.0, sy=1.0, epsg=4326, nodata=9999)
    plain = str(tmp_path / "plain.tif")
    big = str(tmp_path / "big.tif")
    geotiff.write_geotiff(plain, arr, **kw)
    geotiff.write_geotiff(
        big, arr, compression="deflate", predictor=3, tile_size=(16, 16),
        bigtiff=True, **kw,
    )
    lats = rng.uniform(-0.4, 48.9, 400)
    lons = rng.uniform(0.1, 58.9, 400)
    rp = geotiff.open_raster(plain)
    rb = geotiff.open_raster(big)
    for method in ("nearest", "bilinear", "cubic"):
        zp, bp = interpolate.sample_points_on_raster_arrays(rp, lats, lons, method)
        zb, bb = interpolate.sample_points_on_raster_arrays(rb, lats, lons, method)
        np.testing.assert_array_equal(bp, bb)
        np.testing.assert_array_equal(zp[bp], zb[bb])


def test_zipped_bigtiff(tmp_path):
    arr = _terrain(30, 30, np.float32)
    tif = str(tmp_path / "inner.tif")
    geotiff.write_geotiff(
        tif, arr, x0=0, y0=30, sx=1, sy=1, epsg=4326,
        compression="deflate", tile_size=(16, 16), bigtiff=True,
    )
    p = str(tmp_path / "outer.zip")
    with zipfile.ZipFile(p, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.write(tif, "inner.tif")
    r = geotiff.open_raster(p)
    np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_malformed_bigtiff_header(tmp_path):
    """offsetsize != 8 is rejected with a clear error, not a misparse."""
    arr = np.zeros((4, 4), dtype=np.int16)
    p = str(tmp_path / "bad.tif")
    geotiff.write_geotiff(p, arr, x0=0, y0=4, sx=1, sy=1, epsg=4326, bigtiff=True)
    data = bytearray(open(p, "rb").read())
    data[4:6] = struct.pack("<H", 4)  # corrupt the offset-size field
    open(p, "wb").write(bytes(data))
    with pytest.raises(geotiff.RasterOpenError, match="BigTIFF"):
        geotiff.open_raster(p)


def test_unknown_magic_still_rejected(tmp_path):
    p = str(tmp_path / "odd.tif")
    open(p, "wb").write(b"II" + struct.pack("<HI", 44, 8) + b"\x00" * 32)
    with pytest.raises(geotiff.RasterOpenError, match="magic"):
        geotiff.open_raster(p)
