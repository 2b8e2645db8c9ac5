"""Compressed/tiled GeoTIFF + zip-container coverage.

Mirrors every tests/test_geotiff.py case on compressed variants, and adds
block-cache / windowed-read / cross-codec equivalence checks. The reference
reads all of these through GDAL (/root/reference/opentopodata/backend.py:103)
and its docs recommend DEFLATE-tiled datasets, so this is the #1 real-world
format surface.
"""

import os
import zipfile

import numpy as np
import pytest

from opentopodata_spark import geotiff


def _checkerboard(h, w, dtype):
    rng = np.random.default_rng(7)
    base = rng.integers(-500, 4000, size=(h, w)).astype(np.float64)
    if np.dtype(dtype).kind == "f":
        return (base + rng.random((h, w))).astype(dtype)
    return base.astype(dtype)


VARIANTS = [
    # (compression, predictor, layout kwargs)
    ("deflate", 1, {}),
    ("deflate", 1, {"rows_per_strip": 7}),
    ("deflate", 1, {"tile_size": (16, 16)}),
    ("lzw", 1, {}),
    ("lzw", 1, {"rows_per_strip": 13}),
    ("lzw", 1, {"tile_size": (32, 16)}),
    ("none", 1, {"tile_size": (16, 32)}),  # uncompressed but tiled
    ("none", 1, {"rows_per_strip": 5}),
    ("packbits", 1, {}),
    ("packbits", 1, {"rows_per_strip": 6}),
    ("packbits", 1, {"tile_size": (16, 16)}),
]

INT_VARIANTS = VARIANTS + [
    ("deflate", 2, {"rows_per_strip": 9}),
    ("deflate", 2, {"tile_size": (16, 16)}),
    ("lzw", 2, {"tile_size": (32, 32)}),
    ("packbits", 2, {"rows_per_strip": 8}),
]

FLOAT_VARIANTS = VARIANTS + [
    ("deflate", 3, {"rows_per_strip": 11}),
    ("deflate", 3, {"tile_size": (16, 16)}),
    ("lzw", 3, {"tile_size": (16, 32)}),
    ("packbits", 3, {"tile_size": (16, 16)}),
]


@pytest.mark.parametrize("compression,predictor,layout", FLOAT_VARIANTS)
def test_roundtrip_float32(tmp_path, compression, predictor, layout):
    arr = _checkerboard(45, 53, np.float32)
    p = str(tmp_path / "t.tif")
    geotiff.write_geotiff(
        p, arr, x0=-0.5, y0=44.5, sx=1.0, sy=1.0, epsg=4326, nodata=9999,
        compression=compression, predictor=predictor, **layout,
    )
    r = geotiff.open_raster(p)
    assert r.width == 53 and r.height == 45
    assert r.crs.epsg == 4326 and r.nodata == 9999
    np.testing.assert_array_equal(np.asarray(r.band), arr)


@pytest.mark.parametrize("compression,predictor,layout", INT_VARIANTS)
def test_roundtrip_int16_projected(tmp_path, compression, predictor, layout):
    arr = _checkerboard(37, 41, np.int16)
    p = str(tmp_path / "utm.tif")
    geotiff.write_geotiff(
        p, arr, x0=600000, y0=110000, sx=92.45, sy=92.45, epsg=32632,
        nodata=-32768, compression=compression, predictor=predictor, **layout,
    )
    r = geotiff.open_raster(p)
    assert r.crs.epsg == 32632 and r.dtype.kind == "i"
    np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_roundtrip_float64_predictor3(tmp_path):
    arr = _checkerboard(20, 18, np.float64)
    p = str(tmp_path / "f8.tif")
    geotiff.write_geotiff(
        p, arr, x0=0, y0=20, sx=1.0, sy=1.0, epsg=4326,
        compression="deflate", predictor=3, tile_size=(16, 16),
    )
    np.testing.assert_array_equal(np.asarray(geotiff.open_raster(p).band), arr)


def test_wkt_only_crs_compressed(tmp_path):
    from opentopodata_spark.crs import ETRS89_LAEA_WKT

    arr = np.ones((2, 2), dtype=np.float32)
    p = str(tmp_path / "wkt.tif")
    geotiff.write_geotiff(
        p, arr, x0=0, y0=100, sx=50, sy=50, epsg=None, wkt=ETRS89_LAEA_WKT,
        compression="deflate",
    )
    r = geotiff.open_raster(p)
    assert not r.crs.is_epsg_code
    assert "Lambert_Azimuthal_Equal_Area" in r.crs.wkt


def test_read_window_matches_band(tmp_path):
    arr = _checkerboard(64, 80, np.int16)
    p = str(tmp_path / "w.tif")
    geotiff.write_geotiff(
        p, arr, x0=0, y0=64, sx=1, sy=1, epsg=4326,
        compression="deflate", predictor=2, tile_size=(16, 16),
    )
    r = geotiff.open_raster(p)
    for (r0, r1, c0, c1) in [(0, 5, 0, 5), (10, 40, 7, 33), (60, 64, 75, 80),
                             (-3, 70, -3, 90), (31, 33, 15, 17)]:
        win, (orow, ocol) = r.read_window(r0, r1, c0, c1)
        rr0, cc0 = max(r0, 0), max(c0, 0)
        np.testing.assert_array_equal(
            win, arr[rr0 : min(r1, 64), cc0 : min(c1, 80)]
        )
        assert (orow, ocol) == (rr0, cc0)


def test_windowed_read_decodes_only_touched_blocks(tmp_path):
    """A corner window must not pull the whole raster through the cache."""
    arr = _checkerboard(128, 128, np.float32)
    p = str(tmp_path / "c.tif")
    geotiff.write_geotiff(
        p, arr, x0=0, y0=128, sx=1, sy=1, epsg=4326,
        compression="deflate", tile_size=(32, 32),
    )
    geotiff.clear_block_cache()
    r = geotiff.open_raster(p)
    win, _ = r.read_window(0, 10, 0, 10)
    np.testing.assert_array_equal(win, arr[:10, :10])
    # exactly one 32x32 tile decoded
    assert len(geotiff._block_cache) == 1
    # same window again: served from cache (no new entries)
    r2 = geotiff.open_raster(p)
    r2.read_window(2, 8, 2, 8)
    assert len(geotiff._block_cache) == 1


def test_lzw_deflate_same_values(tmp_path):
    arr = _checkerboard(40, 40, np.int16)
    pz = str(tmp_path / "z.tif")
    pl = str(tmp_path / "l.tif")
    for p, comp in ((pz, "deflate"), (pl, "lzw")):
        geotiff.write_geotiff(
            p, arr, x0=0, y0=40, sx=1, sy=1, epsg=4326, compression=comp,
            predictor=2, rows_per_strip=8,
        )
    np.testing.assert_array_equal(
        np.asarray(geotiff.open_raster(pz).band),
        np.asarray(geotiff.open_raster(pl).band),
    )


def test_hgt_zip(tmp_path):
    side = 121
    arr = (np.arange(side * side) % 1000).astype(">i2").reshape(side, side)
    p = str(tmp_path / "N00E010.hgt.zip")
    with zipfile.ZipFile(p, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("N00E010.hgt", arr.tobytes())
    r = geotiff.open_raster(p)
    assert r.width == side and r.height == side
    assert r.crs.epsg == 4326 and r.nodata == -32768
    res = 1.0 / (side - 1)
    assert abs(r.x0 - (10 - res / 2)) < 1e-12
    assert abs(r.y0 - (1 + res / 2)) < 1e-12
    np.testing.assert_array_equal(np.asarray(r.band), arr.astype("i2"))


def test_hgt_zip_corner_from_zip_name(tmp_path):
    """Member named generically -> corner parsed from the zip filename."""
    side = 61
    arr = np.zeros((side, side), dtype=">i2")
    p = str(tmp_path / "S05W071.hgt.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("tile.hgt", arr.tobytes())
    r = geotiff.open_raster(p)
    res = 1.0 / (side - 1)
    assert abs(r.x0 - (-71 - res / 2)) < 1e-12
    assert abs(r.y0 - (-4 + res / 2)) < 1e-12


def test_zipped_geotiff(tmp_path):
    arr = _checkerboard(30, 30, np.float32)
    tif = str(tmp_path / "inner.tif")
    geotiff.write_geotiff(
        tif, arr, x0=0, y0=30, sx=1, sy=1, epsg=4326,
        compression="deflate", tile_size=(16, 16),
    )
    p = str(tmp_path / "outer.zip")
    with zipfile.ZipFile(p, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.write(tif, "inner.tif")
    r = geotiff.open_raster(p)
    np.testing.assert_array_equal(np.asarray(r.band), arr)


def test_open_garbage_zip(tmp_path):
    p = str(tmp_path / "bad.zip")
    with open(p, "wb") as f:
        f.write(b"this is not a zip")
    with pytest.raises(geotiff.RasterOpenError):
        geotiff.open_raster(p)


def test_zip_without_raster_member(tmp_path):
    p = str(tmp_path / "empty.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("readme.txt", "hello")
    with pytest.raises(geotiff.RasterOpenError):
        geotiff.open_raster(p)


def test_unsupported_compression_clear_error(tmp_path):
    """A JPEG-coded TIFF fails with a clear message, not a crash."""
    arr = np.zeros((4, 4), dtype=np.int16)
    p = str(tmp_path / "jp.tif")
    geotiff.write_geotiff(p, arr, x0=0, y0=4, sx=1, sy=1, epsg=4326)
    # patch the compression tag (259) value to 7 (JPEG)
    data = bytearray(open(p, "rb").read())
    import struct

    ifd_offset = struct.unpack("<I", data[4:8])[0]
    (n,) = struct.unpack("<H", data[ifd_offset : ifd_offset + 2])
    for i in range(n):
        base = ifd_offset + 2 + i * 12
        tag = struct.unpack("<H", data[base : base + 2])[0]
        if tag == 259:
            data[base + 8 : base + 10] = struct.pack("<H", 7)
    open(p, "wb").write(bytes(data))
    with pytest.raises(geotiff.RasterOpenError, match="compression"):
        geotiff.open_raster(p)


def test_packbits_codec_edge_cases():
    """Raw codec round-trips: runs, literals, 128-byte packet boundaries."""
    cases = [
        b"",
        b"\x00",
        b"abc",
        b"a" * 3,
        b"a" * 300,                       # multi-packet replicate run
        bytes(range(256)),                # pure literal, >128 bytes
        b"ab" + b"c" * 5 + b"de" + b"f" * 130 + b"gh",
        bytes(np.random.default_rng(11).integers(0, 4, 1000, dtype=np.uint8)),
    ]
    for raw in cases:
        enc = geotiff._packbits_encode(raw)
        assert geotiff._packbits_decode(enc) == raw
    # spec no-op byte (0x80) is skipped on decode
    assert geotiff._packbits_decode(b"\x80\x00A\x80\xfeB") == b"ABBB"


def test_sampling_identical_plain_vs_compressed(tmp_path):
    """End-to-end interpolation parity: same values through the block
    reader as through the memmap."""
    from opentopodata_spark import interpolate

    rng = np.random.default_rng(3)
    arr = _checkerboard(50, 60, np.float32)
    arr[10:13, 20:24] = 9999  # nodata patch
    plain = str(tmp_path / "plain.tif")
    comp = str(tmp_path / "comp.tif")
    for p, kw in ((plain, {}), (comp, dict(compression="deflate", predictor=3,
                                           tile_size=(16, 16)))):
        geotiff.write_geotiff(
            p, arr, x0=-0.5, y0=49.5, sx=1.0, sy=1.0, epsg=4326, nodata=9999, **kw
        )
    lats = rng.uniform(-0.4, 48.9, 500)
    lons = rng.uniform(0.1, 58.9, 500)
    rp = geotiff.open_raster(plain)
    rc = geotiff.open_raster(comp)
    for method in ("nearest", "bilinear", "cubic"):
        zp, bp = interpolate.sample_points_on_raster_arrays(rp, lats, lons, method)
        zc, bc = interpolate.sample_points_on_raster_arrays(rc, lats, lons, method)
        np.testing.assert_array_equal(bp, bc)
        np.testing.assert_array_equal(zp[bp], zc[bc])
