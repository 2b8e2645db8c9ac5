"""GeoPackage raster tiles (opentopodata_spark.gpkg).

The reference reads .gpkg rasters through GDAL
(/root/reference/opentopodata/backend.py:89); this engine implements
the SQLite file format subset + the OGC GPKG tables in pure numpy.
Pins: write->read round trips for the gridded-coverage DEM profile
(PNG16 + scale/offset/data_null, global and per-tile ancillary) and
plain 8-bit tiles, windowed decode through the block LRU, SQLite
overflow-page chains (hand-crafted fixture), multi-leaf B-trees, loud
rejections, and an elevation-pipeline differential vs GeoTIFF.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from opentopodata_spark import geotiff, gpkg
from opentopodata_spark.geotiff import RasterOpenError, open_raster


@pytest.fixture()
def dem():
    rng = np.random.RandomState(11)
    arr = np.round(rng.rand(300, 260) * 900.0)
    arr[5, 7] = np.nan
    return arr


class TestRoundTrip:
    def test_gridded_dem_profile(self, tmp_path, dem):
        p = str(tmp_path / "d.gpkg")
        gpkg.write_gpkg(p, dem, x0=10.0, y0=1.0, sx=0.01, sy=0.01,
                        epsg=4326, tile_size=128, scale=1.0, offset=0.0)
        r = open_raster(p)
        assert r.crs.epsg == 4326
        assert r.dtype == np.dtype("<f4")
        assert abs(r.x0 - 10.0) < 1e-12 and abs(r.y0 - 1.0) < 1e-12
        w = np.asarray(r.read_window(0, 300, 0, 260)[0])
        assert np.isnan(w[5, 7])  # data_null -> NaN
        m = ~np.isnan(dem)
        assert np.array_equal(w[m], dem[m].astype(np.float32))

    def test_windowed_reads(self, tmp_path, dem):
        p = str(tmp_path / "w.gpkg")
        gpkg.write_gpkg(p, dem, x0=10.0, y0=1.0, sx=0.01, sy=0.01,
                        tile_size=64, scale=1.0, offset=0.0)
        r = open_raster(p)
        rng = np.random.RandomState(3)
        for _ in range(10):
            r0, c0 = rng.randint(0, 280), rng.randint(0, 240)
            r1 = r0 + rng.randint(1, 300 - r0)
            c1 = c0 + rng.randint(1, 260 - c0)
            got = np.asarray(r.read_window(r0, r1, c0, c1)[0])
            sub = dem[r0:r1, c0:c1]
            m = ~np.isnan(sub)
            assert np.array_equal(got[m], sub[m].astype(np.float32))
            assert np.all(np.isnan(got[~m]))

    def test_scale_offset_and_per_tile(self, tmp_path, dem):
        p = str(tmp_path / "s.gpkg")
        gpkg.write_gpkg(p, dem, x0=0.0, y0=3.0, sx=0.01, sy=0.01,
                        tile_size=64, scale=0.25, offset=-100.0)
        w = np.asarray(open_raster(p).read_window(0, 300, 0, 260)[0])
        m = ~np.isnan(dem)
        assert np.allclose(w[m], dem[m], atol=0.25)
        q = str(tmp_path / "pt.gpkg")
        gpkg.write_gpkg(q, dem, x0=0.0, y0=3.0, sx=0.01, sy=0.01,
                        tile_size=64, per_tile_ancillary=True)
        w2 = np.asarray(open_raster(q).read_window(0, 300, 0, 260)[0])
        assert float(np.max(np.abs(w2[m] - dem[m]))) < 0.05

    def test_plain_8bit_tiles(self, tmp_path):
        rng = np.random.RandomState(4)
        a8 = (rng.rand(140, 150) * 255).astype(np.uint8)
        p = str(tmp_path / "g.gpkg")
        gpkg.write_gpkg(p, a8, x0=0.0, y0=1.0, sx=0.01, sy=0.01,
                        gridded=False, tile_size=64)
        r = open_raster(p)
        assert r.dtype == np.dtype("u1")
        assert np.array_equal(
            np.asarray(r.read_window(0, 140, 0, 150)[0]), a8)

    def test_multi_leaf_btree(self, tmp_path):
        """Enough tiles that the tiles table spills to several leaf
        pages under one interior root."""
        rng = np.random.RandomState(5)
        arr = np.round(rng.rand(512, 512) * 500.0)
        p = str(tmp_path / "big.gpkg")
        gpkg.write_gpkg(p, arr, x0=0.0, y0=5.0, sx=0.01, sy=0.01,
                        tile_size=64, scale=1.0, offset=0.0)
        r = open_raster(p)
        w = np.asarray(r.read_window(0, 512, 0, 512)[0])
        assert np.array_equal(w, arr.astype(np.float32))


class TestSqliteStructure:
    def test_overflow_chain(self, tmp_path):
        """Hand-crafted db: one row whose payload spills across two
        overflow pages (page_size 512) — real GeoPackages do this for
        every nontrivial tile blob."""
        page_size = 512
        usable = page_size
        blob = bytes(range(256)) * 6  # 1536 bytes
        payload = gpkg._enc_record(["x", blob])
        plen = len(payload)
        max_local = usable - 35
        min_local = ((usable - 12) * 32) // 255 - 23
        local = min_local + (plen - min_local) % (usable - 4)
        if local > max_local:
            local = min_local
        # pages: 1 = sqlite_master, 2 = table leaf, 3.. = overflow chain
        cell = (gpkg._enc_varint(plen) + gpkg._enc_varint(1)
                + payload[:local] + struct.pack(">I", 3))
        rest = payload[local:]
        chunks = [rest[i : i + usable - 4]
                  for i in range(0, len(rest), usable - 4)]
        assert len(chunks) >= 2  # really exercises the chain

        def leaf_page(cells, base):
            page = bytearray(page_size)
            content = page_size
            offs = []
            for c in cells:
                content -= len(c)
                page[content : content + len(c)] = c
                offs.append(content)
            page[base] = 13
            struct.pack_into(">HHHB", page, base + 1, 0, len(cells),
                             content, 0)
            for i, o in enumerate(offs):
                struct.pack_into(">H", page, base + 8 + 2 * i, o)
            return page

        master_payload = gpkg._enc_record(
            ["table", "t", "t", 2, "CREATE TABLE t (name TEXT, b BLOB)"])
        master_cell = (gpkg._enc_varint(len(master_payload))
                       + gpkg._enc_varint(1) + master_payload)
        page1 = leaf_page([master_cell], base=100)
        hdr = bytearray(100)
        hdr[:16] = b"SQLite format 3\x00"
        struct.pack_into(">H", hdr, 16, page_size)
        struct.pack_into(">I", hdr, 28, 4)
        struct.pack_into(">I", hdr, 56, 1)
        page1[:100] = hdr
        page2 = leaf_page([cell], base=0)
        ov_pages = []
        for i, ch in enumerate(chunks):
            pg = bytearray(page_size)
            nxt = 3 + i + 1 if i + 1 < len(chunks) else 0
            struct.pack_into(">I", pg, 0, nxt)
            pg[4 : 4 + len(ch)] = ch
            ov_pages.append(pg)
        p = str(tmp_path / "ov.db")
        with open(p, "wb") as f:
            f.write(bytes(page1 + page2 + b"".join(ov_pages)))

        from opentopodata_spark.geotiff import _ByteSource

        db = gpkg._SQLite(_ByteSource(p))
        rows = list(db.rows(db.tables()["t"][0]))
        assert rows == [(1, ["x", blob])]

    def test_not_sqlite_is_loud(self, tmp_path):
        p = str(tmp_path / "x.gpkg")
        with open(p, "wb") as f:
            f.write(b"not a database at all" * 10)
        with pytest.raises(RasterOpenError, match="SQLite"):
            open_raster(p)

    def test_no_raster_content_is_loud(self, tmp_path, dem):
        p = str(tmp_path / "d.gpkg")
        gpkg.write_gpkg(p, dem, x0=0.0, y0=3.0, sx=0.01, sy=0.01,
                        tile_size=128)
        # surgically rename the content type to a vector layer
        raw = bytearray(open(p, "rb").read())
        at = raw.find(b"2d-gridded-coverage")
        raw[at : at + len(b"2d-gridded-coverage")] = b"featuresfeaturesfea"
        with open(p, "wb") as f:
            f.write(bytes(raw))
        with pytest.raises(RasterOpenError, match="no raster"):
            open_raster(p)


def test_gpkg_elevation_differential(tmp_path, spark):
    """GPKG DEM (scale=1 exact PNG16 packing) resolves bit-identically
    to the same grid as GeoTIFF through the distributed pipeline."""
    from pyspark.sql import functions as F

    from opentopodata_spark import config, fixtures
    from opentopodata_spark.operators import elevation

    res = 1.0 / 60.0
    side = 61
    lons = 10.0 + (np.arange(side) + 0.5) * res
    lats = 1.0 - (np.arange(side) + 0.5) * res
    grid = np.round(
        fixtures.terrain_wgs84(lats[:, None], lons[None, :])
    ).astype(np.float64)
    d_tif = tmp_path / "tif"
    d_gp = tmp_path / "gp"
    os.makedirs(d_tif)
    os.makedirs(d_gp)
    geotiff.write_geotiff(str(d_tif / "t.tif"), grid.astype(np.float32),
                          x0=10.0, y0=1.0, sx=res, sy=res, epsg=4326,
                          nodata=-32768)
    gpkg.write_gpkg(str(d_gp / "t.gpkg"), grid, x0=10.0, y0=1.0, sx=res,
                    sy=res, epsg=4326, tile_size=32, scale=1.0, offset=0.0)

    rng = np.random.default_rng(3)
    pts = spark.createDataFrame(
        [(i, float(la), float(lo)) for i, (la, lo) in enumerate(
            zip(rng.uniform(0.02, 0.95, 80), rng.uniform(10.02, 10.95, 80))
        )],
        "point_id long, lat double, lon double",
    ).withColumn("point_pos", F.lit(0)).withColumn("doc_id", F.lit("d"))

    out = {}
    for name, d in (("tif", d_tif), ("gp", d_gp)):
        ds = config.dataset_from_config(name, path=str(d))
        out[name] = {r.point_id: r.elevation for r in
                     elevation.ElevationResolver(spark, [ds], "bilinear")
                     .resolve(pts).collect()}
    # the GPKG raster is float32 of the same integers the tif stores:
    # identical bilinear inputs -> identical outputs
    assert out["gp"] == out["tif"]


def test_remote_gpkg_range_reads(tmp_path):
    """A .gpkg served over HTTP reads through _RangeByteSource: SQLite
    pages fetch as byte ranges (never a full-object GET) and windows
    equal the local twin."""
    import numpy as np

    from opentopodata_spark.geotiff import open_raster
    from test_remote_raster import _serve

    arr = (100.0 + np.arange(128 * 128).reshape(128, 128) % 900
           ).astype(np.float64)
    p = str(tmp_path / "dem.gpkg")
    gpkg.write_gpkg(p, arr, x0=10.0, y0=1.0, sx=1 / 128, sy=1 / 128,
               epsg=4326, tile_size=64, scale=1.0, offset=0.0)
    srv, base = _serve(str(tmp_path))
    try:
        local = open_raster(p)
        remote = open_raster(f"{base}/dem.gpkg")
        wl, _ = local.read_window(10, 50, 20, 70)
        wr, _ = remote.read_window(10, 50, 20, 70)
        assert np.array_equal(wl, wr)
        assert all(rng for _p, rng in srv.requests), "full GET happened"
    finally:
        srv.shutdown()


def test_null_tile_data_reads_as_fill(tmp_path):
    """Regression: NULL tile_data rows must read as the fill value, not
    raise at window time (the pre-lazy reader skipped them)."""
    import sqlite3

    import numpy as np

    arr = np.full((128, 128), 500.0)
    p = str(tmp_path / "dem.gpkg")
    gpkg.write_gpkg(p, arr, x0=10.0, y0=1.0, sx=1 / 128, sy=1 / 128,
                    epsg=4326, tile_size=64, scale=1.0, offset=0.0)
    con = sqlite3.connect(p)
    con.execute("UPDATE dem SET tile_data=NULL WHERE tile_row=1 AND"
                " tile_column=1")
    con.commit()
    con.close()
    r = open_raster(p)
    win, _ = r.read_window(64, 128, 64, 128)
    assert np.isnan(win).all()
    win2, _ = r.read_window(0, 64, 0, 64)
    assert (win2 == 500.0).all()
