"""Distributed raster reprojection (gdalwarp twin).

Reference note: the reference prepares its served datasets with gdalwarp
(/root/reference/docs/datasets/gebco2020.md:104, nzdem.md:69) and its
test corpus carries a gdalwarp-derived UTM variant of the SRTM fixture
(tests/data/datasets/test-srtm90m-subset-utm). warp_tiles is that step
as a per-output-tile Spark map; these tests pin identity exactness,
cross-CRS analytic parity, distributed == sequential, NODATA discipline,
and the suggested-extent cover.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from opentopodata_spark import fixtures, geotiff
from opentopodata_spark import crs as _crs
from opentopodata_spark.operators import warp


def _write_src(path, arr, *, x0=10.0, y0=1.0, res=0.01, epsg=4326,
               nodata=-9999.0):
    geotiff.write_geotiff(
        path, arr, x0=x0, y0=y0, sx=res, sy=res, epsg=epsg, nodata=nodata
    )
    return path


def _rand(h, w, seed=0, nodata=None, hole=None):
    rng = np.random.default_rng(seed)
    arr = rng.normal(400.0, 80.0, (h, w)).astype(np.float32)
    if hole is not None:
        r0, r1, c0, c1 = hole
        arr[r0:r1, c0:c1] = nodata
    return arr


@pytest.fixture(scope="module")
def srtm_paths(raster_root):
    d = os.path.join(raster_root, "test-srtm90m-subset")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".tif")
    )


class TestIdentityWarp:
    def test_bilinear_identity_is_exact(self, spark, tmp_path):
        arr = _rand(40, 50, seed=3, nodata=-9999.0, hole=(5, 9, 7, 12))
        src = _write_src(str(tmp_path / "s.tif"), arr)
        m = warp.warp_tiles(
            spark, [src], str(tmp_path / "o"),
            dst_epsg=4326, dst_res=(0.01, 0.01),
            dst_bounds=(10.0, 1.0 - 0.4, 10.5, 1.0), tile_px=64,
        ).collect()
        assert len(m) == 1 and m[0].error is None
        out = geotiff.open_raster(m[0].path)
        got = out.read_window(0, 40, 0, 50)[0]
        # same grid, bilinear at exact pixel centers == the pixel values.
        # Hole-ADJACENT pixels may legally null: float rounding can give
        # the neighbor a ~1e-14 kernel weight, and any nonzero weight on
        # NODATA poisons the kernel (reference backend semantics).
        ring = np.zeros_like(arr, dtype=bool)
        ring[4:10, 6:13] = True
        ring[5:9, 7:12] = False
        np.testing.assert_array_equal(got[~ring], arr[~ring])
        assert (got[5:9, 7:12] == -9999.0).all()
        assert (out.x0, out.y0) == (10.0, 1.0)

    def test_nearest_identity_is_exact(self, spark, tmp_path):
        arr = _rand(33, 21, seed=4, nodata=-9999.0, hole=(1, 3, 1, 3))
        src = _write_src(str(tmp_path / "s.tif"), arr)
        m = warp.warp_tiles(
            spark, [src], str(tmp_path / "o"), method="nearest",
            dst_epsg=4326, dst_res=(0.01, 0.01),
            dst_bounds=(10.0, 1.0 - 0.33, 10.21, 1.0), tile_px=64,
        ).collect()
        out = geotiff.open_raster(m[0].path)
        np.testing.assert_array_equal(out.read_window(0, 33, 0, 21)[0], arr)


class TestCrossCrs:
    def test_warp_to_utm_matches_analytic_terrain(self, spark, tmp_path,
                                                  srtm_paths):
        """SRTM fixture (4326, analytic terrain) -> EPSG:32632 at ~250 m.
        Every finite output pixel must sit within rounding+interpolation
        tolerance of the analytic terrain evaluated at that pixel's true
        WGS84 position — the same cross-CRS equivalence the reference's
        gdalwarp-derived UTM fixture encodes."""
        res = 250.0
        m = warp.warp_tiles(
            spark, srtm_paths, str(tmp_path / "utm"),
            dst_epsg=32632, dst_res=(res, res), tile_px=256,
        ).collect()
        assert all(r.error is None for r in m)
        tm = _crs.get_transformer(epsg=32632).proj
        checked = 0
        for row in m:
            r = geotiff.open_raster(row.path)
            band = r.read_block(0, r.height, 0, r.width)  # nodata -> NaN
            xs = r.x0 + (np.arange(r.width) + 0.5) * r.res[0]
            ys = r.y0 - (np.arange(r.height) + 0.5) * r.res[1]
            X, Y = np.meshgrid(xs, ys)
            lon, lat = tm.inverse(X.ravel(), Y.ravel())
            exp = fixtures.terrain_wgs84(lat, lon).reshape(band.shape)
            finite = np.isfinite(band)
            assert finite.any()
            # int16-rounded source (±0.5) + bilinear curvature on a
            # 1/1200-degree grid of a smooth field
            np.testing.assert_allclose(
                band[finite], exp[finite], atol=1.0
            )
            checked += int(finite.sum())
        assert checked > 10000

    def test_distributed_equals_sequential(self, spark, tmp_path,
                                           srtm_paths):
        kw = dict(dst_epsg=32632, dst_res=(400.0, 400.0), tile_px=192)
        m = {
            (r.tile_ty, r.tile_tx): r
            for r in warp.warp_tiles(
                spark, srtm_paths, str(tmp_path / "o"), **kw
            ).collect()
        }
        seq = warp.warp_tiles_sequential(srtm_paths, **kw)
        assert len(seq) == len(m)
        for ty, tx, w, h, n_valid, checksum, band in seq:
            row = m[(ty, tx)]
            assert row.error is None
            assert (row.width, row.height) == (w, h)
            assert row.n_valid == n_valid
            assert row.checksum == checksum
            got = geotiff.open_raster(row.path)
            got_band = got.read_block(0, got.height, 0, got.width)
            exp = np.where(band == -9999.0, np.nan, band.astype(np.float64))
            np.testing.assert_array_equal(got_band, exp)


class TestCoverage:
    def test_uncovered_area_is_nodata(self, spark, tmp_path):
        arr = _rand(20, 20, seed=9)
        src = _write_src(str(tmp_path / "s.tif"), arr)
        # destination pane twice as wide as the source
        m = warp.warp_tiles(
            spark, [src], str(tmp_path / "o"),
            dst_epsg=4326, dst_res=(0.01, 0.01),
            dst_bounds=(10.0, 1.0 - 0.2, 10.4, 1.0), tile_px=64,
        ).collect()
        out = geotiff.open_raster(m[0].path)
        band = out.read_block(0, 20, 0, 40)  # nodata -> NaN
        assert np.isfinite(band[:, :20]).all()
        assert np.isnan(band[:, 21:]).all()  # east half: no source

    def test_sparse_extent_prunes_empty_tiles(self, spark, tmp_path):
        """A tiny source inside a huge target extent: far tiles are
        provably empty (driver-side dst-bbox prune), write pure NODATA
        with zero coordinate transforms, and the distributed run still
        equals the sequential twin exactly."""
        arr = _rand(20, 20, seed=5)
        src = _write_src(str(tmp_path / "s.tif"), arr)
        kw = dict(
            dst_epsg=4326, dst_res=(0.01, 0.01),
            dst_bounds=(8.0, -1.0, 13.0, 2.0), tile_px=64,
        )
        keys_w, keys_h = -(-500 // 64), -(-300 // 64)
        _wgs, src_dst = warp._source_metadata([src], 4326, None)
        active, empty = warp._active_keys(
            [(ty, tx) for ty in range(keys_h) for tx in range(keys_w)],
            src_dst, kw["dst_bounds"], kw["dst_res"], 64, 500, 300,
        )
        assert len(active) < len(active) + len(empty)
        assert len(empty) >= 30  # most of the 40-tile pane is empty
        m = {
            (r.tile_ty, r.tile_tx): r
            for r in warp.warp_tiles(
                spark, [src], str(tmp_path / "o"), **kw
            ).collect()
        }
        seq = warp.warp_tiles_sequential([src], **kw)
        assert len(seq) == len(m) == len(active) + len(empty)
        for ty, tx, w, h, n_valid, checksum, _band in seq:
            row = m[(ty, tx)]
            assert row.error is None
            assert (row.n_valid, row.checksum) == (n_valid, checksum)
        covered = sum(r[4] for r in seq)
        assert covered == 20 * 20  # exactly the source's pixels

    def test_suggest_bounds_cover_source_corners(self, srtm_paths):
        xmin, ymin, xmax, ymax = warp.suggest_dst_bounds(
            srtm_paths, dst_epsg=32632
        )
        for p in srtm_paths:
            r = geotiff.open_raster(p)
            b = r.bounds
            lats = np.array([b.top, b.top, b.bottom, b.bottom])
            lons = np.array([b.left, b.right, b.left, b.right])
            xs, ys = _crs.reproject_latlons(lats, lons, epsg=32632)
            assert (xs >= xmin - 1e-6).all() and (xs <= xmax + 1e-6).all()
            assert (ys >= ymin - 1e-6).all() and (ys <= ymax + 1e-6).all()


def test_plan_shape_one_exchange_no_joins(spark, tmp_path, srtm_paths):
    """The warp is ONE round-robin exchange of bare tile keys into the
    per-tile mapInPandas — a join node or second exchange would be a
    scale regression (pixel data never shuffles at all)."""
    df = warp.warp_tiles(
        spark, srtm_paths, str(tmp_path / "o"),
        dst_epsg=32632, dst_res=(400.0, 400.0), tile_px=192,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    wide = [ln for ln in plan.splitlines()
            if "Exchange" in ln and "BroadcastExchange" not in ln]
    assert len(wide) == 1, plan
    assert "Join" not in plan, plan


def test_elevation_through_warped_dataset(spark, tmp_path, srtm_paths):
    """Cross-operator anchor: resolve elevations from the WARPED (UTM)
    tiles and from the original 4326 tiles — same analytic terrain, so
    interior points agree to re-gridding tolerance. This is exactly the
    reference's own use of gdalwarp output (its UTM fixture is served
    by the same backend as the original)."""
    from opentopodata_spark.config import SingleFileDataset, dataset_from_config
    from opentopodata_spark.operators import elevation

    out = str(tmp_path / "utm_ds")
    m = warp.warp_tiles(
        spark, srtm_paths, out, dst_epsg=32632,
        dst_res=(120.0, 120.0), tile_px=4096,  # one output tile
    ).collect()
    assert len(m) == 1 and m[0].error is None
    ds_utm = SingleFileDataset("utm", tile_path=m[0].path)
    ds_src = dataset_from_config(
        name="src", path=os.path.dirname(srtm_paths[0])
    )
    pts = spark.createDataFrame(
        [(i, 0.2 + 0.06 * i, 10.3 + 0.12 * i) for i in range(10)],
        "point_id long, lat double, lon double",
    )
    res_u = {
        r.point_id: r.elevation
        for r in elevation.ElevationResolver(spark, [ds_utm], "bilinear")
        .resolve(pts).collect()
    }
    res_s = {
        r.point_id: r.elevation
        for r in elevation.ElevationResolver(spark, [ds_src], "bilinear")
        .resolve(pts).collect()
    }
    assert set(res_u) == set(res_s) == set(range(10))
    for i in range(10):
        assert res_u[i] == pytest.approx(res_s[i], abs=1.5)


def test_remote_sources_match_local(spark, tmp_path, srtm_paths):
    """Warp from http:// sources (byte-range windowed reads on the
    executors) must equal the local-file warp bit-for-bit — the 100 TB
    deployment shape, where source tiles live on object storage."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(__file__))
    from test_remote_raster import _serve

    kw = dict(dst_epsg=32632, dst_res=(1500.0, 1500.0), tile_px=128)
    root = os.path.dirname(srtm_paths[0])
    srv, base = _serve(root)
    try:
        urls = [f"{base}/{os.path.basename(p)}" for p in srtm_paths]
        m_r = {
            (r.tile_ty, r.tile_tx): r
            for r in warp.warp_tiles(
                spark, urls, str(tmp_path / "r"), **kw
            ).collect()
        }
    finally:
        srv.shutdown()
    m_l = {
        (r.tile_ty, r.tile_tx): r
        for r in warp.warp_tiles(
            spark, srtm_paths, str(tmp_path / "l"), **kw
        ).collect()
    }
    assert set(m_r) == set(m_l) and len(m_r) >= 1
    for k, rl in m_l.items():
        rr = m_r[k]
        assert rr.error is None and rl.error is None
        assert (rr.n_valid, rr.checksum) == (rl.n_valid, rl.checksum)


class TestValidation:
    def test_bad_method_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="interpolation"):
            warp.warp_tiles(
                spark, ["x.tif"], str(tmp_path), method="lanczos",
                dst_res=(1.0, 1.0),
            )

    def test_both_epsg_and_wkt_raise(self, spark, tmp_path):
        with pytest.raises(ValueError, match="only one"):
            warp.warp_tiles(
                spark, ["x.tif"], str(tmp_path), dst_epsg=4326,
                dst_wkt="PROJCS[...]", dst_res=(1.0, 1.0),
            )

    def test_no_sources_raise(self, spark, tmp_path):
        with pytest.raises(ValueError, match="at least one"):
            warp.warp_tiles(spark, [], str(tmp_path), dst_res=(1.0, 1.0))
