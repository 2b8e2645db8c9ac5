"""Overview/resample tests: exact block means, NaN handling, ragged
edges, georeferencing of outputs, and elevation parity when the engine
serves the overview dataset (resampled tiles remain valid rasters)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import resample


def test_block_reduce_exact():
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = resample.block_reduce(a, 2, "average")
    assert np.array_equal(out, [[2.5, 4.5], [10.5, 12.5]])
    assert np.array_equal(resample.block_reduce(a, 2, "nearest"),
                          [[0.0, 2.0], [8.0, 10.0]])
    assert np.array_equal(resample.block_reduce(a, 1, "average"), a)


def test_block_reduce_nan_and_ragged():
    a = np.arange(9, dtype=np.float64).reshape(3, 3)
    a[0, 1] = np.nan
    out = resample.block_reduce(a, 2, "average")
    assert out.shape == (2, 2)
    assert out[0, 0] == (0.0 + 3.0 + 4.0) / 3  # NaN excluded from mean
    assert out[0, 1] == (2.0 + 5.0) / 2        # ragged right edge
    assert out[1, 1] == 8.0                    # 1x1 corner block
    allnan = np.full((2, 2), np.nan)
    assert np.isnan(resample.block_reduce(allnan, 2, "average")).all()


def test_resample_tiles_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(11)
    arr = rng.normal(100.0, 10.0, (30, 20))
    arr[5:9, 3:7] = -32768.0  # nodata hole
    src = os.path.join(str(tmp_path), "src.tif")
    geotiff.write_geotiff(
        src, arr.astype(np.float64), x0=10.0, y0=1.0, sx=0.01, sy=0.01,
        epsg=4326, nodata=-32768.0,
    )
    m = resample.resample_tiles(
        spark, [(0, 0, src)], str(tmp_path / "ovr"), factor=4,
        dtype="float64",
    ).collect()
    assert len(m) == 1 and m[0]["error"] is None
    r = geotiff.open_raster(m[0]["path"])
    assert (r.width, r.height) == (5, 8)  # ceil(20/4), ceil(30/4)
    assert (r.x0, r.y0) == (10.0, 1.0)
    assert r.res == (0.04, 0.04)
    masked = np.where(arr == -32768.0, np.nan, arr)
    expected = resample.block_reduce(masked, 4, "average")
    got = r.read_block(0, 8, 0, 5)
    assert np.array_equal(got, expected, equal_nan=True)
    assert m[0]["n_valid"] == int(np.isfinite(expected).sum())


def test_resample_then_serve(spark, raster_root, tmp_path):
    """The written overview is a fully valid dataset: the elevation
    oracle can sample it, and values equal block means of the source."""
    import glob

    from opentopodata_spark import oracle

    src = sorted(glob.glob(
        os.path.join(raster_root, "test-srtm90m-subset", "*.tif")
    ))[0]
    m = resample.resample_tiles(
        spark, [(0, 10, src)], str(tmp_path / "ovr"), factor=10,
        dtype="float64",
    ).collect()
    path = m[0]["path"]
    r = geotiff.open_raster(path)
    # center of overview pixel (3, 4)
    lat = r.y0 - 3.5 * r.res[1]
    lon = r.x0 + 4.5 * r.res[0]
    [z] = oracle.get_elevation_from_path([lat], [lon], path, "nearest")
    srcr = geotiff.open_raster(src)
    block = srcr.read_block(30, 40, 40, 50)
    assert z == pytest.approx(np.nanmean(block), abs=1e-9)
