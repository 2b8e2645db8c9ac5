"""raster_stats / raster_histogram: numpy differential, nodata,
tiling invariance, bucket-edge discipline."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import rstats


@pytest.fixture(scope="module")
def tiles(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rstats"))
    rng = np.random.RandomState(9)
    full = rng.randint(-400, 3200, size=(120, 160)).astype(np.int16)
    full[10:20, 30:50] = -9999  # nodata block
    paths = []
    # write as 4 tiles AND as one mosaic
    for ty in range(2):
        for tx in range(2):
            blk = full[ty * 60:(ty + 1) * 60, tx * 80:(tx + 1) * 80]
            p = os.path.join(root, f"t_{ty}_{tx}.tif")
            geotiff.write_geotiff(p, blk, x0=tx * 80 * 0.01,
                                  y0=90 - ty * 60 * 0.01, sx=0.01, sy=0.01,
                                  epsg=4326, nodata=-9999)
            paths.append(p)
    mosaic = os.path.join(root, "mosaic.tif")
    geotiff.write_geotiff(mosaic, full, x0=0.0, y0=90.0, sx=0.01, sy=0.01,
                          epsg=4326, nodata=-9999)
    return full, paths, mosaic


def test_stats_match_numpy_and_tiling_invariant(spark, tiles):
    full, paths, mosaic = tiles
    v = full[full != -9999].astype(np.float64)
    got = rstats.raster_stats(spark, paths)
    assert got["n_valid"] == v.size
    assert got["n_nodata"] == (full == -9999).sum()
    assert got["vmin"] == v.min() and got["vmax"] == v.max()
    assert got["vsum"] == math.fsum(v.tolist())
    assert abs(got["mean"] - v.mean()) < 1e-9
    assert abs(got["stddev"] - v.std()) < 1e-9
    # 4 tiles and the single mosaic agree EXACTLY
    got1 = rstats.raster_stats(spark, [mosaic])
    for k in ("n_valid", "n_nodata", "vmin", "vmax", "vsum", "vsumsq"):
        assert got[k] == got1[k], k


def test_histogram_counts_and_edges(spark, tiles):
    full, paths, _ = tiles
    v = full[full != -9999].astype(np.float64)
    nb = 16
    out = {r.bucket: r["count"] for r in
           rstats.raster_histogram(spark, paths, n_buckets=nb).collect()}
    lo, hi = v.min(), v.max()
    idx = np.clip(np.floor((v - lo) * nb / (hi - lo)).astype(int),
                  0, nb - 1)
    want = np.bincount(idx, minlength=nb)
    assert [out[b] for b in range(nb)] == want.tolist()
    assert sum(out.values()) == v.size  # max folded into last bucket
    # explicit narrower bounds drop out-of-range cells
    mid = {r.bucket: r["count"] for r in rstats.raster_histogram(
        spark, paths, n_buckets=4, vmin=0.0, vmax=1000.0).collect()}
    inside = ((v >= 0) & (v <= 1000)).sum()
    assert sum(mid.values()) == inside


def test_validation(spark, tiles):
    _, paths, _ = tiles
    with pytest.raises(ValueError):
        rstats.raster_stats(spark, [])
    with pytest.raises(ValueError):
        rstats.raster_histogram(spark, paths, n_buckets=0)
    with pytest.raises(ValueError, match="exceed"):
        rstats.raster_histogram(spark, paths, vmin=5.0, vmax=5.0)
