"""Distributed raster sieve (gdal_sieve core).

Anchors: hand goldens for the largest-neighbour rule, tie-breaks,
simultaneous chain merges, nodata isolation; distributed == the
sequential twin (different labeling algorithm AND different merge
executor) on seam-crossing mosaics; the distributed-rounds path ==
the driver fast path; the rewrite pass preserves per-class cell
counts; refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import polygonize, sieve


def _write(path, klass, *, x0=0.0, y0=10.0, res=0.01):
    arr = np.where(klass < 0, -9999, klass).astype(np.int16)
    geotiff.write_geotiff(
        path, arr, x0=x0, y0=y0, sx=res, sy=res, epsg=4326, nodata=-9999
    )
    return path


def _tile_grid(tmp_path, klass_full, th, tw):
    H, W = klass_full.shape
    assert H % th == 0 and W % tw == 0
    tiles = []
    for iy in range(H // th):
        for ix in range(W // tw):
            sub = klass_full[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
            p = str(tmp_path / f"t_{iy}_{ix}.tif")
            _write(p, sub, x0=ix * tw * 0.01, y0=10.0 - iy * th * 0.01)
            tiles.append((iy, ix, p))
    return tiles


def _collect(spark, tiles, threshold, **kw):
    return sorted(
        (r.region_id, r.value, r.n_cells, r.n_tiles)
        for r in sieve.sieve_regions(spark, tiles, threshold,
                                     **kw).collect()
    )


class TestGolden:
    def test_small_island_merges_into_background(self, spark, tmp_path):
        k = np.zeros((8, 8), dtype=np.int64)
        k[3:5, 3:5] = 5  # 4-cell island
        tiles = _tile_grid(tmp_path, k, 8, 8)
        got = _collect(spark, tiles, threshold=5)
        assert got == [(0, 0, 64, 1)]
        # at-threshold regions survive (strict less-than, like GDAL)
        got4 = _collect(spark, tiles, threshold=4)
        assert got4 == [(0, 0, 60, 1), (3 * 8 + 3, 5, 4, 1)]

    def test_largest_neighbour_wins(self, spark, tmp_path):
        # columns: class 1 (3 wide), small class 9 (1 wide), class 2
        # (4 wide) -> the 9-stripe (8 cells) merges into the LARGER 2
        k = np.zeros((8, 8), dtype=np.int64)
        k[:, :3] = 1
        k[:, 3] = 9
        k[:, 4:] = 2
        tiles = _tile_grid(tmp_path, k, 8, 8)
        got = _collect(spark, tiles, threshold=10)
        assert got == [(0, 1, 24, 1), (4, 2, 40, 1)]

    def test_tie_breaks_to_smaller_region_id(self, spark, tmp_path):
        # equal-size neighbours (24 each) flanking an 8-cell stripe:
        # tie -> the neighbour with the smaller region id (the left one,
        # id 0) absorbs it
        k = np.zeros((8, 8), dtype=np.int64)
        k[:, :3] = 1
        k[:, 3] = 9
        k[:, 4:7] = 2
        k[:, 7] = -1  # nodata pad keeps the right block at 24 cells
        tiles = _tile_grid(tmp_path, k, 8, 8)
        got = _collect(spark, tiles, threshold=10)
        assert got == [(0, 1, 32, 1), (4, 2, 24, 1)]

    def test_nodata_isolated_small_region_survives(self, spark, tmp_path):
        k = np.zeros((8, 8), dtype=np.int64)
        k[2:6, 2:6] = -1
        k[3:5, 3:5] = 7  # 4-cell island inside a nodata moat
        tiles = _tile_grid(tmp_path, k, 8, 8)
        got = _collect(spark, tiles, threshold=100)
        # no neighbours -> stays, despite being far below threshold
        assert (3 * 8 + 3, 7, 4, 1) in got

    def test_chain_merges_simultaneously(self, spark, tmp_path):
        # two small stripes a(9) and b(8) between big 1 and big 2:
        # round 1: both pick their largest neighbour; all four classes
        # collapse per the documented simultaneous-component rule
        k = np.zeros((8, 10), dtype=np.int64)
        k[:, :4] = 1   # 32 cells
        k[:, 4] = 9    # 8 cells, neighbours: 1 (32) and 8-stripe (8)
        k[:, 5] = 8    # 8 cells, neighbours: 9 (8) and 2 (24)... sizes
        k[:, 6:9] = 2  # 24 cells
        k[:, 9] = -1
        tiles = _tile_grid(tmp_path, k, 8, 10)
        got = _collect(spark, tiles, threshold=10)
        # picks: 9 -> 1 (32 biggest), 8 -> 2 (24 biggest): two separate
        # components -> 1 grows to 40, 2 grows to 32
        assert got == [(0, 1, 40, 1), (6, 2, 32, 1)]

    def test_cross_seam_small_region(self, spark, tmp_path):
        # a 4-cell island straddling the 4-tile corner merges into the
        # background even though no single tile sees all of it
        k = np.zeros((8, 8), dtype=np.int64)
        k[3:5, 3:5] = 9
        tiles = _tile_grid(tmp_path, k, 4, 4)
        got = _collect(spark, tiles, threshold=5)
        assert got == [(0, 0, 64, 4)]


class TestTwinEquality:
    @pytest.fixture(scope="class")
    def banded(self, tmp_path_factory):
        rng = np.random.default_rng(23)
        z = (
            350 * np.sin(np.linspace(0, 7, 120))[None, :]
            + 250 * np.cos(np.linspace(0, 5, 120))[:, None]
            + rng.normal(0, 40, (120, 120))
        )
        k = np.clip((z + 700) // 200, 0, 6).astype(np.int64)
        k[50:60, 20:30] = -1
        tmp = tmp_path_factory.mktemp("sieve_banded")
        return _tile_grid(tmp, k, 40, 40), k

    def test_matches_sequential_twin(self, spark, banded):
        tiles, k = banded
        got = _collect(spark, tiles, threshold=12)
        exp = sieve.sieve_sequential(tiles, threshold=12)
        assert got == exp
        assert sum(n for _i, _v, n, _t in got) == (k != -1).sum()
        # sieving strictly reduces region count on this noisy fixture
        n_before = len(polygonize.label_regions_sequential(tiles))
        assert len(got) < n_before

    def test_distributed_rounds_match_driver_fast_path(
        self, spark, banded
    ):
        tiles, _k = banded
        fast = _collect(spark, tiles, threshold=12)
        dist = _collect(spark, tiles, threshold=12, local_threshold=0)
        assert fast == dist


class TestRewrite:
    def test_sieved_tiles_preserve_class_cell_counts(
        self, spark, tmp_path
    ):
        rng = np.random.default_rng(31)
        k = rng.integers(0, 3, (40, 40)).astype(np.int64)
        k[10:12, 10:12] = -1
        tiles = _tile_grid(tmp_path, k, 20, 20)
        out_dir = str(tmp_path / "sieved")
        manifest = sieve.sieve_tiles(
            spark, tiles, out_dir, threshold=6
        ).collect()
        assert len(manifest) == 4
        # stitch the rewritten tiles and compare per-class cell counts
        # against the sieve manifest (independent aggregation paths)
        counts: dict[int, int] = {}
        n_nodata = 0
        for row in manifest:
            r = geotiff.open_raster(row.path)
            arr = r.read_block(0, r.height, 0, r.width)
            vals = arr[np.isfinite(arr)].astype(np.int64)
            n_nodata += int((~np.isfinite(arr)).sum())
            for v, c in zip(*np.unique(vals, return_counts=True)):
                counts[int(v)] = counts.get(int(v), 0) + int(c)
        want: dict[int, int] = {}
        for r in sieve.sieve_regions(spark, tiles, 6).collect():
            want[int(r.value)] = want.get(int(r.value), 0) + int(r.n_cells)
        assert counts == want
        assert n_nodata == int((k == -1).sum())


class TestValidation:
    def test_threshold_below_one_refused(self, spark, tmp_path):
        p = _write(str(tmp_path / "a.tif"), np.zeros((4, 4), np.int64))
        with pytest.raises(ValueError, match="threshold"):
            sieve.sieve_regions(spark, [(0, 0, p)], 0)

    def test_empty_tiles_refused(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            sieve.sieve_regions(spark, [], 5)
