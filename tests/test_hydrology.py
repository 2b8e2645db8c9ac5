"""D8 hydrology tests.

Load-bearing assertion: the two-level distributed flow accumulation
(per-tile peel + border-graph solve + inflow re-peel) stitches to the
SAME grid as the single-process whole-mosaic computation — the tile
decomposition is invisible. Kernel semantics pinned by hand-computed
windows."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import hydrology, terrain


def _pad(z):
    p = np.full((z.shape[0] + 2, z.shape[1] + 2), np.nan)
    p[1:-1, 1:-1] = z
    return p


class TestFlowDirKernel:
    def test_cardinal_and_diagonal_codes(self):
        # center 5 with single lowest neighbor in each position
        base = np.full((3, 3), 9.0)
        base[1, 1] = 5.0
        expect = {(1, 2): 1, (2, 2): 2, (2, 1): 4, (2, 0): 8,
                  (1, 0): 16, (0, 0): 32, (0, 1): 64, (0, 2): 128}
        for (r, c), code in expect.items():
            z = base.copy()
            z[r, c] = 1.0
            d = terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")
            assert d.shape == (1, 1) and d[0, 0] == code, (r, c)

    def test_rate_not_drop_and_tiebreak(self):
        # diagonal drop 4 over sqrt(2) (rate 2.83) loses to east drop 3
        z = np.full((3, 3), 9.0)
        z[1, 1] = 5.0
        z[1, 2] = 2.0   # east, drop 3, dist 1
        z[2, 2] = 1.0   # southeast, drop 4, dist sqrt(2) -> rate 2.83
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 1.0
        # exact tie between E and SE: lowest code (E=1) wins
        z[1, 2] = 5.0 - 3.0
        z[2, 2] = 5.0 - 3.0 * np.sqrt(2.0)
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 1.0

    def test_anisotropic_cell_size(self):
        # sx=1 sy=3: south neighbor drop 2 (rate 2/3) loses to east drop 1
        z = np.full((3, 3), 9.0)
        z[1, 1] = 5.0
        z[1, 2] = 4.0
        z[2, 1] = 3.0
        assert terrain.terrain_kernel(z, 1.0, 3.0, "flow_dir")[0, 0] == 1.0
        # with square cells the south drop wins
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 4.0

    def test_pit_flat_nodata(self):
        z = np.full((3, 3), 5.0)  # flat -> 0
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 0.0
        z[1, 1] = 1.0             # pit -> 0
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 0.0
        # NODATA neighbors are EXCLUDED, never targeted
        z = np.full((3, 3), 9.0)
        z[1, 1] = 5.0
        z[1, 2] = np.nan   # the would-be steepest is missing
        z[2, 1] = 3.0
        assert terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0] == 4.0
        # NODATA center -> NaN out
        z[1, 1] = np.nan
        assert np.isnan(terrain.terrain_kernel(z, 1.0, 1.0, "flow_dir")[0, 0])


class TestGraphHelpers:
    def test_next_pointers_and_terminals(self):
        # 1x4 chain flowing east, last cell exits the grid eastward
        dirs = np.array([[1.0, 1.0, 1.0, 1.0]])
        nxt = hydrology.next_pointers(dirs)
        assert list(nxt) == [1, 2, 3, -2]
        term = hydrology.terminals(nxt)
        assert list(term) == [3, 3, 3, 3]
        # pit chain terminates internally
        dirs2 = np.array([[1.0, 1.0, 0.0, np.nan]])
        nxt2 = hydrology.next_pointers(dirs2)
        assert list(nxt2) == [1, 2, -1, -1]
        assert list(hydrology.terminals(nxt2)) == [2, 2, 2, 3]

    def test_peel_chain_and_confluence(self):
        # cells 0->2, 1->2, 2->3: acc = upstream load sums
        nxt = np.array([2, 2, 3, -1])
        loads = np.array([1.0, 1.0, 1.0, 1.0])
        valid = np.ones(4, dtype=bool)
        acc = hydrology.peel_accumulate(nxt, loads, valid)
        assert list(acc) == [0.0, 0.0, 2.0, 3.0]


def _write_tiles(tmp_path, mosaic, n_ty, n_tx, res=0.025):
    side_y = mosaic.shape[0] // n_ty
    side_x = mosaic.shape[1] // n_tx
    tiles = []
    for ty in range(n_ty):
        for tx in range(n_tx):
            arr = mosaic[ty * side_y:(ty + 1) * side_y,
                         tx * side_x:(tx + 1) * side_x]
            path = os.path.join(str(tmp_path), f"h_{ty}_{tx}.tif")
            geotiff.write_geotiff(
                path, arr.astype(np.float64), x0=10.0 + tx * side_x * res,
                y0=1.0 - ty * side_y * res, sx=res, sy=res, epsg=4326,
                nodata=-9999,
            )
            tiles.append((n_ty - 1 - ty, tx, path))
    return tiles


def _stitch(out_dir, n_ty, n_tx, side_y, side_x):
    full = np.full((n_ty * side_y, n_tx * side_x), np.nan)
    for path in glob.glob(os.path.join(out_dir, "flow_acc_*.tif")):
        iy, ix = map(int, os.path.basename(path)[:-4].split("_")[2:])
        r = geotiff.open_raster(path)
        band = r.read_block(0, r.height, 0, r.width)
        ty = n_ty - 1 - iy
        full[ty * side_y:(ty + 1) * side_y,
             ix * side_x:(ix + 1) * side_x] = band
    return full


def _check_differential(spark, tmp_path, mosaic, n_ty, n_tx, **kw):
    tiles = _write_tiles(tmp_path, mosaic, n_ty, n_tx)
    out_dir = os.path.join(str(tmp_path), "acc_out")
    m = hydrology.flow_accumulation(spark, tiles, out_dir, **kw)
    rows = m.collect()
    assert all(r.error is None for r in rows), [r.error for r in rows]
    got = _stitch(out_dir, n_ty, n_tx,
                  mosaic.shape[0] // n_ty, mosaic.shape[1] // n_tx)
    want = hydrology.mosaic_flow_accumulation(mosaic, 0.025, 0.025)
    want32 = np.where(np.isfinite(want), want, np.nan).astype(np.float32)
    finite = np.isfinite(want32)
    assert (np.isfinite(got) == finite).all()
    assert np.array_equal(got[finite].astype(np.float32), want32[finite])
    # manifest checksums equal the stitched sums per tile (lineage)
    side_y = mosaic.shape[0] // n_ty
    side_x = mosaic.shape[1] // n_tx
    for r in rows:
        ty = n_ty - 1 - r.tile_iy
        blk = want32[ty * side_y:(ty + 1) * side_y,
                     r.tile_ix * side_x:(r.tile_ix + 1) * side_x]
        fin = np.isfinite(blk)
        assert r.n_valid == int(fin.sum())
        assert abs(r.checksum - round(float(blk[fin].astype(np.float64).sum()), 3)) < 1e-6
    return rows


def test_tilted_plane_cross_tile_river(spark, tmp_path):
    """A plane tilted east: every row is one long west->east flow line
    crossing both tile columns — accumulation along each row is
    0,1,2,...,W-1 and the border handoff must be exact."""
    H, W = 24, 32
    x = np.arange(W) * 1.0
    mosaic = np.tile(100.0 - x, (H, 1))
    rows = _check_differential(spark, tmp_path, mosaic, 2, 2)
    # closed form: stitched east edge column = W-1 upstream cells
    out_dir = os.path.join(str(tmp_path), "acc_out")
    got = _stitch(out_dir, 2, 2, 12, 16)
    assert np.array_equal(got[:, -1], np.full(H, W - 1, dtype=np.float32))
    assert np.array_equal(got[:, 0], np.zeros(H, dtype=np.float32))


def test_random_surface_with_pits_and_nodata(spark, tmp_path):
    rng = np.random.default_rng(77)
    H, W = 60, 80
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = (
        40.0 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        + 0.2 * xx - 0.1 * yy + rng.normal(0, 0.5, (H, W))
    )
    mosaic[10:14, 20:26] = np.nan          # a NODATA lake
    mosaic[40, 55] = mosaic.min() - 5.0    # a deep pit
    _check_differential(spark, tmp_path, mosaic, 3, 4)


def test_distributed_border_solve_matches_local(spark, tmp_path):
    """local_threshold=0 forces the iterative-join phase B — same
    stitched output as the driver-side Kahn peel."""
    rng = np.random.default_rng(5)
    H, W = 40, 40
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = 30.0 * np.cos(xx / 6.0) + 0.3 * yy + rng.normal(0, 0.3, (H, W))
    _check_differential(spark, tmp_path, mosaic, 2, 2, local_threshold=0)


def test_flow_dir_tiles_seamless(spark, tmp_path):
    """flow_dir rides terrain_tiles unchanged: stitched == mosaic."""
    rng = np.random.default_rng(3)
    H, W = 40, 40
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = 20.0 * np.sin(xx / 5.0) + 0.2 * yy + rng.normal(0, 0.4, (H, W))
    tiles = _write_tiles(tmp_path, mosaic, 2, 2)
    out_dir = os.path.join(str(tmp_path), "dir_out")
    m = terrain.terrain_tiles(spark, tiles, out_dir, kind="flow_dir")
    assert all(r.error is None for r in m.collect())
    got = np.full((H, W), np.nan)
    for path in glob.glob(os.path.join(out_dir, "flow_dir_*.tif")):
        iy, ix = map(int, os.path.basename(path)[:-4].split("_")[2:])
        r = geotiff.open_raster(path)
        band = r.read_block(0, r.height, 0, r.width)
        ty = 2 - 1 - iy
        got[ty * 20:(ty + 1) * 20, ix * 20:(ix + 1) * 20] = band
    want = hydrology.flow_direction_grid(_pad(mosaic), 0.025, 0.025)
    fin = np.isfinite(want)
    assert (np.isfinite(got) == fin).all()
    assert np.array_equal(got[fin], want[fin])


def test_overlapping_grid_refused(spark, raster_root):
    """SRTM-style 1-px-overlap tiles would double-count shared cells —
    the operator must refuse them loudly, not answer wrong."""
    import pytest as _pytest

    paths = sorted(glob.glob(os.path.join(
        raster_root, "test-srtm90m-subset", "*.tif")))
    tiles = [(0, 10 + i, p) for i, p in enumerate(paths)]
    with _pytest.raises(Exception, match="NON-OVERLAPPING"):
        hydrology.flow_accumulation(
            spark, tiles, "/tmp/never_written_flowacc"
        ).collect()


def test_resume_skip_existing(spark, tmp_path):
    """skip_existing: a re-run recomputes only missing tiles; skipped
    tiles' manifest rows are re-derived from the stored files, so the
    manifest stays complete and identical."""
    rng = np.random.default_rng(12)
    H = W = 40
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = 12.0 * np.sin(xx / 5.0) + 0.25 * yy + rng.normal(0, 0.3, (H, W))
    tiles = _write_tiles(tmp_path, mosaic, 2, 2)
    out_dir = os.path.join(str(tmp_path), "acc_out")
    m1 = {(r.tile_iy, r.tile_ix): (r.n_valid, r.checksum)
          for r in hydrology.flow_accumulation(spark, tiles, out_dir).collect()}
    paths = sorted(glob.glob(os.path.join(out_dir, "flow_acc_*.tif")))
    mt = {p: os.path.getmtime(p) for p in paths}
    # delete one tile; the resume run rewrites only that one
    os.remove(paths[0])
    m2 = {(r.tile_iy, r.tile_ix): (r.n_valid, r.checksum)
          for r in hydrology.flow_accumulation(
              spark, tiles, out_dir, skip_existing=True).collect()}
    assert m1 == m2
    for p in paths[1:]:
        assert os.path.getmtime(p) == mt[p]   # untouched
    assert os.path.exists(paths[0])            # recomputed
