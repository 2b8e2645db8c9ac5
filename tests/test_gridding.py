"""Distributed scattered-point gridding (gdal_grid core).

Anchors: exact-hit and weight goldens, every algorithm distributed ==
the brute per-node sequential twin BIT-exactly (seam-hugging points,
ellipse rotation, min/max_points), the all-points broadcast path,
full-tile-cover manifests, refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators.gridding import (
    grid_points, grid_sequential,
)
from opentopodata_spark.operators.rasterize import GridSpec


def _points_df(spark, pts):
    return spark.createDataFrame(
        [(float(la), float(lo), float(v)) for la, lo, v in pts],
        "lat double, lon double, value double",
    )


def _seeded_points(n=400, seed=7, lat0=10.30, lat1=11.05, lon0=3.95,
                   lon1=5.00):
    rng = np.random.default_rng(seed)
    la = rng.uniform(lat0, lat1, n)
    lo = rng.uniform(lon0, lon1, n)
    v = np.round(rng.uniform(-50, 300, n), 3)
    return list(zip(la.tolist(), lo.tolist(), v.tolist()))


# 3x2 tiles of 16x16 nodes, 0.02-degree cells over lon [4,7) lat (9.04..11]
_GRID = GridSpec(x0=4.0, y0=11.0, sx=0.02, sy=0.02, width=48, height=32)


def _run(spark, tmp_path, pts, **kw):
    m = grid_points(
        spark, _points_df(spark, pts), _GRID, str(tmp_path / "out"),
        tile_px=16, **kw,
    ).collect()
    return sorted((r.tile_iy, r.tile_ix, r.n_valid, r.checksum)
                  for r in m), {
        (r.tile_iy, r.tile_ix): r.path for r in m}


class TestGoldens:
    def test_exact_node_hit_returns_point_value(self, spark, tmp_path):
        # node (row 0, col 0) center = (lon 4.01, lat 10.99)
        pts = [(10.99, 4.01, 123.5), (10.5, 5.0, 7.0)]
        _m, paths = _run(spark, tmp_path, pts,
                         algorithm="invdist", radius1=0.1, radius2=0.1)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[0, 0] == np.float32(123.5)

    def test_coincident_points_lowest_id_wins(self, spark, tmp_path):
        # two different values at the same node center: pid order is
        # (lat, lon, value) — the SMALLER value ranks first
        pts = [(10.99, 4.01, 200.0), (10.99, 4.01, 50.0)]
        _m, paths = _run(spark, tmp_path, pts,
                         algorithm="invdist", radius1=0.05,
                         radius2=0.05)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[0, 0] == np.float32(50.0)

    def test_idw_two_point_weighting(self, spark, tmp_path):
        # node (0,0) center (4.01, 10.99); p1 one cell east (d=0.02),
        # p2 three cells east (d=0.06): w1/w2 = 9 at power 2
        pts = [(10.99, 4.03, 10.0), (10.99, 4.07, 100.0)]
        _m, paths = _run(spark, tmp_path, pts,
                         algorithm="invdist", radius1=0.1, radius2=0.1)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        expect = (9 * 10.0 + 1 * 100.0) / 10.0
        assert np.isclose(a[0, 0], expect, atol=1e-4)

    def test_nearest_and_metrics(self, spark, tmp_path):
        pts = [(10.99, 4.03, 10.0), (10.99, 4.07, 100.0)]
        for alg, expect in [("nearest", 10.0), ("minimum", 10.0),
                            ("maximum", 100.0), ("range", 90.0),
                            ("count", 2.0)]:
            _m, paths = _run(spark, tmp_path, pts, algorithm=alg,
                             radius1=0.1, radius2=0.1)
            a = geotiff.open_raster(
                paths[(0, 0)]).read_block(0, 16, 0, 16)
            assert a[0, 0] == np.float32(expect), alg

    def test_outside_radius_is_nodata(self, spark, tmp_path):
        pts = [(10.99, 4.01, 5.0)]
        _m, paths = _run(spark, tmp_path, pts,
                         algorithm="invdist", radius1=0.03,
                         radius2=0.03)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[0, 0] == np.float32(5.0)
        assert np.isnan(a[10, 10])  # reader maps NODATA -> NaN

    def test_min_points_gates_all_algorithms(self, spark, tmp_path):
        pts = [(10.99, 4.01, 5.0)]
        for alg in ("invdist", "average", "count"):
            _m, paths = _run(spark, tmp_path, pts, algorithm=alg,
                             radius1=0.05, radius2=0.05, min_points=2)
            a = geotiff.open_raster(
                paths[(0, 0)]).read_block(0, 16, 0, 16)
            assert np.isnan(a[0, 0]), alg


class TestTwinEquality:
    """Distributed manifest == brute-force sequential twin, bit-exact
    (checksums are rounded sums of the identical float32 cells)."""

    @pytest.mark.parametrize("alg,kw", [
        ("invdist", dict(radius1=0.08, radius2=0.08)),
        ("invdist", dict(radius1=0.08, radius2=0.08, power=3.5,
                         smoothing=0.01)),
        ("invdist", dict(radius1=0.12, radius2=0.05, angle=30.0)),
        ("invdistnn", dict(radius1=0.15, radius2=0.15, max_points=6)),
        ("average", dict(radius1=0.07, radius2=0.07, min_points=2)),
        ("nearest", dict(radius1=0.06, radius2=0.06)),
        ("minimum", dict(radius1=0.09, radius2=0.09)),
        ("maximum", dict(radius1=0.09, radius2=0.09)),
        ("range", dict(radius1=0.09, radius2=0.09)),
        ("count", dict(radius1=0.09, radius2=0.09)),
        ("average_distance", dict(radius1=0.09, radius2=0.09)),
    ])
    def test_algorithms_match_twin(self, spark, tmp_path, alg, kw):
        pts = _seeded_points(300)
        got, _paths = _run(spark, tmp_path, pts, algorithm=alg, **kw)
        want = grid_sequential(pts, _GRID, algorithm=alg, tile_px=16,
                               **kw)
        assert got == want

    def test_seam_hugging_points(self, spark, tmp_path):
        # points sitting exactly on tile node-bbox boundaries and at
        # exactly radius distance from seam nodes
        pts = [
            (11.0 - 16 * 0.02, 4.0 + 16 * 0.02, 10.0),   # tile corner
            (10.99, 4.0 + 16 * 0.02 + 0.01 - 0.08, 20.0),
            (11.0 - (16 + 0.5) * 0.02, 4.33, 30.0),      # seam row node y
        ] + _seeded_points(60, seed=13)
        kw = dict(radius1=0.08, radius2=0.08)
        got, _ = _run(spark, tmp_path, pts, algorithm="invdist", **kw)
        want = grid_sequential(pts, _GRID, algorithm="invdist",
                               tile_px=16, **kw)
        assert got == want

    def test_all_points_broadcast_path(self, spark, tmp_path):
        pts = _seeded_points(80, seed=3)
        got, _ = _run(spark, tmp_path, pts, algorithm="invdist",
                      power=2.0, smoothing=0.005)
        want = grid_sequential(pts, _GRID, algorithm="invdist",
                               power=2.0, smoothing=0.005, tile_px=16)
        assert got == want

    def test_full_tile_cover_with_empty_tiles(self, spark, tmp_path):
        # one point in one corner: every one of the 2x3 tiles still
        # reports, uncovered ones all-NODATA
        pts = [(10.99, 4.01, 5.0)]
        got, paths = _run(spark, tmp_path, pts, algorithm="invdist",
                          radius1=0.03, radius2=0.03)
        assert len(got) == 6 and len(paths) == 6
        empties = [r for r in got if r[2] == 0]
        assert len(empties) == 5
        a = geotiff.open_raster(paths[(1, 2)]).read_block(0, 16, 0, 16)
        assert np.isnan(a).all()


class TestRefusals:
    def test_unknown_algorithm(self, spark):
        with pytest.raises(ValueError, match="unknown algorithm"):
            grid_points(spark, _points_df(spark, []), _GRID, None,
                        algorithm="kriging", radius1=1, radius2=1)

    def test_mixed_zero_radius(self, spark):
        with pytest.raises(ValueError, match="both"):
            grid_points(spark, _points_df(spark, []), _GRID, None,
                        radius1=0.1, radius2=0.0)

    def test_invdistnn_defaults_max_points_12(self, spark, tmp_path):
        pts = _seeded_points(100, seed=21)
        got, _ = _run(spark, tmp_path, pts, algorithm="invdistnn",
                      radius1=0.2, radius2=0.2)  # max_points defaulted
        want = grid_sequential(pts, _GRID, algorithm="invdist",
                               radius1=0.2, radius2=0.2, max_points=12,
                               tile_px=16)
        assert got == want

    def test_broadcast_limit_refusal(self, spark):
        pts = _seeded_points(30)
        with pytest.raises(ValueError, match="all-points"):
            grid_points(spark, _points_df(spark, pts), _GRID, None,
                        broadcast_limit=10).collect()

    def test_nan_points_are_dropped(self, spark, tmp_path):
        pts = [(10.99, 4.03, 10.0)]
        df = _points_df(spark, pts).unionByName(
            spark.createDataFrame(
                [(float("nan"), 4.03, 99.0), (10.99, 4.03, float("nan"))],
                "lat double, lon double, value double",
            )
        )
        m = grid_points(
            spark, df, _GRID, str(tmp_path / "o"), algorithm="invdist",
            radius1=0.05, radius2=0.05, tile_px=16,
        ).collect()
        got = sorted((r.tile_iy, r.tile_ix, r.n_valid, r.checksum)
                     for r in m)
        want = grid_sequential(pts, _GRID, algorithm="invdist",
                               radius1=0.05, radius2=0.05, tile_px=16)
        assert got == want
