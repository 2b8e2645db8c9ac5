"""Polygon/line burning (gdal_rasterize core).

Anchors: hand goldens (square fill, hole punch-out, paint-order
overwrite, add accumulation, invert, all_touched edge touch, open
lines), distributed == the per-pixel scalar sequential twin BIT-exactly
on random polygon soups crossing tile seams, refusals.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators.rasterize import (
    GridSpec, burn_features, burn_sequential,
)

# 2x3 tiles of 16px: 0.1-degree cells over lon [0, 4.8) lat (6.8, 10]
_GRID = GridSpec(x0=0.0, y0=10.0, sx=0.1, sy=0.1, width=48, height=32)


def _ring(lats, lons):
    return {"lats": [float(v) for v in lats],
            "lons": [float(v) for v in lons]}


def _rect(lat0, lat1, lon0, lon1):
    return _ring([lat0, lat0, lat1, lat1], [lon0, lon1, lon1, lon0])


def _df(spark, feats):
    rows = [
        (i, [(r["lats"], r["lons"]) for r in ft["rings"]],
         float(ft["burn"]))
        for i, ft in enumerate(feats)
    ]
    return spark.createDataFrame(
        rows,
        "order_idx long, "
        "rings array<struct<lats:array<double>,lons:array<double>>>, "
        "burn double",
    )


def _run(spark, tmp_path, feats, **kw):
    m = burn_features(
        spark, _df(spark, feats), _GRID, str(tmp_path / "out"),
        tile_px=16, **kw,
    ).collect()
    return sorted((r.tile_iy, r.tile_ix, r.n_burned, r.checksum)
                  for r in m), {
        (r.tile_iy, r.tile_ix): r.path for r in m}


def _rand_feats(n, seed, max_holes=1):
    """Random star-convex polygon soup spanning tile seams."""
    rng = np.random.default_rng(seed)
    feats = []
    for _i in range(n):
        cy = rng.uniform(7.0, 9.9)
        cx = rng.uniform(0.2, 4.6)
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.15, 0.9, nv)
        rings = [_ring(cy + rad * np.sin(ang), cx + rad * np.cos(ang))]
        if max_holes and rng.random() < 0.5:
            hr = rad.min() * rng.uniform(0.2, 0.6)
            ha = np.sort(rng.uniform(0, 2 * np.pi, 4))
            rings.append(_ring(cy + hr * np.sin(ha),
                               cx + hr * np.cos(ha)))
        feats.append({"rings": rings,
                      "burn": float(np.round(rng.uniform(1, 9), 2))})
    return feats


class TestGoldens:
    def test_rect_center_fill(self, spark, tmp_path):
        # rect covering cell centers of rows 0..3, cols 2..5 exactly
        feats = [{"rings": [_rect(9.61, 9.99, 0.21, 0.59)], "burn": 7.0}]
        _m, paths = _run(spark, tmp_path, feats)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert (a[0:4, 2:6] == np.float32(7.0)).all()
        assert a[4, 2] == 0.0 and a[0, 1] == 0.0 and a[0, 6] == 0.0

    def test_hole_punches_out(self, spark, tmp_path):
        feats = [{
            "rings": [_rect(8.0, 9.9, 0.1, 1.5),
                      _rect(8.5, 9.2, 0.5, 0.9)],
            "burn": 3.0,
        }]
        _m, paths = _run(spark, tmp_path, feats)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        # (9.05, 0.65) inside outer+inner ring -> not burned
        assert a[9, 6] == 0.0
        # (9.65, 0.65) inside outer only
        assert a[3, 6] == np.float32(3.0)

    def test_paint_order_later_wins(self, spark, tmp_path):
        feats = [
            {"rings": [_rect(9.0, 9.9, 0.1, 1.0)], "burn": 1.0},
            {"rings": [_rect(9.0, 9.9, 0.5, 1.4)], "burn": 2.0},
        ]
        _m, paths = _run(spark, tmp_path, feats)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[3, 2] == np.float32(1.0)    # only first
        assert a[3, 7] == np.float32(2.0)    # overlap -> later wins
        assert a[3, 13] == np.float32(2.0)   # only second

    def test_add_accumulates(self, spark, tmp_path):
        feats = [
            {"rings": [_rect(9.0, 9.9, 0.1, 1.0)], "burn": 1.5},
            {"rings": [_rect(9.0, 9.9, 0.5, 1.4)], "burn": 2.0},
        ]
        _m, paths = _run(spark, tmp_path, feats, mode="add")
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[3, 7] == np.float32(3.5)

    def test_invert_burns_uncovered(self, spark, tmp_path):
        feats = [{"rings": [_rect(9.0, 9.9, 0.1, 1.0)], "burn": 5.0}]
        got, paths = _run(spark, tmp_path, feats, invert=True,
                          invert_value=9.0)
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[3, 2] == 0.0                # covered -> init
        assert a[15, 15] == np.float32(9.0)  # uncovered -> burned
        far = geotiff.open_raster(paths[(1, 2)]).read_block(0, 16, 0, 16)
        assert (far == np.float32(9.0)).all()  # empty tile fully burned

    def test_all_touched_catches_sliver(self, spark, tmp_path):
        # a thin sliver crossing cells without containing any center
        feats = [{"rings": [_ring([9.99, 9.99, 9.62],
                                  [0.101, 0.135, 0.101])],
                  "burn": 4.0}]
        got_center, _ = _run(spark, tmp_path, feats)
        got_at, paths = _run(spark, tmp_path, feats, all_touched=True)
        n_center = sum(r[2] for r in got_center)
        n_at = sum(r[2] for r in got_at)
        assert n_at > n_center
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[0, 1] == np.float32(4.0)

    def test_line_burns_path_not_interior(self, spark, tmp_path):
        # open polyline across the tile: corners burned, interior not
        feats = [{"rings": [_ring([9.95, 9.95, 8.55],
                                  [0.05, 1.55, 1.55])],
                  "burn": 2.0}]
        _m, paths = _run(spark, tmp_path, feats, geometry="line")
        a = geotiff.open_raster(paths[(0, 0)]).read_block(0, 16, 0, 16)
        assert a[0, 0] == np.float32(2.0)    # on the path
        assert a[0, 15] == np.float32(2.0)   # the corner
        assert a[14, 15] == np.float32(2.0)  # end of second segment
        assert a[8, 7] == 0.0                # interior NOT filled
        assert a[14, 0] == 0.0               # closing edge NOT burned


class TestTwinEquality:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(all_touched=True),
        dict(mode="add"),
        dict(invert=True, invert_value=3.5),
        dict(geometry="line"),
        dict(init=-1.0),
    ])
    def test_random_soup_matches_twin(self, spark, tmp_path, kw):
        feats = _rand_feats(25, seed=11)
        got, _ = _run(spark, tmp_path, feats, **kw)
        want = burn_sequential(feats, _GRID, tile_px=16, **kw)
        assert got == want

    def test_full_cover_and_empty_tiles(self, spark, tmp_path):
        feats = [{"rings": [_rect(9.8, 9.9, 0.1, 0.3)], "burn": 1.0}]
        got, paths = _run(spark, tmp_path, feats)
        assert len(got) == 6 and len(paths) == 6
        assert sum(1 for r in got if r[2] == 0) == 5


class TestRefusals:
    def test_bad_geometry(self, spark):
        with pytest.raises(ValueError, match="geometry"):
            burn_features(spark, _df(spark, []), _GRID, None,
                          geometry="point")

    def test_bad_mode(self, spark):
        with pytest.raises(ValueError, match="mode"):
            burn_features(spark, _df(spark, []), _GRID, None,
                          mode="max")

    def test_invert_add_conflict(self, spark):
        with pytest.raises(ValueError, match="invert"):
            burn_features(spark, _df(spark, []), _GRID, None,
                          mode="add", invert=True)
