"""Vector polygonize (region boundary rings -> GeoJSON).

Anchors: hand goldens (square, donut hole, cross-seam region),
the built-in shoelace == n_cells assertion, RFC 7946 orientation,
distributed checkable columns == the array-shift sequential twin.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import polyvec


def _tile_grid(tmp_path, k_full, th, tw, res=0.01):
    H, W = k_full.shape
    tiles = []
    for iy in range(H // th):
        for ix in range(W // tw):
            sub = k_full[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
            p = str(tmp_path / f"t_{iy}_{ix}.tif")
            geotiff.write_geotiff(
                p, np.where(sub < 0, -9999, sub).astype(np.int16),
                x0=ix * tw * res, y0=10.0 - iy * th * res,
                sx=res, sy=res, epsg=4326, nodata=-9999,
            )
            tiles.append((iy, ix, p))
    return tiles


def _shoelace(ring):
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


class TestGolden:
    def test_single_square_geometry(self, spark, tmp_path):
        k = np.zeros((4, 4), dtype=np.int64)
        tiles = _tile_grid(tmp_path, k, 4, 4)
        rows = polyvec.region_polygons(spark, tiles).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.region_id, r.value, r.n_cells, r.n_rings,
                r.perim_edges, r.area_cells) == (0, 0, 16, 1, 16, 16)
        g = json.loads(r.geometry)
        assert g["type"] == "Polygon"
        ring = g["coordinates"][0]
        assert len(ring) == 5 and ring[0] == ring[-1]
        # geographic corners of the 4x4 tile at res 0.01
        xs = sorted({p[0] for p in ring})
        ys = sorted({p[1] for p in ring})
        assert xs == [0.0, 0.04] and ys == [pytest.approx(9.96), 10.0]
        assert _shoelace(ring) > 0  # RFC 7946 exterior CCW

    def test_donut_hole_orientation(self, spark, tmp_path):
        k = np.ones((5, 5), dtype=np.int64)
        k[2, 2] = 0
        tiles = _tile_grid(tmp_path, k, 5, 5)
        rows = {r.value: r for r in
                polyvec.region_polygons(spark, tiles).collect()}
        donut = rows[1]
        assert donut.n_rings == 2 and donut.n_cells == 24
        g = json.loads(donut.geometry)
        assert g["type"] == "Polygon" and len(g["coordinates"]) == 2
        assert _shoelace(g["coordinates"][0]) > 0   # exterior CCW
        assert _shoelace(g["coordinates"][1]) < 0   # hole CW
        hole = rows[0]
        assert hole.n_cells == 1 and hole.n_rings == 1

    def test_region_across_four_tiles(self, spark, tmp_path):
        k = np.zeros((8, 8), dtype=np.int64)
        k[3:5, 3:5] = 9
        tiles = _tile_grid(tmp_path, k, 4, 4)
        rows = {r.value: r for r in
                polyvec.region_polygons(spark, tiles).collect()}
        nine = rows[9]
        assert (nine.n_cells, nine.n_rings, nine.perim_edges) == (4, 1, 8)
        g = json.loads(nine.geometry)
        ring = g["coordinates"][0]
        assert len(ring) == 5  # collinear seam vertices merged away
        bg = rows[0]
        assert bg.n_rings == 2  # exterior + the hole where 9 sits


class TestTwinEquality:
    def test_checkable_columns_match_twin(self, spark, tmp_path):
        rng = np.random.default_rng(13)
        z = (
            300 * np.sin(np.linspace(0, 5, 80))[None, :]
            + 200 * np.cos(np.linspace(0, 4, 80))[:, None]
            + rng.normal(0, 30, (80, 80))
        )
        k = np.clip((z + 600) // 250, 0, 4).astype(np.int64)
        k[30:40, 25:35] = -1
        tiles = _tile_grid(tmp_path, k, 40, 40)
        got = sorted(
            (r.region_id, r.value, r.n_cells, r.perim_edges)
            for r in polyvec.region_polygons(spark, tiles).collect()
        )
        exp = polyvec.region_boundary_stats_sequential(tiles)
        assert got == exp
        # built-in area assertion already ran inside every task; spot
        # check the invariant survived collection too
        for r in polyvec.region_polygons(spark, tiles).collect():
            assert r.area_cells == r.n_cells

    def test_geometry_parses_everywhere(self, spark, tmp_path):
        rng = np.random.default_rng(21)
        k = rng.integers(-1, 3, (30, 30)).astype(np.int64)
        tiles = _tile_grid(tmp_path, k, 15, 15)
        for r in polyvec.region_polygons(spark, tiles).collect():
            g = json.loads(r.geometry)
            assert g["type"] in ("Polygon", "MultiPolygon")
            polys = ([g["coordinates"]] if g["type"] == "Polygon"
                     else g["coordinates"])
            for rings in polys:
                assert _shoelace(rings[0]) > 0
                for hole in rings[1:]:
                    assert _shoelace(hole) < 0


class TestValidation:
    def test_empty_tiles_refused(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            polyvec.region_polygons(spark, [])


class TestHotTaskBound:
    def test_zipf_region_refuses_above_cap(self, spark, tmp_path):
        # Zipf-shaped mosaic: one region owns almost the whole grid (the
        # continent case) plus a few tiny islands. The dominant region's
        # ring walk is one task; above max_region_perimeter it must
        # refuse loudly instead of silently becoming the straggler.
        k = np.zeros((16, 16), dtype=np.int64)
        k[3, 3] = 1
        k[12, 9] = 1
        tiles = _tile_grid(tmp_path, k, 8, 8)
        from py4j.protocol import Py4JJavaError
        with pytest.raises(Exception, match="max_region_perimeter"):
            polyvec.region_polygons(
                spark, tiles, max_region_perimeter=16
            ).collect()
        # generous cap: identical output to the default path
        got = {
            r.region_id: (r.value, r.n_cells, r.n_rings, r.area_cells)
            for r in polyvec.region_polygons(
                spark, tiles, max_region_perimeter=10_000).collect()
        }
        want = {
            r.region_id: (r.value, r.n_cells, r.n_rings, r.area_cells)
            for r in polyvec.region_polygons(spark, tiles).collect()
        }
        assert got == want
        dom = max(want.values(), key=lambda v: v[1])
        assert dom[1] == 16 * 16 - 2  # the Zipf head spans the mosaic
