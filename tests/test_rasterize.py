"""Rasterize (vector->raster) tests: exact cell assignment, boundary
floor semantics, the GeoTIFF tile sink (read-back golden, partial edge
tiles, atomic manifest), and the rasterize->zonal round trip."""

from __future__ import annotations

import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import rasterize, zonal
from opentopodata_spark.operators.rasterize import GridSpec


@pytest.fixture()
def grid():
    # 10x8 one-degree grid over lon [0,8), lat (0,10]
    return GridSpec(x0=0.0, y0=10.0, sx=1.0, sy=1.0, width=8, height=10)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double, val long")


def test_exact_cells_and_stats(spark, grid):
    pts = _pts(spark, [
        (1, 9.5, 0.5, 10),   # row 0, col 0
        (2, 9.2, 0.9, 30),   # row 0, col 0
        (3, 8.5, 0.5, 7),    # row 1, col 0
        (4, 9.5, 7.5, 5),    # row 0, col 7
    ])
    out = {(r["row"], r["col"]): r.asDict() for r in
           rasterize.rasterize_points(pts, grid, value_col="val").collect()}
    assert out[(0, 0)]["n_points"] == 2
    assert out[(0, 0)]["vsum"] == 40 and out[(0, 0)]["vmean"] == 20.0
    assert out[(0, 0)]["vmin"] == 10 and out[(0, 0)]["vmax"] == 30
    assert out[(1, 0)]["n_points"] == 1 and out[(1, 0)]["vsum"] == 7
    assert out[(0, 7)]["n_points"] == 1
    assert set(out) == {(0, 0), (1, 0), (0, 7)}


def test_boundary_floor_and_oob(spark, grid):
    pts = _pts(spark, [
        (1, 9.0, 1.0, 1),    # lat on boundary -> row floor((10-9)/1)=1; lon -> col 1
        (2, 10.0, 0.0, 1),   # top-left corner: row 0, col 0
        (3, 0.0, 0.0, 1),    # bottom edge: row 10 == height -> dropped
        (4, 5.0, 8.0, 1),    # right edge: col 8 == width -> dropped
        (5, 11.0, 1.0, 1),   # above grid -> negative row -> dropped
    ])
    out = {(r["row"], r["col"]) for r in
           rasterize.rasterize_points(pts, grid).collect()}
    assert out == {(1, 1), (0, 0)}


def test_tile_sink_roundtrip(spark, grid, tmp_path):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(500):
        rows.append((i, float(rng.uniform(0.01, 9.99)),
                     float(rng.uniform(0.01, 7.99)), int(rng.integers(0, 100))))
    pts = _pts(spark, rows)
    cells = rasterize.rasterize_points(pts, grid, value_col="val")
    out_dir = str(tmp_path / "tiles")
    # tile_px=4 over 10x8 grid -> 3x2 tile grid with partial bottom tiles
    manifest = {(m["tile_iy"], m["tile_ix"]): m.asDict() for m in
                rasterize.write_raster_tiles(
                    cells, grid, out_dir, value_col="vsum", tile_px=4,
                    dtype="float64", nodata=-1.0,
                ).collect()}
    # dense single-process expectation
    dense = np.full((10, 8), -1.0)
    for _, lat, lon, val in rows:
        r, c = int(np.floor((10.0 - lat) / 1.0)), int(np.floor(lon / 1.0))
        dense[r, c] = val if dense[r, c] == -1.0 else dense[r, c] + val
    assembled = np.full((10, 8), -1.0)
    n_cells = 0
    for (iy, ix), m in manifest.items():
        r = geotiff.open_raster(m["path"])
        assert (r.x0, r.y0) == (m["x0"], m["y0"])
        assert r.nodata == -1.0
        h, w = r.height, r.width
        assert h == min(4, 10 - iy * 4) and w == min(4, 8 - ix * 4)
        assembled[iy * 4:iy * 4 + h, ix * 4:ix * 4 + w] = r.band
        n_cells += m["n_cells"]
    assert np.array_equal(assembled, dense)
    assert n_cells == int((dense != -1.0).sum())
    assert not any(f.endswith(".tmp") for f in os.listdir(out_dir))


def test_rasterize_then_zonal(spark, grid, tmp_path):
    """Round trip: written count tiles re-read by zonal_stats must sum to
    the point count inside the polygon (integer-exact)."""
    rows = [(i, 0.5 + (i % 9), 0.5 + (i % 7), 1) for i in range(200)]
    pts = _pts(spark, rows)
    cells = rasterize.rasterize_points(pts, grid)
    out_dir = str(tmp_path / "count_tiles")
    manifest = rasterize.write_raster_tiles(
        cells, grid, out_dir, value_col="n_points", tile_px=16,
        dtype="int32", nodata=0,
    ).collect()
    paths = [m["path"] for m in manifest]
    whole = {"polygon_id": "ALL", "lats": [-0.5, 10.5, 10.5, -0.5],
             "lons": [-0.5, -0.5, 8.5, 8.5]}
    meta = zonal.raster_metadata(spark, paths)
    stats = zonal.zonal_stats(meta, [whole]).collect()[0]
    assert stats["vsum"] == 200.0  # every point accounted for exactly once


def test_plan_is_two_phase_jvm_aggregation(spark, grid):
    """Scale proof in the plan: cell aggregation must be a two-phase
    hash aggregate (map-side partial combine -> exchange on cell keys ->
    final), entirely JVM-side — no Python eval nodes, no sort-based agg,
    shuffle volume O(occupied cells)."""
    pts = _pts(spark, [(1, 9.5, 0.5, 10)])
    plan = rasterize.rasterize_points(pts, grid, value_col="val")\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2       # partial + final
    assert "partial_count" in plan or "partial" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "hashpartitioning(row" in plan         # exchange keyed on cells


def test_null_values_mean_consistency(spark, grid):
    """NULL-valued points count toward n_points but not the value stats;
    vmean divides by the non-NULL count (consistent with vsum/vmin/vmax)."""
    pts = spark.createDataFrame(
        [(1, 9.5, 0.5, 10), (2, 9.2, 0.9, 20), (3, 9.3, 0.7, None)],
        "pid long, lat double, lon double, val long",
    )
    [r] = rasterize.rasterize_points(pts, grid, value_col="val").collect()
    assert r["n_points"] == 3 and r["vsum"] == 30
    assert r["vmean"] == 15.0  # NOT 10.0 (30/3)
    # all-NULL cell: stats NULL, mean NULL, count still 3
    pts2 = spark.createDataFrame(
        [(1, 9.5, 0.5, None), (2, 9.2, 0.9, None)],
        "pid long, lat double, lon double, val long",
    )
    [r2] = rasterize.rasterize_points(pts2, grid, value_col="val").collect()
    assert r2["n_points"] == 2 and r2["vsum"] is None and r2["vmean"] is None
