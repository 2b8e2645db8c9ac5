"""Zonal statistics (raster<->vector aggregate) tests.

Correctness anchors:
- hand-computable tiny rasters (exact counts/min/max/sum/mean);
- a single-process numpy oracle sharing only the pixel-center formula
  and the ray-cast expression (no Spark, no partial aggregation) — the
  distributed strip/partial/merge plumbing must reproduce it exactly;
- partial-aggregation invariance: strip_rows=1 vs one-strip-per-raster
  results are identical (integer-valued rasters -> exact float64 sums);
- NODATA, multi-tile, projected-CRS, and off-raster polygons.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import zonal
from opentopodata_spark.operators.spatial import points_in_polygon_mask

pytestmark = pytest.mark.usefixtures("raster_root")


def _write(tmp_path, name, arr, **kw):
    path = os.path.join(str(tmp_path), name)
    geotiff.write_geotiff(path, arr, **kw)
    return path


def _single_process_zonal(paths, polygons):
    """Independent non-distributed evaluation (whole-band, no strips)."""
    from opentopodata_spark import crs as _crs

    out = {}
    for path in paths:
        r = geotiff.open_raster(path)
        win, (r0, c0) = r.read_window(0, r.height, 0, r.width)
        h, w = win.shape
        xs = r.x0 + (c0 + np.arange(w) + 0.5) * r.sx
        ys = r.y0 - (r0 + np.arange(h) + 0.5) * r.sy
        ci = r.crs
        if ci and ci.epsg and ci.epsg != 4326:
            gx, gy = np.meshgrid(xs, ys)
            lons, lats = _crs.unproject_xys(gx.ravel(), gy.ravel(), epsg=ci.epsg)
        else:
            lons = np.broadcast_to(xs, (h, w)).ravel()
            lats = np.broadcast_to(ys[:, None], (h, w)).ravel()
        vals = win.ravel()
        for p in polygons:
            m = points_in_polygon_mask(lats, lons, p["lats"], p["lons"])
            if not m.any():
                continue
            v = np.asarray(vals[m], dtype=np.float64)
            nod = zonal._nodata_mask(v, r.nodata)
            valid = v[~nod]
            st = out.setdefault(
                p["polygon_id"],
                {"n_px": 0, "n_nodata": 0, "n_valid": 0,
                 "vmin": np.inf, "vmax": -np.inf, "vsum": 0.0},
            )
            st["n_px"] += int(m.sum())
            st["n_nodata"] += int(nod.sum())
            st["n_valid"] += int(valid.size)
            if valid.size:
                st["vmin"] = min(st["vmin"], float(valid.min()))
                st["vmax"] = max(st["vmax"], float(valid.max()))
                st["vsum"] += float(valid.sum())
    return out


def _collect(df):
    return {r["polygon_id"]: r.asDict() for r in df.collect()}


def test_metadata_scan(spark, tmp_path):
    arr = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = _write(tmp_path, "a.tif", arr, x0=0.0, y0=3.0, sx=1.0, sy=1.0,
               epsg=4326, nodata=-1)
    rows = zonal.raster_metadata(spark, [p, str(tmp_path / "missing.tif")]).collect()
    by_path = {r["path"]: r for r in rows}
    m = by_path[p]
    assert (m["width"], m["height"]) == (4, 3)
    assert (m["x0"], m["y0"], m["sx"], m["sy"]) == (0.0, 3.0, 1.0, 1.0)
    assert m["epsg"] == 4326 and m["nodata"] == -1.0 and m["error"] is None
    assert by_path[str(tmp_path / "missing.tif")]["error"] is not None


def test_exact_tiny_raster(spark, tmp_path):
    # 4x4 int grid, 1-degree pixels, centers at 0.5..3.5; polygon covers
    # the 2x2 center block (centers 1.5, 2.5) exactly
    arr = np.arange(16, dtype=np.int32).reshape(4, 4)
    p = _write(tmp_path, "t.tif", arr, x0=0.0, y0=4.0, sx=1.0, sy=1.0, epsg=4326)
    poly = {"polygon_id": "C", "lats": [1.0, 3.0, 3.0, 1.0],
            "lons": [1.0, 1.0, 3.0, 3.0]}
    meta = zonal.raster_metadata(spark, [p])
    out = _collect(zonal.zonal_stats(meta, [poly]))
    # rows 1..2 x cols 1..2 of the array: values 5,6,9,10
    s = out["C"]
    assert s["n_px"] == 4 and s["n_nodata"] == 0 and s["n_valid"] == 4
    assert (s["vmin"], s["vmax"], s["vsum"]) == (5.0, 10.0, 30.0)
    assert s["vmean"] == 7.5


def test_nodata_and_all_nodata_polygon(spark, tmp_path):
    arr = np.array([[2, 1, 0], [3, 9, 9], [4, 9, 9]], dtype=np.float32)
    p = _write(tmp_path, "n.tif", arr, x0=-0.5, y0=2.5, sx=1.0, sy=1.0,
               epsg=4326, nodata=9)
    # pixel centers at lon 0,1,2 / lat 2,1,0
    mixed = {"polygon_id": "MIX", "lats": [-0.5, 2.5, 2.5, -0.5],
             "lons": [-0.5, -0.5, 2.5, 2.5]}
    dead = {"polygon_id": "DEAD", "lats": [0.5, 1.5, 1.5, 0.5],
            "lons": [0.5, 0.5, 2.5, 2.5]}
    meta = zonal.raster_metadata(spark, [p])
    out = _collect(zonal.zonal_stats(meta, [mixed, dead]))
    m = out["MIX"]
    assert m["n_px"] == 9 and m["n_nodata"] == 4 and m["n_valid"] == 5
    assert (m["vmin"], m["vmax"], m["vsum"]) == (0.0, 4.0, 10.0)
    assert m["vmean"] == 2.0
    d = out["DEAD"]  # only the 9-valued quadrant: all NODATA -> null stats
    assert d["n_px"] == 2 and d["n_nodata"] == 2 and d["n_valid"] == 0
    assert d["vmin"] is None and d["vmax"] is None
    assert d["vsum"] is None and d["vmean"] is None


def test_partial_aggregation_invariance(spark, raster_root):
    paths = sorted(glob.glob(os.path.join(raster_root, "test-srtm90m-subset", "*.tif")))
    assert len(paths) == 2
    polys = [
        {"polygon_id": "TRI", "lats": [0.1, 0.9, 0.1],
         "lons": [10.2, 10.9, 11.7]},
        {"polygon_id": "BOX", "lats": [0.3, 0.7, 0.7, 0.3],
         "lons": [10.8, 10.8, 11.2, 11.2]},
    ]
    meta = zonal.raster_metadata(spark, paths)
    fine = _collect(zonal.zonal_stats(meta, polys, strip_rows=97))
    coarse = _collect(zonal.zonal_stats(meta, polys, strip_rows=100000))
    assert fine == coarse  # int16 values: float64 sums are exact
    # cross-tile: TRI spans both tiles; the shared lon=11 pixel column
    # counts once per tile (documented multiset semantics)
    expected = _single_process_zonal(paths, polys)
    for pid, e in expected.items():
        got = fine[pid]
        assert got["n_px"] == e["n_px"] and got["n_valid"] == e["n_valid"]
        assert got["n_nodata"] == e["n_nodata"]
        assert got["vmin"] == e["vmin"] and got["vmax"] == e["vmax"]
        assert got["vsum"] == e["vsum"]
        assert got["vmean"] == round(e["vsum"] / e["n_valid"], 6)


def test_projected_raster(spark, raster_root):
    paths = sorted(
        glob.glob(os.path.join(raster_root, "test-srtm90m-subset-utm", "*.tif"))
    )
    assert paths
    polys = [{"polygon_id": "UTM_BOX", "lats": [0.2, 0.8, 0.8, 0.2],
              "lons": [10.1, 10.1, 10.6, 10.6]}]
    meta = zonal.raster_metadata(spark, paths)
    got = _collect(zonal.zonal_stats(meta, polys, strip_rows=301))
    expected = _single_process_zonal(paths, polys)
    e = expected["UTM_BOX"]
    g = got["UTM_BOX"]
    assert g["n_px"] == e["n_px"] and g["n_valid"] == e["n_valid"]
    assert g["vmin"] == e["vmin"] and g["vmax"] == e["vmax"]
    assert g["vsum"] == e["vsum"]


def test_polygon_off_raster(spark, tmp_path):
    arr = np.ones((3, 3), dtype=np.int16)
    p = _write(tmp_path, "o.tif", arr, x0=0.0, y0=3.0, sx=1.0, sy=1.0, epsg=4326)
    far = {"polygon_id": "FAR", "lats": [50.0, 51.0, 51.0, 50.0],
           "lons": [50.0, 50.0, 51.0, 51.0]}
    meta = zonal.raster_metadata(spark, [p])
    assert zonal.zonal_stats(meta, [far]).count() == 0


def test_pixels_never_become_rows(spark, raster_root):
    """Plan shape: the aggregate's input is the partial stream (no
    exchange wider than the tiny unit repartition; no crossJoin)."""
    paths = sorted(glob.glob(os.path.join(raster_root, "test-srtm90m-subset", "*.tif")))
    polys = [{"polygon_id": "B", "lats": [0.3, 0.7, 0.7, 0.3],
              "lons": [10.8, 10.8, 11.2, 11.2]}]
    meta = zonal.raster_metadata(spark, paths)
    plan = zonal.zonal_stats(meta, polys)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan and "crossJoin" not in plan


def test_projected_pruning_central_meridian(spark, raster_root):
    """A polygon bbox straddling the raster CRS's central meridian has
    its minimum northing at an INTERIOR longitude; boundary-only bbox
    sampling would under-cover and prune strips that contain polygon
    pixels. The wide box must still aggregate every raster pixel."""
    paths = sorted(
        glob.glob(os.path.join(raster_root, "test-srtm90m-subset-utm", "*.tif"))
    )
    wide = [{"polygon_id": "WIDE", "lats": [0.05, 0.95, 0.95, 0.05],
             "lons": [3.0, 3.0, 15.0, 15.0]}]  # straddles lon0=9 of 32632
    meta = zonal.raster_metadata(spark, paths)
    got = _collect(zonal.zonal_stats(meta, wide, strip_rows=173))
    expected = _single_process_zonal(paths, wide)
    e, g = expected["WIDE"], got["WIDE"]
    assert g["n_px"] == e["n_px"] and g["n_valid"] == e["n_valid"]
    assert g["vsum"] == e["vsum"]


def test_nodata_semantics_float64(spark, tmp_path):
    """Out-of-range and NaN GDAL_NODATA tags: the mask must be computed
    in float64 (stored-dtype comparison would wrap -9999 onto a real
    uint8 value; NaN == NaN is never true)."""
    # uint8 band, nodata tag -9999 (as GDAL happily writes): nothing in
    # the band can equal it -> zero nodata pixels
    arr8 = np.arange(9, dtype=np.uint8).reshape(3, 3)
    p8 = os.path.join(str(tmp_path), "u8.tif")
    geotiff.write_geotiff(p8, arr8, x0=0.0, y0=3.0, sx=1.0, sy=1.0,
                          epsg=4326, nodata=-9999)
    box = {"polygon_id": "B", "lats": [-0.5, 3.5, 3.5, -0.5],
           "lons": [-0.5, -0.5, 3.5, 3.5]}
    out = _collect(zonal.zonal_stats(zonal.raster_metadata(spark, [p8]), [box]))
    assert out["B"]["n_nodata"] == 0 and out["B"]["n_valid"] == 9
    assert out["B"]["vsum"] == 36.0
    # float band with nodata=nan: NaN pixels must be classified nodata
    arrf = np.array([[1.0, np.nan], [3.0, 4.0]], dtype=np.float32)
    pf = os.path.join(str(tmp_path), "fn.tif")
    geotiff.write_geotiff(pf, arrf, x0=0.0, y0=2.0, sx=1.0, sy=1.0,
                          epsg=4326, nodata=float("nan"))
    outf = _collect(zonal.zonal_stats(zonal.raster_metadata(spark, [pf]), [box]))
    assert outf["B"]["n_nodata"] == 1 and outf["B"]["n_valid"] == 3
    assert outf["B"]["vsum"] == 8.0 and outf["B"]["vmax"] == 4.0


def test_zonal_majority(spark, tmp_path):
    """Categorical majority per polygon: dominant class wins; ties cut
    to the SMALLEST value; nodata ignored; strip-size invariant."""
    # 10x10 class raster: left half class 3, right half class 7, one
    # nodata stripe, a 2x2 patch of class 1
    arr = np.full((10, 10), 3, dtype=np.int16)
    arr[:, 5:] = 7
    arr[0, :] = -9999
    arr[5:7, 5:7] = 1
    p = _write(tmp_path, "classes.tif", arr, x0=0.0, y0=10.0,
               sx=1.0, sy=1.0, epsg=4326, nodata=-9999)
    polys = [
        # whole raster: 45 threes vs 41 sevens vs 4 ones
        {"polygon_id": "all", "lats": [-1.0, -1.0, 11.0, 11.0],
         "lons": [-1.0, 11.0, 11.0, -1.0]},
        # right half only: class 7 dominates
        {"polygon_id": "right", "lats": [-1.0, -1.0, 11.0, 11.0],
         "lons": [5.0, 11.0, 11.0, 5.0]},
        # a 2x2 window holding one 3 and one 7 on each row -> tie 2:2,
        # smallest value (3) wins deterministically
        {"polygon_id": "tie", "lats": [7.0, 7.0, 9.0, 9.0],
         "lons": [4.0, 6.0, 6.0, 4.0]},
    ]
    meta = zonal.raster_metadata(spark, [p])
    for strips in (512, 1):
        got = {r.polygon_id: r for r in zonal.zonal_majority(
            meta, polys, strip_rows=strips).collect()}
        assert got["all"].majority_value == 3.0
        assert got["all"].majority_count == 45
        assert got["all"].n_distinct_values == 3
        assert got["right"].majority_value == 7.0
        t = got["tie"]
        assert (t.majority_value, t.majority_count) == (3.0, 2)
