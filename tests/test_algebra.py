"""Map algebra tests: exact diffs, NODATA propagation from either side,
unpaired tiles and grid mismatches as loud error rows, resume."""

from __future__ import annotations

import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.operators import algebra


def _write(tmp_path, name, arr, x0=0.0, y0=None, nodata=-99.0):
    path = os.path.join(str(tmp_path), name)
    geotiff.write_geotiff(
        path, arr, x0=x0, y0=y0 if y0 is not None else float(arr.shape[0]),
        sx=1.0, sy=1.0, epsg=4326, nodata=nodata,
    )
    return path


def test_diff_exact_and_nodata(spark, tmp_path):
    a = np.array([[10.0, 20.0], [30.0, -99.0]])
    b = np.array([[1.0, -99.0], [3.0, 4.0]])
    pa_ = _write(tmp_path, "a.tif", a)
    pb = _write(tmp_path, "b.tif", b)
    m = algebra.raster_calc_tiles(
        spark, [(0, 0, pa_)], [(0, 0, pb)], str(tmp_path / "d"),
        expression="a - b", dtype="float64", nodata=-12345.0,
    ).collect()
    assert len(m) == 1 and m[0]["error"] is None
    r = geotiff.open_raster(m[0]["path"])
    out = r.read_block(0, 2, 0, 2)
    expected = np.array([[9.0, np.nan], [27.0, np.nan]])
    assert np.array_equal(out, expected, equal_nan=True)
    assert m[0]["n_valid"] == 2 and m[0]["sum_value"] == 36.0
    assert m[0]["max_abs"] == 27.0


def test_all_expressions(spark, tmp_path):
    a = np.array([[4.0, 9.0]])
    b = np.array([[1.0, 16.0]])
    pa_ = _write(tmp_path, "ea.tif", a, y0=1.0)
    pb = _write(tmp_path, "eb.tif", b, y0=1.0)
    for expr, fn in algebra.EXPRESSIONS.items():
        m = algebra.raster_calc_tiles(
            spark, [(0, 0, pa_)], [(0, 0, pb)],
            str(tmp_path / expr.replace(" ", "").replace("/", "_")),
            expression=expr, dtype="float64",
        ).collect()
        r = geotiff.open_raster(m[0]["path"])
        assert np.array_equal(r.read_block(0, 1, 0, 2), fn(a, b)), expr


def test_unpaired_and_mismatch_are_error_rows(spark, tmp_path):
    a = np.ones((2, 2))
    pa_ = _write(tmp_path, "u_a.tif", a)
    pb_shift = _write(tmp_path, "u_b.tif", np.ones((2, 2)), x0=5.0)
    lone = _write(tmp_path, "lone.tif", a)
    m = {(r["tile_iy"], r["tile_ix"]): r for r in algebra.raster_calc_tiles(
        spark, [(0, 0, pa_)], [(0, 0, pb_shift), (1, 1, lone)],
        str(tmp_path / "err"),
    ).collect()}
    assert "mismatch" in m[(0, 0)]["error"]
    assert "unpaired" in m[(1, 1)]["error"]
    with pytest.raises(ValueError, match="unsupported expression"):
        algebra.raster_calc_tiles(
            spark, [], [], str(tmp_path / "x"), expression="__import__('os')"
        )


def test_resume_skip_existing(spark, tmp_path):
    rng = np.random.default_rng(2)
    a = rng.normal(0, 5, (8, 8)).round(2)
    b = rng.normal(0, 5, (8, 8)).round(2)
    pa_ = _write(tmp_path, "r_a.tif", a)
    pb = _write(tmp_path, "r_b.tif", b)
    out = str(tmp_path / "res")
    first = algebra.raster_calc_tiles(
        spark, [(0, 0, pa_)], [(0, 0, pb)], out, dtype="float64"
    ).collect()
    mt = os.path.getmtime(first[0]["path"])
    second = algebra.raster_calc_tiles(
        spark, [(0, 0, pa_)], [(0, 0, pb)], out, dtype="float64",
        skip_existing=True,
    ).collect()
    assert os.path.getmtime(second[0]["path"]) == mt
    assert (first[0]["n_valid"], first[0]["checksum"]) == (
        second[0]["n_valid"], second[0]["checksum"]
    )
