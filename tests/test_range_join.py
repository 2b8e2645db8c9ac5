"""range_join (within-distance spatial join) vs a brute-force oracle.

Covers: mid-latitudes, antimeridian wrap, polar cap (full-ring
degradation), radius boundary rounding, and the no-crossJoin plan shape.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentopodata_spark.operators.knn import EARTH_RADIUS_M, range_join


def _hav_np(lat1, lon1, lat2, lon2):
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1) / 2.0
    dlon = np.radians(lon2 - lon1) / 2.0
    a = np.sin(dlat) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def _brute_pairs(pts, anc, radius_m, round_to=1):
    out = set()
    for pid, plat, plon in pts:
        for aid, alat, alon in anc:
            d = round(float(_hav_np(plat, plon, alat, alon)), round_to)
            if d <= radius_m:
                out.add((pid, aid, d))
    return out


def _run(spark, pts, anc, radius_m, **kw):
    p = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    a = spark.createDataFrame(anc, "anchor_id long, lat double, lon double")
    got = {
        (r.point_id, r.anchor_id, r.dist_m)
        for r in range_join(p, a, radius_m, **kw).collect()
    }
    assert got == _brute_pairs(pts, anc, radius_m, kw.get("round_to", 1))
    return got


def test_range_join_mid_latitudes(spark):
    rng = np.random.default_rng(7)
    pts = [
        (int(i), float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-60, 60, 80), rng.uniform(-179, 179, 80))
        )
    ]
    anc = [
        (int(i), float(lat), float(lon))
        for i, (lat, lon) in enumerate(
            zip(rng.uniform(-60, 60, 60), rng.uniform(-179, 179, 60))
        )
    ]
    got = _run(spark, pts, anc, 1_500_000.0)
    assert len(got) > 20  # the radius actually matches something


def test_range_join_antimeridian_wrap(spark):
    # 0.2 deg apart across the +/-180 seam at the equator: ~22 km
    pts = [(1, 0.0, 179.9), (2, 10.0, -179.95)]
    anc = [(1, 0.0, -179.9), (2, 10.0, 179.95), (3, 0.0, 170.0)]
    got = _run(spark, pts, anc, 50_000.0)
    assert (1, 1, round(float(_hav_np(0.0, 179.9, 0.0, -179.9)), 1)) in got
    assert (2, 2, round(float(_hav_np(10.0, -179.95, 10.0, 179.95)), 1)) in got


def test_range_join_polar_cap_full_ring(spark):
    # near the pole every longitude is close: the lon ring must cover 360
    pts = [(1, 89.2, 0.0), (2, -89.5, 123.0)]
    anc = [(1, 89.2, 180.0), (2, 89.5, -90.0), (3, -89.3, -57.0), (4, 0.0, 0.0)]
    _run(spark, pts, anc, 300_000.0)


def test_range_join_highlat_cosine_widening(spark):
    # at 70N one cell of longitude is ~1/3 the ground distance of the
    # equator: a fixed 3x3 ring would miss these; the dynamic ring must not
    pts = [(1, 70.0, 0.0)]
    radius = 400_000.0
    # ~3.6 deg of latitude; at 70N, 400 km east is ~10.5 deg of longitude
    anc = [(1, 70.0, 10.2), (2, 70.0, -10.2), (3, 70.0, 11.5)]
    got = _run(spark, pts, anc, radius)
    assert (1, 1, round(float(_hav_np(70.0, 0.0, 70.0, 10.2)), 1)) in got
    assert (1, 2, round(float(_hav_np(70.0, 0.0, 70.0, -10.2)), 1)) in got


def test_range_join_custom_cell_and_boundary(spark):
    # cell smaller than the radius: ny/nx > 1 path
    pts = [(int(i), float(i) * 0.3 - 3.0, float(i) * 0.7 - 7.0) for i in range(25)]
    anc = [(int(i), float(i) * 0.31 - 3.0, 0.7 * float(i) - 6.5) for i in range(25)]
    _run(spark, pts, anc, 120_000.0, cell_deg=0.4)


def test_range_join_no_cartesian_product(spark):
    p = spark.createDataFrame([(1, 0.0, 0.0)], "point_id long, lat double, lon double")
    a = spark.createDataFrame(
        [(1, 0.1, 0.1)], "anchor_id long, lat double, lon double"
    )
    plan = range_join(p, a, 100_000.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_range_join_no_duplicate_pairs(spark):
    # polar full ring wraps: array_distinct must keep each pair unique
    pts = [(1, 89.9, 17.0)]
    anc = [(int(i), 89.8, float(i) * 36.0 - 180.0) for i in range(10)]
    p = spark.createDataFrame(pts, "point_id long, lat double, lon double")
    a = spark.createDataFrame(anc, "anchor_id long, lat double, lon double")
    rows = range_join(p, a, 500_000.0).collect()
    keys = [(r.point_id, r.anchor_id) for r in rows]
    assert len(keys) == len(set(keys))
    assert set(keys) == {(1, i) for i in range(10)}  # all within 500 km of pole-ish point
