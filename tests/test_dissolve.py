"""Dissolve: edge cancellation, ring stitching, holes, multi-parts,
orientation insensitivity, distributed==sequential bit-equality, loud
refusals, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators import dissolve

Q = 2.0 ** -20


def cell(x: int, y: int) -> list:
    """Unit grid cell as one CCW shell ring (open)."""
    return [[[float(x), float(y)], [float(x + 1), float(y)],
             [float(x + 1), float(y + 1)], [float(x), float(y + 1)]]]


def _collect(spark, rows):
    rows = [
        (k, [[[float(x), float(y)] for x, y in ring] for ring in rings])
        for k, rings in rows
    ]
    df = spark.createDataFrame(
        rows, "key string, rings array<array<array<double>>>"
    )
    return {
        r.key: r.asDict()
        for r in dissolve.dissolve_polygons(df, "key").collect()
    }


def test_rectangle_block_and_multipart(spark):
    rows = [("X", cell(x, y)) for x in range(2) for y in range(4)]
    rows += [("M", cell(5, 0)), ("M", cell(7, 3))]  # disconnected parts
    got = _collect(spark, rows)
    x = got["X"]
    assert (x["n_parts"], x["n_shells"], x["n_holes"]) == (8, 1, 0)
    assert x["perim_edges"] == 12  # 2*(2+4) unit segments
    assert x["area2_q"] == 2 * 8 * (2 ** 40)  # 8 deg^2 in quanta^2
    assert len(x["rings"]) == 1
    m = got["M"]
    assert (m["n_parts"], m["n_shells"], m["n_holes"]) == (2, 2, 0)
    assert m["area2_q"] == 2 * 2 * (2 ** 40)


def test_ring_of_cells_leaves_hole(spark):
    ring_cells = [
        (x, y) for x in range(3) for y in range(3) if (x, y) != (1, 1)
    ]
    rows = [("Y", cell(x, y)) for x, y in ring_cells]
    rows += [("Z", cell(1, 1))]
    got = _collect(spark, rows)
    y = got["Y"]
    assert (y["n_parts"], y["n_shells"], y["n_holes"]) == (8, 1, 1)
    assert y["area2_q"] == 2 * 8 * (2 ** 40)
    assert y["perim_edges"] == 12 + 4  # outer 3x3 + inner hole square
    shells = [r for r in y["rings"] if _a2(r) > 0]
    holes = [r for r in y["rings"] if _a2(r) < 0]
    assert len(shells) == 1 and len(holes) == 1
    z = got["Z"]
    assert (z["n_shells"], z["n_holes"]) == (1, 0)


def _a2(ring) -> float:
    s = 0.0
    n = len(ring)
    for k in range(n):
        x0, y0 = ring[k]
        x1, y1 = ring[(k + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def test_donut_plus_island_fills_hole(spark):
    donut = [
        [[0, 0], [3, 0], [3, 3], [0, 3]],          # shell CCW
        [[1, 1], [1, 2], [2, 2], [2, 1]],          # hole CW
    ]
    island = [[[1, 1], [2, 1], [2, 2], [1, 2]]]
    got = _collect(spark, [("W", donut), ("W", island)])
    w = got["W"]
    assert (w["n_parts"], w["n_shells"], w["n_holes"]) == (2, 1, 0)
    assert w["area2_q"] == 2 * 9 * (2 ** 40)
    assert w["perim_edges"] == 4  # the hole boundary cancelled entirely
    assert len(w["rings"]) == 1 and len(w["rings"][0]) == 4


def test_orientation_insensitive_and_closed_rings(spark):
    # shell given CW, hole given CCW, rings CLOSED (first==last):
    # normalization must produce the identical result
    donut_wrong = [
        [[0, 0], [0, 3], [3, 3], [3, 0], [0, 0]],
        [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],
    ]
    island = [[[1, 1], [2, 1], [2, 2], [1, 2]]]
    got = _collect(spark, [("W", donut_wrong), ("W", island)])
    w = got["W"]
    assert (w["n_shells"], w["n_holes"], w["area2_q"]) == (1, 0, 2 * 9 * (2 ** 40))


def test_distributed_equals_sequential(spark):
    rows = [("X", cell(x, y)) for x in range(2) for y in range(4)]
    rows += [
        ("Y", cell(x, y))
        for x in range(3) for y in range(3) if (x, y) != (1, 1)
    ]
    rows += [("Z", cell(1, 1)), ("M", cell(5, 0)), ("M", cell(7, 3))]
    got = _collect(spark, rows)
    seq = dissolve.dissolve_sequential(rows)
    assert set(got) == set(seq)
    for k in seq:
        for fld in ("n_parts", "n_shells", "n_holes", "perim_edges",
                    "area2_q"):
            assert got[k][fld] == seq[k][fld], (k, fld)
        # geometry bit-equality (same stitcher, pinned start order)
        g = [[(x, y) for x, y in ring] for ring in got[k]["rings"]]
        s = [[(x, y) for x, y in ring] for ring in seq[k]["rings"]]
        assert g == s, k


def test_corner_touching_cells_stay_separate_shells(spark):
    got = _collect(spark, [("C", cell(0, 0)), ("C", cell(1, 1))])
    c = got["C"]
    assert (c["n_shells"], c["n_holes"]) == (2, 0)
    assert c["perim_edges"] == 8


def test_duplicate_geometry_raises(spark):
    df = spark.createDataFrame(
        [("D", cell(0, 0)), ("D", cell(0, 0))],
        "key string, rings array<array<array<double>>>",
    )
    with pytest.raises(Exception, match="more than once|overlap"):
        dissolve.dissolve_polygons(df, "key").collect()
    with pytest.raises(ValueError, match="overlap"):
        dissolve.dissolve_sequential([("D", cell(0, 0)), ("D", cell(0, 0))])


def test_plan_shape(spark):
    df = spark.createDataFrame(
        [("X", cell(0, 0))], "key string, rings array<array<array<double>>>"
    )
    plan = (
        dissolve.dissolve_polygons(df, "key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # edge emission + cancellation are JVM-side; the only Python is the
    # per-key boundary stitcher
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_zero_area_cancelled_key_emits_empty_row(spark):
    # ADVICE r4: a key whose directed edges fully cancel (zero-area
    # input at the quantize — a sliver collapsing to a back-and-forth
    # chain) produced no stitched row and the inner join silently
    # DROPPED the key. It must surface as an explicit empty-geometry
    # row instead. (A CCW part plus its CW mirror is NOT the legal
    # spelling of this case: winding normalizes, so that input is
    # duplicated geometry and keeps its own loud refusal.)
    sliver = [[[0.0, 0.0], [3.0, 0.0], [0.0, 0.0]]]  # zero-area triangle
    rows = [("GONE", sliver), ("KEEP", cell(5, 5))]
    got = _collect(spark, rows)
    assert set(got) == {"GONE", "KEEP"}
    g = got["GONE"]
    assert (g["n_parts"], g["n_shells"], g["n_holes"]) == (1, 0, 0)
    assert g["perim_edges"] == 0
    assert g["area2_q"] == 0
    assert g["rings"] == []
    k = got["KEEP"]
    assert (k["n_shells"], k["area2_q"]) == (1, 2 * (2 ** 40))


def test_back_and_forth_sliver_emits_empty_row(spark):
    # degenerate 2-point ring: one forward + one reverse edge cancel
    rows = [("S", [[[0.0, 0.0], [1.0, 0.0]]])]
    got = _collect(spark, rows)
    s = got["S"]
    assert (s["n_parts"], s["n_shells"], s["perim_edges"]) == (1, 0, 0)
    assert s["area2_q"] == 0 and s["rings"] == []
