"""Vector overlay analytics (operators/overlay.py).

Independence discipline: every Spark result is checked against a
DIFFERENT algorithm, not a replay of the operator's own code —
polygon intersection against the separating-axis theorem (exact
integer arithmetic, closed sets), convex hull against the O(n³)
all-points-left edge predicate (the same definition the DuckDB oracle
states), Douglas–Peucker against an independent recursive (not
stack-based) implementation in exact Python ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from opentopodata_spark.operators import overlay


def sq(cx, cy, r):
    return [[[cx - r, cy - r], [cx + r, cy - r],
             [cx + r, cy + r], [cx - r, cy + r]]]


def tri(a, b, c):
    return [[list(a), list(b), list(c)]]


def flat(rings):
    vx = [v[0] for r in rings for v in r]
    vy = [v[1] for r in rings for v in r]
    rs = [len(r) for r in rings]
    return vx, vy, rs


def inter(a, b):
    return overlay.polygons_intersect(*flat(a), *flat(b))


class TestPredicate:
    def test_disjoint(self):
        assert not inter(sq(0, 0, 1), sq(10, 10, 1))

    def test_overlap(self):
        assert inter(sq(0, 0, 2), sq(1, 1, 2))

    def test_corner_touch(self):
        # closed sets: a single shared point counts
        assert inter(sq(0, 0, 1), sq(2, 2, 1))

    def test_edge_touch_collinear(self):
        assert inter(sq(0, 0, 1), sq(2, 0, 1))

    def test_containment_both_ways(self):
        assert inter(sq(0, 0, 10), sq(1, 1, 2))
        assert inter(sq(1, 1, 2), sq(0, 0, 10))

    def test_hole_excludes(self):
        donut = [sq(0, 0, 10)[0], sq(0, 0, 4)[0]]
        assert not inter(donut, sq(0, 0, 2))       # inside the hole
        assert inter(donut, sq(0, 0, 5))           # crosses the hole ring
        assert inter(donut, sq(7, 0, 1))           # in the annulus
        assert inter(sq(0, 0, 2), [donut[0]])      # same outer, no hole

    def test_hole_boundary_touch(self):
        donut = [sq(0, 0, 10)[0], sq(0, 0, 4)[0]]
        # square touching the hole ring from inside the hole: boundary
        # contact with the hole ring IS contact with the polygon
        assert inter(donut, sq(0, 0, 4))

    def test_symmetry(self):
        a, b = tri((0, 0), (8, 0), (0, 8)), sq(3, 3, 1)
        assert inter(a, b) == inter(b, a)

    def test_degenerate_ring_raises(self):
        with pytest.raises(overlay.OverlayError):
            inter([[[0, 0], [1, 1]]], sq(0, 0, 1))


# --- independent oracle: separating-axis theorem for convex polygons ----


def _sat_intersects(pa, pb) -> bool:
    """Closed-set intersection of two CONVEX integer polygons (CCW):
    they are disjoint iff some edge normal strictly separates them."""
    def axes(poly):
        n = len(poly)
        for i in range(n):
            (x1, y1), (x2, y2) = poly[i], poly[(i + 1) % n]
            yield (y1 - y2, x2 - x1)  # outward-facing normal (CCW)

    for poly, other in ((pa, pb), (pb, pa)):
        for ax, ay in axes(poly):
            pr_a = [ax * x + ay * y for x, y in poly]
            pr_b = [ax * x + ay * y for x, y in other]
            if max(pr_a) < min(pr_b) or max(pr_b) < min(pr_a):
                return False
    return True


def _rand_convex(rng, cx, cy, spread):
    pts = {(int(rng.integers(cx - spread, cx + spread + 1)),
            int(rng.integers(cy - spread, cy + spread + 1)))
           for _ in range(8)}
    pts = sorted(pts)
    if len(pts) < 3:
        return None
    arr = np.array(pts, dtype=float)
    idx = overlay._chain(arr[:, 0], arr[:, 1])
    hull = [pts[i] for i in idx]
    if len(hull) < 3:
        return None
    return hull


def test_batch_predicate_equals_scalar():
    """The whole-batch vectorized predicate must agree with the scalar
    geoms_intersect on every pair, for all four kind combinations."""
    rng = np.random.default_rng(77)
    for a_closed in (True, False):
        for b_closed in (True, False):
            lvx, lvy, lrs, rvx, rvy, rrs = [], [], [], [], [], []
            want = []
            for _ in range(120):
                def geom(closed):
                    n = int(rng.integers(3 if closed else 2, 8))
                    cx, cy = rng.integers(-20, 21, size=2)
                    xs = (cx + rng.integers(-6, 7, size=n)).astype(float)
                    ys = (cy + rng.integers(-6, 7, size=n)).astype(float)
                    return xs, ys, [n]
                ax, ay, ars = geom(a_closed)
                bx, by, brs = geom(b_closed)
                lvx.append(ax); lvy.append(ay); lrs.append(ars)
                rvx.append(bx); rvy.append(by); rrs.append(brs)
                want.append(overlay.geoms_intersect(
                    ax, ay, ars, bx, by, brs, a_closed, b_closed))
            got = overlay._pairs_intersect_batch(
                lvx, lvy, lrs, rvx, rvy, rrs, a_closed, b_closed)
            assert got.tolist() == want


def test_predicate_vs_sat_random():
    rng = np.random.default_rng(42)
    n_checked = 0
    for _ in range(400):
        a = _rand_convex(rng, 0, 0, int(rng.integers(2, 12)))
        b = _rand_convex(rng, int(rng.integers(-14, 15)),
                         int(rng.integers(-14, 15)), int(rng.integers(2, 12)))
        if a is None or b is None:
            continue
        got = inter([ [list(v) for v in a] ], [ [list(v) for v in b] ])
        want = _sat_intersects(a, b)
        assert got == want, (a, b)
        n_checked += 1
    assert n_checked > 300


# --- Spark-side tests ---------------------------------------------------


@pytest.fixture(scope="module")
def polys(spark):
    hole_poly = [sq(20.0, 20.0, 10.0)[0], sq(20.0, 20.0, 2.0)[0]]
    left = spark.createDataFrame(
        [(1, sq(5.0, 5.0, 1.0)), (2, sq(50.0, 50.0, 1.0)),
         (3, sq(20.0, 20.0, 4.0)), (4, sq(20.0, 20.0, 1.0)),
         (5, sq(13.0, 20.0, 3.0))],
        "l_id int, rings array<array<array<double>>>")
    right = spark.createDataFrame(
        [(100, sq(5.5, 5.5, 1.0)), (200, hole_poly)],
        "r_id int, rings array<array<array<double>>>")
    return left, right


class TestPolygonJoin:
    def test_pairs(self, spark, polys):
        left, right = polys
        out = overlay.polygon_join(left, right, cell_size=8.0)
        got = sorted((r.l_id, r.r_id) for r in out.collect())
        # 3 crosses the hole ring; 4 sits inside the hole (no hit);
        # 5 lies in the annulus interior; 2 is far away
        assert got == [(1, 100), (3, 200), (5, 200)]

    def test_layout_independence(self, spark, polys):
        left, right = polys
        a = overlay.polygon_join(left.repartition(7), right, cell_size=4.0)
        b = overlay.polygon_join(left.coalesce(1), right.coalesce(1),
                                 cell_size=32.0)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_plan_shape(self, spark, polys):
        left, right = polys
        plan = overlay.polygon_join(left, right, cell_size=8.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_max_cells_refusal(self, spark, polys):
        left, right = polys
        with pytest.raises(Exception, match="max_cells"):
            overlay.polygon_join(left, right, cell_size=0.25,
                                 max_cells=2).collect()

    def test_max_bucket_refusal_and_pass(self, spark, polys):
        left, right = polys
        # one giant cell: all 5 left polygons share it -> refused at 4
        with pytest.raises(overlay.OverlayError, match="max_bucket"):
            overlay.polygon_join(left, right, cell_size=1024.0,
                                 max_bucket=4)
        ok = overlay.polygon_join(left, right, cell_size=1024.0,
                                  max_bucket=100)
        assert sorted((r.l_id, r.r_id) for r in ok.collect()) == \
            [(1, 100), (3, 200), (5, 200)]


class TestLineKinds:
    def line(self, *pts):
        return [[list(map(float, p)) for p in pts]]

    def test_line_polygon(self, spark):
        lines = spark.createDataFrame(
            [(1, self.line((0, 0), (10, 10))),      # crosses the square
             (2, self.line((40, 40), (50, 50))),    # far away
             (3, self.line((4, 4), (6, 6))),        # fully inside
             (4, self.line((21, 19), (21, 21)))],   # inside the hole
            "line_id int, rings array<array<array<double>>>")
        donut = [sq(5.0, 5.0, 4.0)[0]]
        holed = [sq(21.0, 21.0, 5.0)[0], sq(21.0, 21.0, 3.0)[0]]
        polys = spark.createDataFrame(
            [(100, donut), (200, holed)],
            "r_id int, rings array<array<array<double>>>")
        got = sorted((r.line_id, r.r_id) for r in overlay.polygon_join(
            lines, polys, "line_id", "r_id", cell_size=16.0,
            left_kind="line").collect())
        assert got == [(1, 100), (3, 100)]
        bgot = sorted((r.line_id, r.r_id) for r in
                      overlay.polygon_join_broadcast(
                          lines, polys, "line_id", "r_id", cell_size=16.0,
                          left_kind="line").collect())
        assert bgot == got

    def test_line_line(self, spark):
        a = spark.createDataFrame(
            [(1, self.line((0, 0), (10, 10))),
             (2, self.line((0, 20), (10, 20)))],
            "a_id int, rings array<array<array<double>>>")
        b = spark.createDataFrame(
            [(7, self.line((0, 10), (10, 0))),      # crosses line 1
             (8, self.line((5, 20), (5, 30)))],     # touches line 2 endpoint-on-segment
            "b_id int, rings array<array<array<double>>>")
        got = sorted((r.a_id, r.b_id) for r in overlay.polygon_join(
            a, b, "a_id", "b_id", cell_size=16.0,
            left_kind="line", right_kind="line").collect())
        assert got == [(1, 7), (2, 8)]

    def test_open_path_does_not_wrap(self, spark):
        # 3-vertex L path: the implicit closing edge of a POLYGON would
        # cross the probe segment; the open LINE must not
        path = self.line((0, 0), (10, 0), (10, 10))
        probe = spark.createDataFrame(
            [(1, self.line((4, 2), (4, 12)))],
            "p_id int, rings array<array<array<double>>>")
        df = spark.createDataFrame(
            [(9, path)], "g_id int, rings array<array<array<double>>>")
        as_line = overlay.polygon_join(
            probe, df, "p_id", "g_id", cell_size=32.0,
            left_kind="line", right_kind="line").count()
        as_poly = overlay.polygon_join(
            probe, df, "p_id", "g_id", cell_size=32.0,
            left_kind="line", right_kind="polygon").count()
        assert (as_line, as_poly) == (0, 1)

    def test_kind_validation(self, spark, polys):
        left, right = polys
        with pytest.raises(overlay.OverlayError, match="kind"):
            overlay.polygon_join(left, right, left_kind="wkb")


class TestBroadcastJoin:
    def test_equals_shuffle_path(self, spark):
        rng = np.random.default_rng(5)
        lrows, rrows = [], []
        for i in range(60):
            h = _rand_convex(rng, int(rng.integers(0, 200)),
                             int(rng.integers(0, 200)), int(rng.integers(2, 20)))
            if h is None:
                continue
            lrows.append((i, [[[float(x), float(y)] for x, y in h]]))
        for i in range(25):
            h = _rand_convex(rng, int(rng.integers(0, 200)),
                             int(rng.integers(0, 200)), int(rng.integers(2, 25)))
            if h is None:
                continue
            rrows.append((i, [[[float(x), float(y)] for x, y in h]]))
        schema = "l_id int, rings array<array<array<double>>>"
        left = spark.createDataFrame(lrows, schema)
        right = spark.createDataFrame(
            rrows, "r_id int, rings array<array<array<double>>>")
        a = sorted(map(tuple,
                       overlay.polygon_join(left, right, cell_size=32.0).collect()))
        b = sorted(map(tuple, overlay.polygon_join_broadcast(
            left.repartition(5), right, cell_size=48.0).collect()))
        assert a == b and len(a) > 0

    def test_no_exchange_in_plan(self, spark, polys):
        left, right = polys
        plan = overlay.polygon_join_broadcast(left, right, cell_size=8.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_broadcast_cap_refusal(self, spark, polys):
        left, right = polys
        with pytest.raises(overlay.OverlayError, match="max_broadcast_rows"):
            overlay.polygon_join_broadcast(left, right, max_broadcast_rows=1)


class TestPolygonMetrics:
    def test_l_shape_and_holes(self, spark):
        Lhex = [[[0.0, 0.0], [12.0, 0.0], [12.0, 5.0],
                 [6.0, 5.0], [6.0, 10.0], [0.0, 10.0]]]
        holed = [sq(10.0, 10.0, 6.0)[0], sq(10.0, 10.0, 2.0)[0]]
        df = spark.createDataFrame(
            [("L", Lhex), ("H", holed)],
            "poly_id string, rings array<array<array<double>>>")
        got = {r.poly_id: r for r in overlay.polygon_metrics(df).collect()}
        assert (got["L"].area, got["L"].perimeter) == (90.0, 44.0)
        assert (got["L"].cx, got["L"].cy) == (5.0, round(25 / 6, 6))
        assert (got["H"].area, got["H"].perimeter) == (128.0, 64.0)
        assert (got["H"].cx, got["H"].cy) == (10.0, 10.0)

    def test_orientation_independent(self, spark):
        cw = [[[0.0, 0.0], [0.0, 4.0], [4.0, 4.0], [4.0, 0.0]]]
        ccw = [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]]
        df = spark.createDataFrame(
            [("cw", cw), ("ccw", ccw)],
            "poly_id string, rings array<array<array<double>>>")
        got = {r.poly_id: r for r in overlay.polygon_metrics(df).collect()}
        for k in ("cw", "ccw"):
            r = got[k]
            assert (r.area, r.perimeter, r.cx, r.cy) == (16.0, 16.0, 2.0, 2.0)

    def test_no_exchange_no_udf(self, spark):
        df = spark.createDataFrame(
            [("a", sq(0.0, 0.0, 1.0))],
            "poly_id string, rings array<array<array<double>>>")
        plan = overlay.polygon_metrics(df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _lhuilier_area(ring_lonlat):
    """Independent spherical polygon area: fan triangulation from
    vertex 0 with l'Huilier's theorem per triangle (haversine sides) —
    a different algorithm from the pole-fan excess formula.  Valid for
    convex CCW rings."""
    def vec(lon, lat):
        la, lo = np.radians(lat), np.radians(lon)
        return np.array([np.cos(la) * np.cos(lo),
                         np.cos(la) * np.sin(lo), np.sin(la)])

    def side(u, v):
        return float(np.arctan2(np.linalg.norm(np.cross(u, v)),
                                float(np.dot(u, v))))

    v0 = vec(*ring_lonlat[0])
    total = 0.0
    for i in range(1, len(ring_lonlat) - 1):
        v1 = vec(*ring_lonlat[i])
        v2 = vec(*ring_lonlat[i + 1])
        a, b, c = side(v1, v2), side(v0, v2), side(v0, v1)
        s = (a + b + c) / 2
        t = np.tan(s / 2) * np.tan((s - a) / 2) \
            * np.tan((s - b) / 2) * np.tan((s - c) / 2)
        total += 4 * np.arctan(np.sqrt(max(t, 0.0)))
    return total


class TestSphereMetrics:
    R = 6371.0088

    def test_octant_golden(self, spark):
        octant = [[[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]]]
        df = spark.createDataFrame(
            [("o", octant)], "poly_id string, rings array<array<array<double>>>")
        r = overlay.sphere_polygon_metrics(df).collect()[0]
        assert r.area_km2 == round(np.pi / 2 * self.R ** 2, 3)
        assert r.perimeter_km == round(3 * (np.pi / 2) * self.R, 3)

    def test_vs_lhuilier(self, spark):
        rng = np.random.default_rng(23)
        rows, want = [], {}
        for i in range(25):
            clon = float(rng.uniform(-150, 150))
            clat = float(rng.uniform(-55, 55))
            p, q = float(rng.uniform(0.5, 4)), float(rng.uniform(0.5, 4))
            ring = [[clon - p, clat - q], [clon + p, clat - q],
                    [clon + p, clat + q], [clon - p, clat + q]]
            rows.append((i, [ring]))
            want[i] = _lhuilier_area([tuple(v) for v in ring]) * self.R ** 2
        df = spark.createDataFrame(
            rows, "poly_id int, rings array<array<array<double>>>")
        got = {r.poly_id: r.area_km2 for r in
               overlay.sphere_polygon_metrics(df).collect()}
        for i, area in want.items():
            assert abs(got[i] - area) < max(1e-6 * area, 1e-3), i

    def test_hole_subtracts_and_orientation_free(self, spark):
        outer = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]
        hole_ccw = [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]]
        hole_cw = list(reversed(hole_ccw))
        df = spark.createDataFrame(
            [("a", [outer, hole_ccw]), ("b", [outer, hole_cw]),
             ("full", [outer])],
            "poly_id string, rings array<array<array<double>>>")
        got = {r.poly_id: r for r in
               overlay.sphere_polygon_metrics(df).collect()}
        assert got["a"].area_km2 == got["b"].area_km2 < got["full"].area_km2
        assert got["a"].perimeter_km == got["b"].perimeter_km \
            > got["full"].perimeter_km

    def test_plan_pure_expressions(self, spark):
        df = spark.createDataFrame(
            [("x", [[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])],
            "poly_id string, rings array<array<array<double>>>")
        plan = overlay.sphere_polygon_metrics(df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _convex_clip_area_independent(subject, window):
    """Intersection area of two convex polygons by the candidate-vertex
    method (vertices-inside + pairwise edge intersections -> hull ->
    shoelace) — a different algorithm from Sutherland–Hodgman."""
    def inside(pt, poly):
        n = len(poly)
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            if (bx - ax) * (pt[1] - ay) - (by - ay) * (pt[0] - ax) < -1e-12:
                return False
        return True

    cands = [p for p in subject if inside(p, window)]
    cands += [p for p in window if inside(p, subject)]
    ns, nw = len(subject), len(window)
    for i in range(ns):
        p1, p2 = subject[i], subject[(i + 1) % ns]
        for j in range(nw):
            q1, q2 = window[j], window[(j + 1) % nw]
            d = ((p2[0] - p1[0]) * (q2[1] - q1[1])
                 - (p2[1] - p1[1]) * (q2[0] - q1[0]))
            if d == 0:
                continue
            t = ((q1[0] - p1[0]) * (q2[1] - q1[1])
                 - (q1[1] - p1[1]) * (q2[0] - q1[0])) / d
            u = ((q1[0] - p1[0]) * (p2[1] - p1[1])
                 - (q1[1] - p1[1]) * (p2[0] - p1[0])) / d
            if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
                cands.append((p1[0] + t * (p2[0] - p1[0]),
                              p1[1] + t * (p2[1] - p1[1])))
    if len(cands) < 3:
        return 0.0
    arr = np.array(sorted(set((round(x, 9), round(y, 9)) for x, y in cands)),
                   dtype=float)
    if len(arr) < 3:
        return 0.0
    idx = overlay._chain(arr[:, 0], arr[:, 1])
    hull = arr[idx]
    return abs(overlay._shoelace2(hull[:, 0], hull[:, 1])) / 2.0


class TestClip:
    WINDOW = [[2.0, 1.0], [9.0, 2.0], [10.0, 8.0], [3.0, 9.0]]

    def test_convex_vs_independent(self, spark):
        rng = np.random.default_rng(19)
        rows, want = [], {}
        for i in range(40):
            h = _rand_convex(rng, int(rng.integers(0, 14)),
                             int(rng.integers(0, 12)), int(rng.integers(2, 8)))
            if h is None:
                continue
            rows.append((i, [[[float(x), float(y)] for x, y in h]]))
            want[i] = _convex_clip_area_independent(
                [(float(x), float(y)) for x, y in h],
                [tuple(p) for p in self.WINDOW])
        df = spark.createDataFrame(
            rows, "poly_id int, rings array<array<array<double>>>")
        got = {r.poly_id: r.clip_area for r in
               overlay.clip_polygons(df, self.WINDOW).collect()}
        for i, area in want.items():
            if area > 1e-9:
                assert i in got and abs(got[i] - area) < 1e-6, i
            else:
                assert i not in got, i

    def test_concave_rectilinear(self, spark):
        Lhex = [[[0.0, 0.0], [12.0, 0.0], [12.0, 5.0],
                 [6.0, 5.0], [6.0, 10.0], [0.0, 10.0]]]
        window = [[3.0, 2.0], [20.0, 2.0], [20.0, 20.0], [3.0, 20.0]]
        df = spark.createDataFrame(
            [("L", Lhex)], "poly_id string, rings array<array<array<double>>>")
        got = overlay.clip_polygons(df, window).collect()[0]
        # [3,12]x[2,5] = 27  plus  [3,6]x[5,10] = 15
        assert got.clip_area == 42.0

    def test_hole_subtracts(self, spark):
        holed = [sq(5.0, 5.0, 4.0)[0], sq(5.0, 5.0, 1.0)[0]]
        window = [[0.0, 0.0], [5.0, 0.0], [5.0, 12.0], [0.0, 12.0]]
        df = spark.createDataFrame(
            [("H", holed)], "poly_id string, rings array<array<array<double>>>")
        got = overlay.clip_polygons(df, window).collect()[0]
        # left half of the donut: outer 4x8=32 minus half the hole 2
        assert got.clip_area == 30.0

    def test_outside_dropped_and_refusals(self, spark):
        df = spark.createDataFrame(
            [("far", sq(100.0, 100.0, 2.0))],
            "poly_id string, rings array<array<array<double>>>")
        window = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
        assert overlay.clip_polygons(df, window).count() == 0
        with pytest.raises(overlay.OverlayError):
            overlay.clip_polygons(df, [[0, 0], [1, 0]])
        with pytest.raises(overlay.OverlayError, match="CCW"):
            overlay.clip_polygons(df, [[0.0, 0.0], [0.0, 10.0],
                                       [10.0, 10.0], [10.0, 0.0]])


def _brute_hull_edges(pts):
    """Directed minimal hull edges by the all-points-left predicate —
    the DuckDB oracle's definition, reimplemented independently."""
    edges = []
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for p in pts:
                if p in (a, b):
                    continue
                cr = ((b[0] - a[0]) * (p[1] - a[1])
                      - (b[1] - a[1]) * (p[0] - a[0]))
                if cr > 0:
                    continue
                if cr == 0 and not (
                        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])):
                    continue
                ok = False
                break
            if ok:
                edges.append((a, b))
    return edges


class TestConvexHull:
    def test_vs_brute(self, spark):
        rng = np.random.default_rng(7)
        rows = [(int(g), float(rng.integers(0, 50)), float(rng.integers(0, 50)))
                for g in range(4) for _ in range(40)]
        df = spark.createDataFrame(rows, "grp int, x double, y double")
        out = overlay.convex_hull(df, by=["grp"]).collect()
        for g in range(4):
            pts = {(int(x), int(y)) for gg, x, y in rows if gg == g}
            edges = _brute_hull_edges(sorted(pts))
            want_v = sorted({e[0] for e in edges})
            want_area2 = sum(a[0] * b[1] - b[0] * a[1] for a, b in edges)
            got = [r for r in out if r.grp == g]
            assert sorted((int(r.x), int(r.y)) for r in got) == want_v
            assert all(r.hull_n == len(want_v) for r in got)
            assert all(int(r.hull_area2) == want_area2 for r in got)

    def test_collinear_points_are_vertices(self, spark):
        df = spark.createDataFrame(
            [(0, 0.0, 0.0), (0, 2.0, 0.0), (0, 4.0, 0.0),
             (0, 4.0, 4.0), (0, 0.0, 4.0)],
            "grp int, x double, y double")
        got = sorted((r.x, r.y) for r in
                     overlay.convex_hull(df, by=["grp"]).collect())
        assert (2.0, 0.0) in got and len(got) == 5

    def test_layout_independence(self, spark):
        rng = np.random.default_rng(3)
        rows = [(0, float(rng.integers(0, 100)), float(rng.integers(0, 100)))
                for _ in range(300)]
        df = spark.createDataFrame(rows, "grp int, x double, y double")
        a = overlay.convex_hull(df.repartition(13), by=["grp"]).collect()
        b = overlay.convex_hull(df.coalesce(1), by=["grp"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_global_hull_no_groups(self, spark):
        df = spark.createDataFrame(
            [(0.0, 0.0), (9.0, 0.0), (9.0, 9.0), (0.0, 9.0), (4.0, 4.0)],
            "x double, y double")
        got = overlay.convex_hull(df).collect()
        assert len(got) == 4 and got[0].hull_area2 == 162.0

    def test_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [(0, 0.0, 0.0)] * 5 + [(0, 3.0, 0.0)] * 3 + [(0, 0.0, 3.0)],
            "grp int, x double, y double")
        got = overlay.convex_hull(df, by=["grp"]).collect()
        assert len(got) == 3


def _dp_recursive(pts, eps2_num):
    """Independent recursive DP in exact Python ints."""
    def rec(lo, hi, keep):
        if hi - lo < 2:
            return
        ax, ay = pts[lo]
        bx, by = pts[hi]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, best_d2 = None, None
        for i in range(lo + 1, hi):
            px, py = pts[i]
            cr = dx * (py - ay) - dy * (px - ax)
            d2 = cr * cr
            if len2 == 0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
                far = d2 > eps2_num
            else:
                far = d2 > eps2_num * len2
            if far and (best_d2 is None or d2 > best_d2):
                best, best_d2 = i, d2
        if best is not None:
            keep.add(best)
            rec(lo, best, keep)
            rec(best, hi, keep)

    keep = {0, len(pts) - 1}
    rec(0, len(pts) - 1, keep)
    return sorted(keep)


class TestSimplify:
    def test_vs_recursive_twin(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        for line in range(6):
            for i in range(80):
                rows.append((line, i, float(rng.integers(-500, 501)),
                             float(rng.integers(-500, 501))))
        df = spark.createDataFrame(rows, "line_id int, seq int, x double, y double")
        out = overlay.simplify_lines(df, eps=40.0)
        got = {(r.line_id, r.seq) for r in out.collect()}
        for line in range(6):
            pts = [(int(x), int(y)) for l, i, x, y in rows if l == line]
            want = _dp_recursive(pts, 1600)
            assert {s for l, s in got if l == line} == set(want)

    def test_tiebreak_smallest_seq(self, spark):
        # two symmetric spikes of identical distance: the SMALLER seq
        # must be chosen first (then the other survives recursion)
        rows = [(0, 0, 0.0, 0.0), (0, 1, 2.0, 10.0), (0, 2, 4.0, 0.0),
                (0, 3, 6.0, -10.0), (0, 4, 8.0, 0.0)]
        df = spark.createDataFrame(rows, "line_id int, seq int, x double, y double")
        got = sorted(r.seq for r in overlay.simplify_lines(df, eps=3.0).collect())
        assert got == [0, 1, 2, 3, 4] or got == [0, 1, 3, 4]
        # exact expectation from the twin
        want = _dp_recursive([(0, 0), (2, 10), (4, 0), (6, -10), (8, 0)], 9)
        assert got == want

    def test_endpoints_only_at_large_eps(self, spark):
        rows = [(0, i, float(i), float((i % 3) - 1)) for i in range(50)]
        df = spark.createDataFrame(rows, "line_id int, seq int, x double, y double")
        got = sorted(r.seq for r in overlay.simplify_lines(df, eps=100.0).collect())
        assert got == [0, 49]

    def test_eps_contract(self, spark):
        df = spark.createDataFrame([(0, 0, 0.0, 0.0)],
                                   "line_id int, seq int, x double, y double")
        with pytest.raises(overlay.OverlayError):
            overlay.simplify_lines(df, eps=2.5)
        # integral eps² passes (sqrt(2) grid diagonals are fine too)
        overlay.simplify_lines(df, eps=2.0).collect()
