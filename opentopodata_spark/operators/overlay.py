"""Vector–vector overlay analytics: polygon×polygon spatial join,
distributed convex hull, and Douglas–Peucker line simplification.

The reference resolves *points* against rasters and polygon coverage
(`/root/reference/opentopodata/config.py:432-451` is its only join);
a 100 TB geospatial corpus also needs the polygon-vs-polygon side of
the overlay algebra: "which admin region does each crawl-derived
footprint touch", "collapse each user's GPS trace to its shape".
Everything here is built from the same Spark-first discipline as the
rest of the engine:

``polygon_join``  — the 2-D analogue of operators/intervals.py's
    bin-bucketing rewrite.  Spark plans a raw geometric predicate join
    as BroadcastNestedLoop / cartesian (O(|L|·|R|)); instead each
    polygon's bbox explodes to the fixed-width GRID CELLS it covers
    (pure column exprs), the two sides equi-join on the cell key (a
    shuffle hash join Catalyst can re-plan under AQE), a CANONICAL-CELL
    rule dedupes candidate pairs without a ``distinct()`` (a pair is
    tested only in the cell that contains the top-left corner of the
    bbox intersection), and the exact closed-set ``intersects``
    predicate runs as an Arrow-batched pandas UDF over the surviving
    candidates only.  Replication per polygon = its bbox cell count
    (``max_cells`` refuses pathological polygons executor-side, the
    same loud-refusal discipline as interval_join's ``max_bins``).

``convex_hull``  — two-level distributed hull: per-partition monotone
    chains (mapInPandas, keep-collinear variant) shrink each partition
    to its local hull, then ONE groupBy gathers only those candidates
    for the final chain.  hull(∪ partitions) = hull(∪ local hulls) and
    a point on the global hull boundary is on every containing subset's
    hull boundary, so the keep-collinear chain makes the result
    layout-independent (tested).  The only shuffle carries local-hull
    points, not the input.

``simplify_lines``  — classic stack-based Douglas–Peucker per line via
    applyInPandas (one shuffle on line id).  The retain decision
    compares cross²  >  eps²·len² in int64 — exact for grid-snapped
    coordinates, so the result is bit-stable across layouts and engines
    and a DuckDB *recursive CTE* can replay it as an independent oracle
    (see __spark_entry__._Q_SIMPLIFY_SQL).

Exactness contract (shared with the DuckDB oracles): every geometric
test is sign-of-cross-product arithmetic on coordinate DIFFERENCES.
With inputs snapped to a grid (integers, or multiples of 2^-k) the
doubles are exact as long as single products stay below 2^53 — signs
are never taken of products-of-products.  Ray-cast point-in-polygon
divisions appear only for points strictly off the boundary (the
segment test runs first), where the quotient is bounded away from the
decision threshold by ≥ 1/Δy ≫ 1 ULP.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType


class OverlayError(ValueError):
    pass


# ---------------------------------------------------------------------------
# flat polygon representation: rings array<array<array<double>>> ->
# (vx array<double>, vy array<double>, ring_sizes array<int>) + bbox
# ---------------------------------------------------------------------------


def _flatten_rings(df: DataFrame, rings: str, prefix: str) -> DataFrame:
    vx = F.flatten(F.expr(f"transform({rings}, r -> transform(r, v -> v[0]))"))
    vy = F.flatten(F.expr(f"transform({rings}, r -> transform(r, v -> v[1]))"))
    sizes = F.expr(f"transform({rings}, r -> size(r))")
    return (
        df.withColumn(f"{prefix}vx", vx)
        .withColumn(f"{prefix}vy", vy)
        .withColumn(f"{prefix}rs", sizes)
        .withColumn(f"{prefix}xmin", F.array_min(f"{prefix}vx"))
        .withColumn(f"{prefix}xmax", F.array_max(f"{prefix}vx"))
        .withColumn(f"{prefix}ymin", F.array_min(f"{prefix}vy"))
        .withColumn(f"{prefix}ymax", F.array_max(f"{prefix}vy"))
        .drop(rings)
    )


def _cell_floor(col, width: float):
    # floor() of a double column is exact; width is a positive double.
    return F.floor(col / F.lit(float(width))).cast("long")


def _explode_cells(df: DataFrame, prefix: str, width: float,
                   max_cells: int) -> DataFrame:
    cx_lo = _cell_floor(F.col(f"{prefix}xmin"), width)
    cx_hi = _cell_floor(F.col(f"{prefix}xmax"), width)
    cy_lo = _cell_floor(F.col(f"{prefix}ymin"), width)
    cy_hi = _cell_floor(F.col(f"{prefix}ymax"), width)
    n = (cx_hi - cx_lo + 1) * (cy_hi - cy_lo + 1)
    guard = F.assert_true(
        n <= max_cells,
        F.concat(
            F.lit("polygon_join: a polygon bbox covers "), n.cast("string"),
            F.lit(f" grid cells (> max_cells={max_cells}); raise cell_size "
                  "or max_cells"),
        ),
    )
    df = df.withColumn(
        "_cx", F.explode(F.when(guard.isNull(), F.sequence(cx_lo, cx_hi)))
    )
    return df.withColumn("_cy", F.explode(F.sequence(cy_lo, cy_hi)))


# ---------------------------------------------------------------------------
# exact closed-set intersects predicate (numpy, per candidate pair)
# ---------------------------------------------------------------------------


def _ring_edges(vx, vy, ring_sizes):
    """(n_edges, 4) array [x1 y1 x2 y2]; edges wrap within each ring and
    never connect consecutive rings."""
    x1s, y1s, x2s, y2s = [], [], [], []
    off = 0
    for n in ring_sizes:
        n = int(n)
        if n < 3:
            raise OverlayError("polygon ring with < 3 vertices")
        rx, ry = vx[off:off + n], vy[off:off + n]
        x1s.append(rx)
        y1s.append(ry)
        x2s.append(np.roll(rx, -1))
        y2s.append(np.roll(ry, -1))
        off += n
    return (np.concatenate(x1s), np.concatenate(y1s),
            np.concatenate(x2s), np.concatenate(y2s))


def _segments_intersect_any(ea, eb) -> bool:
    """True iff any closed segment of ea touches any closed segment of
    eb (proper crossing, endpoint touch, or collinear overlap) —
    vectorized CLRS SEGMENTS-INTERSECT over the nA×nB pair grid.
    Signs are compared, never multiplied: each cross term is a single
    product of coordinate differences, exact below 2^53."""
    p1x, p1y, p2x, p2y = (a[:, None] for a in ea)
    q1x, q1y, q2x, q2y = (b[None, :] for b in eb)

    def cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    d1 = np.sign(cross(q1x, q1y, q2x, q2y, p1x, p1y))
    d2 = np.sign(cross(q1x, q1y, q2x, q2y, p2x, p2y))
    d3 = np.sign(cross(p1x, p1y, p2x, p2y, q1x, q1y))
    d4 = np.sign(cross(p1x, p1y, p2x, p2y, q2x, q2y))
    straddle = (d1 != d2) & (d1 != 0) & (d2 != 0) \
        & (d3 != d4) & (d3 != 0) & (d4 != 0)
    if straddle.any():
        return True

    def on_seg(ax, ay, bx, by, cx, cy):
        return (np.minimum(ax, bx) <= cx) & (cx <= np.maximum(ax, bx)) \
            & (np.minimum(ay, by) <= cy) & (cy <= np.maximum(ay, by))

    touch = ((d1 == 0) & on_seg(q1x, q1y, q2x, q2y, p1x, p1y)) \
        | ((d2 == 0) & on_seg(q1x, q1y, q2x, q2y, p2x, p2y)) \
        | ((d3 == 0) & on_seg(p1x, p1y, p2x, p2y, q1x, q1y)) \
        | ((d4 == 0) & on_seg(p1x, p1y, p2x, p2y, q2x, q2y))
    return bool(touch.any())


def _point_in_polygon(px: float, py: float, edges) -> bool:
    """Even-odd ray cast over ALL rings (holes subtract).  Only called
    for points strictly off the boundary (segment test ran first)."""
    x1, y1, x2, y2 = edges
    crossing = (y1 > py) != (y2 > py)
    if not crossing.any():
        return False
    x1c, y1c, x2c, y2c = x1[crossing], y1[crossing], x2[crossing], y2[crossing]
    xint = (x2c - x1c) * (py - y1c) / (y2c - y1c) + x1c
    return bool(np.count_nonzero(px < xint) % 2 == 1)


def polygons_intersect(a_vx, a_vy, a_rs, b_vx, b_vy, b_rs) -> bool:
    """Closed-set intersects for two polygons-with-holes (even-odd
    interiors): boundary crossing/touch, or either's outer-ring anchor
    vertex interior to the other."""
    ea = _ring_edges(np.asarray(a_vx, float), np.asarray(a_vy, float), a_rs)
    eb = _ring_edges(np.asarray(b_vx, float), np.asarray(b_vy, float), b_rs)
    if _segments_intersect_any(ea, eb):
        return True
    if _point_in_polygon(float(a_vx[0]), float(a_vy[0]), eb):
        return True
    return _point_in_polygon(float(b_vx[0]), float(b_vy[0]), ea)


# ---------------------------------------------------------------------------
# polygon_join
# ---------------------------------------------------------------------------


def polygon_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "l_id",
    right_id: str = "r_id",
    rings: str = "rings",
    *,
    cell_size: float = 256.0,
    on: list[str] | None = None,
    max_cells: int = 4096,
) -> DataFrame:
    """Pairs (left_id, right_id) of polygons whose closed point sets
    intersect (boundary touch counts; holes are even-odd interior).

    ``rings`` column on BOTH inputs: array<array<array<double>>> —
    ring -> vertex -> [x, y], first ring the outer boundary, later
    rings holes, vertices NOT closed (first != last).  ``cell_size``
    is the bucketing grid width in coordinate units — pick it near the
    median polygon bbox edge so replication stays O(1) per polygon.

    Scale shape: one cell-explode + shuffle per side, one equi-join on
    (``on``…, cell), pure-expression canonical-cell + bbox filters,
    then the exact predicate only on surviving candidates.  No
    cartesian, no nested loop, no distinct (plan-shape pinned in
    tests/test_overlay.py).
    """
    on = list(on or [])
    lf = _flatten_rings(
        left.select(F.col(left_id).alias("_lid"), *on, rings), rings, "_l")
    rf = _flatten_rings(
        right.select(F.col(right_id).alias("_rid"), *on, rings), rings, "_r")
    lf = _explode_cells(lf, "_l", cell_size, max_cells)
    rf = _explode_cells(rf, "_r", cell_size, max_cells)

    cand = lf.join(rf, on + ["_cx", "_cy"])
    # canonical cell: the one containing the top-left (min-x, min-y)
    # corner of the bbox intersection — inside both bboxes, so exactly
    # one surviving copy per candidate pair.
    cand = cand.where(
        (F.col("_cx") == _cell_floor(F.greatest("_lxmin", "_rxmin"), cell_size))
        & (F.col("_cy") == _cell_floor(F.greatest("_lymin", "_rymin"), cell_size))
    )
    cand = cand.where(
        (F.col("_lxmin") <= F.col("_rxmax")) & (F.col("_rxmin") <= F.col("_lxmax"))
        & (F.col("_lymin") <= F.col("_rymax")) & (F.col("_rymin") <= F.col("_lymax"))
    )

    @F.pandas_udf(BooleanType())
    def hit(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            out = np.empty(len(pdf), dtype=bool)
            lvx, lvy, lrs = pdf["_lvx"].values, pdf["_lvy"].values, pdf["_lrs"].values
            rvx, rvy, rrs = pdf["_rvx"].values, pdf["_rvy"].values, pdf["_rrs"].values
            for i in range(len(pdf)):
                out[i] = polygons_intersect(
                    lvx[i], lvy[i], lrs[i], rvx[i], rvy[i], rrs[i])
            yield pd.Series(out)

    struct_cols = F.struct("_lvx", "_lvy", "_lrs", "_rvx", "_rvy", "_rrs")
    # pandas_udf over multiple array columns: pass via struct iterator
    cand = cand.withColumn("_hit", hit(struct_cols))
    out = cand.where("_hit").select(
        F.col("_lid").alias(left_id), F.col("_rid").alias(right_id), *on
    )
    return out


# ---------------------------------------------------------------------------
# convex hull (distributed, keep-collinear — boundary points are vertices)
# ---------------------------------------------------------------------------


def _chain(px: np.ndarray, py: np.ndarray):
    """Monotone chain keeping collinear boundary points.  Input must be
    deduplicated.  Returns hull vertex indices in CCW order starting at
    the lexicographically smallest point; for degenerate (all-collinear)
    input returns the sorted segment run."""
    order = np.lexsort((py, px))
    px, py = px[order], py[order]
    n = len(px)
    if n <= 2:
        return order[:n]

    def half(rng):
        h = []
        for i in rng:
            while len(h) >= 2:
                ax, ay = px[h[-2]], py[h[-2]]
                bx, by = px[h[-1]], py[h[-1]]
                if (bx - ax) * (py[i] - ay) - (by - ay) * (px[i] - ax) < 0:
                    h.pop()
                else:
                    break
            h.append(i)
        return h

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    idx = lower[:-1] + upper[:-1]
    # all-collinear degenerate: lower+upper retrace the same segment;
    # collapse to the unique sorted run
    if len(idx) != len(set(idx)):
        seen, uniq = set(), []
        for i in idx:
            if i not in seen:
                seen.add(i)
                uniq.append(i)
        idx = uniq
    return order[np.asarray(idx, dtype=np.int64)]


def _hull_pdf(pdf: pd.DataFrame, by: list[str], final: bool) -> pd.DataFrame:
    px = pdf["x"].values.astype(float)
    py = pdf["y"].values.astype(float)
    pts = np.stack([px, py], axis=1)
    uniq, uidx = np.unique(pts, axis=0, return_index=True)
    idx = uidx[_chain(uniq[:, 0], uniq[:, 1])]
    out = pdf.iloc[idx][by + ["x", "y"]].reset_index(drop=True)
    if final:
        hx, hy = out["x"].values, out["y"].values
        # shoelace over the CCW chain; ×2 keeps it integral for
        # integer-grid inputs (order-independent checksum for oracles)
        area2 = float(np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy))
        out = out.assign(hull_n=len(out), hull_area2=area2)
    return out


def convex_hull(points: DataFrame, x: str = "x", y: str = "y",
                by: list[str] | None = None) -> DataFrame:
    """Per-group convex hull vertex rows
    (by…, x, y, hull_n, hull_area2).  Collinear boundary points ARE
    vertices (the minimal-edge convention the SQL oracle can state
    pair-wise); hull_area2 is the doubled shoelace area — exact for
    grid-snapped inputs.

    Two-level plan: per-input-partition local chains first (mapInPandas
    — no shuffle, output is each partition's hull only), then one
    groupBy gathers just those candidates for the final chain.  The
    exchange therefore carries O(partitions × local hull size), not the
    input; the classic all-points-on-a-circle adversary degrades the
    final gather to the true hull size, which is the output size —
    inherent, not a plan defect."""
    by = list(by or [])
    base = points.select(*by, F.col(x).cast("double").alias("x"),
                         F.col(y).cast("double").alias("y"))
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in points.select(*by).dtypes]
        + ["x double", "y double"])
    final_schema = out_schema + ", hull_n int, hull_area2 double"

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            if by:
                for _, g in pdf.groupby(by, sort=False):
                    yield _hull_pdf(g, by, final=False)
            else:
                yield _hull_pdf(pdf, by, final=False)

    cands = base.mapInPandas(local, schema=out_schema)

    if by:
        return cands.groupBy(*by).applyInPandas(
            lambda pdf: _hull_pdf(pdf, by, final=True), schema=final_schema)

    def final_all(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in it if len(p)]
        if parts:
            yield _hull_pdf(pd.concat(parts, ignore_index=True), by, final=True)

    return cands.coalesce(1).mapInPandas(final_all, schema=final_schema)


# ---------------------------------------------------------------------------
# Douglas–Peucker line simplification
# ---------------------------------------------------------------------------


def _dp_keep(xs: np.ndarray, ys: np.ndarray, eps2_num: int) -> np.ndarray:
    """Kept-index boolean mask.  Exact int64 arithmetic: a point is far
    when cross((b-a),(p-a))² > eps²·|b-a|² — both sides integral for
    grid coordinates.  Farthest point wins; ties break to the smallest
    index (the pinned rule the recursive-CTE oracle replays)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        dx, dy = bx - ax, by - ay
        seg_len2 = dx * dx + dy * dy
        mx = xs[lo + 1:hi]
        my = ys[lo + 1:hi]
        cross = dx * (my - ay) - dy * (mx - ax)
        d2num = cross * cross
        if seg_len2 == 0:
            # degenerate closed segment: distance to the point itself
            d2num = ((mx - ax) ** 2 + (my - ay) ** 2)
            far = d2num > eps2_num
            thresh = eps2_num
        else:
            far = d2num > eps2_num * seg_len2
            thresh = eps2_num * seg_len2
        del thresh
        if not far.any():
            continue
        k = int(np.argmax(np.where(far, d2num, np.iinfo(np.int64).min)))
        # np.argmax returns the FIRST max — the smallest-index tiebreak
        k += lo + 1
        keep[k] = True
        stack.append((lo, k))
        stack.append((k, hi))
    return keep


def simplify_lines(lines: DataFrame, eps: float, *,
                   line_id: str = "line_id", seq: str = "seq",
                   x: str = "x", y: str = "y") -> DataFrame:
    """Douglas–Peucker per line: keep endpoints plus, recursively, the
    farthest point whose perpendicular distance to the current chord
    exceeds ``eps``.  One shuffle on the line id (applyInPandas); the
    per-line pass is a vectorized stack loop, exact in int64 for
    grid-snapped coordinates (eps² must be integral after scaling —
    callers pass integer eps for integer grids)."""
    eps2 = eps * eps
    eps2_num = int(round(eps2))
    if abs(eps2 - eps2_num) > 1e-12:
        raise OverlayError(
            "simplify_lines: eps² must be integral in grid units for the "
            "exact-arithmetic contract (got eps=%r)" % (eps,))
    id_t = dict(lines.dtypes)[line_id]
    schema = f"`{line_id}` {id_t}, `{seq}` long, x double, y double"

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq, kind="mergesort").reset_index(drop=True)
        xs = pdf[x].values.astype(np.int64)
        ys = pdf[y].values.astype(np.int64)
        if len(pdf) <= 2:
            mask = np.ones(len(pdf), dtype=bool)
        else:
            mask = _dp_keep(xs, ys, eps2_num)
        return pd.DataFrame({
            line_id: pdf[line_id][mask].values,
            seq: pdf[seq][mask].values.astype("int64"),
            "x": xs[mask].astype(float),
            "y": ys[mask].astype(float),
        })

    base = lines.select(line_id, F.col(seq).cast("long").alias(seq),
                        F.col(x).cast("double").alias(x),
                        F.col(y).cast("double").alias(y))
    return base.groupBy(line_id).applyInPandas(lambda p: one(p), schema=schema)
