"""Distributed scattered-point gridding: gdal_grid's core, Spark-first.

Interpolates an UNBOUNDED point stream (lat, lon, value) onto a regular
north-up raster grid — the remaining member of the GDAL utility family
(gdal_polygonize / sieve / fillnodata / proximity / dem are siblings in
this repo). Algorithms match gdal_grid's public surface:

  invdist           inverse-distance-to-a-power:  v = Σ w·vᵢ / Σ w,
                    w = (d² + smoothing²)^(-power/2); an EXACT node hit
                    (d == 0, smoothing == 0) returns that point's value
                    (lowest point id wins — GDAL takes "first found",
                    which is scan-order-dependent; this engine pins it)
  invdistnn         invdist restricted to the ``max_points`` nearest
                    candidates (GDAL's nearest-neighbour variant)
  average           moving average of values inside the search ellipse
  nearest           value of the nearest in-ellipse point
                    (ties broken by lowest point id)
  minimum / maximum / range / count / average_distance
                    gdal_grid's "data metrics" family

Search ellipse: ``radius1``/``radius2`` semi-axes rotated ``angle``
degrees counter-clockwise, membership (x'/r1)² + (y'/r2)² <= 1 in the
rotated frame; distances for weighting stay TRUE euclidean. Nodes with
fewer than ``min_points`` in-ellipse candidates get NODATA. Grid nodes
sit at CELL CENTERS (x0 + (col+.5)·sx, y0 - (row+.5)·sy), gdal_grid's
node model for a -outsize/-txe raster.

Scale shape (the points are the big side — think 10^12 rows; the GRID
is what fits the tile contract):

    points -> influencing tiles      narrow column exprs: a point can
                                     only touch nodes within
                                     R = max(radius1, radius2), so it is
                                     exploded to the (usually 1, at most
                                     4 for R < tile extent) output tiles
                                     whose node bbox expanded by R
                                     contains it — whole-stage codegen,
                                     no Python
    groupBy(tile).applyInPandas      THE wide shuffle, O(points·dup)
                                     rows; each task evaluates its
                                     tile's nodes against its bounded
                                     halo candidate set, vectorized
                                     (mask/distance matrices in node
                                     chunks), and writes one GeoTIFF
    empty tiles                      a driver-side sentinel union (one
                                     row per tile, null point) so
                                     uncovered tiles still emit a
                                     constant-NODATA raster — no second
                                     job, no driver collect of points

``radius1 = radius2 = 0`` (gdal_grid's "use ALL points" default) cannot
be halo-bounded — every point influences every node. That path
broadcasts the point set and refuses loudly above
``broadcast_limit`` rows: at engine scale an unbounded-search gridding
over 10^12 points is not a computable request, and pretending otherwise
with an O(points x nodes) shuffle would be a silent cluster-killer.

Bit-exactness contract: per node, candidates are evaluated in point-id
order as a COMPACT array (mask -> take), so the sequential twin
(`grid_sequential`, brute force over all points per node, no tiles, no
halos) reproduces every float64 intermediate and every float32 stored
cell exactly — same compaction order, same expression shapes, same
np.sum reduction tree.

Reference note: the reference's dataset-preparation docs shell out to
the GDAL toolbox (docs/notes/performance-optimisation.md); gdal_grid is
that toolbox's vector->raster interpolator. This is the
beyond-reference distributed equivalent.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rasterize import GridSpec

__all__ = [
    "grid_points",
    "grid_sequential",
    "GRID_ALGORITHMS",
]

GRID_ALGORITHMS = (
    "invdist", "invdistnn", "average", "nearest",
    "minimum", "maximum", "range", "count", "average_distance",
)

# chunk the node x candidate matrices so a task never materializes more
# than ~32 MB of float64 per intermediate (4M elements)
_CHUNK_ELEMS = 4_000_000


def _validate(algorithm, power, smoothing, radius1, radius2,
              min_points, max_points):
    if algorithm not in GRID_ALGORITHMS:
        raise ValueError(
            f"unknown algorithm '{algorithm}' — one of {GRID_ALGORITHMS}"
        )
    if (radius1 == 0) != (radius2 == 0):
        raise ValueError(
            "radius1 and radius2 must be both zero (all-points search) "
            "or both positive"
        )
    if radius1 < 0 or radius2 < 0:
        raise ValueError("search radii must be >= 0")
    if power <= 0:
        raise ValueError("power must be > 0")
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    if min_points < 0 or max_points < 0:
        raise ValueError("min_points/max_points must be >= 0")


def _node_values(
    nx: np.ndarray, ny: np.ndarray,
    px: np.ndarray, py: np.ndarray, pv: np.ndarray,
    *,
    algorithm: str, power: float, smoothing: float,
    radius1: float, radius2: float, angle: float,
    min_points: int, max_points: int,
) -> np.ndarray:
    """Evaluate ``len(nx)`` nodes against the pid-ORDERED candidate
    arrays (px, py, pv). NaN where the node gets NODATA. The per-node
    compact-candidate evaluation order is the bit-exactness contract
    shared with :func:`grid_sequential`."""
    n = nx.shape[0]
    out = np.full(n, np.nan)
    if px.shape[0] == 0:
        if algorithm == "count":
            out[:] = 0.0
        return out
    p_count = px.shape[0]
    bounded = radius1 > 0
    if angle:
        ca = math.cos(math.radians(angle))
        sa = math.sin(math.radians(angle))
    chunk = max(1, _CHUNK_ELEMS // p_count)
    s2 = smoothing * smoothing
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        dx = nx[lo:hi, None] - px[None, :]
        dy = ny[lo:hi, None] - py[None, :]
        d2 = dx * dx + dy * dy
        if bounded:
            if angle:
                xr = dx * ca + dy * sa
                yr = -dx * sa + dy * ca
            else:
                xr, yr = dx, dy
            u = xr / radius1
            w_ = yr / radius2
            mask = u * u + w_ * w_ <= 1.0
        else:
            mask = np.ones_like(d2, dtype=bool)
        counts = mask.sum(axis=1)
        for i in range(hi - lo):
            c = int(counts[i])
            if c == 0 or c < min_points:
                if algorithm == "count" and c >= min_points:
                    out[lo + i] = 0.0
                continue
            m = mask[i]
            d2c = d2[i][m]          # compact, pid order
            if max_points and c > max_points:
                # nearest max_points; stable sort on d2 over
                # pid-ordered columns pins ties to the lowest pid
                keep = np.sort(
                    np.argsort(d2c, kind="stable")[:max_points]
                )
                d2c = d2c[keep]
                vc = pv[m][keep]
                c = max_points
            else:
                vc = pv[m]
            if algorithm in ("invdist", "invdistnn"):
                if s2 == 0.0:
                    z = d2c == 0.0
                    if z.any():
                        out[lo + i] = vc[np.flatnonzero(z)[0]]
                        continue
                w = (d2c + s2) ** (-power / 2.0)
                out[lo + i] = np.sum(w * vc) / np.sum(w)
            elif algorithm == "average":
                out[lo + i] = np.sum(vc) / c
            elif algorithm == "nearest":
                out[lo + i] = vc[int(np.argmin(d2c))]
            elif algorithm == "minimum":
                out[lo + i] = np.min(vc)
            elif algorithm == "maximum":
                out[lo + i] = np.max(vc)
            elif algorithm == "range":
                out[lo + i] = np.max(vc) - np.min(vc)
            elif algorithm == "count":
                out[lo + i] = float(c)
            else:  # average_distance
                out[lo + i] = np.sum(np.sqrt(d2c)) / c
    return out


def grid_points(
    spark: SparkSession,
    points: DataFrame,
    grid: GridSpec,
    out_dir: str | None,
    *,
    algorithm: str = "invdist",
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
    power: float = 2.0,
    smoothing: float = 0.0,
    radius1: float = 0.0,
    radius2: float = 0.0,
    angle: float = 0.0,
    min_points: int = 0,
    max_points: int = 0,
    nodata: float = -9999.0,
    tile_px: int = 256,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """Grid a point DataFrame onto ``grid``; one float32 GeoTIFF per
    ``tile_px`` x ``tile_px`` tile under ``out_dir`` (``None`` skips the
    file sink). Returns the manifest
    (tile_iy, tile_ix, path, n_valid, checksum) covering EVERY tile of
    the grid — uncovered tiles are constant NODATA.

    Point identity (the tie/order pin) is the stream order per the
    (lat, lon, value) triple: rows are ranked by (lat, lon, value) — a
    total, layout-independent order for distinct points; exact
    duplicate triples are interchangeable so their arbitrary relative
    order cannot change any result.
    """
    if algorithm == "invdistnn" and max_points == 0:
        max_points = 12  # gdal_grid's invdistnn default
    _validate(algorithm, power, smoothing, radius1, radius2,
              min_points, max_points)
    if tile_px < 8:
        raise ValueError("tile_px must be >= 8")
    g = grid
    n_ty = (g.height + tile_px - 1) // tile_px
    n_tx = (g.width + tile_px - 1) // tile_px

    pts = points.select(
        F.col(lon_col).cast("double").alias("x"),
        F.col(lat_col).cast("double").alias("y"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull()
            & F.col("v").isNotNull() & ~F.isnan("x") & ~F.isnan("y")
            & ~F.isnan("v"))  # NaN is NOT null in Spark — drop both

    if radius1 == 0:
        # all-points search: every point influences every node. Only
        # sane as a broadcast; refuse loudly above the limit instead of
        # silently running an O(points x nodes) job.
        head = pts.limit(broadcast_limit + 1).toPandas()
        if len(head) > broadcast_limit:
            raise ValueError(
                f"radius=0 (all-points search) with > {broadcast_limit}"
                " points — set a finite search radius for the"
                " halo-bounded distributed path"
            )
        head = head.sort_values(["y", "x", "v"], kind="stable")
        bpts = spark.sparkContext.broadcast((
            head["x"].to_numpy(np.float64),
            head["y"].to_numpy(np.float64),
            head["v"].to_numpy(np.float64),
        ))
        keyed = spark.createDataFrame(
            [(iy, ix) for iy in range(n_ty) for ix in range(n_tx)],
            "tile_iy long, tile_ix long",
        ).withColumn("x", F.lit(None).cast("double")) \
         .withColumn("y", F.lit(None).cast("double")) \
         .withColumn("v", F.lit(None).cast("double"))
    else:
        bpts = None
        R = max(radius1, radius2)
        ts_x = tile_px * g.sx
        ts_y = tile_px * g.sy
        # tiles whose node bbox expanded by R can contain the point —
        # the node at exactly x = px ± R lives at col
        # (px ± R - x0)/sx - 0.5, so bound with 1.5 px of slack on each
        # side: membership is decided EXACTLY by the kernel's ellipse
        # re-check, over-assignment only costs duplicate shuffle rows
        tx_lo = F.greatest(
            F.lit(0),
            F.floor((F.col("x") - g.x0 - R - 1.5 * g.sx) / ts_x),
        ).cast("long")
        tx_hi = F.least(
            F.lit(n_tx - 1),
            F.floor((F.col("x") - g.x0 + R + 1.5 * g.sx) / ts_x),
        ).cast("long")
        ty_lo = F.greatest(
            F.lit(0),
            F.floor((g.y0 - F.col("y") - R - 1.5 * g.sy) / ts_y),
        ).cast("long")
        ty_hi = F.least(
            F.lit(n_ty - 1),
            F.floor((g.y0 - F.col("y") + R + 1.5 * g.sy) / ts_y),
        ).cast("long")
        exploded = (
            pts.withColumn("_txl", tx_lo).withColumn("_txh", tx_hi)
            .withColumn("_tyl", ty_lo).withColumn("_tyh", ty_hi)
            .where((F.col("_txl") <= F.col("_txh"))
                   & (F.col("_tyl") <= F.col("_tyh")))
            .select(
                F.explode(
                    F.sequence(F.col("_tyl"), F.col("_tyh"))
                ).alias("tile_iy"),
                F.col("_txl"), F.col("_txh"), "x", "y", "v",
            )
            .select(
                "tile_iy",
                F.explode(
                    F.sequence(F.col("_txl"), F.col("_txh"))
                ).alias("tile_ix"),
                "x", "y", "v",
            )
        )
        # sentinel row per tile so uncovered tiles still produce a
        # constant-NODATA raster in the same job
        sentinels = spark.createDataFrame(
            [(iy, ix) for iy in range(n_ty) for ix in range(n_tx)],
            "tile_iy long, tile_ix long",
        ).withColumn("x", F.lit(None).cast("double")) \
         .withColumn("y", F.lit(None).cast("double")) \
         .withColumn("v", F.lit(None).cast("double"))
        keyed = exploded.unionByName(sentinels)

    kw = dict(
        algorithm=algorithm, power=power, smoothing=smoothing,
        radius1=radius1, radius2=radius2, angle=angle,
        min_points=min_points, max_points=max_points,
    )
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)

    def process(key, pdf):
        from .. import geotiff

        iy, ix = int(key[0]), int(key[1])
        r_off, c_off = iy * tile_px, ix * tile_px
        h = min(tile_px, g.height - r_off)
        w = min(tile_px, g.width - c_off)
        if bpts is not None:
            px, py, pv = bpts.value
        else:
            pdf = pdf[pdf["x"].notna()]
            pdf = pdf.sort_values(["y", "x", "v"], kind="stable")
            px = pdf["x"].to_numpy(np.float64)
            py = pdf["y"].to_numpy(np.float64)
            pv = pdf["v"].to_numpy(np.float64)
        cols = c_off + np.arange(w, dtype=np.float64)
        rows = r_off + np.arange(h, dtype=np.float64)
        nx = np.broadcast_to(
            g.x0 + (cols + 0.5) * g.sx, (h, w)
        ).ravel()
        ny = np.broadcast_to(
            (g.y0 - (rows + 0.5) * g.sy)[:, None], (h, w)
        ).ravel()
        vals = _node_values(nx, ny, px, py, pv, **kw).reshape(h, w)
        fin = np.isfinite(vals)
        arr = np.where(fin, vals, nodata).astype(np.float32)
        path = ""
        if out_dir is not None:
            tx0 = g.x0 + c_off * g.sx
            ty0 = g.y0 - r_off * g.sy
            path = os.path.join(out_dir, f"grid_{iy}_{ix}.tif")
            tmp = path + f".tmp{os.getpid()}"
            geotiff.write_geotiff(
                tmp, arr, x0=tx0, y0=ty0, sx=g.sx, sy=g.sy,
                epsg=4326, nodata=nodata,
            )
            os.replace(tmp, path)
        stored = arr[fin].astype(np.float64)
        return pd.DataFrame(
            [(iy, ix, path, int(fin.sum()),
              round(float(stored.sum()), 3))],
            columns=["tile_iy", "tile_ix", "path", "n_valid",
                     "checksum"],
        )

    return keyed.groupBy("tile_iy", "tile_ix").applyInPandas(
        process,
        "tile_iy long, tile_ix long, path string, n_valid long, "
        "checksum double",
    )


def grid_sequential(
    points,
    grid: GridSpec,
    *,
    algorithm: str = "invdist",
    power: float = 2.0,
    smoothing: float = 0.0,
    radius1: float = 0.0,
    radius2: float = 0.0,
    angle: float = 0.0,
    min_points: int = 0,
    max_points: int = 0,
    tile_px: int = 256,
) -> list[tuple[int, int, int, float]]:
    """Single-process INDEPENDENT twin: per node, brute force over ALL
    points (no tiling, no halo assignment, no Spark) with the same
    compact-candidate evaluation order. ``points`` is an iterable of
    (lat, lon, value). Returns sorted
    (tile_iy, tile_ix, n_valid, checksum) rows over the full tile
    cover, NODATA tiles included."""
    if algorithm == "invdistnn" and max_points == 0:
        max_points = 12
    _validate(algorithm, power, smoothing, radius1, radius2,
              min_points, max_points)
    g = grid
    arr = np.asarray([(x, y, v) for (y, x, v) in points],
                     dtype=np.float64).reshape(-1, 3)
    # pid order = (y, x, v): match grid_points' rank pin
    order = np.lexsort((arr[:, 2], arr[:, 0], arr[:, 1]))
    px, py, pv = arr[order, 0], arr[order, 1], arr[order, 2]
    bounded = radius1 > 0
    if angle:
        ca = math.cos(math.radians(angle))
        sa = math.sin(math.radians(angle))
    s2 = smoothing * smoothing
    vals = np.full((g.height, g.width), np.nan)
    for r in range(g.height):
        nyv = g.y0 - (r + 0.5) * g.sy
        for c in range(g.width):
            nxv = g.x0 + (c + 0.5) * g.sx
            dx = nxv - px
            dy = nyv - py
            d2 = dx * dx + dy * dy
            if bounded:
                if angle:
                    xr = dx * ca + dy * sa
                    yr = -dx * sa + dy * ca
                else:
                    xr, yr = dx, dy
                u = xr / radius1
                w_ = yr / radius2
                m = u * u + w_ * w_ <= 1.0
            else:
                m = np.ones_like(d2, dtype=bool)
            cnt = int(m.sum())
            if cnt == 0 or cnt < min_points:
                if algorithm == "count" and cnt >= min_points:
                    vals[r, c] = 0.0
                continue
            d2c = d2[m]
            vc = pv[m]
            if max_points and cnt > max_points:
                keep = np.sort(
                    np.argsort(d2c, kind="stable")[:max_points]
                )
                d2c, vc = d2c[keep], vc[keep]
                cnt = max_points
            if algorithm in ("invdist", "invdistnn"):
                if s2 == 0.0:
                    z = d2c == 0.0
                    if z.any():
                        vals[r, c] = vc[np.flatnonzero(z)[0]]
                        continue
                w = (d2c + s2) ** (-power / 2.0)
                vals[r, c] = np.sum(w * vc) / np.sum(w)
            elif algorithm == "average":
                vals[r, c] = np.sum(vc) / cnt
            elif algorithm == "nearest":
                vals[r, c] = vc[int(np.argmin(d2c))]
            elif algorithm == "minimum":
                vals[r, c] = np.min(vc)
            elif algorithm == "maximum":
                vals[r, c] = np.max(vc)
            elif algorithm == "range":
                vals[r, c] = np.max(vc) - np.min(vc)
            elif algorithm == "count":
                vals[r, c] = float(cnt)
            else:
                vals[r, c] = np.sum(np.sqrt(d2c)) / cnt
    n_ty = (g.height + tile_px - 1) // tile_px
    n_tx = (g.width + tile_px - 1) // tile_px
    rows = []
    for iy in range(n_ty):
        for ix in range(n_tx):
            core = vals[iy * tile_px:(iy + 1) * tile_px,
                        ix * tile_px:(ix + 1) * tile_px]
            fin = np.isfinite(core)
            stored = core[fin].astype(np.float32).astype(np.float64)
            rows.append((iy, ix, int(fin.sum()),
                         round(float(stored.sum()), 3)))
    return sorted(rows)
