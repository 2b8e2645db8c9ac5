"""Rasterize: vector->raster aggregation of a point stream onto a grid.

The inverse-direction half of the north rule's "raster<->vector" item
(operators/zonal.py is raster->vector). Turns a 10^12-row point stream
into a regular raster grid: each point lands in the cell containing it,
cells aggregate (count / sum / min / max / mean), and the cell stream can
be materialized as GeoTIFF tiles written executor-side.

Scale shape:

    points -> (row, col) cell keys      narrow column exprs (floor math,
                                        whole-stage codegen, no Python)
    groupBy(row, col)                   THE wide shuffle, map-side combine
                                        (partial aggregation) so shuffle
                                        volume is O(occupied cells), not
                                        O(points)
    cells -> (tile_iy, tile_ix)         narrow
    groupBy(tile) + applyInPandas       tiny second shuffle (O(cells));
                                        each task assembles one tile array
                                        and writes one GeoTIFF

Cell assignment matches the raster model used everywhere else in this
repo (geotiff.Raster affine, north-up): col = floor((lon-x0)/sx),
row = floor((y0-lat)/sy) — a point exactly on a cell boundary belongs to
the cell below/right, i.e. IEEE floor semantics, identical in Spark and
any SQL engine.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GridSpec", "rasterize_points", "write_raster_tiles",
           "burn_features", "burn_sequential", "features_from_geojson",
           "features_to_df"]


class GridSpec:
    """North-up target grid: x = x0 + col*sx, y = y0 - row*sy."""

    def __init__(self, x0: float, y0: float, sx: float, sy: float,
                 width: int, height: int):
        if sx <= 0 or sy <= 0:
            raise ValueError("sx and sy must be positive")
        if width < 1 or height < 1:
            raise ValueError("width and height must be >= 1")
        self.x0, self.y0 = float(x0), float(y0)
        self.sx, self.sy = float(sx), float(sy)
        self.width, self.height = int(width), int(height)


def rasterize_points(
    points: DataFrame,
    grid: GridSpec,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str | None = None,
) -> DataFrame:
    """Aggregate points onto ``grid`` cells.

    Returns one row per OCCUPIED cell:
      row, col, n_points[, vsum, vmin, vmax, vmean]
    (value stats only when ``value_col`` is given; vmean rounded to 6dp).
    Out-of-grid points are dropped (the standard rasterize contract).

    Pure column expressions end-to-end — the only Python is none; the
    single wide shuffle carries partially-aggregated cells.
    """
    col = F.floor((F.col(lon_col) - F.lit(grid.x0)) / F.lit(grid.sx))
    row = F.floor((F.lit(grid.y0) - F.col(lat_col)) / F.lit(grid.sy))
    df = (
        points.withColumn("row", row.cast("long"))
        .withColumn("col", col.cast("long"))
        .where(
            (F.col("row") >= 0) & (F.col("row") < grid.height)
            & (F.col("col") >= 0) & (F.col("col") < grid.width)
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col is not None:
        v = F.col(value_col)
        aggs += [
            F.sum(v).alias("vsum"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            # NULL-valued points count toward n_points but not the value
            # stats; the mean must divide by the non-NULL count to stay
            # consistent with vsum/vmin/vmax
            F.count(v).alias("_n_values"),
        ]
    out = df.groupBy("row", "col").agg(*aggs)
    if value_col is not None:
        out = out.withColumn(
            "vmean",
            F.when(F.col("_n_values") > 0,
                   F.round(F.col("vsum") / F.col("_n_values"), 6)),
        ).drop("_n_values")
    return out


def write_raster_tiles(
    cells: DataFrame,
    grid: GridSpec,
    out_dir: str,
    *,
    value_col: str = "n_points",
    tile_px: int = 1024,
    dtype: str = "float32",
    nodata: float = -9999.0,
    epsg: int | None = 4326,
    skip_existing: bool = False,
) -> DataFrame:
    """Materialize a cell stream (output of :func:`rasterize_points`) as
    GeoTIFF tiles of ``tile_px`` x ``tile_px`` cells, one file per
    occupied tile, written EXECUTOR-side (out_dir must be shared storage
    on a real cluster — same contract as any Spark file sink).

    Returns the manifest DataFrame (tile_iy, tile_ix, path, n_cells,
    x0, y0) — also the lineage record for resume (a tile listed in the
    manifest is complete: files appear atomically via rename). With
    ``skip_existing=True`` tiles whose output file already exists are
    not rewritten (crash resume; the aggregation upstream still runs —
    it feeds the cell stream — but the write is skipped).

    The per-tile regroup is a TINY shuffle: its input is occupied cells
    (already aggregated), not points.
    """
    if tile_px < 1:
        raise ValueError("tile_px must be >= 1")
    g = grid
    os.makedirs(out_dir, exist_ok=True)
    # defensive in-grid filter: rasterize_points guarantees it, but this
    # sink accepts any cell stream and an out-of-grid row would otherwise
    # fault the tile task with a bare IndexError
    cells = cells.where(
        (F.col("row") >= 0) & (F.col("row") < g.height)
        & (F.col("col") >= 0) & (F.col("col") < g.width)
    )
    keyed = cells.withColumn(
        "tile_iy", (F.col("row") / tile_px).cast("long")
    ).withColumn("tile_ix", (F.col("col") / tile_px).cast("long"))

    schema = (
        "tile_iy long, tile_ix long, path string, n_cells long, "
        "x0 double, y0 double"
    )

    def write_tile(key, pdf):
        from .. import geotiff

        iy, ix = int(key[0]), int(key[1])
        r_off, c_off = iy * tile_px, ix * tile_px
        h = min(tile_px, g.height - r_off)
        w = min(tile_px, g.width - c_off)
        arr = np.full((h, w), nodata, dtype=np.dtype(dtype))
        rr = pdf["row"].to_numpy(dtype=np.int64) - r_off
        cc = pdf["col"].to_numpy(dtype=np.int64) - c_off
        arr[rr, cc] = pdf[value_col].to_numpy(dtype=np.dtype(dtype))
        tx0 = g.x0 + c_off * g.sx
        ty0 = g.y0 - r_off * g.sy
        path = os.path.join(out_dir, f"tile_{iy}_{ix}.tif")
        if not (skip_existing and os.path.exists(path)):
            tmp = path + f".tmp{os.getpid()}"
            geotiff.write_geotiff(
                tmp, arr, x0=tx0, y0=ty0, sx=g.sx, sy=g.sy, epsg=epsg,
                nodata=nodata,
            )
            os.replace(tmp, path)  # atomic publish
        return pd.DataFrame(
            [(iy, ix, path, len(pdf), tx0, ty0)],
            columns=["tile_iy", "tile_ix", "path", "n_cells", "x0", "y0"],
        )

    return keyed.groupBy("tile_iy", "tile_ix").applyInPandas(write_tile, schema)


# ---------------------------------------------------------------------------
# Polygon / line burning (gdal_rasterize core)
# ---------------------------------------------------------------------------
#
# The points path above is gdal_rasterize's point mode; this is the
# polygon/line mode: vector features burned into a raster grid.
#
# Scale shape — the FEATURES are the big side (think 10^9 parcels), the
# grid is tiled like every raster op in this repo:
#
#     features -> intersecting tiles     narrow exprs: per-feature bbox
#                                        (array_min/max over ring coords)
#                                        exploded to the tiles it can
#                                        touch — whole-stage codegen
#     groupBy(tile).applyInPandas        THE wide shuffle; each task
#                                        paints its tile in GLOBAL
#                                        feature order (order_idx sort —
#                                        gdal_rasterize's feature-order
#                                        paint semantics survive
#                                        distribution)
#     sentinel per tile                  uncovered tiles still emit an
#                                        init-valued raster (and under
#                                        invert=True a fully-burned one)
#
# Pixel predicates are PINNED IEEE expressions shared bit-for-bit with
# the sequential twin:
#   center rule   even-odd ray cast, the exact crossing expression of
#                 spatial.points_in_polygon_mask / the DuckDB zonal
#                 oracle: ((y1>lat) != (y2>lat)) AND
#                 lon < (x2-x1)*(lat-y1)/(y2-y1) + x1, XOR across rings
#                 (holes punch out)
#   all_touched   a pixel is additionally burned when any ring edge
#                 intersects its CLOSED square — the Liang-Barsky clip
#                 accept test (t0 <= t1, touching counts), evaluated
#                 with the same expression vectorized (kernel, over the
#                 edge's cell bbox) and scalar (twin, per pixel) so the
#                 masks agree exactly
#
# gdal_rasterize parity: -burn/-a (per-feature value), feature-order
# paint (later wins) or -add (accumulate), -i invert (burn where NO
# feature covers), -at all_touched, -init. Lines are the all_touched
# edge rule with no interior fill.


_BURN_SCHEMA = (
    "tile_iy long, tile_ix long, path string, n_burned long, "
    "checksum double"
)


def _ring_center_mask(nx, ny, xs, ys):
    """Even-odd crossing mask of pixel centers vs ONE ring — the pinned
    expression (see module notes); nx/ny flat float64 arrays."""
    inside = np.zeros(nx.shape, dtype=bool)
    n = len(xs)
    for k in range(n):
        y1, x1 = ys[k], xs[k]
        y2, x2 = ys[(k + 1) % n], xs[(k + 1) % n]
        if y1 == y2:
            continue
        crosses = (y1 > ny) != (y2 > ny)
        with np.errstate(invalid="ignore", divide="ignore"):
            xint = (x2 - x1) * (ny - y1) / (y2 - y1) + x1
        inside ^= crosses & (nx < xint)
    return inside


def _edge_touch_mask(h, w, r_off, c_off, g, xs, ys, closed=True):
    """Cells of an (h, w) tile window whose CLOSED square is touched by
    any edge of the ring (xs, ys) — vectorized Liang-Barsky accept test
    per edge over the edge's cell bbox."""
    touched = np.zeros((h, w), dtype=bool)
    n = len(xs)
    last = n if closed else n - 1
    for k in range(last):
        xa, ya = xs[k], ys[k]
        xb, yb = xs[(k + 1) % n], ys[(k + 1) % n]
        # candidate cells: the edge's bbox, clipped to the tile window
        c_lo = int(np.floor((min(xa, xb) - g.x0) / g.sx)) - 1
        c_hi = int(np.floor((max(xa, xb) - g.x0) / g.sx)) + 1
        r_lo = int(np.floor((g.y0 - max(ya, yb)) / g.sy)) - 1
        r_hi = int(np.floor((g.y0 - min(ya, yb)) / g.sy)) + 1
        c_lo, c_hi = max(c_lo, c_off), min(c_hi, c_off + w - 1)
        r_lo, r_hi = max(r_lo, r_off), min(r_hi, r_off + h - 1)
        if c_lo > c_hi or r_lo > r_hi:
            continue
        cc = np.arange(c_lo, c_hi + 1, dtype=np.float64)
        rr = np.arange(r_lo, r_hi + 1, dtype=np.float64)
        xl = g.x0 + cc * g.sx
        xr = g.x0 + (cc + 1.0) * g.sx
        yt = g.y0 - rr * g.sy
        yb_ = g.y0 - (rr + 1.0) * g.sy
        dx, dy = xb - xa, yb - ya
        t0 = np.zeros((rr.size, cc.size))
        t1 = np.ones((rr.size, cc.size))
        ok = np.ones((rr.size, cc.size), dtype=bool)
        for p, q in (
            (-dx, (xa - xl)[None, :] + np.zeros((rr.size, 1))),
            (dx, (xr - xa)[None, :] + np.zeros((rr.size, 1))),
            (-dy, (ya - yb_)[:, None] + np.zeros((1, cc.size))),
            (dy, (yt - ya)[:, None] + np.zeros((1, cc.size))),
        ):
            if p == 0.0:
                ok &= q >= 0.0
            else:
                t = q / p
                if p < 0.0:
                    t0 = np.maximum(t0, t)
                else:
                    t1 = np.minimum(t1, t)
        ok &= t0 <= t1
        touched[r_lo - r_off:r_hi + 1 - r_off,
                c_lo - c_off:c_hi + 1 - c_off] |= ok
    return touched


def _feature_mask(h, w, r_off, c_off, g, rings, *, all_touched,
                  fill=True):
    """Boolean coverage of one feature over a tile window. ``rings`` is
    a list of (xs, ys) float64 array pairs; even-odd XOR across rings
    (holes punch out); all_touched ORs the edge-touch mask of EVERY
    ring (hole boundaries burn too, pinned)."""
    if fill:
        cols = c_off + np.arange(w, dtype=np.float64)
        rows = r_off + np.arange(h, dtype=np.float64)
        nx = np.broadcast_to(g.x0 + (cols + 0.5) * g.sx, (h, w)).ravel()
        ny = np.broadcast_to(
            (g.y0 - (rows + 0.5) * g.sy)[:, None], (h, w)
        ).ravel()
        mask = np.zeros(h * w, dtype=bool)
        for xs, ys in rings:
            mask ^= _ring_center_mask(nx, ny, xs, ys)
        mask = mask.reshape(h, w)
    else:
        mask = np.zeros((h, w), dtype=bool)
    if all_touched or not fill:
        for xs, ys in rings:
            mask |= _edge_touch_mask(h, w, r_off, c_off, g, xs, ys,
                                     closed=fill)
    return mask


def _paint(arr, burned, mask, value, mode):
    if mode == "add":
        arr[mask] += value
    else:
        arr[mask] = value
    burned |= mask


def burn_features(
    spark,
    features: DataFrame,
    grid: GridSpec,
    out_dir: str | None,
    *,
    geometry: str = "polygon",
    mode: str = "paint",
    all_touched: bool = False,
    invert: bool = False,
    invert_value: float = 1.0,
    init: float = 0.0,
    tile_px: int = 1024,
    dtype: str = "float32",
    epsg: int | None = 4326,
) -> DataFrame:
    """Burn a feature DataFrame into ``grid``; one GeoTIFF per
    ``tile_px`` tile under ``out_dir`` (``None`` skips the file sink).
    Returns the manifest (tile_iy, tile_ix, path, n_burned, checksum)
    covering EVERY tile.

    ``features`` columns: ``order_idx`` (long — the GLOBAL paint order,
    UNIQUE per feature or overlapping ties paint nondeterministically;
    gdal_rasterize paints in feature order and later features win),
    ``rings`` (array<struct<lats:array<double>, lons:array<double>>> —
    ring 0 the outer boundary, further rings holes, even-odd), and
    ``burn`` (double — the -burn/-a value).

    ``geometry='line'`` burns every cell whose closed square the
    ring polyline touches (open — last vertex does not connect back),
    no interior fill. ``invert=True`` burns ``invert_value`` into every
    cell NO feature covers (paint order is irrelevant there; gdal's -i).
    """
    if geometry not in ("polygon", "line"):
        raise ValueError("geometry must be 'polygon' or 'line'")
    if mode not in ("paint", "add"):
        raise ValueError("mode must be 'paint' or 'add'")
    if invert and mode == "add":
        raise ValueError("invert and add cannot combine (gdal_rasterize"
                         " -i burns a fixed value)")
    if tile_px < 8:
        raise ValueError("tile_px must be >= 8")
    g = grid
    n_ty = (g.height + tile_px - 1) // tile_px
    n_tx = (g.width + tile_px - 1) // tile_px

    lats_of = "transform(rings, r -> r.lats)"
    lons_of = "transform(rings, r -> r.lons)"
    feat = features.select(
        F.col("order_idx").cast("long"),
        "rings",
        F.col("burn").cast("double"),
        F.expr(f"array_min(flatten({lons_of}))").alias("_xmin"),
        F.expr(f"array_max(flatten({lons_of}))").alias("_xmax"),
        F.expr(f"array_min(flatten({lats_of}))").alias("_ymin"),
        F.expr(f"array_max(flatten({lats_of}))").alias("_ymax"),
    )
    ts_x, ts_y = tile_px * g.sx, tile_px * g.sy
    # any burned cell lies within the feature bbox expanded by one cell
    # (its center or square touches the geometry); 1.5-cell slack, the
    # kernel's predicates are exact
    tx_lo = F.greatest(
        F.lit(0), F.floor((F.col("_xmin") - g.x0 - 1.5 * g.sx) / ts_x)
    ).cast("long")
    tx_hi = F.least(
        F.lit(n_tx - 1),
        F.floor((F.col("_xmax") - g.x0 + 1.5 * g.sx) / ts_x),
    ).cast("long")
    ty_lo = F.greatest(
        F.lit(0), F.floor((g.y0 - F.col("_ymax") - 1.5 * g.sy) / ts_y)
    ).cast("long")
    ty_hi = F.least(
        F.lit(n_ty - 1),
        F.floor((g.y0 - F.col("_ymin") + 1.5 * g.sy) / ts_y),
    ).cast("long")
    exploded = (
        feat.withColumn("_txl", tx_lo).withColumn("_txh", tx_hi)
        .withColumn("_tyl", ty_lo).withColumn("_tyh", ty_hi)
        .where((F.col("_txl") <= F.col("_txh"))
               & (F.col("_tyl") <= F.col("_tyh")))
        .select(
            F.explode(F.sequence("_tyl", "_tyh")).alias("tile_iy"),
            "_txl", "_txh", "order_idx", "rings", "burn",
        )
        .select(
            "tile_iy",
            F.explode(F.sequence("_txl", "_txh")).alias("tile_ix"),
            "order_idx", "rings", "burn",
        )
    )
    sentinels = spark.createDataFrame(
        [(iy, ix) for iy in range(n_ty) for ix in range(n_tx)],
        "tile_iy long, tile_ix long",
    ).select(
        "tile_iy", "tile_ix",
        F.lit(None).cast("long").alias("order_idx"),
        F.lit(None).cast(
            "array<struct<lats:array<double>,lons:array<double>>>"
        ).alias("rings"),
        F.lit(None).cast("double").alias("burn"),
    )
    keyed = exploded.unionByName(sentinels)
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    fill = geometry == "polygon"

    def process(key, pdf):
        from .. import geotiff

        iy, ix = int(key[0]), int(key[1])
        r_off, c_off = iy * tile_px, ix * tile_px
        h = min(tile_px, g.height - r_off)
        w = min(tile_px, g.width - c_off)
        arr = np.full((h, w), init, dtype=np.float64)
        burned = np.zeros((h, w), dtype=bool)
        pdf = pdf[pdf["order_idx"].notna()]
        pdf = pdf.sort_values("order_idx", kind="stable")
        for t in pdf.itertuples(index=False):
            rings = [
                (np.asarray(r["lons"], dtype=np.float64),
                 np.asarray(r["lats"], dtype=np.float64))
                for r in t.rings
            ]
            m = _feature_mask(h, w, r_off, c_off, g, rings,
                              all_touched=all_touched, fill=fill)
            _paint(arr, burned, m, float(t.burn), mode)
        if invert:
            arr = np.full((h, w), init, dtype=np.float64)
            arr[~burned] = invert_value
            burned = ~burned
        arr = arr.astype(np.dtype(dtype))
        path = ""
        if out_dir is not None:
            tx0 = g.x0 + c_off * g.sx
            ty0 = g.y0 - r_off * g.sy
            path = os.path.join(out_dir, f"burn_{iy}_{ix}.tif")
            tmp = path + f".tmp{os.getpid()}"
            geotiff.write_geotiff(
                tmp, arr, x0=tx0, y0=ty0, sx=g.sx, sy=g.sy,
                epsg=epsg, nodata=None,
            )
            os.replace(tmp, path)
        return pd.DataFrame(
            [(iy, ix, path, int(burned.sum()),
              round(float(arr.astype(np.float64).sum()), 3))],
            columns=["tile_iy", "tile_ix", "path", "n_burned",
                     "checksum"],
        )

    return keyed.groupBy("tile_iy", "tile_ix").applyInPandas(
        process, _BURN_SCHEMA
    )


def burn_sequential(
    feats: list[dict],
    grid: GridSpec,
    *,
    geometry: str = "polygon",
    mode: str = "paint",
    all_touched: bool = False,
    invert: bool = False,
    invert_value: float = 1.0,
    init: float = 0.0,
    tile_px: int = 1024,
    dtype: str = "float32",
) -> list[tuple[int, int, int, float]]:
    """Single-process INDEPENDENT twin: paint the WHOLE grid feature by
    feature (no tiles, no Spark), per-pixel scalar predicates — the
    same pinned IEEE expressions, a different evaluation structure.
    ``feats``: [{"rings": [{"lats": [...], "lons": [...]}, ...],
    "burn": v}] in list order (= order_idx). Returns sorted
    (tile_iy, tile_ix, n_burned, checksum)."""
    g = grid
    arr = np.full((g.height, g.width), init, dtype=np.float64)
    burned = np.zeros((g.height, g.width), dtype=bool)
    fill = geometry == "polygon"
    for ft in feats:
        m = np.zeros((g.height, g.width), dtype=bool)
        # pixels outside the feature bbox (one-cell margin) can be
        # neither center-inside nor square-touched — a cost bound, not
        # an algorithm change
        xs_all = [v for ring in ft["rings"] for v in ring["lons"]]
        ys_all = [v for ring in ft["rings"] for v in ring["lats"]]
        rb0 = max(0, int(np.floor((g.y0 - max(ys_all)) / g.sy)) - 1)
        rb1 = min(g.height - 1,
                  int(np.floor((g.y0 - min(ys_all)) / g.sy)) + 1)
        cb0 = max(0, int(np.floor((min(xs_all) - g.x0) / g.sx)) - 1)
        cb1 = min(g.width - 1,
                  int(np.floor((max(xs_all) - g.x0) / g.sx)) + 1)
        for r in range(rb0, rb1 + 1):
            ny = g.y0 - (r + 0.5) * g.sy
            for c in range(cb0, cb1 + 1):
                nx = g.x0 + (c + 0.5) * g.sx
                hit = False
                if fill:
                    inside = False
                    for ring in ft["rings"]:
                        xs, ys = ring["lons"], ring["lats"]
                        n = len(xs)
                        ring_in = False
                        for k in range(n):
                            y1, x1 = ys[k], xs[k]
                            y2, x2 = ys[(k + 1) % n], xs[(k + 1) % n]
                            if y1 == y2:
                                continue
                            if (y1 > ny) != (y2 > ny):
                                xint = ((x2 - x1) * (ny - y1)
                                        / (y2 - y1) + x1)
                                if nx < xint:
                                    ring_in = not ring_in
                        inside ^= ring_in
                    hit = inside
                if not hit and (all_touched or not fill):
                    xl = g.x0 + c * g.sx
                    xr = g.x0 + (c + 1.0) * g.sx
                    yt = g.y0 - r * g.sy
                    yb_ = g.y0 - (r + 1.0) * g.sy
                    for ring in ft["rings"]:
                        xs, ys = ring["lons"], ring["lats"]
                        n = len(xs)
                        last = n if fill else n - 1
                        for k in range(last):
                            xa, ya = xs[k], ys[k]
                            xb, yb = (xs[(k + 1) % n], ys[(k + 1) % n])
                            dx, dy = xb - xa, yb - ya
                            t0, t1, ok = 0.0, 1.0, True
                            for p, q in ((-dx, xa - xl), (dx, xr - xa),
                                         (-dy, ya - yb_), (dy, yt - ya)):
                                if p == 0.0:
                                    if q < 0.0:
                                        ok = False
                                        break
                                else:
                                    t = q / p
                                    if p < 0.0:
                                        t0 = max(t0, t)
                                    else:
                                        t1 = min(t1, t)
                            if ok and t0 <= t1:
                                hit = True
                                break
                        if hit:
                            break
                if hit:
                    m[r, c] = True
        if mode == "add":
            arr[m] += float(ft["burn"])
        else:
            arr[m] = float(ft["burn"])
        burned |= m
    if invert:
        arr = np.full((g.height, g.width), init, dtype=np.float64)
        arr[~burned] = invert_value
        burned = ~burned
    arr = arr.astype(np.dtype(dtype))
    n_ty = (g.height + tile_px - 1) // tile_px
    n_tx = (g.width + tile_px - 1) // tile_px
    rows = []
    for iy in range(n_ty):
        for ix in range(n_tx):
            a = arr[iy * tile_px:(iy + 1) * tile_px,
                    ix * tile_px:(ix + 1) * tile_px]
            b = burned[iy * tile_px:(iy + 1) * tile_px,
                       ix * tile_px:(ix + 1) * tile_px]
            rows.append((iy, ix, int(b.sum()),
                         round(float(a.astype(np.float64).sum()), 3)))
    return sorted(rows)


def features_from_geojson(path_or_obj, *, burn_attr: str | None = None,
                          burn_value: float = 1.0) -> list[dict]:
    """GeoJSON -> burn feature list [{"rings", "burn"}] in FEATURE
    ORDER (= gdal_rasterize paint order). Unlike
    spatial.polygons_from_geojson (the PIP front door, outer rings
    only), holes are KEPT — even-odd punches them out. Polygon /
    MultiPolygon / LineString / MultiLineString; the burn value comes
    from feature property ``burn_attr`` (-a) or the fixed
    ``burn_value`` (-burn). Accepts a path (GeoJSON, ESRI Shapefile
    ``.shp``, or GeoPackage ``.gpkg``) or a parsed mapping."""
    import os as _os

    if isinstance(path_or_obj, (str, bytes, _os.PathLike)):
        from .. import vector as _vector

        obj = _vector.load_features(path_or_obj)
    else:
        obj = path_or_obj
    t = obj.get("type")
    if t == "FeatureCollection":
        feats = obj["features"]
    elif t == "Feature":
        feats = [obj]
    elif t in ("Polygon", "MultiPolygon", "LineString",
               "MultiLineString"):
        feats = [{"type": "Feature", "geometry": obj, "properties": {}}]
    else:
        raise ValueError(f"unsupported GeoJSON type '{t}'")

    def _ring(coords, drop_closing):
        if drop_closing and len(coords) > 1 and coords[0] == coords[-1]:
            coords = coords[:-1]
        return {"lons": [float(v[0]) for v in coords],
                "lats": [float(v[1]) for v in coords]}

    out = []
    for feat in feats:
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        if burn_attr is not None:
            if burn_attr not in props:
                raise ValueError(
                    f"feature lacks burn attribute '{burn_attr}'"
                )
            v = float(props[burn_attr])
        else:
            v = float(burn_value)
        gt = geom.get("type")
        if gt == "Polygon":
            groups = [geom["coordinates"]]
            closed = True
        elif gt == "MultiPolygon":
            groups = list(geom["coordinates"])
            closed = True
        elif gt == "LineString":
            groups = [[geom["coordinates"]]]
            closed = False
        elif gt == "MultiLineString":
            groups = [[c] for c in geom["coordinates"]]
            closed = False
        else:
            raise ValueError(f"unsupported geometry type '{gt}'")
        for rings in groups:
            out.append({
                "rings": [_ring(r, closed) for r in rings],
                "burn": v,
                "geometry": "polygon" if closed else "line",
            })
    return out


def features_to_df(spark, feats: list[dict]) -> DataFrame:
    """Burn feature list -> the (order_idx, rings, burn) DataFrame
    ``burn_features`` takes; list order becomes the paint order."""
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
