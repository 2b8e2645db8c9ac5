"""Whole-raster statistics: the gdalinfo -stats / -hist twin,
distributed over tiles.

The reference's dataset-preparation docs lean on gdalinfo to sanity-
check downloaded rasters (nodata coverage, value ranges) before
serving; at catalog scale that is a two-pass Spark map:

  pass 1  one task per tile: decoded window -> EXACT partials
          (n_valid, n_nodata, fsum(value), fsum(value^2), min, max).
          math.fsum is correctly rounded, so each partial is the
          uniquely-determined double for its tile REGARDLESS of pixel
          order, and the driver's fsum over path-sorted partials is
          deterministic end to end — stats never wobble with
          partitioning. (float32 squares are exact in float64: 48
          mantissa bits < 53.)
  pass 2  histogram with the pass-1 global [min, max]: per-tile
          np.bincount on clamped floor((v - vmin) * n_buckets / range)
          (LEFT-closed equal-width buckets, max value folded into the
          last bucket), one map-side-combined groupBy(bucket).

Both passes are embarrassingly parallel tile maps (windowed reads,
remote tiles byte-range); only (tile, partial) and (bucket, count)
rows ever move. NODATA semantics match the resolver (_nodata_mask).

Bucketing note: gdalinfo -hist uses bucket CENTERS on min/max by
default; this operator uses the simpler left-closed equal-width
convention and documents it — the driver oracle replays the identical
expression in SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracle import _open_cached
from .zonal import _nodata_mask

__all__ = ["raster_stats", "raster_histogram"]

_PARTIAL_SCHEMA = (
    "path string, n_valid long, n_nodata long, vsum double, "
    "vsumsq double, vmin double, vmax double"
)


def _partials_df(spark: SparkSession, paths: list[str]) -> DataFrame:
    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")

    def scan(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                r = _open_cached(path)
                win, _ = r.read_window(0, r.height, 0, r.width)
                v = np.asarray(win.ravel(), dtype=np.float64)
                nod = _nodata_mask(v, r.nodata)
                vv = v[~nod]
                if vv.size:
                    rows.append((
                        path, int(vv.size), int(nod.sum()),
                        math.fsum(vv.tolist()),
                        math.fsum((vv * vv).tolist()),
                        float(vv.min()), float(vv.max()),
                    ))
                else:
                    rows.append((path, 0, int(nod.sum()), 0.0, 0.0,
                                 None, None))
            yield pd.DataFrame(
                rows, columns=["path", "n_valid", "n_nodata", "vsum",
                               "vsumsq", "vmin", "vmax"],
            )

    return pdf.repartition(max(1, min(len(paths), 64))).mapInPandas(
        scan, _PARTIAL_SCHEMA
    )


def raster_stats(spark: SparkSession, paths: list[str]) -> dict:
    """Exact whole-catalog statistics: {n_valid, n_nodata, vmin, vmax,
    vsum, vsumsq, mean, stddev} — deterministic (fsum partials combined
    in path order), population stddev like gdalinfo."""
    if not paths:
        raise ValueError("raster_stats: no raster paths")
    parts = _partials_df(spark, paths).collect()
    parts.sort(key=lambda r: r.path)
    n_valid = sum(int(r.n_valid) for r in parts)
    n_nodata = sum(int(r.n_nodata) for r in parts)
    if n_valid == 0:
        return {"n_valid": 0, "n_nodata": n_nodata, "vmin": None,
                "vmax": None, "vsum": 0.0, "vsumsq": 0.0, "mean": None,
                "stddev": None}
    vsum = math.fsum(float(r.vsum) for r in parts)
    vsumsq = math.fsum(float(r.vsumsq) for r in parts)
    vmin = min(float(r.vmin) for r in parts if r.vmin is not None)
    vmax = max(float(r.vmax) for r in parts if r.vmax is not None)
    mean = vsum / n_valid
    var = vsumsq / n_valid - (vsum / n_valid) * (vsum / n_valid)
    return {
        "n_valid": n_valid, "n_nodata": n_nodata, "vmin": vmin,
        "vmax": vmax, "vsum": vsum, "vsumsq": vsumsq, "mean": mean,
        "stddev": math.sqrt(max(var, 0.0)),
    }


def raster_histogram(
    spark: SparkSession,
    paths: list[str],
    n_buckets: int = 32,
    vmin: float | None = None,
    vmax: float | None = None,
) -> DataFrame:
    """(bucket, count) equal-width histogram over all valid cells.

    Bounds default to the exact pass-1 min/max. Left-closed buckets:
    bucket = clamp(floor((v - vmin) * n_buckets / (vmax - vmin))) with
    v == vmax folded into bucket n_buckets-1; empty buckets are emitted
    with count 0 so the output always has n_buckets rows.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if vmin is None or vmax is None:
        s = raster_stats(spark, paths)
        if s["n_valid"] == 0:
            raise ValueError("raster_histogram: no valid cells")
        vmin = s["vmin"] if vmin is None else vmin
        vmax = s["vmax"] if vmax is None else vmax
    if not (vmax > vmin):
        raise ValueError("raster_histogram: vmax must exceed vmin")
    lo, hi, nb = float(vmin), float(vmax), int(n_buckets)
    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")

    def hist(batches):
        for b in batches:
            acc = np.zeros(nb, dtype=np.int64)
            for path in b["path"]:
                r = _open_cached(path)
                win, _ = r.read_window(0, r.height, 0, r.width)
                v = np.asarray(win.ravel(), dtype=np.float64)
                v = v[~_nodata_mask(v, r.nodata)]
                v = v[(v >= lo) & (v <= hi)]
                if not v.size:
                    continue
                idx = np.floor((v - lo) * nb / (hi - lo)).astype(np.int64)
                np.clip(idx, 0, nb - 1, out=idx)
                acc += np.bincount(idx, minlength=nb)
            yield pd.DataFrame({
                "bucket": np.arange(nb, dtype=np.int64),
                "count": acc,
            })

    partial = pdf.repartition(max(1, min(len(paths), 64))).mapInPandas(
        hist, "bucket long, count long"
    )
    buckets = spark.range(nb).select(F.col("id").alias("bucket"))
    agg = partial.groupBy("bucket").agg(F.sum("count").alias("count"))
    return (
        buckets.join(agg, "bucket", "left")
        .select("bucket", F.coalesce("count", F.lit(0)).alias("count"))
    )
