"""Map algebra: cell-wise arithmetic between aligned raster tile sets.

The change-detection / QA primitive (gdal_calc.py's job): given two tile
sets on the SAME grid (e.g. two yearly DEM releases), compute a cell-wise
expression per tile and write result tiles — plus the per-tile summary
statistics a 100 TB pipeline actually wants from a diff (count / mean /
max |delta|) without materializing anything but the manifest.

Scale shape: a pure per-tile map, zero shuffles. Tiles pair by (iy, ix)
key; the B-side tile is located by key and validated to share A's exact
affine (mismatched grids fail loudly per tile rather than resampling
silently — resample_tiles is the explicit tool for that). NODATA in
either input -> NODATA out (NaN-propagating float64 arithmetic).

Expressions: a whitelisted cell-wise vocabulary evaluated with numpy —
  "a - b", "b - a", "a + b", "(a + b) / 2", "abs(a - b)", "min(a, b)",
  "max(a, b)"
— enough for diffs/mosaics/QA; arbitrary code is deliberately NOT
eval'd (executor-side eval of user strings is a security and
serialization hazard).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..oracle import _open_cached

__all__ = ["raster_calc_tiles", "EXPRESSIONS"]

MANIFEST_SCHEMA = (
    "tile_iy long, tile_ix long, path string, n_valid long, "
    "sum_value double, max_abs double, checksum double, error string"
)

EXPRESSIONS: dict = {
    "a - b": lambda a, b: a - b,
    "b - a": lambda a, b: b - a,
    "a + b": lambda a, b: a + b,
    "(a + b) / 2": lambda a, b: (a + b) / 2.0,
    "abs(a - b)": lambda a, b: np.abs(a - b),
    "min(a, b)": lambda a, b: np.fmin(a, b),
    "max(a, b)": lambda a, b: np.fmax(a, b),
}


def raster_calc_tiles(
    spark: SparkSession,
    tiles_a: list[tuple[int, int, str]],
    tiles_b: list[tuple[int, int, str]],
    out_dir: str,
    *,
    expression: str = "a - b",
    dtype: str = "float32",
    nodata: float = -9999.0,
    num_partitions: int | None = None,
    skip_existing: bool = False,
) -> DataFrame:
    """Cell-wise ``expression`` over tile pairs matched by (iy, ix).

    Tiles present only on one side become error rows ("unpaired"), never
    silent drops. Returns the manifest (tile key, output path, n_valid,
    sum/max-abs summary, L1-norm lineage checksum, error).
    """
    if expression not in EXPRESSIONS:
        raise ValueError(
            f"unsupported expression '{expression}' — one of "
            f"{sorted(EXPRESSIONS)}"
        )
    fn = EXPRESSIONS[expression]
    b_by_key = {(int(iy), int(ix)): p for iy, ix, p in tiles_b}
    a_keys = {(int(iy), int(ix)) for iy, ix, _p in tiles_a}
    os.makedirs(out_dir, exist_ok=True)

    def process(batches):
        from .. import geotiff

        for batch in batches:
            rows = []
            for t in batch.itertuples(index=False):
                key = (int(t.tile_iy), int(t.tile_ix))
                out = os.path.join(out_dir, f"calc_{key[0]}_{key[1]}.tif")
                try:
                    if t.path_a is None:
                        raise ValueError("unpaired tile (no A-side match)")
                    if t.path_b is None:
                        raise ValueError("unpaired tile (no B-side match)")
                    if skip_existing and os.path.exists(out):
                        done = geotiff.open_raster(out)
                        band = done.read_window(
                            0, done.height, 0, done.width
                        )[0].astype(np.float64)
                        valid = band != float(done.nodata)
                        v = band[valid]
                        rows.append((
                            key[0], key[1], out, int(valid.sum()),
                            round(float(v.sum()), 3),
                            round(float(np.abs(v).max()), 3) if v.size else None,
                            round(float(np.abs(v).sum()), 3), None,
                        ))
                        continue
                    ra = _open_cached(t.path_a)
                    rb = _open_cached(t.path_b)
                    if (ra.width, ra.height) != (rb.width, rb.height) or (
                        (ra.x0, ra.y0, ra.sx, ra.sy)
                        != (rb.x0, rb.y0, rb.sx, rb.sy)
                    ):
                        raise ValueError(
                            "grid mismatch between A and B tiles "
                            "(resample first — resample_tiles)"
                        )
                    a = ra.read_block(0, ra.height, 0, ra.width)
                    b = rb.read_block(0, rb.height, 0, rb.width)
                    res = fn(a, b)  # NaN (either side's nodata) propagates
                    finite = np.isfinite(res)
                    arr = np.where(finite, res, nodata).astype(np.dtype(dtype))
                    v = arr[finite].astype(np.float64)
                    ci = ra.crs
                    tmp = out + f".tmp{os.getpid()}"
                    geotiff.write_geotiff(
                        tmp, arr, x0=ra.x0, y0=ra.y0, sx=ra.sx, sy=ra.sy,
                        epsg=(ci.epsg if ci else None),
                        wkt=(ci.wkt if ci and not ci.epsg else None),
                        nodata=nodata,
                    )
                    os.replace(tmp, out)
                    rows.append((
                        key[0], key[1], out, int(finite.sum()),
                        round(float(v.sum()), 3),
                        round(float(np.abs(v).max()), 3) if v.size else None,
                        # L1-norm digest: independent of sum_value (which
                        # cancels signed deltas), so it actually verifies
                        round(float(np.abs(v).sum()), 3), None,
                    ))
                except Exception as e:  # noqa: BLE001 — per-tile isolation
                    rows.append(
                        (key[0], key[1], None, 0, None, None, None, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=["tile_iy", "tile_ix", "path", "n_valid",
                         "sum_value", "max_abs", "checksum", "error"],
            )

    pairs = [
        (int(iy), int(ix), p, b_by_key.get((int(iy), int(ix))))
        for iy, ix, p in tiles_a
    ] + [
        (iy, ix, None, p)
        for (iy, ix), p in b_by_key.items()
        if (iy, ix) not in a_keys
    ]
    pdf = spark.createDataFrame(
        pairs, "tile_iy long, tile_ix long, path_a string, path_b string"
    )
    n = num_partitions or max(
        1, min(len(pairs), spark.sparkContext.defaultParallelism)
    )
    return pdf.repartition(n).mapInPandas(process, MANIFEST_SCHEMA)
