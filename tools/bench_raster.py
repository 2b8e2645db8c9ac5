"""Raster-family throughput benchmark: pixels/sec for the per-tile ops.

Generates a cached grid of synthetic 1201x1201 float32 tiles (analytic
terrain, non-overlapping) and times each operator end-to-end (inputs
read + compute + GeoTIFF outputs written), reporting pixels/sec. These
are the embarrassingly-parallel per-tile maps (zero shuffles), so the
numbers measure raw decode/compute/encode bandwidth — compare runs only
within one box-weather day (see docs/BENCH.md).

    python tools/bench_raster.py                    # 16 tiles, local[32]
    RASTER_TILES=32 RASTER_CPUS=8 python tools/bench_raster.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TILES = int(os.environ.get("RASTER_TILES", "16"))
CPUS = int(os.environ.get("RASTER_CPUS", "32"))
SIDE = 1201


def make_tiles(root: str) -> list[tuple[int, int, str]]:
    from opentopodata_spark import geotiff
    from opentopodata_spark.fixtures import terrain_wgs84

    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, ".complete")
    n_side = int(np.ceil(np.sqrt(N_TILES)))
    tiles = []
    k = 0
    for ty in range(n_side):
        for tx in range(n_side):
            if k >= N_TILES:
                break
            k += 1
            path = os.path.join(root, f"b_{ty}_{tx}.tif")
            tiles.append((n_side - 1 - ty, tx, path))
            if os.path.exists(marker):
                continue
            res = 1.0 / SIDE
            lons = tx + (np.arange(SIDE) + 0.5) * res
            lats = (ty + 1) - (np.arange(SIDE) + 0.5) * res
            arr = terrain_wgs84(lats[:, None], lons[None, :]).astype(np.float32)
            geotiff.write_geotiff(
                path, arr, x0=float(tx), y0=float(ty + 1), sx=res, sy=res,
                epsg=4326,
            )
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write("ok\n")
    return tiles


def main() -> None:
    from opentopodata_spark.operators import contours, resample, terrain
    from opentopodata_spark.session import get_spark

    spark = get_spark(
        app_name="otds-raster-bench", cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), f"otds_raster_bench_{N_TILES}")
    tiles = make_tiles(root)
    n_px = N_TILES * SIDE * SIDE

    results: dict[str, float] = {}

    def timed(name, fn, runs=3):
        fn()  # warmup (fixture page cache, codegen, worker pool)
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        results[name] = sorted(times)[len(times) // 2]

    out = os.path.join(root, "out")

    def run_terrain():
        shutil.rmtree(out, ignore_errors=True)
        terrain.terrain_tiles(
            spark, tiles, out, kind="slope", scale=111120.0
        ).write.format("noop").mode("overwrite").save()

    def run_overview():
        shutil.rmtree(out, ignore_errors=True)
        resample.resample_tiles(
            spark, tiles, out, factor=8
        ).write.format("noop").mode("overwrite").save()

    def run_contours():
        contours.contour_tiles(
            spark, tiles, [1200.5, 1500.5, 1800.5]
        ).write.format("noop").mode("overwrite").save()

    timed("terrain_slope", run_terrain)
    timed("overview_x8", run_overview)
    timed("contours_3levels", run_contours)

    print(json.dumps({
        "metric": "raster_pixels_per_sec",
        "tiles": N_TILES,
        "pixels": n_px,
        "cores": CPUS,
        "seconds": {k: round(v, 3) for k, v in results.items()},
        "px_per_sec": {k: round(n_px / v, 0) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
