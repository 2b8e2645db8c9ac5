"""Distributed color-relief rendering: gdaldem color-relief, Spark-first.

Maps elevations through a color ramp to RGBA tiles — the last gdaldem
mode this engine was missing (slope/aspect/hillshade/TPI/TRI/
roughness live in operators/terrain.py). Pointwise per tile: ZERO
shuffles, no halo, pure numpy per task.

Ramp contract (pinned because GDAL's rounding is implementation
detail): entries sorted by elevation; ``interpolate`` mode blends each
channel linearly between the bracketing entries and rounds with
floor(x + 0.5); elevations below the first / above the last entry
clamp to that entry's color; ``nearest`` snaps to the closest entry
(ties -> the lower elevation); ``exact`` colors only exact matches and
leaves everything else fully transparent. NODATA cells take the ``nv``
ramp entry if present, else transparent black.

Reference note: the reference's dataset docs render preview maps with
exactly this GDAL step (gdaldem color-relief in its toolbox); this is
the beyond-reference distributed equivalent, and it composes with
operators/tileexport.py for colored web-tile pyramids.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..oracle import _open_cached

__all__ = [
    "parse_color_ramp",
    "color_kernel",
    "colorrelief_tiles",
    "colorrelief_sequential",
]


def parse_color_ramp(text: str):
    """GDAL color-relief ramp text -> (entries, nv_color).

    One ``elevation r g b [a]`` per line; ``nv r g b [a]`` sets the
    NODATA color; '#' comments and blank lines ignored. Returns
    entries sorted by elevation as [(elev, (r, g, b, a)), ...]."""
    entries, nv = [], None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.replace(",", " ").split()
        if len(parts) not in (4, 5):
            raise ValueError(f"bad color ramp line: {raw!r}")
        rgba = [int(v) for v in parts[1:]]
        if len(rgba) == 3:
            rgba.append(255)
        if not all(0 <= v <= 255 for v in rgba):
            raise ValueError(f"color out of range in line: {raw!r}")
        if parts[0].lower() == "nv":
            nv = tuple(rgba)
        else:
            entries.append((float(parts[0]), tuple(rgba)))
    if not entries:
        raise ValueError("color ramp has no elevation entries")
    entries.sort(key=lambda e: e[0])
    elevs = [e for e, _c in entries]
    if len(set(elevs)) != len(elevs):
        raise ValueError("color ramp has duplicate elevation entries")
    return entries, nv


def color_kernel(
    arr: np.ndarray,
    entries,
    nv=None,
    mode: str = "interpolate",
) -> np.ndarray:
    """(h, w) float elevations -> (h, w, 4) uint8 RGBA per the module
    ramp contract. Vectorized: one searchsorted + channel blends."""
    if mode not in ("interpolate", "nearest", "exact"):
        raise ValueError(
            "mode must be 'interpolate', 'nearest' or 'exact'"
        )
    elevs = np.array([e for e, _c in entries], dtype=np.float64)
    colors = np.array([c for _e, c in entries], dtype=np.float64)
    finite = np.isfinite(arr)
    e = np.where(finite, arr, elevs[0])
    out = np.zeros(arr.shape + (4,), dtype=np.uint8)
    if mode == "interpolate":
        hi = np.clip(np.searchsorted(elevs, e, side="left"), 1,
                     len(elevs) - 1) if len(elevs) > 1 else None
        if hi is None:
            rgba = np.broadcast_to(colors[0], arr.shape + (4,)).copy()
        else:
            lo = hi - 1
            span = elevs[hi] - elevs[lo]
            t = np.clip((e - elevs[lo]) / span, 0.0, 1.0)
            rgba = colors[lo] + (colors[hi] - colors[lo]) * t[..., None]
        out[finite] = np.floor(rgba + 0.5).astype(np.uint8)[finite]
    elif mode == "nearest":
        pos = np.clip(np.searchsorted(elevs, e, side="left"), 1,
                      len(elevs) - 1) if len(elevs) > 1 else \
            np.zeros(arr.shape, np.int64)
        if len(elevs) > 1:
            lo = pos - 1
            # ties -> the LOWER elevation entry
            pick = np.where(
                (e - elevs[lo]) <= (elevs[pos] - e), lo, pos
            )
            # below first / above last clamp naturally via clip + tie
            pick = np.where(e <= elevs[0], 0, pick)
            pick = np.where(e >= elevs[-1], len(elevs) - 1, pick)
        else:
            pick = pos
        out[finite] = colors[pick].astype(np.uint8)[finite]
    else:  # exact
        pos = np.searchsorted(elevs, e)
        pos_c = np.clip(pos, 0, len(elevs) - 1)
        hit = finite & (elevs[pos_c] == e)
        out[hit] = colors[pos_c].astype(np.uint8)[hit]
    if nv is not None:
        out[~finite] = np.array(nv, dtype=np.uint8)
    return out


def colorrelief_tiles(
    spark: SparkSession,
    tiles: list[tuple[int, int, str]],
    out_dir: str,
    ramp: str,
    *,
    mode: str = "interpolate",
    num_partitions: int | None = None,
) -> DataFrame:
    """Render every tile through the ramp to an RGBA PNG under
    ``out_dir``. ``ramp``: GDAL color-relief text (see
    parse_color_ramp). Pointwise — zero shuffles, no halo, any tile
    keying. Returns the manifest (tile_iy, tile_ix, path, n_valid,
    md5)."""
    from .. import png

    if not tiles:
        raise ValueError("colorrelief_tiles needs at least one tile")
    entries, nv = parse_color_ramp(ramp)  # validate on the driver
    color_kernel(np.zeros((1, 1)), entries, nv, mode)  # validate mode
    tiles = [(int(iy), int(ix), p) for iy, ix, p in tiles]
    os.makedirs(out_dir, exist_ok=True)

    def process(batches):
        for b in batches:
            rows = []
            for t in b.itertuples(index=False):
                iy, ix = int(t.tile_iy), int(t.tile_ix)
                r = _open_cached(t.path)
                arr = r.read_block(0, r.height, 0, r.width)
                rgba = color_kernel(arr, entries, nv, mode)
                blob = png.encode_png(rgba, filter_type=2)
                dst = os.path.join(out_dir, f"relief_{iy}_{ix}.png")
                tmp = dst + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, dst)
                rows.append((
                    iy, ix, dst, int(np.isfinite(arr).sum()),
                    hashlib.md5(blob).hexdigest(),
                ))
            yield pd.DataFrame(rows, columns=[
                "tile_iy", "tile_ix", "path", "n_valid", "md5",
            ])

    pdf = spark.createDataFrame(
        tiles, "tile_iy long, tile_ix long, path string"
    )
    n = num_partitions or max(
        1, min(len(tiles), spark.sparkContext.defaultParallelism)
    )
    return pdf.repartition(n).mapInPandas(
        process,
        "tile_iy long, tile_ix long, path string, n_valid long,"
        " md5 string",
    )


def _scalar_color(e: float, entries, nv, mode: str):
    """Per-pixel reference evaluation of the ramp contract — pure
    Python, no searchsorted — for the sequential twin."""
    if not np.isfinite(e):
        return tuple(nv) if nv is not None else (0, 0, 0, 0)
    elevs = [v for v, _c in entries]
    colors = [c for _v, c in entries]
    if mode == "exact":
        for v, c in entries:
            if v == e:
                return c
        return (0, 0, 0, 0)
    if mode == "nearest":
        best = min(
            range(len(elevs)), key=lambda i: (abs(e - elevs[i]), elevs[i])
        )
        return colors[best]
    if e <= elevs[0]:
        return colors[0]
    if e >= elevs[-1]:
        return colors[-1]
    for i in range(1, len(elevs)):
        if e <= elevs[i]:
            t = (e - elevs[i - 1]) / (elevs[i] - elevs[i - 1])
            return tuple(
                int(np.floor(
                    colors[i - 1][k]
                    + (colors[i][k] - colors[i - 1][k]) * t + 0.5
                ))
                for k in range(4)
            )
    raise AssertionError("unreachable")


def colorrelief_sequential(
    tiles: list[tuple[int, int, str]],
    ramp: str,
    *,
    mode: str = "interpolate",
) -> list[tuple[int, int, int, str]]:
    """Single-process INDEPENDENT twin: evaluates the ramp PER PIXEL
    in pure Python (no searchsorted, no channel broadcasting), then
    encodes with the shared golden-tested PNG encoder so md5s are
    comparable. Returns sorted (tile_iy, tile_ix, n_valid, md5)."""
    from .. import png

    entries, nv = parse_color_ramp(ramp)
    rows = []
    for iy, ix, p in sorted((int(a), int(b), c) for a, b, c in tiles):
        r = _open_cached(p)
        arr = r.read_block(0, r.height, 0, r.width)
        h, w = arr.shape
        rgba = np.zeros((h, w, 4), dtype=np.uint8)
        for rr in range(h):
            for cc in range(w):
                rgba[rr, cc] = _scalar_color(
                    float(arr[rr, cc]), entries, nv, mode
                )
        blob = png.encode_png(rgba, filter_type=2)
        rows.append((
            iy, ix, int(np.isfinite(arr).sum()),
            hashlib.md5(blob).hexdigest(),
        ))
    return sorted(rows)
