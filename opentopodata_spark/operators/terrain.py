"""Terrain derivatives: slope / aspect / hillshade over a tiled raster.

A distributed 3x3 stencil (Horn 1981, the kernel gdaldem uses) where the
hard part is the tile seams: every border pixel's neighborhood spans up
to 3 neighboring tiles. The engine keeps the computation SHUFFLE-FREE:

    tile index rows     -> round-robin partitions    (uniform work units)
    per tile            -> own band + 1-pixel HALO read directly from the
                           <=8 neighboring tiles (windowed strip reads —
                           object-store range GETs on a real cluster, a
                           handful of KB per seam; no pixel ever shuffles)
    Horn kernel         -> vectorized numpy over the padded array
    GeoTIFF tile sink   -> atomic rename + manifest row

Correctness invariant (tests/test_terrain.py): the stitched distributed
output is IDENTICAL to running the same kernel single-process over the
whole mosaic — seams are invisible. Halo pixels are located by exact
affine arithmetic against each neighbor's own georeferencing (center
alignment asserted to 1e-6 px), so 1-pixel-overlap conventions like
SRTM's shared edge rows work unchanged. Where no neighbor covers a halo
cell (the mosaic's outer border, missing tiles) the neighborhood is
incomplete and the output pixel is NODATA — gdaldem's default
(no -compute_edges) mosaic-border behavior.

Conventions (all public/standard):
  slope_deg  = degrees(atan(z_factor * hypot(dz/dx_east, dz/dy_north)))
  aspect_deg = compass bearing of the DOWNSLOPE direction,
               degrees(atan2(-dz/dx_east, -dz/dy_north)) mod 360
               (flat cells -> NODATA)
  hillshade  = round(255 * max(0, cos(zenith)cos(slope)
               + sin(zenith)sin(slope)cos(azimuth - aspect_uphill)))
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..oracle import _open_cached

__all__ = ["horn_derivatives", "terrain_kernel", "terrain_tiles"]

MANIFEST_SCHEMA = (
    "tile_iy long, tile_ix long, path string, n_valid long, "
    "checksum double, error string"
)

# (esri_code, d_row_south, d_col_east) in tie-break order (lowest code wins)
D8_CODES = (
    (1, 0, 1), (2, 1, 1), (4, 1, 0), (8, 1, -1),
    (16, 0, -1), (32, -1, -1), (64, -1, 0), (128, -1, 1),
)


def horn_derivatives(padded: np.ndarray, sx: float, sy: float, scale: float):
    """(dz/dx_east, dz/dy_north) from a NaN-padded (h+2, w+2) float64
    array; NaN anywhere in the 3x3 neighborhood (center included) -> NaN
    output (gdaldem's nodata handling). ``scale`` converts xy units to z
    units (e.g. 111120 for degrees->meters)."""
    z = padded
    a = z[:-2, :-2]; b = z[:-2, 1:-1]; c = z[:-2, 2:]
    d = z[1:-1, :-2];                  f = z[1:-1, 2:]
    g = z[2:, :-2];  h = z[2:, 1:-1];  i = z[2:, 2:]
    dzdx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / (8.0 * sx * scale)
    # rows grow southward: Horn's row difference is dz/d(south); negate
    dzdy_south = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * sy * scale)
    # Horn's stencil skips the center pixel, but a NODATA center must
    # still produce NODATA output (gdaldem semantics): propagate its NaN
    center_nan = 0.0 * z[1:-1, 1:-1]
    return dzdx + center_nan, -dzdy_south + center_nan


def zevenbergen_thorne_derivatives(padded: np.ndarray, sx: float,
                                   sy: float, scale: float):
    """(dz/dx_east, dz/dy_north) by the Zevenbergen-Thorne (1987)
    4-neighbor central difference — gdaldem's ``-alg
    ZevenbergenThorne``. Sharper than Horn on smooth terrain (exact for
    any surface linear in the cross direction, e.g. x*y^2 along x,
    where Horn's row-averaged stencil biases by t^2/2), noisier on
    rough terrain. Same NODATA discipline: NaN anywhere the stencil
    touches (center included) -> NaN out."""
    z = padded
    b = z[:-2, 1:-1]
    d = z[1:-1, :-2]; f = z[1:-1, 2:]
    h = z[2:, 1:-1]
    dzdx = (f - d) / (2.0 * sx * scale)
    dzdy_south = (h - b) / (2.0 * sy * scale)
    center_nan = 0.0 * z[1:-1, 1:-1]
    # corners must still poison (gdaldem masks on the full 3x3 window)
    corner_nan = 0.0 * (z[:-2, :-2] + z[:-2, 2:] + z[2:, :-2]
                        + z[2:, 2:])
    return (dzdx + center_nan + corner_nan,
            -dzdy_south + center_nan + corner_nan)


def terrain_kernel(
    padded: np.ndarray, sx: float, sy: float, kind: str, *,
    scale: float = 1.0, z_factor: float = 1.0,
    azimuth: float = 315.0, altitude: float = 45.0,
    alg: str = "horn",
) -> np.ndarray:
    """Padded (h+2, w+2) float64 -> (h, w) derivative of ``kind``.

    ``alg`` selects the gradient stencil for the slope/aspect/hillshade
    family: ``'horn'`` (gdaldem default) or ``'zevenbergen_thorne'``
    (gdaldem -alg ZevenbergenThorne); ignored by the neighborhood-
    statistics and flow_dir kinds, which have no gradient."""
    if alg not in ("horn", "zevenbergen_thorne"):
        raise ValueError(
            "alg must be 'horn' or 'zevenbergen_thorne'"
        )
    if kind == "flow_dir":
        # D8 steepest-descent direction, ESRI encoding (E=1 SE=2 S=4 SW=8
        # W=16 NW=32 N=64 NE=128; pit/flat=0). Drop RATE per unit distance
        # (diagonals over hypot(sx,sy)); NODATA neighbors are excluded
        # (directions never point into NODATA), ties break to the lowest
        # code — deterministic, so tiled == mosaic bit-for-bit. NODATA
        # center -> NODATA out.
        z = padded
        c0 = z[1:-1, 1:-1]
        best = np.zeros(c0.shape)
        code = np.zeros(c0.shape)
        for dcode, dy, dx in D8_CODES:
            nbv = z[1 + dy:z.shape[0] - 1 + dy, 1 + dx:z.shape[1] - 1 + dx]
            if dy and dx:
                dist = float(np.hypot(sx, sy)) * scale
            elif dx:
                dist = sx * scale
            else:
                dist = sy * scale
            with np.errstate(invalid="ignore"):
                rate = (c0 - nbv) / dist
                take = rate > best  # NaN rate compares False: excluded
            code = np.where(take, float(dcode), code)
            best = np.where(take, rate, best)
        code = code + 0.0 * c0  # propagate NODATA centers
        return code
    if kind in ("tpi", "tri", "tri_wilson", "roughness"):
        # 3x3 neighborhood statistics (the other gdaldem modes). Plain
        # (non-nan) reductions so any NODATA in the window -> NODATA out,
        # matching the slope/aspect border discipline.
        z = padded
        c0 = z[1:-1, 1:-1]
        nb = np.stack([
            z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:],
            z[1:-1, :-2], z[1:-1, 2:],
            z[2:, :-2], z[2:, 1:-1], z[2:, 2:],
        ])
        if kind == "tpi":
            # Topographic Position Index: center minus neighborhood mean
            return c0 - nb.mean(axis=0)
        if kind == "tri":
            # Terrain Ruggedness Index, Riley 1999 (gdaldem >=3.3 default):
            # sqrt of the sum of squared center-neighbor differences
            return np.sqrt(((nb - c0) ** 2).sum(axis=0))
        if kind == "tri_wilson":
            # Wilson 2007 variant: mean absolute center-neighbor difference
            return np.abs(nb - c0).mean(axis=0)
        # roughness: max minus min over the full 9-cell window
        allv = np.concatenate([nb, c0[None]], axis=0)
        return allv.max(axis=0) - allv.min(axis=0)
    if alg == "zevenbergen_thorne":
        dzdx, dzdy = zevenbergen_thorne_derivatives(padded, sx, sy,
                                                    scale)
    else:
        dzdx, dzdy = horn_derivatives(padded, sx, sy, scale)
    slope_rad = np.arctan(z_factor * np.hypot(dzdx, dzdy))
    if kind == "slope":
        return np.degrees(slope_rad)
    if kind == "aspect":
        with np.errstate(invalid="ignore"):
            asp = np.degrees(np.arctan2(-dzdx, -dzdy)) % 360.0
        flat = (dzdx == 0.0) & (dzdy == 0.0)
        asp[flat] = np.nan
        return asp
    zen = np.radians(90.0 - altitude)
    # uphill aspect (gradient direction), compass from north
    with np.errstate(invalid="ignore"):
        up = np.arctan2(dzdx, dzdy)

    def _hs_cos(az_rad):
        return (np.cos(zen) * np.cos(slope_rad)
                + np.sin(zen) * np.sin(slope_rad)
                * np.cos(az_rad - up))

    if kind == "hillshade":
        hs = _hs_cos(np.radians(azimuth))
        return np.round(255.0 * np.clip(hs, 0.0, 1.0))
    if kind == "hillshade_multidirectional":
        # gdaldem -multidirectional (USGS OFR 92-422): hillshades from
        # 225/270/315/360 deg blended by w_k = sin^2(up - az_k); the
        # four weights of azimuths 45 deg apart always sum to 2, so the
        # blend divides by 2. Flat cells (up undefined via gradient 0)
        # reduce to the standard cos(zenith) shade exactly.
        acc = np.zeros_like(slope_rad)
        for az_deg in (225.0, 270.0, 315.0, 360.0):
            az = np.radians(az_deg)
            w = np.sin(up - az) ** 2
            acc = acc + w * _hs_cos(az)
        flat = (dzdx == 0.0) & (dzdy == 0.0)
        hs = np.where(flat, np.cos(zen), acc / 2.0)
        hs = hs + 0.0 * slope_rad  # re-poison NODATA through the where
        return np.round(255.0 * np.clip(hs, 0.0, 1.0))
    if kind == "hillshade_combined":
        # gdaldem's combined mode (oblique + slope shading): the
        # standard shade attenuated by steepness. PINNED contract:
        # round(255 * clip(hs_cos, 0, 1) * (1 - slope_rad/(pi/2))) —
        # flat ground equals the standard hillshade, a vertical wall
        # goes black. (The MODE mirrors gdaldem; the exact curve is
        # this engine's pinned formula, not asserted bit-equal to
        # GDAL's.)
        hs = np.clip(_hs_cos(np.radians(azimuth)), 0.0, 1.0)
        att = 1.0 - slope_rad / (np.pi / 2.0)
        return np.round(255.0 * hs * att)
    raise ValueError(f"Unknown terrain derivative '{kind}'.")


def _fill_halo(padded: np.ndarray, own, neighbor_paths: list[str]) -> None:
    """Fill the 1-pixel border of ``padded`` from neighboring tiles by
    exact affine location (center alignment asserted to 1e-6 px). Cells
    no neighbor covers stay NaN."""
    h, w = own.height, own.width
    # padded (pr, pc) center coords in own CRS:
    #   x = own.x0 + (pc - 0.5) * own.sx ; y = own.y0 - (pr - 0.5) * own.sy
    strips: list[tuple[np.ndarray, np.ndarray]] = []
    cols_all = np.arange(w + 2)
    rows_mid = np.arange(1, h + 1)
    strips.append((np.zeros(w + 2, dtype=np.int64), cols_all))        # top
    strips.append((np.full(w + 2, h + 1, dtype=np.int64), cols_all))  # bottom
    strips.append((rows_mid, np.zeros(h, dtype=np.int64)))            # left
    strips.append((rows_mid, np.full(h, w + 1, dtype=np.int64)))      # right
    for path in neighbor_paths:
        try:
            nb = _open_cached(path)
        except Exception:
            continue  # unreadable neighbor == missing: edge stays NaN
        for prs, pcs in strips:
            need = np.isnan(padded[prs, pcs])
            if not need.any():
                continue
            pr, pc = prs[need], pcs[need]
            xs = own.x0 + (pc - 0.5) * own.sx
            ys = own.y0 - (pr - 0.5) * own.sy
            fr, fc = nb.index(xs, ys)
            nr, nc = np.floor(fr).astype(np.int64), np.floor(fc).astype(np.int64)
            ok = (
                (nr >= 0) & (nr < nb.height) & (nc >= 0) & (nc < nb.width)
                & (np.abs(fr - nr - 0.5) < 1e-6)
                & (np.abs(fc - nc - 0.5) < 1e-6)
            )
            if not ok.any():
                continue
            nr, nc = nr[ok], nc[ok]
            block = nb.read_block(nr.min(), nr.max() + 1, nc.min(), nc.max() + 1)
            padded[pr[ok], pc[ok]] = block[nr - nr.min(), nc - nc.min()]


def terrain_tiles(
    spark: SparkSession,
    tiles: list[tuple[int, int, str]],
    out_dir: str,
    *,
    kind: str = "slope",
    scale: float = 1.0,
    z_factor: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    alg: str = "horn",
    dtype: str = "float32",
    nodata: float = -9999.0,
    num_partitions: int | None = None,
    skip_existing: bool = False,
) -> DataFrame:
    """Compute ``kind`` for every tile of a regular tile grid and write
    the result as GeoTIFF tiles under ``out_dir`` (shared storage on a
    real cluster). ``tiles``: (iy, ix, path) rows — the exact shape
    :func:`opentopodata_spark.tiles.tile_index_rows` produces.

    Returns the manifest DataFrame (tile_iy, tile_ix, path, n_valid,
    checksum, error); per-tile faults isolate into error rows. Zero
    shuffles: the halo is read, not exchanged.

    Resume: outputs publish via atomic rename, so an existing file IS a
    complete tile. With ``skip_existing=True`` a re-run after a crash
    recomputes only missing tiles; skipped tiles' manifest rows
    (n_valid, checksum) are re-derived from the stored file, so the
    returned manifest is always complete and verifiable.
    """
    terrain_kernel(np.full((3, 3), np.nan), 1.0, 1.0, kind,
                   alg=alg)  # validate kind + alg
    by_key = {(int(iy), int(ix)): p for iy, ix, p in tiles}
    os.makedirs(out_dir, exist_ok=True)

    def process(batches):
        for b in batches:
            rows = []
            for t in b.itertuples(index=False):
                key = (int(t.tile_iy), int(t.tile_ix))
                out = os.path.join(out_dir, f"{kind}_{key[0]}_{key[1]}.tif")
                try:
                    if skip_existing and os.path.exists(out):
                        from .. import geotiff

                        # uncached open: the output path can be rewritten
                        # within this process's lifetime
                        done = geotiff.open_raster(out)
                        band = done.read_window(
                            0, done.height, 0, done.width
                        )[0].astype(np.float64)
                        valid = band != float(done.nodata)
                        rows.append((
                            key[0], key[1], out, int(valid.sum()),
                            round(float(band[valid].sum()), 3), None,
                        ))
                        continue
                    own = _open_cached(t.path)
                    padded = np.full(
                        (own.height + 2, own.width + 2), np.nan
                    )
                    padded[1:-1, 1:-1] = own.read_block(
                        0, own.height, 0, own.width
                    )
                    nbrs = [
                        by_key[k]
                        for k in (
                            (key[0] + dy, key[1] + dx)
                            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                            if (dy, dx) != (0, 0)
                        )
                        if k in by_key
                    ]
                    _fill_halo(padded, own, nbrs)
                    res = terrain_kernel(
                        padded, own.sx, own.sy, kind, scale=scale,
                        z_factor=z_factor, azimuth=azimuth,
                        altitude=altitude, alg=alg,
                    )
                    finite = np.isfinite(res)
                    n_valid = int(finite.sum())
                    arr = np.where(finite, res, nodata).astype(np.dtype(dtype))
                    # lineage checksum (north rule: per-partition elevation
                    # checksums): C-order sum of the stored-dtype values
                    checksum = round(
                        float(arr[finite].astype(np.float64).sum()), 3
                    )
                    ci = own.crs
                    tmp = out + f".tmp{os.getpid()}"
                    from .. import geotiff

                    geotiff.write_geotiff(
                        tmp, arr, x0=own.x0, y0=own.y0, sx=own.sx, sy=own.sy,
                        epsg=(ci.epsg if ci else None),
                        wkt=(ci.wkt if ci and not ci.epsg else None),
                        nodata=nodata,
                    )
                    os.replace(tmp, out)
                    rows.append((key[0], key[1], out, n_valid, checksum, None))
                except Exception as e:  # noqa: BLE001 — per-tile isolation
                    rows.append((key[0], key[1], None, 0, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["tile_iy", "tile_ix", "path", "n_valid",
                         "checksum", "error"],
            )

    pdf = spark.createDataFrame(
        [(int(iy), int(ix), p) for iy, ix, p in tiles],
        "tile_iy long, tile_ix long, path string",
    )
    n = num_partitions or max(
        1, min(len(tiles), spark.sparkContext.defaultParallelism)
    )
    return pdf.repartition(n).mapInPandas(process, MANIFEST_SCHEMA)
