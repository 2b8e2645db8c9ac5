"""Raster-ops batch job: terrain derivatives / zonal stats / rasterize.

The raster<->vector cluster surface, submit-able the same way as
jobs/elevation.py (``spark-submit --py-files otds.zip -m ... raster``).
Subcommands:

  terrain    tiled DEM -> slope|aspect|hillshade|tpi|tri|roughness tiles
             (cross-tile halo reads, resume via --skip-existing,
             per-tile lineage checksums in the manifest)
  zonal      tiled/loose rasters + polygons (GeoJSON or engine JSON)
             -> per-polygon statistics parquet
  rasterize  points parquet (lat, lon[, value]) -> cell aggregation
             parquet and optional GeoTIFF tile pyramid
  resample   tiled DEM -> factor-k overview tiles (gdaladdo)
  warp       tiles -> target-CRS grid (gdalwarp -t_srs -tr -te -r)
  prep       warp + corner-named servable tiles + embedded COG
             overviews + serving config (the reference's documented
             gdalbuildvrt/gdalwarp/gdaladdo dataset recipe, distributed)
  buildvrt   VRT mosaic over tiles (gdalbuildvrt; driver-only)
  info       raster metadata JSON (gdalinfo; driver-only)
  contours   tiled DEM -> iso-line segments parquet (gdal_contour)
  calc       two tile sets -> cell-wise expression tiles (gdal_calc)
  grid       scattered points parquet -> interpolated raster tiles
             (gdal_grid: invdist/invdistnn/average/nearest + metrics)

Polygons file format (``--polygons``): JSON list of
{"polygon_id": str, "lats": [...], "lons": [...]} — the engine's
driver-side polygon shape (small side of the PIP join).
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import sys
import time

from .. import config as _config
from ..operators.gridding import GRID_ALGORITHMS as _GRID_ALGORITHMS
from ..session import get_spark


def _tile_rows_from_config(cfg_path: str, name: str):
    """Dataset name -> (iy, ix, path) rows via the exact tile-index keys
    (tiles.tile_index_rows); single-file datasets become one (0,0,path)."""
    from .. import tiles as _tiles

    datasets = _config.load_datasets(cfg_path)
    ordered = _config.resolve_dataset_names(name, datasets)
    all_tiles = _tiles.tile_index_rows(ordered)
    rows = []
    for ds in ordered:
        got = [(iy, ix, p) for (_d, iy, ix, p) in all_tiles if _d == ds.name]
        if got:
            rows.extend(got)
        elif getattr(ds, "tile_path", None):
            rows.append((0, 0, ds.tile_path))
    return rows


def _tiles_from_globs(globs) -> list[tuple[int, int, str]]:
    """Loose raster globs -> (iy, ix, path) rows with CORNER-DERIVED grid
    keys (regular grid assumed). The keys are load-bearing: halo-reading
    operators (terrain, contours) look up neighbors by (iy±1, ix±1), so
    arbitrary keys like sorted-order enumeration would silently sever
    tile adjacency and drop seam output."""
    from .. import geotiff as _geotiff

    paths = sorted(p for pat in globs for p in _glob.glob(pat))
    if not paths:
        raise FileNotFoundError(f"no rasters match {globs}")
    metas = [(p, _geotiff.open_raster(p)) for p in paths]
    ys = sorted({round(r.y0, 9) for _p, r in metas}, reverse=True)
    xs = sorted({round(r.x0, 9) for _p, r in metas})
    return [
        (len(ys) - 1 - ys.index(round(r.y0, 9)), xs.index(round(r.x0, 9)), p)
        for p, r in metas
    ]


def _raster_paths(ns) -> list[str]:
    if ns.rasters:
        paths = sorted(
            p for pat in ns.rasters for p in _glob.glob(pat)
        )
        if not paths:
            raise FileNotFoundError(f"no rasters match {ns.rasters}")
        return paths
    return [p for _iy, _ix, p in _tile_rows_from_config(ns.config, ns.dataset)]


def _paths_from_globs(globs) -> list[str]:
    """Flat raster paths from glob patterns. A pattern that matches
    nothing passes through VERBATIM (http(s) URLs and literal remote
    object names can't be globbed) — per pattern, not all-or-nothing,
    so mixing a local glob with a URL never silently drops the URL."""
    out: list[str] = []
    for pat in globs:
        out.extend(sorted(_glob.glob(pat)) or [pat])
    return out


def _load_polygons(path: str) -> list[dict]:
    if path.lower().endswith((".shp", ".gpkg")):
        from ..operators.spatial import polygons_from_geojson

        return polygons_from_geojson(path)
    with open(path) as f:
        polys = json.load(f)
    if isinstance(polys, dict):  # real GeoJSON (FeatureCollection etc.)
        from ..operators.spatial import polygons_from_geojson

        return polygons_from_geojson(polys)
    for p in polys:
        if not {"polygon_id", "lats", "lons"} <= set(p):
            raise ValueError(
                "each polygon needs polygon_id, lats, lons (got "
                f"{sorted(p)})"
            )
    return polys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.raster",
        description="Distributed raster<->vector operations.",
    )
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("terrain", help="slope/aspect/hillshade tiles")
    t.add_argument("--config", help="dataset config YAML")
    t.add_argument("--dataset", help="tiled dataset name from the config")
    t.add_argument("--rasters", nargs="*", help="glob(s) of a regular tile grid (alternative to --config; grid keys derived from filenames is NOT attempted — files must share one grid and are keyed by sorted order per row/col of their corners)")
    t.add_argument("--out", required=True)
    t.add_argument("--kind", default="slope",
                   choices=["slope", "aspect", "hillshade",
                            "hillshade_multidirectional",
                            "hillshade_combined", "tpi", "tri",
                            "tri_wilson", "roughness"])
    t.add_argument("--alg", default="horn",
                   choices=["horn", "zevenbergen_thorne"],
                   help="gradient stencil for slope/aspect/hillshade"
                        " (gdaldem -alg)")
    t.add_argument("--scale", type=float, default=1.0, help="xy->z unit factor (111120 for degree grids with meter elevations)")
    t.add_argument("--z-factor", type=float, default=1.0)
    t.add_argument("--azimuth", type=float, default=315.0)
    t.add_argument("--altitude", type=float, default=45.0)
    t.add_argument("--skip-existing", action="store_true", help="resume: do not recompute tiles whose output exists")

    fa = sub.add_parser("flowacc", help="D8 flow accumulation tiles")
    fa.add_argument("--config")
    fa.add_argument("--dataset")
    fa.add_argument("--rasters", nargs="*")
    fa.add_argument("--out", required=True)
    fa.add_argument("--scale", type=float, default=1.0)
    fa.add_argument("--skip-existing", action="store_true")

    sv = sub.add_parser(
        "sieve", help="remove small regions (gdal_sieve): merge regions"
        " below --threshold cells into their largest neighbour"
    )
    sv.add_argument("--config")
    sv.add_argument("--dataset")
    sv.add_argument("--rasters", nargs="*")
    sv.add_argument("--out", required=True)
    sv.add_argument("--threshold", type=int, required=True,
                    help="minimum region size in cells (strict <)")
    sv.add_argument("--bands", type=float, nargs="*",
                    help="quantization edges for float rasters"
                    " (class k = count of edges <= value)")

    fnd = sub.add_parser(
        "fillnodata", help="fill NODATA voids (gdal_fillnodata): 8-ray"
        " IDW up to --max-distance px, optional --smoothing passes"
    )
    fnd.add_argument("--config")
    fnd.add_argument("--dataset")
    fnd.add_argument("--rasters", nargs="*")
    fnd.add_argument("--out", required=True)
    fnd.add_argument("--max-distance", type=float, default=16.0)
    fnd.add_argument("--smoothing", type=int, default=0)

    px = sub.add_parser(
        "proximity", help="distance-to-target raster (gdal_proximity):"
        " exact euclidean within --max-distance"
    )
    px.add_argument("--config")
    px.add_argument("--dataset")
    px.add_argument("--rasters", nargs="*")
    px.add_argument("--out", required=True)
    px.add_argument("--target-values", type=float, nargs="+",
                    required=True)
    px.add_argument("--max-distance", type=float, required=True)
    px.add_argument("--dist-units", choices=["pixel", "geo"],
                    default="pixel")

    pg = sub.add_parser(
        "polygonize", help="regions -> polygons (gdal_polygonize):"
        " region stats parquet + optional GeoJSON FeatureCollection"
    )
    pg.add_argument("--config")
    pg.add_argument("--dataset")
    pg.add_argument("--rasters", nargs="*")
    pg.add_argument("--out", required=True,
                    help="parquet output (region stats + geometry)")
    pg.add_argument("--geojson",
                    help="optional FeatureCollection file (driver-side"
                    " assembly — bounded by the region count)")
    pg.add_argument("--bands", type=float, nargs="*",
                    help="quantization edges for float rasters")

    crp = sub.add_parser(
        "colorrelief", help="RGBA relief tiles through a color ramp"
        " (gdaldem color-relief)"
    )
    crp.add_argument("--config")
    crp.add_argument("--dataset")
    crp.add_argument("--rasters", nargs="*")
    crp.add_argument("--out", required=True)
    crp.add_argument("--ramp", required=True,
                     help="GDAL color-relief text file:"
                     " 'elevation r g b [a]' per line, 'nv ...' for"
                     " NODATA")
    crp.add_argument("--mode", default="interpolate",
                     choices=["interpolate", "nearest", "exact"])

    z = sub.add_parser("zonal", help="per-polygon raster statistics")
    z.add_argument("--config")
    z.add_argument("--dataset")
    z.add_argument("--rasters", nargs="*")
    z.add_argument("--polygons", required=True)
    z.add_argument("--out", required=True)
    z.add_argument("--strip-rows", type=int, default=512)

    o = sub.add_parser("resample", help="build overview tiles (gdaladdo)")
    o.add_argument("--config")
    o.add_argument("--dataset")
    o.add_argument("--rasters", nargs="*")
    o.add_argument("--out", required=True)
    o.add_argument("--factor", type=int, default=2)
    o.add_argument("--method", default="average", choices=["average", "nearest"])
    o.add_argument("--skip-existing", action="store_true")
    o.add_argument("--use-overviews", action="store_true",
                   help="serve 'average' from an embedded COG overview "
                        "IFD at exactly --factor when one exists "
                        "(bit-identical, 1/factor^2 of the bytes read)")

    wp = sub.add_parser(
        "warp", help="reproject tiles onto a target-CRS grid (gdalwarp)")
    wp.add_argument("--config")
    wp.add_argument("--dataset")
    wp.add_argument("--rasters", nargs="*")
    wp.add_argument("--out", required=True)
    wp.add_argument("--dst-epsg", type=int)
    wp.add_argument("--dst-wkt")
    wp.add_argument("--dst-res", required=True,
                    help="xres[,yres] in target units (gdalwarp -tr)")
    wp.add_argument("--dst-bounds",
                    help="xmin,ymin,xmax,ymax in target units (gdalwarp "
                         "-te; default: densified source extent)")
    wp.add_argument("--method", default="bilinear",
                    choices=["nearest", "bilinear", "cubic"])
    wp.add_argument("--tile-px", type=int, default=512)
    wp.add_argument("--nodata", type=float, default=-9999.0)
    wp.add_argument("--skip-existing", action="store_true")

    pp = sub.add_parser(
        "prep",
        help="one-command dataset preparation: warp onto an aligned "
             "grid with corner-named servable tiles + embedded COG "
             "overviews, then emit the serving config (the reference's "
             "documented gdalbuildvrt/gdalwarp/gdaladdo recipe, "
             "distributed)")
    pp.add_argument("--config")
    pp.add_argument("--dataset")
    pp.add_argument("--rasters", nargs="*")
    pp.add_argument("--out", required=True)
    pp.add_argument("--name", default="prepared",
                    help="dataset name in the emitted config")
    pp.add_argument("--dst-epsg", type=int, default=4326)
    pp.add_argument("--dst-res", required=True,
                    help="square pixel size in target units")
    pp.add_argument("--dst-bounds",
                    help="xmin,ymin,xmax,ymax (snapped outward to tile "
                         "multiples; default: source extent)")
    pp.add_argument("--method", default="bilinear",
                    choices=["nearest", "bilinear", "cubic"])
    pp.add_argument("--tile-px", type=int, default=1024)
    pp.add_argument("--overviews", default="2,4,8",
                    help="comma-separated COG levels ('' = none)")
    pp.add_argument("--nodata", type=float, default=-9999.0)
    pp.add_argument("--vrt", action="store_true",
                    help="also write <out>/<name>.vrt over the tiles")
    pp.add_argument("--skip-existing", action="store_true")

    bv = sub.add_parser(
        "buildvrt", help="write a VRT mosaic over tiles (gdalbuildvrt)")
    bv.add_argument("--config")
    bv.add_argument("--dataset")
    bv.add_argument("--rasters", nargs="*")
    bv.add_argument("--out", required=True, help="output .vrt path")

    gi = sub.add_parser(
        "info", help="print raster metadata as JSON (gdalinfo)")
    gi.add_argument("--raster", required=True)

    gs = sub.add_parser(
        "stats", help="exact whole-catalog statistics + histogram "
                      "(gdalinfo -stats/-hist, distributed over tiles)")
    gs.add_argument("--rasters", nargs="+", required=True,
                    help="raster path globs")
    gs.add_argument("--buckets", type=int, default=0,
                    help="histogram buckets (0 = stats only)")

    c = sub.add_parser("contours", help="iso-elevation line segments")
    c.add_argument("--config")
    c.add_argument("--dataset")
    c.add_argument("--rasters", nargs="*")
    c.add_argument("--out", required=True)
    c.add_argument("--levels", required=True, help="comma-separated elevations")
    c.add_argument("--no-dedupe", action="store_true")

    x = sub.add_parser("calc", help="cell-wise expression over tile pairs")
    x.add_argument("--config")
    x.add_argument("--dataset-a")
    x.add_argument("--dataset-b")
    x.add_argument("--rasters-a", nargs="*")
    x.add_argument("--rasters-b", nargs="*")
    x.add_argument("--out", required=True)
    x.add_argument("--expression", default="a - b")
    x.add_argument("--skip-existing", action="store_true")

    tc = sub.add_parser(
        "transcode",
        help="any-format tiles -> GeoTIFF (gdal_translate -of GTiff)")
    tc.add_argument("--config")
    tc.add_argument("--dataset")
    tc.add_argument("--rasters", nargs="*",
                    help="glob(s) or http(s) URLs of source tiles in any "
                         "supported format (jp2, gpkg, nc, asc, ...)")
    tc.add_argument("--out", required=True)
    tc.add_argument("--compression", default="deflate",
                    choices=["none", "deflate", "lzw", "packbits",
                             "lzma"])
    tc.add_argument("--tile-px", type=int, default=256,
                    help="output GeoTIFF internal tile size (multiple "
                         "of 16; 0 = strips)")
    tc.add_argument("--skip-existing", action="store_true")

    w = sub.add_parser(
        "tiles",
        help="datasets -> Web Mercator terrain tiles (Terrain-RGB /"
             " Terrarium web-DEM export)")
    w.add_argument("--config", help="dataset config YAML")
    w.add_argument("--dataset", help="dataset name (multidatasets ok)")
    w.add_argument("--rasters", nargs="*",
                   help="alternative to --config: files sharing ONE"
                        " directory, opened as a dataset")
    w.add_argument("--out", required=True,
                   help="parquet tile-shard dir (z, x, y, stats, png)")
    w.add_argument("--zoom", type=int, required=True,
                   help="base (finest) zoom level")
    w.add_argument("--min-zoom", type=int, default=None,
                   help="also roll the base level up into a pyramid"
                        " down to this zoom (2x2 NaN-aware average)")
    w.add_argument("--tile-px", type=int, default=256)
    w.add_argument("--encoding", default="terrarium",
                   choices=["terrarium", "terrain-rgb"])
    w.add_argument("--interpolation", default="bilinear")
    w.add_argument("--bbox", default=None,
                   help="left,bottom,right,top WGS84 clip")
    w.add_argument("--mbtiles", default=None,
                   help="also assemble one MBTiles db here (bounded"
                        " exports; the parquet shards are the scale"
                        " sink)")

    r = sub.add_parser("rasterize", help="points -> grid aggregation")
    r.add_argument("--points", required=True, help="parquet with lat, lon[, value] columns")
    r.add_argument("--value-col", default=None)
    r.add_argument("--out", required=True)
    r.add_argument("--grid", required=True, help="x0,y0,sx,sy,width,height")
    r.add_argument("--tiles-out", default=None, help="also write GeoTIFF tiles here")
    r.add_argument("--tile-px", type=int, default=1024)
    r.add_argument("--agg-col", default="n_points", help="cell column to rasterize into --tiles-out")

    gg = sub.add_parser(
        "grid", help="scattered points -> interpolated raster (gdal_grid)"
    )
    gg.add_argument("--points", required=True,
                    help="parquet with lat, lon, value columns")
    gg.add_argument("--value-col", default="value")
    gg.add_argument("--out", required=True, help="GeoTIFF tile directory")
    gg.add_argument("--grid", required=True, help="x0,y0,sx,sy,width,height")
    gg.add_argument("--algorithm", default="invdist",
                    choices=list(_GRID_ALGORITHMS))
    gg.add_argument("--power", type=float, default=2.0)
    gg.add_argument("--smoothing", type=float, default=0.0)
    gg.add_argument("--radius", type=float, default=0.0,
                    help="circular search radius (0 = all points,"
                         " broadcast-bounded)")
    gg.add_argument("--radius2", type=float, default=None,
                    help="second ellipse semi-axis (defaults to --radius)")
    gg.add_argument("--angle", type=float, default=0.0,
                    help="ellipse rotation, degrees CCW")
    gg.add_argument("--min-points", type=int, default=0)
    gg.add_argument("--max-points", type=int, default=0)
    gg.add_argument("--nodata", type=float, default=-9999.0)
    gg.add_argument("--tile-px", type=int, default=256)

    bn = sub.add_parser(
        "burn", help="vector features -> raster (gdal_rasterize)"
    )
    bn.add_argument("--features", required=True,
                    help="GeoJSON (FeatureCollection of Polygon/"
                         "MultiPolygon/LineString) or parquet with"
                         " (order_idx, rings, burn) columns")
    bn.add_argument("--grid", required=True,
                    help="x0,y0,sx,sy,width,height")
    bn.add_argument("--out", required=True, help="GeoTIFF tile dir")
    bn.add_argument("--burn", type=float, default=1.0,
                    help="fixed burn value (-burn)")
    bn.add_argument("--attr", default=None,
                    help="feature property to burn (-a; GeoJSON only)")
    bn.add_argument("--geometry", choices=("polygon", "line"),
                    default="polygon")
    bn.add_argument("--add", action="store_true",
                    help="accumulate instead of paint-over (-add)")
    bn.add_argument("--invert", action="store_true",
                    help="burn where NO feature covers (-i)")
    bn.add_argument("--all-touched", action="store_true",
                    help="burn every cell the boundary touches (-at)")
    bn.add_argument("--init", type=float, default=0.0)
    bn.add_argument("--tile-px", type=int, default=1024)
    return p


def run(argv: list[str] | None = None) -> dict:
    ns = build_parser().parse_args(argv)
    if ns.cmd not in ("buildvrt", "info"):  # driver-only subcommands
        spark = get_spark(
            app_name=f"otds-raster-{ns.cmd}",
            cores=ns.cores,
            shuffle_partitions=ns.shuffle_partitions,
            master=ns.master,
        )
    t0 = time.time()
    stats: dict = {"job": f"raster-{ns.cmd}"}

    if ns.cmd == "terrain":
        from ..operators import terrain as _terrain

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError("terrain needs --config/--dataset or --rasters")
        manifest = _terrain.terrain_tiles(
            spark, tiles, ns.out, kind=ns.kind, alg=ns.alg,
            scale=ns.scale,
            z_factor=ns.z_factor, azimuth=ns.azimuth, altitude=ns.altitude,
            skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            out=ns.out,
        )

    elif ns.cmd == "flowacc":
        from ..operators import hydrology as _hydrology

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError("flowacc needs --config/--dataset or --rasters")
        manifest = _hydrology.flow_accumulation(
            spark, tiles, ns.out, scale=ns.scale,
            skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            out=ns.out,
        )

    elif ns.cmd == "sieve":
        from ..operators import sieve as _sieve

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError("sieve needs --config/--dataset or --rasters")
        manifest = _sieve.sieve_tiles(
            spark, tiles, ns.out, ns.threshold, bands=ns.bands,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(tiles=m.count(), out=ns.out)

    elif ns.cmd == "polygonize":
        import json as _json

        from ..operators import polyvec as _polyvec

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError(
                "polygonize needs --config/--dataset or --rasters"
            )
        df = _polyvec.region_polygons(spark, tiles, bands=ns.bands)
        df.write.mode("overwrite").parquet(ns.out)
        back = spark.read.parquet(ns.out)
        stats.update(regions=back.count(), out=ns.out)
        if ns.geojson:
            feats = [
                {
                    "type": "Feature",
                    "properties": {
                        "region_id": int(r.region_id),
                        "value": int(r.value),
                        "n_cells": int(r.n_cells),
                    },
                    "geometry": _json.loads(r.geometry),
                }
                for r in back.orderBy("region_id").collect()
            ]
            tmp = ns.geojson + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(
                    {"type": "FeatureCollection", "features": feats}, f
                )
            os.replace(tmp, ns.geojson)
            stats.update(geojson=ns.geojson)

    elif ns.cmd == "colorrelief":
        from ..operators import colorrelief as _colorrelief

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError(
                "colorrelief needs --config/--dataset or --rasters"
            )
        with open(ns.ramp) as f:
            ramp_text = f.read()
        manifest = _colorrelief.colorrelief_tiles(
            spark, tiles, ns.out, ramp_text, mode=ns.mode,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(tiles=m.count(), out=ns.out)

    elif ns.cmd == "proximity":
        from ..operators import proximity as _proximity

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError(
                "proximity needs --config/--dataset or --rasters"
            )
        manifest = _proximity.proximity_tiles(
            spark, tiles, ns.out, ns.target_values, ns.max_distance,
            dist_units=ns.dist_units,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(tiles=m.count(), out=ns.out)

    elif ns.cmd == "fillnodata":
        from ..operators import fillnodata as _fillnodata

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError(
                "fillnodata needs --config/--dataset or --rasters"
            )
        manifest = _fillnodata.fillnodata_tiles(
            spark, tiles, ns.out, max_distance=ns.max_distance,
            smoothing_iterations=ns.smoothing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            filled=m.agg({"n_filled": "sum"}).collect()[0][0],
            out=ns.out,
        )

    elif ns.cmd == "prep":
        from ..operators import warp as _warp

        if ns.config and ns.dataset:
            paths = [
                p for _iy, _ix, p
                in _tile_rows_from_config(ns.config, ns.dataset)
            ]
        elif ns.rasters:
            paths = _paths_from_globs(ns.rasters)
        else:
            raise ValueError("prep needs --config/--dataset or --rasters")
        res = float(ns.dst_res)
        dst_bounds = (
            tuple(float(v) for v in ns.dst_bounds.split(","))
            if ns.dst_bounds else None
        )
        ovr = tuple(
            int(v) for v in ns.overviews.split(",") if v.strip()
        ) or None
        tiles_dir = os.path.join(ns.out, "tiles")
        manifest = _warp.warp_tiles(
            spark, paths, tiles_dir,
            dst_epsg=ns.dst_epsg, dst_res=(res, res),
            dst_bounds=dst_bounds, method=ns.method,
            tile_px=ns.tile_px, nodata=ns.nodata,
            corner_names=True, overviews=ovr,
            skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        n_err = m.where(m.error.isNotNull()).count()
        tile_span = ns.tile_px * res
        span_s = f"{tile_span:.6f}".rstrip("0").rstrip(".")
        cfg_path = os.path.join(ns.out, "dataset-config.yaml")
        with open(cfg_path, "w") as f:
            f.write(
                "datasets:\n"
                f"- name: {ns.name}\n"
                f"  path: {os.path.abspath(tiles_dir)}/\n"
                f"  filename_epsg: {ns.dst_epsg}\n"
                f"  filename_tile_size: {span_s}\n"
            )
        stats.update(
            tiles=m.count(), errors=n_err, out=ns.out, config=cfg_path,
            dataset_name=ns.name, filename_epsg=ns.dst_epsg,
            filename_tile_size=float(span_s),
        )
        if ns.vrt:
            from .. import gridformats as _gf

            tifs = sorted(_glob.glob(os.path.join(tiles_dir, "*.tif")))
            vrt_path = os.path.join(ns.out, f"{ns.name}.vrt")
            _gf.build_vrt(vrt_path, tifs)
            stats["vrt"] = vrt_path

    elif ns.cmd == "buildvrt":
        from .. import gridformats as _gf

        if ns.config and ns.dataset:
            paths = [
                p for _iy, _ix, p
                in _tile_rows_from_config(ns.config, ns.dataset)
            ]
        elif ns.rasters:
            paths = _paths_from_globs(ns.rasters)
        else:
            raise ValueError("buildvrt needs --config/--dataset or"
                             " --rasters")
        _gf.build_vrt(ns.out, paths)
        from ..geotiff import open_raster as _open

        r = _open(ns.out)  # validate the mosaic opens
        stats.update(
            sources=len(paths), width=r.width, height=r.height,
            out=ns.out,
        )

    elif ns.cmd == "stats":
        from ..operators import rstats as _rstats

        paths = sorted(
            p for g in ns.rasters for p in _glob.glob(g)
        )
        s = _rstats.raster_stats(spark, paths)
        stats.update(n_rasters=len(paths), **s)
        if ns.buckets:
            hist = _rstats.raster_histogram(
                spark, paths, n_buckets=ns.buckets,
                vmin=s["vmin"], vmax=s["vmax"],
            )
            stats["histogram"] = [
                int(r["count"])
                for r in hist.orderBy("bucket").collect()
            ]

    elif ns.cmd == "info":
        from ..geotiff import open_raster as _open

        r = _open(ns.raster)
        ci = r.crs
        stats.update(
            path=ns.raster, width=r.width, height=r.height,
            dtype=str(r.dtype), nodata=r.nodata,
            epsg=(ci.epsg if ci else None),
            wkt=(ci.wkt if ci and not ci.epsg else None),
            origin=[r.x0, r.y0], res=[r.sx, r.sy],
            bounds=[r.bounds.left, r.bounds.bottom,
                    r.bounds.right, r.bounds.top],
            overviews=[
                {"width": o.width, "height": o.height,
                 "dtype": str(o.dtype)} for o in r.overviews
            ],
        )

    elif ns.cmd == "warp":
        from ..operators import warp as _warp

        if ns.config and ns.dataset:
            paths = [
                p for _iy, _ix, p
                in _tile_rows_from_config(ns.config, ns.dataset)
            ]
        elif ns.rasters:
            paths = _paths_from_globs(ns.rasters)
        else:
            raise ValueError("warp needs --config/--dataset or --rasters")
        res_parts = [float(v) for v in ns.dst_res.split(",")]
        dst_res = (res_parts[0], res_parts[-1])
        dst_bounds = (
            tuple(float(v) for v in ns.dst_bounds.split(","))
            if ns.dst_bounds else None
        )
        manifest = _warp.warp_tiles(
            spark, paths, ns.out,
            dst_epsg=ns.dst_epsg, dst_wkt=ns.dst_wkt,
            dst_res=dst_res, dst_bounds=dst_bounds,
            method=ns.method, tile_px=ns.tile_px, nodata=ns.nodata,
            skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            out=ns.out,
        )

    elif ns.cmd == "contours":
        from ..operators import contours as _contours

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            # corner-derived keys: contour cells read their halo from
            # key-neighbors, so enumeration keys would sever adjacency
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError("contours needs --config/--dataset or --rasters")
        levels = [float(v) for v in ns.levels.split(",")]
        segs = _contours.contour_tiles(
            spark, tiles, levels, dedupe=not ns.no_dedupe
        )
        segs.write.mode("overwrite").parquet(ns.out)
        stats.update(segments=spark.read.parquet(ns.out).count(), out=ns.out)

    elif ns.cmd == "calc":
        from ..operators import algebra as _algebra

        def _side(cfg_ds, globs, label):
            if ns.config and cfg_ds:
                return _tile_rows_from_config(ns.config, cfg_ds)
            if globs:
                # corner-derived keys pair A/B tiles geographically, not
                # by filename sort order
                return _tiles_from_globs(globs)
            raise ValueError(f"calc needs --dataset-{label} or --rasters-{label}")

        manifest = _algebra.raster_calc_tiles(
            spark,
            _side(ns.dataset_a, ns.rasters_a, "a"),
            _side(ns.dataset_b, ns.rasters_b, "b"),
            ns.out, expression=ns.expression, skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            out=ns.out,
        )

    elif ns.cmd == "resample":
        from ..operators import resample as _resample

        if ns.config and ns.dataset:
            tiles = _tile_rows_from_config(ns.config, ns.dataset)
        elif ns.rasters:
            tiles = _tiles_from_globs(ns.rasters)
        else:
            raise ValueError("resample needs --config/--dataset or --rasters")
        manifest = _resample.resample_tiles(
            spark, tiles, ns.out, factor=ns.factor, method=ns.method,
            skip_existing=ns.skip_existing,
            use_overviews=ns.use_overviews,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            from_overview=m.where(m.from_overview).count(),
            out=ns.out,
        )

    elif ns.cmd == "transcode":
        from ..operators import transcode as _transcode

        if ns.rasters:
            # per-pattern: globs expand, URLs pass through verbatim —
            # a mixed glob+URL list keeps both
            paths = _paths_from_globs(ns.rasters)
        else:
            paths = _raster_paths(ns)
        manifest = _transcode.transcode_tiles(
            spark, paths, ns.out, compression=ns.compression,
            tile_size=(ns.tile_px, ns.tile_px) if ns.tile_px else None,
            skip_existing=ns.skip_existing,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            errors=m.where(m.error.isNotNull()).count(),
            out=ns.out,
        )

    elif ns.cmd == "zonal":
        from ..operators import zonal as _zonal

        if not ((ns.config and ns.dataset) or ns.rasters):
            raise ValueError("zonal needs --config/--dataset or --rasters")
        meta = _zonal.raster_metadata(spark, _raster_paths(ns))
        out = _zonal.zonal_stats(
            meta, _load_polygons(ns.polygons), strip_rows=ns.strip_rows
        )
        out.write.mode("overwrite").parquet(ns.out)
        stats.update(polygons=spark.read.parquet(ns.out).count(), out=ns.out)

    elif ns.cmd == "tiles":
        from .. import config as _config
        from ..operators import tileexport as _tileexport

        if ns.config and ns.dataset:
            all_ds = _config.load_datasets(ns.config)
            dsets = _config.resolve_dataset_names(ns.dataset, all_ds)
        elif ns.rasters:
            import os as _os

            # NB: no local `glob` import here — rebinding _glob inside
            # run() would make it function-local and break every other
            # branch's --rasters globbing (UnboundLocalError)
            files = sorted({p for g in ns.rasters for p in _glob.glob(g)})
            if not files:
                raise ValueError(f"no files match {ns.rasters}")
            dirs = {_os.path.dirname(_os.path.abspath(p)) for p in files}
            if len(dirs) != 1:
                raise ValueError(
                    "tiles --rasters needs all files in ONE directory"
                    f" (got {sorted(dirs)})")
            dsets = [_config.dataset_from_config(
                "export", path=dirs.pop(), filename_tile_size=1)]
        else:
            raise ValueError("tiles needs --config/--dataset or --rasters")
        bbox = None
        if ns.bbox:
            parts = [float(v) for v in ns.bbox.split(",")]
            if len(parts) != 4:
                raise ValueError("--bbox needs left,bottom,right,top")
            bbox = tuple(parts)
        df = _tileexport.render_terrain_tiles(
            spark, dsets, ns.zoom, encoding=ns.encoding,
            tile_px=ns.tile_px, interpolation=ns.interpolation, bbox=bbox)
        if ns.min_zoom is not None:
            df = _tileexport.build_tile_pyramid(
                df, base_zoom=ns.zoom, min_zoom=ns.min_zoom,
                tile_px=ns.tile_px, encoding=ns.encoding)
        df.write.mode("overwrite").parquet(ns.out)
        back = spark.read.parquet(ns.out)
        stats.update(tiles=back.count(), out=ns.out, zoom=ns.zoom,
                     encoding=ns.encoding)
        if ns.min_zoom is not None:
            stats["min_zoom"] = ns.min_zoom
        if ns.mbtiles:
            from .. import mbtiles as _mbtiles

            rows = back.select("z", "x", "y", "tile_data").collect()
            _mbtiles.write_mbtiles_tiles(
                ns.mbtiles,
                [(r.z, r.x, r.y, bytes(r.tile_data)) for r in rows],
                encoding=ns.encoding)
            stats["mbtiles"] = ns.mbtiles

    elif ns.cmd == "rasterize":
        from ..operators import rasterize as _rz

        parts = [float(v) for v in ns.grid.split(",")]
        if len(parts) != 6:
            raise ValueError("--grid must be x0,y0,sx,sy,width,height")
        grid = _rz.GridSpec(
            parts[0], parts[1], parts[2], parts[3], int(parts[4]), int(parts[5])
        )
        pts = spark.read.parquet(ns.points)
        cells = _rz.rasterize_points(pts, grid, value_col=ns.value_col)
        cells.write.mode("overwrite").parquet(ns.out)
        stats.update(cells=spark.read.parquet(ns.out).count(), out=ns.out)
        if ns.tiles_out:
            manifest = _rz.write_raster_tiles(
                spark.read.parquet(ns.out), grid, ns.tiles_out,
                value_col=ns.agg_col, tile_px=ns.tile_px,
            )
            manifest.write.mode("overwrite").parquet(
                f"{ns.tiles_out}/_manifest"
            )
            stats["tiles"] = spark.read.parquet(
                f"{ns.tiles_out}/_manifest"
            ).count()

    elif ns.cmd == "burn":
        from ..operators import rasterize as _rz

        parts = [float(v) for v in ns.grid.split(",")]
        if len(parts) != 6:
            raise ValueError("--grid must be x0,y0,sx,sy,width,height")
        grid = _rz.GridSpec(
            parts[0], parts[1], parts[2], parts[3],
            int(parts[4]), int(parts[5]),
        )
        if ns.features.lower().endswith(
                (".json", ".geojson", ".shp", ".gpkg")):
            feats = _rz.features_from_geojson(
                ns.features, burn_attr=ns.attr, burn_value=ns.burn
            )
            geoms = {ft["geometry"] for ft in feats}
            if len(geoms) > 1:
                raise ValueError(
                    "mixed polygon and line features — burn them in"
                    " separate runs (paint-order across geometry kinds"
                    " is ambiguous)"
                )
            geometry = geoms.pop() if geoms else ns.geometry
            fdf = _rz.features_to_df(spark, feats)
        else:
            fdf = spark.read.parquet(ns.features)
            geometry = ns.geometry
        manifest = _rz.burn_features(
            spark, fdf, grid, ns.out, geometry=geometry,
            mode="add" if ns.add else "paint",
            all_touched=ns.all_touched, invert=ns.invert,
            invert_value=ns.burn, init=ns.init, tile_px=ns.tile_px,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            burned_cells=m.agg({"n_burned": "sum"}).collect()[0][0],
            out=ns.out,
        )

    elif ns.cmd == "grid":
        from ..operators import gridding as _gridding
        from ..operators import rasterize as _rz

        parts = [float(v) for v in ns.grid.split(",")]
        if len(parts) != 6:
            raise ValueError("--grid must be x0,y0,sx,sy,width,height")
        grid = _rz.GridSpec(
            parts[0], parts[1], parts[2], parts[3],
            int(parts[4]), int(parts[5]),
        )
        r2 = ns.radius if ns.radius2 is None else ns.radius2
        manifest = _gridding.grid_points(
            spark, spark.read.parquet(ns.points), grid, ns.out,
            algorithm=ns.algorithm, value_col=ns.value_col,
            power=ns.power, smoothing=ns.smoothing,
            radius1=ns.radius, radius2=r2, angle=ns.angle,
            min_points=ns.min_points, max_points=ns.max_points,
            nodata=ns.nodata, tile_px=ns.tile_px,
        )
        manifest.write.mode("overwrite").parquet(f"{ns.out}/_manifest")
        m = spark.read.parquet(f"{ns.out}/_manifest")
        stats.update(
            tiles=m.count(),
            valid_cells=m.agg({"n_valid": "sum"}).collect()[0][0],
            out=ns.out,
        )

    stats["seconds"] = round(time.time() - t0, 3)
    return stats


def main(argv: list[str] | None = None) -> int:
    try:
        stats = run(argv)
    except (ValueError, FileNotFoundError) as e:
        print(json.dumps({"status": "INVALID_REQUEST", "error": str(e)}))
        return 2
    print(json.dumps({"status": "OK", **stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
