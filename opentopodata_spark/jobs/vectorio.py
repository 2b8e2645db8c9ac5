"""Vector IO utility: format conversion + layer inspection.

The ogr2ogr / ogrinfo slice this engine needs — the reference leans on
GDAL/OGR for any vector handling around its rasters; here the polygon /
geofence / burn front doors accept GeoJSON, ESRI Shapefile and
GeoPackage (vector.py), and this CLI converts between them and dumps
layer metadata. Driver-only: vector layers are the broadcast-small side
of every join in the engine, so there is no Spark session to spin up.

  convert   any supported input -> .geojson / .shp / .gpkg
  info      layer summary JSON (feature/geometry counts, bbox, fields)

Usage:
  python -m opentopodata_spark.jobs.vectorio convert \
      --in zones.gpkg [--layer zones] --out zones.shp
  python -m opentopodata_spark.jobs.vectorio info --in zones.shp
"""

from __future__ import annotations

import argparse
import json

from .. import vector


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m opentopodata_spark.jobs.vectorio",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="convert between vector formats")
    c.add_argument("--in", dest="src", required=True,
                   help="input .geojson/.json/.shp/.gpkg")
    c.add_argument("--layer", default=None,
                   help="gpkg layer (when the input has several)")
    c.add_argument("--out", required=True,
                   help="output path; format from extension")
    c.add_argument("--out-layer", default="features",
                   help="layer name for .gpkg output")

    i = sub.add_parser("info", help="print layer summary JSON")
    i.add_argument("--in", dest="src", required=True)
    i.add_argument("--layer", default=None)
    return p


def _info(fc: dict) -> dict:
    gtypes: dict[str, int] = {}
    fields: dict[str, str] = {}
    xs: list[float] = []
    ys: list[float] = []
    n_null = 0
    for f in fc["features"]:
        g = f.get("geometry")
        if g is None:
            n_null += 1
        else:
            gtypes[g["type"]] = gtypes.get(g["type"], 0) + 1
            for c in vector._iter_points(g):
                xs.append(c[0])
                ys.append(c[1])
        for k, v in (f.get("properties") or {}).items():
            if isinstance(v, bool):
                t = "bool"
            elif isinstance(v, int):
                t = "int"
            elif isinstance(v, float):
                t = "float"
            elif isinstance(v, str):
                t = "str"
            else:
                t = None
            if t is not None:
                prev = fields.get(k)
                fields[k] = t if prev in (None, t) else "mixed"
    out = {
        "n_features": len(fc["features"]),
        "n_null_geometries": n_null,
        "geometry_types": dict(sorted(gtypes.items())),
        "fields": dict(sorted(fields.items())),
    }
    if xs:
        out["bbox"] = [min(xs), min(ys), max(xs), max(ys)]
    return out


def run(argv: list[str] | None = None) -> dict:
    ns = build_parser().parse_args(argv)
    fc = vector.load_features(ns.src, layer=ns.layer)
    if ns.cmd == "info":
        stats = {"job": "vectorio-info", "src": ns.src, **_info(fc)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    low = ns.out.lower()
    if low.endswith(".shp"):
        vector.write_shapefile(ns.out, fc)
    elif low.endswith(".gpkg"):
        vector.write_gpkg_features(ns.out, fc, layer=ns.out_layer)
    elif low.endswith((".geojson", ".json")):
        with open(ns.out, "w", encoding="utf-8") as f:
            json.dump(fc, f)
    else:
        raise vector.VectorError(
            f"unknown output format for '{ns.out}' "
            "(use .geojson/.json/.shp/.gpkg)")
    stats = {"job": "vectorio-convert", "src": ns.src, "out": ns.out,
             "n_features": len(fc["features"])}
    print(json.dumps(stats, sort_keys=True))
    return stats


def main(argv: list[str] | None = None) -> int:
    run(argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
