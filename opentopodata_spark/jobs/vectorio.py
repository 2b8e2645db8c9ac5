"""Vector IO utility: format conversion + layer inspection.

The ogr2ogr / ogrinfo slice this engine needs — the reference leans on
GDAL/OGR for any vector handling around its rasters; here the polygon /
geofence / burn front doors accept GeoJSON, ESRI Shapefile and
GeoPackage (vector.py), and this CLI converts between them and dumps
layer metadata. Driver-only: vector layers are the broadcast-small side
of every join in the engine, so there is no Spark session to spin up.

  convert   any supported input -> .geojson / .shp / .gpkg
  info      layer summary JSON (feature/geometry counts, bbox, fields)
  overlay   polygon×polygon 'intersects' join of two layers (Spark —
            operators/overlay.polygon_join; --broadcast for the
            shuffle-free path when the right layer is dimension-sized)
  metrics   per-feature area/perimeter/centroid (Spark, pure codegen
            expressions — operators/overlay.polygon_metrics)
  clip      clip polygons to a rectangular window, geometry out
            (ogr2ogr -clipsrc twin — operators/overlay.clip_polygons)
  simplify  Douglas–Peucker polyline simplification
            (ogr2ogr -simplify twin — operators/overlay.simplify_lines)

Usage:
  python -m opentopodata_spark.jobs.vectorio convert \
      --in zones.gpkg [--layer zones] --out zones.shp
  python -m opentopodata_spark.jobs.vectorio info --in zones.shp
  python -m opentopodata_spark.jobs.vectorio overlay \
      --left parcels.shp --right admin.gpkg --out pairs.parquet \
      [--cell-size 256] [--broadcast] [--cores 4]
  python -m opentopodata_spark.jobs.vectorio metrics \
      --in zones.gpkg --out metrics.parquet [--cores 4]
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

    o = sub.add_parser("overlay",
                       help="polygon×polygon intersects join (Spark)")
    o.add_argument("--left", required=True,
                   help="left layer .geojson/.json/.shp/.gpkg")
    o.add_argument("--right", required=True, help="right layer")
    o.add_argument("--left-layer", default=None)
    o.add_argument("--right-layer", default=None)
    o.add_argument("--out", required=True, help="output pairs parquet")
    o.add_argument("--cell-size", type=float, default=None,
                   help="bucketing grid width (default: median bbox edge)")
    o.add_argument("--broadcast", action="store_true",
                   help="shuffle-free path (right side must be small)")
    o.add_argument("--cores", type=int, default=4)

    m = sub.add_parser("metrics",
                       help="per-feature area/perimeter/centroid (Spark)")
    m.add_argument("--in", dest="src", required=True)
    m.add_argument("--layer", default=None)
    m.add_argument("--out", required=True, help="output parquet")
    m.add_argument("--cores", type=int, default=4)

    cl = sub.add_parser("clip",
                        help="clip polygons to a rectangular window "
                             "(ogr2ogr -clipsrc twin, Spark)")
    cl.add_argument("--in", dest="src", required=True)
    cl.add_argument("--layer", default=None)
    cl.add_argument("--window", nargs=4, type=float, required=True,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    cl.add_argument("--out", required=True,
                    help="output layer .geojson/.json/.shp/.gpkg")
    cl.add_argument("--out-layer", default="clipped")
    cl.add_argument("--cores", type=int, default=4)

    sp = sub.add_parser("simplify",
                        help="Douglas–Peucker line simplification "
                             "(ogr2ogr -simplify twin, Spark)")
    sp.add_argument("--in", dest="src", required=True)
    sp.add_argument("--layer", default=None)
    sp.add_argument("--eps", type=float, required=True,
                    help="tolerance in layer coordinate units")
    sp.add_argument("--out", required=True)
    sp.add_argument("--out-layer", default="simplified")
    sp.add_argument("--cores", type=int, default=4)

    dz = sub.add_parser("dissolve",
                        help="merge edge-sharing polygons by attribute "
                             "(ogr2ogr dissolve twin, Spark)")
    dz.add_argument("--in", dest="src", required=True)
    dz.add_argument("--layer", default=None)
    dz.add_argument("--by", default=None,
                    help="property name holding the dissolve key "
                         "(default: everything merges into one key)")
    dz.add_argument("--quantize", type=float, default=2.0 ** -20,
                    help="vertex snap grid in layer units (edges must "
                         "match exactly after snapping)")
    dz.add_argument("--out", required=True,
                    help="output layer .geojson/.json/.shp/.gpkg")
    dz.add_argument("--out-layer", default="dissolved")
    dz.add_argument("--cores", type=int, default=4)

    b = sub.add_parser("buffer",
                       help="geodesic point buffers: Point features -> "
                            "polygon geofences (Spark)")
    b.add_argument("--in", dest="src", required=True,
                   help="point layer .geojson/.json/.shp/.gpkg")
    b.add_argument("--layer", default=None)
    b.add_argument("--radius-m", type=float, required=True)
    b.add_argument("--segments", type=int, default=32,
                   help="vertices per ring (default 32)")
    b.add_argument("--circumscribe", action="store_true",
                   help="scale radius by 1/cos(pi/segments) so the "
                        "polygon CONTAINS the true circle")
    b.add_argument("--out", required=True)
    b.add_argument("--out-layer", default="buffered")
    b.add_argument("--cores", type=int, default=4)

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


def _polygon_rows(fc: dict, tag: str) -> list[tuple]:
    """FeatureCollection -> (fid, rings) rows for operators/overlay.
    GeoJSON rings arrive CLOSED (first == last); overlay wants open
    rings, so the closing vertex is stripped.  MultiPolygon parts
    become separate rows (``fid#part``)."""
    def open_rings(rings):
        out = []
        for ring in rings:
            r = [[float(x), float(y)] for x, y in ring]
            if len(r) >= 2 and r[0] == r[-1]:
                r = r[:-1]
            if len(r) < 3:
                raise vector.VectorError(
                    f"{tag}: degenerate ring with < 3 distinct vertices")
            out.append(r)
        return out

    rows = []
    for i, ft in enumerate(fc.get("features", [])):
        g = ft.get("geometry") or {}
        fid = str(ft.get("id", i))
        if g.get("type") == "Polygon":
            rows.append((fid, open_rings(g["coordinates"])))
        elif g.get("type") == "MultiPolygon":
            for pi, part in enumerate(g["coordinates"]):
                rows.append((f"{fid}#{pi}", open_rings(part)))
    if not rows:
        raise vector.VectorError(
            f"{tag}: no Polygon/MultiPolygon features in the layer")
    return rows


def _default_cell(*rowsets) -> float:
    """Median bbox long-edge across all features — the replication-
    minimizing grid width for polygon_join."""
    edges = []
    for rows in rowsets:
        for _, rings in rows:
            xs = [v[0] for r in rings for v in r]
            ys = [v[1] for r in rings for v in r]
            edges.append(max(max(xs) - min(xs), max(ys) - min(ys)))
    edges.sort()
    med = edges[len(edges) // 2]
    return float(med) if med > 0 else 1.0


_RINGS_SCHEMA = "fid string, rings array<array<array<double>>>"
_DISSOLVE_SCHEMA = "key string, rings array<array<array<double>>>"


def _ring_area2(ring) -> float:
    s = 0.0
    n = len(ring)
    for k in range(n):
        x0, y0 = ring[k][0], ring[k][1]
        x1, y1 = ring[(k + 1) % n][0], ring[(k + 1) % n][1]
        s += x0 * y1 - x1 * y0
    return s


def _even_odd(px: float, py: float, ring) -> bool:
    inside = False
    n = len(ring)
    for k in range(n):
        x0, y0 = ring[k][0], ring[k][1]
        x1, y1 = ring[(k + 1) % n][0], ring[(k + 1) % n][1]
        if (y0 > py) != (y1 > py):
            if px < (x1 - x0) * (py - y0) / (y1 - y0) + x0:
                inside = not inside
    return inside


def _multipolygon_coords(rings) -> list:
    """Dissolve output rings (shells CCW, holes CW, open) -> GeoJSON
    MultiPolygon coordinates: each hole attached to the SMALLEST shell
    containing its first vertex (handles islands-in-holes), rings
    closed. A hole touching its shell at a vertex is assigned by the
    same first-vertex ray cast (documented best-effort for the CLI)."""
    shells = [(abs(_ring_area2(r)), r) for r in rings if _ring_area2(r) > 0]
    holes = [r for r in rings if _ring_area2(r) < 0]
    shells.sort(key=lambda t: t[0])
    polys = [[list(r) + [list(r[0])]] for _, r in shells]
    for h in holes:
        px, py = h[0][0], h[0][1]
        for i, (_, shell) in enumerate(shells):
            if _even_odd(px, py, shell):
                polys[i].append(list(h) + [list(h[0])])
                break
        else:
            raise vector.VectorError(
                "dissolve: hole ring not contained in any shell")
    return polys


def _write_layer(out: str, fc: dict, layer: str) -> None:
    low = out.lower()
    if low.endswith(".shp"):
        vector.write_shapefile(out, fc)
    elif low.endswith(".gpkg"):
        vector.write_gpkg_features(out, fc, layer=layer)
    elif low.endswith((".geojson", ".json")):
        with open(out, "w", encoding="utf-8") as f:
            json.dump(fc, f)
    else:
        raise vector.VectorError(
            f"unknown output format for '{out}' "
            "(use .geojson/.json/.shp/.gpkg)")


def run(argv: list[str] | None = None) -> dict:
    ns = build_parser().parse_args(argv)

    if ns.cmd == "overlay":
        from ..operators import overlay as ov
        from ..session import get_spark

        lrows = _polygon_rows(
            vector.load_features(ns.left, layer=ns.left_layer), "left")
        rrows = _polygon_rows(
            vector.load_features(ns.right, layer=ns.right_layer), "right")
        w = ns.cell_size if ns.cell_size else _default_cell(lrows, rrows)
        spark = get_spark(cores=ns.cores)
        ldf = spark.createDataFrame(lrows, _RINGS_SCHEMA) \
            .withColumnRenamed("fid", "left_id")
        rdf = spark.createDataFrame(rrows, _RINGS_SCHEMA) \
            .withColumnRenamed("fid", "right_id")
        if ns.broadcast:
            out = ov.polygon_join_broadcast(
                ldf, rdf, "left_id", "right_id", cell_size=w)
        else:
            out = ov.polygon_join(ldf, rdf, "left_id", "right_id",
                                  cell_size=w)
        out.write.mode("overwrite").parquet(ns.out)
        n = spark.read.parquet(ns.out).count()
        stats = {"job": "vectorio-overlay", "left": ns.left,
                 "right": ns.right, "out": ns.out, "n_pairs": n,
                 "cell_size": w, "broadcast": bool(ns.broadcast)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    if ns.cmd == "metrics":
        from ..operators import overlay as ov
        from ..session import get_spark

        rows = _polygon_rows(
            vector.load_features(ns.src, layer=ns.layer), "in")
        spark = get_spark(cores=ns.cores)
        df = spark.createDataFrame(rows, _RINGS_SCHEMA) \
            .withColumnRenamed("fid", "poly_id")
        ov.polygon_metrics(df).write.mode("overwrite").parquet(ns.out)
        n = spark.read.parquet(ns.out).count()
        stats = {"job": "vectorio-metrics", "src": ns.src, "out": ns.out,
                 "n_features": n}
        print(json.dumps(stats, sort_keys=True))
        return stats

    if ns.cmd == "clip":
        from ..operators import overlay as ov
        from ..session import get_spark

        rows = _polygon_rows(
            vector.load_features(ns.src, layer=ns.layer), "in")
        x0, y0, x1, y1 = ns.window
        if not (x1 > x0 and y1 > y0):
            raise vector.VectorError("clip: window must have XMAX > XMIN "
                                     "and YMAX > YMIN")
        window = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
        spark = get_spark(cores=ns.cores)
        df = spark.createDataFrame(rows, _RINGS_SCHEMA) \
            .withColumnRenamed("fid", "poly_id")
        clipped = ov.clip_polygons(df, window, emit_rings=True,
                                   decimals=9).collect()
        feats = []
        for r in clipped:
            coords = [ring + [ring[0]] for ring in r.rings]
            feats.append({"type": "Feature", "id": r.poly_id,
                          "properties": {"src_fid": r.poly_id,
                                         "clip_area": r.clip_area},
                          "geometry": {"type": "Polygon",
                                       "coordinates": coords}})
        out_fc = {"type": "FeatureCollection", "features": feats}
        _write_layer(ns.out, out_fc, ns.out_layer)
        stats = {"job": "vectorio-clip", "src": ns.src, "out": ns.out,
                 "n_in": len(rows), "n_out": len(feats)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    if ns.cmd == "simplify":
        from ..operators import overlay as ov
        from ..session import get_spark

        fc = vector.load_features(ns.src, layer=ns.layer)
        rows, keep_props = [], {}
        for i, ft in enumerate(fc.get("features", [])):
            g = ft.get("geometry") or {}
            fid = str(ft.get("id", i))
            keep_props[fid] = ft.get("properties", {})
            if g.get("type") == "LineString":
                for si, v in enumerate(g["coordinates"]):
                    rows.append((fid, si, float(v[0]), float(v[1])))
            elif g.get("type") == "MultiLineString":
                for pi, part in enumerate(g["coordinates"]):
                    keep_props[f"{fid}#{pi}"] = ft.get("properties", {})
                    for si, v in enumerate(part):
                        rows.append((f"{fid}#{pi}", si,
                                     float(v[0]), float(v[1])))
        if not rows:
            raise vector.VectorError(
                "simplify: no LineString/MultiLineString features")
        spark = get_spark(cores=ns.cores)
        df = spark.createDataFrame(
            rows, "line_id string, seq long, x double, y double")
        kept = ov.simplify_lines(df, ns.eps, exact=False).collect()
        by_line: dict[str, list] = {}
        for r in kept:
            by_line.setdefault(r.line_id, []).append((r.seq, r.x, r.y))
        feats = []
        for fid in sorted(by_line):
            pts = [[x, y] for _, x, y in sorted(by_line[fid])]
            feats.append({"type": "Feature", "id": fid,
                          "properties": keep_props.get(fid, {}),
                          "geometry": {"type": "LineString",
                                       "coordinates": pts}})
        out_fc = {"type": "FeatureCollection", "features": feats}
        _write_layer(ns.out, out_fc, ns.out_layer)
        n_in = len(rows)
        n_out = sum(len(f["geometry"]["coordinates"]) for f in feats)
        stats = {"job": "vectorio-simplify", "src": ns.src,
                 "out": ns.out, "vertices_in": n_in, "vertices_out": n_out}
        print(json.dumps(stats, sort_keys=True))
        return stats

    if ns.cmd == "buffer":
        import math

        from ..operators import buffer as bf
        from ..session import get_spark

        fc = vector.load_features(ns.src, layer=ns.layer)
        rows, props = [], {}
        for i, ft in enumerate(fc.get("features", [])):
            g = ft.get("geometry") or {}
            fid = str(ft.get("id", i))
            if g.get("type") == "Point":
                pts = [g["coordinates"]]
            elif g.get("type") == "MultiPoint":
                pts = list(g["coordinates"])
            else:
                continue
            for pi, (x, y) in enumerate(pts):
                pid = fid if len(pts) == 1 else f"{fid}#{pi}"
                rows.append((pid, float(y), float(x)))
                props[pid] = ft.get("properties", {})
        if not rows:
            raise vector.VectorError(
                "buffer: no Point/MultiPoint features in the layer")
        r = ns.radius_m
        if ns.circumscribe:
            r = r / math.cos(math.pi / ns.segments)
        spark = get_spark(cores=ns.cores)
        df = spark.createDataFrame(
            rows, "point_id string, lat double, lon double")
        rings = bf.buffer_points(df, r, n_vertices=ns.segments).collect()
        feats = []
        for row in sorted(rings, key=lambda rr: rr.polygon_id):
            ring = [[x, y] for y, x in zip(row.lats, row.lons)]
            feats.append({
                "type": "Feature", "id": row.polygon_id,
                "properties": {**props.get(row.polygon_id, {}),
                               "buffer_radius_m": ns.radius_m},
                "geometry": {"type": "Polygon",
                             "coordinates": [ring + [ring[0]]]},
            })
        out_fc = {"type": "FeatureCollection", "features": feats}
        _write_layer(ns.out, out_fc, ns.out_layer)
        stats = {"job": "vectorio-buffer", "src": ns.src, "out": ns.out,
                 "n_points": len(rows), "n_polygons": len(feats),
                 "radius_m": ns.radius_m,
                 "circumscribed": bool(ns.circumscribe)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    if ns.cmd == "dissolve":
        from ..operators import dissolve as dz
        from ..session import get_spark

        fc = vector.load_features(ns.src, layer=ns.layer)
        rows = []
        for i, ft in enumerate(fc.get("features", [])):
            g = ft.get("geometry") or {}
            props = ft.get("properties") or {}
            key = str(props.get(ns.by)) if ns.by else "ALL"
            if g.get("type") == "Polygon":
                parts = [g["coordinates"]]
            elif g.get("type") == "MultiPolygon":
                parts = list(g["coordinates"])
            else:
                continue
            for part in parts:
                rows.append((key, [
                    [[float(x), float(y)] for x, y in ring]
                    for ring in part
                ]))
        if not rows:
            raise vector.VectorError(
                "dissolve: no Polygon/MultiPolygon features in the layer")
        spark = get_spark(cores=ns.cores)
        df = spark.createDataFrame(rows, _DISSOLVE_SCHEMA)
        res = dz.dissolve_polygons(df, "key", quantize=ns.quantize).collect()
        feats = []
        for r in sorted(res, key=lambda row: row.key):
            coords = _multipolygon_coords(
                [[list(v) for v in ring] for ring in r.rings]
            )
            gtype = "Polygon" if len(coords) == 1 else "MultiPolygon"
            feats.append({
                "type": "Feature", "id": r.key,
                "properties": {(ns.by or "key"): r.key,
                               "n_parts": int(r.n_parts)},
                "geometry": {
                    "type": gtype,
                    "coordinates": coords[0] if gtype == "Polygon" else coords,
                },
            })
        out_fc = {"type": "FeatureCollection", "features": feats}
        _write_layer(ns.out, out_fc, ns.out_layer)
        stats = {"job": "vectorio-dissolve", "src": ns.src, "out": ns.out,
                 "n_in": len(rows), "n_out": len(feats)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    fc = vector.load_features(ns.src, layer=ns.layer)
    if ns.cmd == "info":
        stats = {"job": "vectorio-info", "src": ns.src, **_info(fc)}
        print(json.dumps(stats, sort_keys=True))
        return stats

    _write_layer(ns.out, fc, ns.out_layer)
    stats = {"job": "vectorio-convert", "src": ns.src, "out": ns.out,
             "n_features": len(fc["features"])}
    print(json.dumps(stats, sort_keys=True))
    return stats


def main(argv: list[str] | None = None) -> int:
    run(argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
