"""vectorio dissolve CLI: ogr2ogr-dissolve twin over the layer front
door — .gpkg in, GeoJSON out, holes grouped under their shells."""

from __future__ import annotations

import json

import pytest

from opentopodata_spark.jobs import vectorio
from opentopodata_spark.vector import write_gpkg_features


def _sq(x, y, w=1.0):
    return [[x, y], [x + w, y], [x + w, y + w], [x, y + w], [x, y]]


@pytest.fixture()
def layer(tmp_path):
    feats = []
    # region "west": 2x2 block of unit cells
    for i, (x, y) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        feats.append({
            "type": "Feature", "id": f"w{i}",
            "properties": {"region": "west"},
            "geometry": {"type": "Polygon", "coordinates": [_sq(x, y)]},
        })
    # region "ring": 3x3 ring around (11,1) -> shell + hole
    for i, (x, y) in enumerate(
        (x, y) for x in range(10, 13) for y in range(3) if (x, y) != (11, 1)
    ):
        feats.append({
            "type": "Feature", "id": f"r{i}",
            "properties": {"region": "ring"},
            "geometry": {"type": "Polygon", "coordinates": [_sq(x, y)]},
        })
    # region "isle": the island inside the ring (MultiPolygon form)
    feats.append({
        "type": "Feature", "id": "isle",
        "properties": {"region": "isle"},
        "geometry": {"type": "MultiPolygon",
                     "coordinates": [[_sq(11, 1)]]},
    })
    p = str(tmp_path / "cells.gpkg")
    write_gpkg_features(p, {"type": "FeatureCollection", "features": feats},
                        layer="cells")
    return p


def test_cli_dissolve_by_region(layer, tmp_path, spark):
    out = str(tmp_path / "dissolved.geojson")
    stats = vectorio.run([
        "dissolve", "--in", layer, "--layer", "cells",
        "--by", "region", "--out", out, "--cores", "4",
    ])
    assert stats["n_in"] == 13 and stats["n_out"] == 3
    fc = json.loads(open(out).read())
    by_key = {f["properties"]["region"]: f for f in fc["features"]}
    assert set(by_key) == {"west", "ring", "isle"}
    west = by_key["west"]["geometry"]
    assert west["type"] == "Polygon"
    assert len(west["coordinates"]) == 1  # no holes
    shell = west["coordinates"][0]
    assert shell[0] == shell[-1]  # closed
    assert len(shell) == 9  # 8 unit-edge vertices kept (no collinear merge)
    xs = [v[0] for v in shell]
    ys = [v[1] for v in shell]
    assert (min(xs), min(ys), max(xs), max(ys)) == (0.0, 0.0, 2.0, 2.0)
    ring = by_key["ring"]["geometry"]
    assert ring["type"] == "Polygon"
    assert len(ring["coordinates"]) == 2  # shell + hole
    hole = ring["coordinates"][1]
    hx = [v[0] for v in hole]
    assert (min(hx), max(hx)) == (11.0, 12.0)
    assert by_key["west"]["properties"]["n_parts"] == 4


def test_cli_dissolve_all_one_key(layer, tmp_path, spark):
    out = str(tmp_path / "one.geojson")
    stats = vectorio.run([
        "dissolve", "--in", layer, "--layer", "cells", "--out", out,
        "--cores", "4",
    ])
    # isle fills the ring hole; west stays a separate shell -> one
    # feature, MultiPolygon with two shells, zero holes
    assert stats["n_out"] == 1
    fc = json.loads(open(out).read())
    g = fc["features"][0]["geometry"]
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    assert all(len(poly) == 1 for poly in g["coordinates"])  # no holes


def test_cli_buffer_points(tmp_path, spark):
    import math

    from opentopodata_spark import geodesic

    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": "site1", "properties": {"name": "s1"},
         "geometry": {"type": "Point", "coordinates": [8.0, 47.0]}},
        {"type": "Feature", "id": "m", "properties": {},
         "geometry": {"type": "MultiPoint",
                      "coordinates": [[0.0, 10.0], [1.0, 11.0]]}},
    ]}
    src = tmp_path / "pts.geojson"
    src.write_text(json.dumps(fc))
    out = str(tmp_path / "buf.geojson")
    stats = vectorio.run([
        "buffer", "--in", str(src), "--radius-m", "50000",
        "--segments", "16", "--out", out, "--cores", "4",
    ])
    assert stats["n_points"] == 3 and stats["n_polygons"] == 3
    got = json.loads(open(out).read())
    by_id = {f["id"]: f for f in got["features"]}
    assert set(by_id) == {"site1", "m#0", "m#1"}
    ring = by_id["site1"]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) == 17
    for x, y in ring[:-1]:
        d = geodesic.inverse(47.0, 8.0, y, x)["s12"]
        assert abs(d - 50000.0) < 0.5
    assert by_id["site1"]["properties"]["name"] == "s1"
    # circumscribed variant pushes every vertex to R/cos(pi/16)
    out2 = str(tmp_path / "buf2.geojson")
    vectorio.run([
        "buffer", "--in", str(src), "--radius-m", "50000",
        "--segments", "16", "--circumscribe", "--out", out2,
    ])
    got2 = json.loads(open(out2).read())
    ring2 = {f["id"]: f for f in got2["features"]}["site1"][
        "geometry"]["coordinates"][0]
    want = 50000.0 / math.cos(math.pi / 16)
    for x, y in ring2[:-1]:
        d = geodesic.inverse(47.0, 8.0, y, x)["s12"]
        assert abs(d - want) < 0.5
