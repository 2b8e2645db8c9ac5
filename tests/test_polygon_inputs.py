"""Polygon input adapters: GeoJSON FeatureCollection / Feature /
MultiPolygon -> engine polygon lists, DataFrame polygons with the
broadcast-size guard, and the CLI accepting real GeoJSON."""

from __future__ import annotations

import json

import pytest

from opentopodata_spark.operators import spatial


GEOJSON = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"polygon_id": "A"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[10.0, 0.0], [11.0, 0.0], [11.0, 1.0],
                                 [10.0, 1.0], [10.0, 0.0]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"id": "M"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[0.0, 0.0], [1.0, 0.0], [0.5, 1.0], [0.0, 0.0]]],
                    [[[5.0, 5.0], [6.0, 5.0], [5.5, 6.0], [5.0, 5.0]]],
                ],
            },
        },
    ],
}


def test_geojson_feature_collection(tmp_path):
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(GEOJSON))
    polys = spatial.polygons_from_geojson(str(p))
    by_id = {q["polygon_id"]: q for q in polys}
    assert set(by_id) == {"A", "M#0", "M#1"}
    # closing vertex stripped; lon/lat order mapped correctly
    assert by_id["A"]["lons"] == [10.0, 11.0, 11.0, 10.0]
    assert by_id["A"]["lats"] == [0.0, 0.0, 1.0, 1.0]
    assert len(by_id["M#0"]["lats"]) == 3


def test_geojson_bare_polygon_and_feature():
    polys = spatial.polygons_from_geojson(
        {"type": "Polygon",
         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}
    )
    assert polys[0]["polygon_id"] == "0" and len(polys[0]["lats"]) == 3


def test_geojson_holes_rejected():
    with pytest.raises(ValueError, match="holes"):
        spatial.polygons_from_geojson(
            {"type": "Polygon", "coordinates": [
                [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],
            ]}
        )


def test_geojson_equivalent_pip_result(spark):
    """The GeoJSON path and the native list produce identical joins."""
    pts = spark.createDataFrame(
        [(1, 0.5, 10.5), (2, 0.5, 12.5), (3, 0.2, 0.5)],
        "pid long, lat double, lon double",
    )
    native = [{"polygon_id": "A", "lats": [0.0, 0.0, 1.0, 1.0],
               "lons": [10.0, 11.0, 11.0, 10.0]}]
    via_geojson = [
        p for p in spatial.polygons_from_geojson(GEOJSON)
        if p["polygon_id"] == "A"
    ]
    a = sorted(
        (r["pid"], r["polygon_id"])
        for r in spatial.point_in_polygon_join(pts, native, level=6).collect()
    )
    b = sorted(
        (r["pid"], r["polygon_id"])
        for r in spatial.point_in_polygon_join(pts, via_geojson, level=6).collect()
    )
    assert a == b == [(1, "A")]


def test_polygons_from_df_and_guard(spark):
    df = spark.createDataFrame(
        [("P", [0.0, 0.0, 1.0], [0.0, 1.0, 0.5])],
        "polygon_id string, lats array<double>, lons array<double>",
    )
    polys = spatial.polygons_from_df(df)
    assert polys == [{"polygon_id": "P", "lats": [0.0, 0.0, 1.0],
                      "lons": [0.0, 1.0, 0.5]}]
    with pytest.raises(ValueError, match="broadcasts"):
        spatial.polygons_from_df(df, max_polygons=0)


def test_cli_accepts_geojson(spark, raster_root, tmp_path, capsys):
    from opentopodata_spark.jobs import raster as job
    import os

    gj = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "properties": {"polygon_id": "B"},
            "geometry": {"type": "Polygon", "coordinates": [[
                [10.8, 0.3], [11.2, 0.3], [11.2, 0.7], [10.8, 0.7],
                [10.8, 0.3],
            ]]},
        }],
    }
    p = tmp_path / "b.geojson"
    p.write_text(json.dumps(gj))
    out = str(tmp_path / "zout")
    rc = job.main([
        "--cores", "4", "zonal",
        "--config", os.path.join(raster_root, "test-config.yaml"),
        "--dataset", "srtm90subset", "--polygons", str(p), "--out", out,
    ])
    assert rc == 0
    row = spark.read.parquet(out).collect()[0]
    assert row["polygon_id"] == "B" and row["n_px"] > 0


def test_falsy_feature_ids_preserved():
    polys = spatial.polygons_from_geojson({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"id": 0},
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}},
            {"type": "Feature", "properties": {}, "id": "",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[2, 2], [3, 2], [3, 3], [2, 2]]]}},
        ],
    })
    assert [p["polygon_id"] for p in polys] == ["0", ""]
