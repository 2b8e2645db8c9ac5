"""SNK1-SNK4: JSON/GeoJSON response shapes, catalog, health."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from opentopodata_spark import sinks


def _resolved(spark):
    rows = [
        (1, 39.747114, -104.996334, 1612.0, "srtm"),
        (2, 0.0, 0.0, None, "etopo1"),
    ]
    return spark.createDataFrame(
        rows, "point_id long, lat double, lon double, elevation double, dataset string"
    )


class TestJsonSinks:
    def test_json_results_shape(self, spark):
        out = {r.point_id: json.loads(r.json) for r in sinks.json_results(_resolved(spark)).collect()}
        assert out[1] == {
            "dataset": "srtm",
            "elevation": 1612.0,
            "location": {"lat": 39.747114, "lng": -104.996334},
        }
        # null elevation omitted by to_json -> absent key means null
        assert out[2].get("elevation") is None
        assert out[2]["dataset"] == "etopo1"

    def test_geojson_feature_shape(self, spark):
        out = {
            r.point_id: json.loads(r.feature)
            for r in sinks.geojson_features(_resolved(spark)).collect()
        }
        f = out[1]
        assert f["type"] == "Feature"
        assert f["geometry"]["type"] == "Point"
        assert f["geometry"]["coordinates"] == [-104.996334, 39.747114, 1612.0]
        assert f["properties"]["dataset"] == "srtm"


class TestCatalogHealth:
    def test_dataset_catalog(self, spark, datasets):
        rows = sinks.dataset_catalog(spark, datasets).collect()
        names = [r.name for r in rows]
        assert names == sorted(names)
        by_name = {r.name: r.child_datasets for r in rows}
        assert by_name["multi_eudem_etopo1"] == ["nodata", "eudemsubset", "etopo1deg"]
        assert by_name["etopo1deg"] == []

    def test_health_ok(self, spark, raster_root):
        got = sinks.health(spark, os.path.join(raster_root, "test-config.yaml"))
        assert got == {"status": "OK"}

    def test_health_bad_config(self, spark, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("datasets:\n  - name: broken\n    path: /nonexistent/\n")
        got = sinks.health(spark, str(bad))
        assert got["status"] == "SERVER_ERROR"
