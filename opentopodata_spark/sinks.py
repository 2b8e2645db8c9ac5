"""Result sinks: JSON / GeoJSON response shapes, dataset catalog, health.

Reference parity (all pure column expressions — ``to_json`` over structs,
no Python in the hot path):

* SNK1 JSON results — the /v1 response row shape
  ``{"dataset": ..., "elevation": ..., "location": {"lat":, "lng":}}``
  (/root/reference/opentopodata/api.py:568-578).
* SNK2 GeoJSON — Feature of Point [lng, lat, elevation] with
  ``properties.dataset`` (api.py:557-566, docs/api.md:81-128).
* SNK3 dataset catalog — name + child dataset names sorted by name
  (api.py:493-511).
* SNK4 health — config + dataset load + one smoke query
  (api.py:480-490).

At scale these write as JSON-lines datasets (``df.write.json``); the
reference's enveloping ``{"status": "OK", "results": [...]}`` object is a
per-request decoration that has no meaning for a 10^12-row table — each
row is one result object, statuses are data columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import config as _config

__all__ = ["json_results", "geojson_features", "dataset_catalog", "health"]


def json_results(resolved: DataFrame) -> DataFrame:
    """(point_id, json) — reference /v1 result objects as JSON strings.

    NaN elevations (NODATA kept as NaN via nodata_value='nan') serialize
    as the string "NaN" like the reference's Python json.dumps; null
    stays null.
    """
    obj = F.struct(
        F.col("dataset").alias("dataset"),
        F.col("elevation").alias("elevation"),
        F.struct(
            F.col("lat").alias("lat"), F.col("lon").alias("lng")
        ).alias("location"),
    )
    return resolved.select("point_id", F.to_json(obj).alias("json"))


def geojson_features(resolved: DataFrame) -> DataFrame:
    """(point_id, feature) — GeoJSON Feature strings, coordinates
    [lng, lat, elevation] per the reference's geojson sink."""
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(
                F.col("lon"), F.col("lat"), F.col("elevation")
            ).alias("coordinates"),
        ).alias("geometry"),
        F.struct(F.col("dataset").alias("dataset")).alias("properties"),
    )
    return resolved.select("point_id", F.to_json(feature).alias("feature"))


def dataset_catalog(spark, datasets: dict) -> DataFrame:
    """SNK3: (name, child_datasets) sorted by name. MultiDatasets list
    their children; concrete datasets have an empty list."""
    rows = []
    for name in sorted(datasets):
        ds = datasets[name]
        children = list(getattr(ds, "child_dataset_names", []) or [])
        rows.append((name, children))
    return spark.createDataFrame(
        rows, "name string, child_datasets array<string>"
    ).orderBy("name")


def health(spark, config_path: str | None = None) -> dict:
    """SNK4: load config + datasets and run one smoke point through the
    resolver. Returns {"status": "OK"} or {"status": "SERVER_ERROR",
    "error": ...} — the /health contract, minus HTTP."""
    try:
        datasets = _config.load_datasets(config_path)
        if not datasets:
            raise _config.ConfigError("No datasets configured.")
        from .operators.elevation import ElevationResolver

        name = sorted(datasets)[0]
        ordered = _config.resolve_dataset_names(name, datasets)
        resolver = ElevationResolver(spark, ordered)
        pts = spark.createDataFrame(
            [(0, 0.5, 10.5)], "point_id long, lat double, lon double"
        )
        resolver.resolve(pts).collect()
        return {"status": "OK"}
    except Exception as exc:  # noqa: BLE001 — health endpoints catch all
        return {"status": "SERVER_ERROR", "error": str(exc)}
