"""opentopodata_spark — a PySpark-native batch elevation + spatial-join engine.

Re-expresses the computation semantics of ajnisbet/opentopodata (a Flask
point-elevation REST server; reference read-only at /root/reference) as a
Spark DataFrame / Arrow-vectorized dataflow over tables of interleaved
text+media documents.

This is NOT a port: the reference's per-request Python loops become
declarative DataFrame plans (broadcast tile joins, window-function priority
coalescing, mapInPandas raster sampling), designed for 1000-executor /
100 TB scale while matching the reference's elevation values and tile
assignments bit-for-bit (see tests/).

Subpackages / modules
---------------------
geotiff        pure-numpy GeoTIFF writer + memory-mapped windowed reader
crs            vectorized WGS84 -> UTM / LAEA / WebMercator transforms
geodesic       Karney geodesic (direct/inverse) + path sampling
polyline_codec Google encoded-polyline decode/encode
interpolate    GDAL-parity nearest/bilinear/cubic samplers w/ NODATA rules
config         YAML config loading + dataset registry (driver-side)
tiles          tile-index build (filename -> corner) + tile-key column math
oracle         single-process reference-semantics implementation (test oracle)
operators.*    the Spark operators (extract, tile join, elevation, coalesce,
               knn, geocell, dedup, similarity, text, multimodal)
lineage        per-partition lineage checkpoint + anti-join resume
session        SparkSession builder helpers
"""

__version__ = "0.1.0"
