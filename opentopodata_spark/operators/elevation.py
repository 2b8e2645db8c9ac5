"""The distributed elevation resolver — the engine's flagship pipeline.

Replaces the reference's per-request loop (/root/reference/opentopodata/
backend.py:224-288) with the one-shot Spark plan (SURVEY.md J3(b)):

    points (point_id, lat, lon, ...)
      -> J2  candidate datasets: broadcast bbox join against the registry
      -> S1/S3 tile keys: Arrow-batched reprojection + float64 floor
      -> J1  broadcast tile join (missing tile -> null path)
      -> A1  shuffle by (path [, salt]) -> mapInPandas raster sampling
      -> S5  per-dataset NaN fill (nodata_value semantics)
      -> J3  priority coalesce: hash agg (min_by), first-non-null by priority
      -> J4  join back to the input rows (order restored by key, no sort)

Semantics parity (verified differentially against oracle.get_elevation):
  * missing tile / out-of-raster-bounds -> null elevation
  * NODATA in kernel footprint -> NaN, then nodata_value fill PER dataset
    (null fill => falls through to next dataset; int/NaN fill => resolves)
  * attribution = winning dataset, else LAST bbox-matching dataset, else
    the final dataset name as fallback (backend.py:285-286)

Scale design notes:
  * registry and tile index are broadcast — points never shuffle for joins
  * the only wide exchange before the coalesce window is the repartition
    by tile path, which is exactly the reference's "batch by file" strategy
    (backend.py:188-203) generalized; ``salt`` splits hot tiles (Zipf
    coordinate clusters) across multiple tasks
  * rasters are opened via a per-executor LRU over memory-mapped files —
    the GDAL-block-cache analog.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, DoubleType, StructField, StructType

from .. import crs as _crs
from .. import interpolate, tiles
from ..config import Dataset

_XY_SCHEMA = StructType(
    [StructField("x", DoubleType()), StructField("y", DoubleType())]
)


@F.pandas_udf(_XY_SCHEMA)
def project_xy(lat: pd.Series, lon: pd.Series, epsg: pd.Series) -> pd.DataFrame:
    """WGS84 -> filename CRS, vectorized per distinct EPSG in the batch.
    (S1: the reference's reproject_latlons with transformer cache,
    /root/reference/opentopodata/utils.py:17-52.)"""
    lat_v = lat.to_numpy(dtype=np.float64)
    lon_v = lon.to_numpy(dtype=np.float64)
    x = np.full(len(lat_v), np.nan)
    y = np.full(len(lat_v), np.nan)
    for code in pd.unique(epsg):
        if code is None or (isinstance(code, float) and math.isnan(code)):
            continue
        m = (epsg == code).to_numpy()
        xs, ys = _crs.reproject_latlons(lat_v[m], lon_v[m], epsg=int(code))
        x[m] = xs
        y[m] = ys
    return pd.DataFrame({"x": x, "y": y})


# state: 0 = value, 1 = NODATA (NaN inside raster), 2 = out-of-coverage.
# An explicit marker column is REQUIRED: pandas/Arrow coerce NaN to SQL
# null at the UDF boundary, which would silently merge the NODATA and
# out-of-coverage cases and break nodata_value semantics (SURVEY.md §7
# hard part 3 — caught by the differential test).
_SAMPLE_BASE_COLS = ("point_id", "lat", "lon", "dataset", "priority")
_SAMPLE_SCHEMA = (
    "point_id long, lat double, lon double, dataset string, priority int,"
    " z double, state tinyint"
)

_STATE_VALUE, _STATE_NODATA, _STATE_OOB = 0, 1, 2


def _make_sampler(interpolation: str, carry: tuple = ()):
    out_cols = list(_SAMPLE_BASE_COLS) + list(carry)

    def sample(batches):
        from ..oracle import _open_cached

        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            n = len(pdf)
            z = np.zeros(n, dtype=np.float64)
            state = np.full(n, _STATE_OOB, dtype=np.int8)
            groups = pdf.groupby("path", sort=False, dropna=True)
            for path, g in groups:
                raster = _open_cached(path)
                vals, in_bounds = interpolate.sample_points_on_raster_arrays(
                    raster,
                    g["lat"].to_numpy(dtype=np.float64),
                    g["lon"].to_numpy(dtype=np.float64),
                    interpolation,
                )
                idx = g.index.to_numpy()
                st = np.where(
                    ~in_bounds,
                    _STATE_OOB,
                    np.where(np.isnan(vals), _STATE_NODATA, _STATE_VALUE),
                )
                z[idx] = np.where(in_bounds & np.isfinite(vals), vals, 0.0)
                state[idx] = st
            out = {c: pdf[c] for c in out_cols}
            out["z"] = z
            out["state"] = state
            yield pd.DataFrame(out)

    return sample


def _fill_expr(col, nodata_value):
    """S5: replace NaN (NOT null) with nodata_value
    (/root/reference/opentopodata/utils.py:89-99)."""
    if nodata_value is None:
        return F.when(F.isnan(col), F.lit(None).cast("double")).otherwise(col)
    if isinstance(nodata_value, float) and math.isnan(nodata_value):
        return col
    return F.when(F.isnan(col), F.lit(float(nodata_value))).otherwise(col)


class ElevationResolver:
    """Resolves elevations for a points DataFrame against ordered datasets."""

    def __init__(
        self,
        spark: SparkSession,
        datasets: list[Dataset],
        interpolation: str = "bilinear",
        nodata_value=None,
        sample_partitions: int | None = None,
        salt: int = 0,
    ):
        if interpolation not in interpolate.INTERPOLATION_METHODS:
            raise ValueError(f"Invalid interpolation method '{interpolation}'.")
        self.spark = spark
        self.datasets = datasets
        self.interpolation = interpolation
        self.nodata_value = nodata_value
        self.sample_partitions = sample_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self.registry = tiles.registry_df(spark, datasets)
        tile_rows = tiles.tile_index_rows(datasets)
        self.tile_index = spark.createDataFrame(
            tile_rows, tiles.TILE_INDEX_SCHEMA
        )
        self.fallback_name = datasets[-1].name
        # Adaptive hot-tile salting: the sampling shuffle hashes on the
        # raster path, so distinct-path count caps that stage's
        # parallelism. With fewer tiles than target partitions (small
        # fixture sets locally; Zipf hotspots at scale where one tile
        # holds a disproportionate share) every tile is "hot" — split
        # each across enough tasks to fill the stage. salt=0 requests
        # this auto mode; an explicit salt>=1 is honored as-is.
        n_paths = max(
            1, len(tile_rows) + sum(1 for d in datasets if d.kind == "single")
        )
        self.salt = salt if salt >= 1 else max(
            1, -(-self.sample_partitions // n_paths)
        )

    def candidates(self, points: DataFrame, carry: tuple = ()) -> DataFrame:
        """J2: broadcast bbox coverage join (inclusive bounds, parity with
        backend.py:254-266). LEFT join so uncovered points survive as a
        single null-dataset row — the pipeline stays one linear flow with
        no re-scan of the input subtree."""
        reg = F.broadcast(self.registry)
        cond = (
            (points["lat"] >= reg["bottom"])
            & (points["lat"] <= reg["top"])
            & (points["lon"] >= reg["left"])
            & (points["lon"] <= reg["right"])
        )
        return points.select("point_id", "lat", "lon", *carry).join(
            reg, cond, "left"
        )

    def with_tile_paths(self, cand: DataFrame, carry: tuple = ()) -> DataFrame:
        """S1+S3+J1: tile key derivation and broadcast tile join.

        Single-file datasets have null tile_size -> null keys -> no tile
        match; their path comes from coalesce with single_path. Uncovered
        points keep a null path end-to-end."""
        cand = cand.withColumn("xy", project_xy("lat", "lon", "filename_epsg"))
        # float64 floor(coord / tile_size): same arithmetic as the
        # reference's decimal_base_floor (utils.py:60-65 divides in float)
        cand = cand.withColumn(
            "iy", F.floor(F.col("xy.y") / F.col("tile_size")).cast("long")
        ).withColumn(
            "ix", F.floor(F.col("xy.x") / F.col("tile_size")).cast("long")
        )
        idx = F.broadcast(
            self.tile_index.select(
                F.col("dataset").alias("_tds"),
                F.col("iy").alias("_tiy"),
                F.col("ix").alias("_tix"),
                F.col("path").alias("_tpath"),
            )
        )
        cand = cand.join(
            idx,
            (cand["dataset"] == idx["_tds"])
            & (cand["iy"] == idx["_tiy"])
            & (cand["ix"] == idx["_tix"]),
            "left",
        )
        return cand.select(
            "point_id",
            "lat",
            "lon",
            "dataset",
            "priority",
            *carry,
            F.coalesce(F.col("_tpath"), F.col("single_path")).alias("path"),
        )

    def set_path_salts(self, salts: dict[str, int]) -> None:
        """Install per-path salt factors (from ``estimate_path_salts``).

        Skew is per-tile, not uniform: one global low-res raster (or one
        Zipf-hot city tile) can hold most points while thousands of tiles
        hold a handful. A uniform salt either under-splits the hot tile
        or shatters every cold tile across tasks (each task then opens
        many rasters — pathological at 10^5 tiles). Per-path salts split
        each tile across ~its fair share of partitions only."""
        self._path_salts = {p: int(s) for p, s in salts.items() if s > 1}

    def sampled(self, cand_paths: DataFrame, carry: tuple = ()) -> DataFrame:
        """A1+S8: shuffle by tile path, sample rasters in Arrow batches.
        Null-path rows ride along and come out as state=OOB."""
        df = cand_paths
        parts = ["path"]
        if getattr(self, "_path_salts", None):
            salt_df = F.broadcast(
                self.spark.createDataFrame(
                    list(self._path_salts.items()), "_spath string, _sfactor int"
                )
            )
            df = (
                df.join(salt_df, df["path"] == salt_df["_spath"], "left")
                .withColumn(
                    "_salt",
                    F.pmod(
                        F.xxhash64("point_id"),
                        F.coalesce(F.col("_sfactor"), F.lit(1)),
                    ),
                )
                .drop("_spath", "_sfactor")
            )
            parts = ["path", "_salt"]
        elif self.salt > 1:
            df = df.withColumn("_salt", F.pmod(F.col("point_id"), F.lit(self.salt)))
            parts = ["path", "_salt"]
        df = df.repartition(self.sample_partitions, *parts)
        schema = StructType(
            [df.schema[c] for c in _SAMPLE_BASE_COLS]
            + [df.schema[c] for c in carry]
            + [
                StructField("z", DoubleType()),
                StructField("state", ByteType()),
            ]
        )
        return df.mapInPandas(_make_sampler(self.interpolation, carry), schema)

    def resolve(self, points: DataFrame, carry: tuple = ()) -> DataFrame:
        """Full pipeline: one linear plan, one scan of the input.

        Input needs (point_id, lat, lon). Output: (point_id, lat, lon,
        elevation, dataset), exactly one row per input point_id. ``carry``
        names extra input columns to thread through the pipeline — at
        scale this is strictly cheaper than ``attach``'s join, which
        would shuffle both sides AND recompute the extraction subtree
        (a second full scan of the input table)."""
        carry = tuple(carry)
        cand = self.candidates(points, carry)
        cand = self.with_tile_paths(cand, carry)
        res = self.sampled(cand, carry)

        elev = (
            F.when(F.col("state") == _STATE_OOB, F.lit(None).cast("double"))
            .when(F.col("state") == _STATE_NODATA, F.lit(float("nan")))
            .otherwise(F.col("z"))
        )
        res = res.withColumn("elevation", _fill_expr(elev, self.nodata_value))
        res = res.withColumn("resolved", F.col("elevation").isNotNull())

        # J3(b): winner = min priority among resolved rows, via a hash
        # aggregate with map-side partial combine (min_by) — cheaper than
        # a sort-based row_number window and AQE-coalescible. Unresolved
        # points take the STATIC attribution expression instead of a
        # candidate row's dataset: the reference stamps dataset_name on
        # every config-bbox-matched query even when it returns None
        # (backend.py:280-286), so unresolved attribution = last
        # config-matching dataset — which may be a dataset the engine
        # never sampled because its derived raster coverage (registry
        # build) excluded the point. Config bounds are a tiny static
        # list, so this is a chain of K codegen'd comparisons, not a join.
        attrib = F.coalesce(
            *[
                F.when(
                    (F.col("lat") >= float(ds.wgs84_bounds.bottom))
                    & (F.col("lat") <= float(ds.wgs84_bounds.top))
                    & (F.col("lon") >= float(ds.wgs84_bounds.left))
                    & (F.col("lon") <= float(ds.wgs84_bounds.right)),
                    F.lit(ds.name),
                )
                for ds in reversed(self.datasets)
            ],
            F.lit(self.fallback_name),
        )
        pick_order = F.when(F.col("resolved"), F.col("priority")).otherwise(
            F.lit(1_000_000)
        )
        agg = res.groupBy("point_id").agg(
            F.first("lat").alias("lat"),
            F.first("lon").alias("lon"),
            *[F.first(c).alias(c) for c in carry],
            F.min_by(
                F.struct(F.col("elevation"), F.col("dataset")), pick_order
            ).alias("_win"),
            F.max("resolved").alias("_any"),
        )
        picked = agg.select(
            "point_id",
            "lat",
            "lon",
            *carry,
            F.when(F.col("_any"), F.col("_win.elevation")).alias("elevation"),
            F.when(F.col("_any"), F.col("_win.dataset"))
            .otherwise(attrib)
            .alias("dataset"),
        )
        return picked

    @staticmethod
    def attach(points: DataFrame, resolved: DataFrame) -> DataFrame:
        """J4: re-attach resolver output to the full input rows by key
        (no global sort — order is identity, not position)."""
        return points.join(
            resolved.select("point_id", "elevation", "dataset"), "point_id", "left"
        )


def estimate_path_salts(
    resolver: "ElevationResolver",
    points_sample: DataFrame,
) -> dict[str, int]:
    """Per-path salt factors from a cheap sample of the point stream.

    ``points_sample`` should be the extraction of a SMALL document sample
    (e.g. ``documents.sample(0.001)`` upstream — sampling documents, not
    the extracted points, keeps the estimation job's UDF work
    proportional to the sample). The returned dict maps each raster path
    to ceil(its share of rows x sample_partitions): a path that would
    fill k partitions is split into ~k salt buckets; cold tiles stay at
    salt 1 and are never shattered across tasks. Shares are scale-free,
    so the sampling fraction needs no correction. Feed the result to
    ``resolver.set_path_salts``.

    At cluster scale this is one tiny pre-pass (0.1% of the data) that
    removes the single-hot-tile straggler — the skew case AQE cannot fix
    for a mapInPandas repartition (it is not a join)."""
    cand = resolver.with_tile_paths(resolver.candidates(points_sample))
    rows = (
        cand.where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(r.cnt for r in rows)
    if total == 0:
        return {}
    per_part = max(1.0, total / resolver.sample_partitions)
    out = {}
    for r in rows:
        salt = min(resolver.sample_partitions, math.ceil(r.cnt / per_part))
        if salt > 1:
            out[r.path] = salt
    return out
