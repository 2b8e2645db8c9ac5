"""Tile index + dataset registry as (broadcastable) DataFrames.

The reference keeps an in-memory dict {(northing, easting) -> path} per
dataset (/root/reference/opentopodata/config.py:367-373) and floors query
coordinates to Decimal tile corners per request (config.py:432-451). At
engine scale that becomes:

* ``dataset_registry_rows``: one row per (request-ordered) dataset with its
  priority, bbox, filename CRS and tile size — broadcast for the coverage
  join (operator J2);
* ``tile_index_rows``: one row per raster tile with EXACT integer tile
  indices iy = corner_northing / tile_size, ix = corner_easting / tile_size
  (computed in Decimal on the driver, stored as longs) — broadcast for the
  point->tile equi-join (operator J1). Points compute the same longs with
  ``floor(coord / tile_size)`` in float64, which reproduces the reference's
  decimal_base_floor arithmetic exactly (it also divides in float:
  utils.py:60-65).

Joining on longs instead of Decimals keeps the join key cheap at 10^12-row
scale and exactly equal on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal

from .config import Dataset, MultiDataset, SingleFileDataset, TiledDataset

REGISTRY_SCHEMA = (
    "dataset string, priority int, kind string, "
    "left double, bottom double, right double, top double, "
    "filename_epsg int, tile_size double, single_path string"
)

TILE_INDEX_SCHEMA = "dataset string, iy long, ix long, path string"


@dataclass(frozen=True)
class RegistryRow:
    dataset: str
    priority: int
    kind: str
    left: float
    bottom: float
    right: float
    top: float
    filename_epsg: int | None
    tile_size: float | None
    single_path: str | None


def dataset_registry_rows(datasets: list[Dataset]) -> list[tuple]:
    """Ordered datasets -> registry rows (priority = position)."""
    rows = []
    for priority, ds in enumerate(datasets):
        if isinstance(ds, MultiDataset):
            raise ValueError("MultiDataset must be expanded before registry build")
        b = ds.wgs84_bounds
        left, bottom, right, top = (
            float(b.left), float(b.bottom), float(b.right), float(b.top)
        )
        if isinstance(ds, SingleFileDataset):
            rows.append(
                (ds.name, priority, "single", left, bottom, right, top,
                 None, None, ds.tile_path)
            )
        else:
            rows.append(
                (ds.name, priority, "tiled", left, bottom, right, top,
                 int(ds.filename_epsg), float(ds.filename_tile_size), None)
            )
    return rows


def tile_index_rows(datasets: list[Dataset]) -> list[tuple]:
    """All tiled datasets' tiles -> (dataset, iy, ix, path) rows.

    iy/ix are exact: corner / tile_size evaluated in Decimal. A corner that
    is not an integer multiple of the tile size keeps the reference's
    behavior implicitly (the floored point key simply never equals it...
    which is also what the dict lookup would do)."""
    rows = []
    for ds in datasets:
        if not isinstance(ds, TiledDataset):
            continue
        size = ds.filename_tile_size
        for (northing, easting), path in ds.tile_lookup.items():
            iy = int(Decimal(northing) / size)
            ix = int(Decimal(easting) / size)
            # verify exactness; non-multiple corners get a sentinel index
            # that can never match a floored point key
            if Decimal(iy) * size != Decimal(northing) or Decimal(ix) * size != Decimal(easting):
                continue
            rows.append((ds.name, iy, ix, path))
    return rows


def registry_df(spark, datasets: list[Dataset]):
    return spark.createDataFrame(dataset_registry_rows(datasets), REGISTRY_SCHEMA)


def tile_index_df(spark, datasets: list[Dataset]):
    rows = tile_index_rows(datasets)
    return spark.createDataFrame(rows, TILE_INDEX_SCHEMA)
