"""Single-process reference-semantics oracle.

A faithful, non-distributed re-implementation of the reference's elevation
resolution (/root/reference/opentopodata/backend.py:166-288) built on this
repo's own geotiff/crs/interpolate modules. The Spark pipeline is
differential-tested against this oracle: elevations, dataset attributions
and tile assignments must match exactly (see tests/test_differential.py).
"""

from __future__ import annotations

import functools

import numpy as np

from . import geotiff, interpolate
from .config import MultiDataset, SingleFileDataset, TiledDataset
from .utilmath import fill_na


class InputError(ValueError):
    """Invalid input data (message safe for clients)."""


@functools.lru_cache(maxsize=64)
def _open_cached(path: str) -> geotiff.Raster:
    return geotiff.open_raster(path)


def get_elevation_from_path(lats, lons, path, interpolation) -> list:
    """Per-file read: reproject -> bounds check -> fractional window sample.

    Contract of /root/reference/opentopodata/backend.py:72-163: returns one
    entry per point; None for out-of-bounds, NaN for NODATA.
    """
    if interpolation not in interpolate.INTERPOLATION_METHODS:
        raise InputError(f"Invalid interpolation method '{interpolation}'.")
    try:
        raster = _open_cached(path)
    except geotiff.RasterOpenError as e:
        raise InputError(str(e))
    return interpolate.sample_points_on_raster(raster, lats, lons, interpolation)


def get_elevation_for_single_dataset(
    lats, lons, dataset, interpolation="nearest", nodata_value=None
) -> list:
    """Tile assignment -> per-path batches -> scatter back -> NaN fill.

    Parity with /root/reference/opentopodata/backend.py:166-212, including
    fill_na applied PER DATASET (so a non-null nodata_value stops
    multi-dataset fall-through at the first NODATA hit — the code-is-spec
    divergence from docs/api.md:26 noted in SURVEY.md §7).
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    paths = dataset.location_paths(lats, lons)

    path_to_idx: dict = {}
    for i, p in enumerate(paths):
        path_to_idx.setdefault(p, []).append(i)

    elevations: list = [None] * len(paths)
    for path, indices in path_to_idx.items():
        if path is None:
            continue  # missing tile -> None
        zs = get_elevation_from_path(
            lats[indices], lons[indices], path, interpolation
        )
        for i, z in zip(indices, zs):
            elevations[i] = z
    return fill_na(elevations, nodata_value)


def get_elevation(
    lats, lons, datasets, interpolation="nearest", nodata_value=None
) -> tuple[list, list]:
    """First-non-null coalesce across ordered datasets.

    Parity with /root/reference/opentopodata/backend.py:224-288:
    - per dataset in priority order, only unresolved (elevation is None)
      points inside the dataset's wgs84_bounds are queried;
    - attribution is the LAST dataset that attempted the point, even when
      the result stayed None;
    - final fallback name is the last dataset in the list.
    """
    n = len(lats)
    elevations: list = [None] * n
    names: list = [None] * n

    for dataset in datasets:
        idx = [
            i
            for i in range(n)
            if elevations[i] is None
            and dataset.wgs84_bounds.bottom <= lats[i] <= dataset.wgs84_bounds.top
            and dataset.wgs84_bounds.left <= lons[i] <= dataset.wgs84_bounds.right
        ]
        if not idx:
            if all(e is not None for e in elevations):
                break
            continue
        zs = get_elevation_for_single_dataset(
            [lats[i] for i in idx],
            [lons[i] for i in idx],
            dataset,
            interpolation,
            nodata_value,
        )
        for i, z in zip(idx, zs):
            elevations[i] = z
            names[i] = dataset.name

    fallback = datasets[-1].name
    return elevations, [nm or fallback for nm in names]


__all__ = [
    "InputError",
    "get_elevation",
    "get_elevation_for_single_dataset",
    "get_elevation_from_path",
    "MultiDataset",
    "SingleFileDataset",
    "TiledDataset",
]
