"""Distributed geodesic path sampling (SURVEY.md S6).

The reference samples n equally-spaced points along a WGS84 geodesic per
request (/root/reference/opentopodata/utils.py:102-168, geographiclib).
Here the same numerics (opentopodata_spark.geodesic — Karney series,
validated against the reference's pytest goldens) run per-path inside an
Arrow-batched ``mapInPandas``: one input row = one path (arrays of
waypoint lats/lons), output = one row per sample. Paths are independent,
so the operator is embarrassingly parallel — no shuffle at all; the
explode happens inside the UDF batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import geodesic

__all__ = ["sample_paths"]

_OUT_SCHEMA = "path_id long, sample_pos int, lat double, lon double"


def sample_paths(paths: DataFrame, n_samples: int) -> DataFrame:
    """paths: (path_id long, lats array<double>, lons array<double>) ->
    (path_id, sample_pos, lat, lon) with n_samples rows per path.

    Endpoint exactness and shortest-route wraparound semantics follow
    the reference (pinned by tests/test_utils_parity.py).
    """
    if n_samples < 2:
        raise ValueError("n_samples must be >= 2")

    def run(batches):
        for pdf in batches:
            ids, pos, las, los = [], [], [], []
            for pid, plats, plons in zip(pdf["path_id"], pdf["lats"], pdf["lons"]):
                s_lats, s_lons = geodesic.sample_points_on_path(
                    np.asarray(plats, dtype=np.float64),
                    np.asarray(plons, dtype=np.float64),
                    n_samples,
                )
                ids.extend([pid] * n_samples)
                pos.extend(range(n_samples))
                las.extend(s_lats)
                los.extend(s_lons)
            yield pd.DataFrame(
                {"path_id": ids, "sample_pos": pos, "lat": las, "lon": los}
            )

    return paths.mapInPandas(run, _OUT_SCHEMA)
