"""Elevation profiles: distance-axis sampling + ordered gain/loss fold,
differentially tested against a sequential single-process replay."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark import geodesic, oracle
from opentopodata_spark.operators import elevation, paths


class TestSampleDistance:
    def test_with_distance_linspace(self, spark):
        df = spark.createDataFrame(
            [(3, [0.0, 1.0], [10.0, 11.0])],
            "path_id long, lats array<double>, lons array<double>",
        )
        out = sorted(
            paths.sample_paths(df, 5, with_distance=True).collect(),
            key=lambda r: r.sample_pos,
        )
        d = [r.distance_m for r in out]
        assert d[0] == 0.0
        total = geodesic.inverse(0.0, 10.0, 1.0, 11.0)["s12"]
        assert d[-1] == pytest.approx(total, rel=1e-12)
        steps = np.diff(d)
        assert np.allclose(steps, steps[0])

    def test_with_distance_n2_measures_segment(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.5], [0.0, 0.5])],
            "path_id long, lats array<double>, lons array<double>",
        )
        out = sorted(
            paths.sample_paths(df, 2, with_distance=True).collect(),
            key=lambda r: r.sample_pos,
        )
        assert out[0].distance_m == 0.0
        assert out[1].distance_m == pytest.approx(
            geodesic.inverse(0.0, 0.0, 0.5, 0.5)["s12"], rel=1e-12
        )

    def test_without_distance_schema_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 1.0], [0.0, 1.0])],
            "path_id long, lats array<double>, lons array<double>",
        )
        assert paths.sample_paths(df, 3).columns == [
            "path_id", "sample_pos", "lat", "lon",
        ]


class TestProfileMetrics:
    def test_gain_loss_fold(self, spark):
        # path 1: 10 -> 30 -> 20 -> 25 => gain 25, loss 10
        rows = [
            (1, 0, 0.0, 10.0),
            (1, 1, 100.0, 30.0),
            (1, 2, 200.0, 20.0),
            (1, 3, 300.0, 25.0),
        ]
        df = spark.createDataFrame(
            rows, "path_id long, sample_pos int, distance_m double, elevation double"
        )
        (m,) = paths.profile_metrics(df).collect()
        assert (m.path_id, m.n_valid) == (1, 4)
        assert m.total_distance_m == 300.0
        assert (m.elev_min, m.elev_max) == (10.0, 30.0)
        assert (m.elev_gain, m.elev_loss) == (25.0, 10.0)

    def test_null_gap_skipped_without_reset(self, spark):
        # null elevations are NODATA gaps: 10 -> None -> 15 counts +5
        rows = [
            (2, 0, 0.0, 10.0),
            (2, 1, 50.0, None),
            (2, 2, 100.0, 15.0),
        ]
        df = spark.createDataFrame(
            rows, "path_id long, sample_pos int, distance_m double, elevation double"
        )
        (m,) = paths.profile_metrics(df).collect()
        assert m.n_valid == 2
        assert (m.elev_gain, m.elev_loss) == (5.0, 0.0)

    def test_all_null_path(self, spark):
        df = spark.createDataFrame(
            [(3, 0, 0.0, None), (3, 1, 9.0, None)],
            "path_id long, sample_pos int, distance_m double, elevation double",
        )
        (m,) = paths.profile_metrics(df).collect()
        assert m.n_valid == 0
        assert m.elev_min is None and m.elev_max is None
        assert (m.elev_gain, m.elev_loss) == (0.0, 0.0)

    def test_order_independence(self, spark):
        # the fold sorts by sample_pos inside the group: shuffled input
        # rows give the identical result
        rows = [(4, p, float(p), float((p * 37) % 11)) for p in range(20)]
        df = spark.createDataFrame(
            rows, "path_id long, sample_pos int, distance_m double, elevation double"
        )
        a = paths.profile_metrics(df).collect()[0]
        b = paths.profile_metrics(
            df.orderBy(F.rand(seed=5)).repartition(7)
        ).collect()[0]
        assert a == b


class TestElevationProfileE2E:
    def test_profile_matches_sequential_replay(self, spark, datasets):
        ds = [datasets["eudemsubset"], datasets["etopo1deg"]]
        # three multi-waypoint paths: one through the hi-res EU window,
        # one global, one crossing the window edge (priority coalesce)
        wp = [
            (1, [0.2, 0.5, 0.9], [10.2, 11.0, 11.8]),
            (2, [-40.0, -35.0, -30.0], [100.0, 106.0, 103.0]),
            (3, [-0.5, 0.5, 1.5], [9.5, 11.0, 12.5]),
        ]
        n = 17
        pdf = spark.createDataFrame(
            wp, "path_id long, lats array<double>, lons array<double>"
        )
        resolver = elevation.ElevationResolver(spark, ds, "bilinear")
        got = {
            r.path_id: r
            for r in paths.elevation_profile(resolver, pdf, n).collect()
        }
        assert set(got) == {1, 2, 3}
        for pid, plats, plons in wp:
            s_lats, s_lons, s_dist = geodesic.sample_points_with_distance(
                np.asarray(plats), np.asarray(plons), n
            )
            elevs, _ = oracle.get_elevation(s_lats, s_lons, ds, "bilinear")
            prev, gain, loss = None, 0.0, 0.0
            valid = [float(e) for e in elevs if e is not None]
            for e in elevs:
                if e is None:
                    continue
                e = float(e)
                if prev is not None:
                    gain += max(e - prev, 0.0)
                    loss += max(prev - e, 0.0)
                prev = e
            m = got[pid]
            assert m.n_valid == len(valid)
            assert m.total_distance_m == pytest.approx(s_dist[-1], rel=1e-12)
            if valid:
                assert m.elev_min == min(valid)
                assert m.elev_max == max(valid)
            assert m.elev_gain == pytest.approx(gain, abs=1e-9)
            assert m.elev_loss == pytest.approx(loss, abs=1e-9)
