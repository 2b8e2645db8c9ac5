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


class TestLineOfSight:
    def _samples(self, spark, elevs, step=100.0):
        rows = [
            (1, i, i * step, e) for i, e in enumerate(elevs)
        ]
        return spark.createDataFrame(
            rows, "path_id long, sample_pos long, distance_m double, "
                  "elevation double",
        )

    def test_flat_visible_and_hill_blocks(self, spark):
        flat = self._samples(spark, [10.0, 10.0, 10.0, 10.0, 10.0])
        r = paths.los_metrics(flat, observer_height=2.0, target_height=0.0,
                              use_curvature=False).collect()[0]
        assert r.visible is True
        # line goes 12 -> 10 over 400 m; clearance at d=100 is
        # (12 - 0.5) - 10 = 1.5
        assert r.min_clearance_m == pytest.approx(10.0 + 2.0 * (1 - 3 / 4)
                                                  - 10.0)
        hill = self._samples(spark, [10.0, 10.0, 40.0, 10.0, 10.0])
        r = paths.los_metrics(hill, observer_height=2.0,
                              use_curvature=False).collect()[0]
        assert r.visible is False
        # sight line at d=200: 12 + (10-12)*0.5 = 11; terrain 40
        assert r.min_clearance_m == pytest.approx(11.0 - 40.0)

    def test_curvature_blocks_long_flat_path(self, spark):
        # 60 km dead-flat sea-level path, 1.5 m eyes: earth's bulge
        # (~ (1-0.13)*30000^2/(2R) = 61 m) blocks it; without curvature
        # it is visible
        n, D = 61, 60_000.0
        flat = self._samples(spark, [0.0] * n, step=D / (n - 1))
        vis = paths.los_metrics(flat, observer_height=1.5,
                                target_height=1.5,
                                use_curvature=False).collect()[0]
        assert vis.visible is True
        blocked = paths.los_metrics(flat, observer_height=1.5,
                                    target_height=1.5).collect()[0]
        assert blocked.visible is False
        bulge = (1 - 0.13) * (D / 2) ** 2 / (2 * 6371008.8)
        assert blocked.min_clearance_m == pytest.approx(1.5 - bulge, abs=0.5)

    def test_null_handling(self, spark):
        # missing endpoint -> visible null; missing intermediates counted
        r = paths.los_metrics(
            self._samples(spark, [None, 10.0, 10.0]),
            use_curvature=False,
        ).collect()[0]
        assert r.visible is None and r.elev_a is None
        r = paths.los_metrics(
            self._samples(spark, [10.0, None, 10.5, 10.0]),
            use_curvature=False,
        ).collect()[0]
        # line at d=200 is 12 + (10-12)*2/3 = 10.667 > 10.5 -> visible
        assert r.visible is True and r.n_missing == 1

    def test_e2e_matches_sequential_replay(self, spark, datasets):
        ds = [datasets["eudemsubset"], datasets["etopo1deg"]]
        prs = [
            (1, 0.25, 10.25, 0.85, 11.75),   # across the EU window
            (2, -40.0, 100.0, -30.0, 103.0),  # global etopo
            (3, 0.5, 11.0, 40.0, 11.0),       # long south->north
        ]
        pdf = spark.createDataFrame(
            prs, "los_id long, lat_a double, lon_a double, lat_b double, "
                 "lon_b double",
        )
        n = 33
        resolver = elevation.ElevationResolver(spark, ds, "bilinear")
        got = {
            r.los_id: r
            for r in paths.line_of_sight(resolver, pdf, n).collect()
        }
        assert set(got) == {1, 2, 3}
        R = 6371008.8
        for pid, la, lo, lb, lon_b in prs:
            s_lats, s_lons, s_dist = geodesic.sample_points_with_distance(
                np.asarray([la, lb]), np.asarray([lo, lon_b]), n
            )
            elevs, _ = oracle.get_elevation(s_lats, s_lons, ds, "bilinear")
            ea, eb, D = elevs[0], elevs[-1], s_dist[-1]
            margins = []
            miss = 0
            for i in range(1, n - 1):
                if elevs[i] is None:
                    miss += 1
                    continue
                d = s_dist[i]
                line = (ea + 2.0) + ((eb + 0.0) - (ea + 2.0)) * d / D
                terr = float(elevs[i]) + (1 - 0.13) / (2 * R) * d * (D - d)
                margins.append(line - terr)
            m = got[pid]
            assert m.elev_a == ea and m.elev_b == eb
            assert m.distance_m == pytest.approx(D, rel=1e-12)
            assert m.n_missing == miss
            assert m.min_clearance_m == pytest.approx(min(margins),
                                                      abs=1e-9)
            assert m.visible == (min(margins) >= 0)


class TestViewshed:
    @pytest.fixture()
    def wall_ds(self, tmp_path):
        """Flat 0 m terrain with a 200 m-tall, ~1 km-thick north-south
        wall starting ~1.1 km east of the observer at (0, 10): rays east
        are blocked beyond the wall, rays west stay clear."""
        import os

        from opentopodata_spark import config, geotiff

        n, res = 200, 0.001  # ~111 m cells, 0.2 deg box around (0, 10)
        grid = np.zeros((n, n), dtype=np.float32)
        grid[:, 110:119] = 200.0  # wall: lon ~ 10.010-10.019 (1.1-2.1 km)
        d = tmp_path / "wall"
        os.makedirs(d, exist_ok=True)
        geotiff.write_geotiff(
            str(d / "wall.tif"), grid, x0=9.9, y0=0.1, sx=res, sy=res,
            epsg=4326, nodata=-9999,
        )
        cfg = tmp_path / "wall.yaml"
        cfg.write_text(f"datasets:\n- name: wall\n  path: {d}/\n")
        return [config.load_datasets(str(cfg))["wall"]]

    def test_wall_blocks_east_not_west(self, spark, wall_ds):
        obs = spark.createDataFrame([(1, 0.0, 10.0)],
                                    "obs_id long, lat double, lon double")
        resolver = elevation.ElevationResolver(spark, wall_ds, "bilinear")
        vs = paths.viewshed(
            resolver, obs, radius_m=8000.0, n_rays=4, n_samples=17,
            observer_height=2.0,
        )
        rows = vs.collect()
        by_ray = {}
        for r in rows:
            by_ray.setdefault(r.ray, []).append(r)
        for ray, rs in by_ray.items():
            rs.sort(key=lambda r: r.sample_pos)
        # ray 1 = east (azimuths 0=N,1=E,2=S,3=W): wall at ~1.2 km
        east = [r for r in by_ray[1] if r.elevation is not None]
        near = [r for r in east if r.distance_m < 1000]
        far = [r for r in east if r.distance_m > 2500]
        assert all(r.visible for r in near)
        assert all(not r.visible for r in far)
        # the NEAR edge of the wall is visible (it IS the horizon);
        # its own far edge is already in the near edge's shadow
        wall_hits = [r for r in east if r.elevation and r.elevation > 100]
        assert wall_hits and wall_hits[0].visible
        # ray 3 = west: flat, so visibility ends at the 2 m-eye horizon
        # (~3.57*sqrt(h) km ~ 5.0 km with the 0.87 refraction factor):
        # near samples visible, beyond-horizon flat ground hidden by the
        # earth bulge itself
        west = [r for r in by_ray[3] if r.elevation is not None]
        assert all(r.visible for r in west if r.distance_m < 4500)
        assert all(not r.visible for r in west if r.distance_m > 6500)
        # summary rollup agrees with the sample-level frame
        s = {r.obs_id: r for r in paths.viewshed_summary(vs).collect()}[1]
        vals = [r for r in rows if r.visible is not None]
        assert s.n_valid == len(vals)
        assert s.n_visible == sum(1 for r in vals if r.visible)

    def test_matches_sequential_replay(self, spark, datasets):
        ds = [datasets["eudemsubset"], datasets["etopo1deg"]]
        obs = [(1, 0.45, 10.8), (2, -35.0, 101.0)]
        odf = spark.createDataFrame(obs,
                                    "obs_id long, lat double, lon double")
        resolver = elevation.ElevationResolver(spark, ds, "bilinear")
        n_rays, n_samples, radius = 6, 9, 30000.0
        got = {}
        vs = paths.viewshed(resolver, odf, radius, n_rays, n_samples)
        for r in vs.collect():
            got[(r.obs_id, r.ray, r.sample_pos)] = (
                r.visible, r.elevation, r.distance_m)
        R = 6371008.8
        curv = (1 - 0.13) / (2 * R)
        n_checked = 0
        for oid, la, lo in obs:
            e0 = oracle.get_elevation(
                np.array([la]), np.array([lo]), ds, "bilinear")[0][0]
            for ray in range(n_rays):
                az = 360.0 * ray / n_rays
                lats, lons, dd = [], [], []
                for i in range(1, n_samples):
                    d = radius * i / (n_samples - 1)
                    g = geodesic.direct(la, lo, az, d)
                    lats.append(g["lat2"])
                    lons.append((g["lon2"] + 180.0) % 360.0 - 180.0)
                    dd.append(d)
                elevs, _ = oracle.get_elevation(
                    np.array(lats), np.array(lons), ds, "bilinear")
                eye = None if e0 is None else float(e0) + 2.0
                maxtan = -np.inf
                for i, (e, d) in enumerate(zip(elevs, dd), start=1):
                    gv, ge, gd = got[(oid, ray, i)]
                    assert ge == e and abs(gd - d) < 1e-9
                    if eye is None or e is None:
                        assert gv is None
                        continue
                    t = (float(e) - curv * d * d - eye) / d
                    assert gv == (t >= maxtan), (oid, ray, i)
                    maxtan = max(maxtan, t)
                    n_checked += 1
        assert n_checked > 50
