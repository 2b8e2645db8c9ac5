"""jobs/raster.py CLI tests: the three subcommands end-to-end, output
read-back, resume flag, and client-error exits."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest

from opentopodata_spark import geotiff
from opentopodata_spark.jobs import raster as job


@pytest.fixture()
def srtm_cfg(raster_root):
    return os.path.join(raster_root, "test-config.yaml")


def test_terrain_from_config(spark, srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "slope")
    rc = job.main([
        "--cores", "4", "terrain", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out,
        "--kind", "slope", "--scale", "111120",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["tiles"] == 2 and res["errors"] == 0
    tifs = sorted(glob.glob(os.path.join(out, "slope_*.tif")))
    assert len(tifs) == 2
    r = geotiff.open_raster(tifs[0])
    inner = r.read_block(1, r.height - 1, 1, r.width - 1)
    assert np.isfinite(inner).any()
    # resume run: nothing recomputed, same manifest size
    mt = {p: os.path.getmtime(p) for p in tifs}
    rc = job.main([
        "--cores", "4", "terrain", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out,
        "--kind", "slope", "--scale", "111120", "--skip-existing",
    ])
    assert rc == 0
    assert all(os.path.getmtime(p) == t for p, t in mt.items())


def test_zonal_cli(spark, srtm_cfg, tmp_path, capsys):
    polys = str(tmp_path / "polys.json")
    with open(polys, "w") as f:
        json.dump([{"polygon_id": "B", "lats": [0.3, 0.7, 0.7, 0.3],
                    "lons": [10.8, 10.8, 11.2, 11.2]}], f)
    out = str(tmp_path / "zonal_out")
    rc = job.main([
        "--cores", "4", "zonal", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--polygons", polys, "--out", out,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["polygons"] == 1
    row = spark.read.parquet(out).collect()[0]
    assert row["polygon_id"] == "B" and row["n_px"] > 0


def test_rasterize_cli(spark, tmp_path, capsys):
    pts = str(tmp_path / "pts.parquet")
    rows = [(i, 0.5 + (i % 9), 0.5 + (i % 7), i % 5) for i in range(100)]
    spark.createDataFrame(
        rows, "pid long, lat double, lon double, value long"
    ).write.parquet(pts)
    out = str(tmp_path / "cells")
    tiles_out = str(tmp_path / "tiles")
    rc = job.main([
        "--cores", "4", "rasterize", "--points", pts, "--value-col", "value",
        "--grid", "0,10,1,1,8,10", "--out", out,
        "--tiles-out", tiles_out, "--tile-px", "16",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["cells"] > 0 and res["tiles"] == 1
    cells = spark.read.parquet(out)
    assert cells.agg({"n_points": "sum"}).collect()[0][0] == 100


def test_bad_grid_is_client_error(tmp_path, capsys):
    rc = job.main([
        "rasterize", "--points", str(tmp_path / "x.parquet"),
        "--grid", "1,2,3", "--out", str(tmp_path / "o"),
    ])
    assert rc == 2
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "INVALID_REQUEST"


def test_resample_cli(spark, srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "ovr")
    rc = job.main([
        "--cores", "4", "resample", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out, "--factor", "8",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["tiles"] == 2 and res["errors"] == 0
    tifs = sorted(glob.glob(os.path.join(out, "ovr8_*.tif")))
    assert len(tifs) == 2
    r = geotiff.open_raster(tifs[0])
    assert r.width == -(-1201 // 8) and r.height == -(-1201 // 8)


def test_warp_cli(spark, srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "utm")
    rc = job.main([
        "--cores", "4", "warp", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out,
        "--dst-epsg", "32632", "--dst-res", "500", "--tile-px", "256",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["errors"] == 0 and res["tiles"] >= 1
    tifs = sorted(glob.glob(os.path.join(out, "warp_*.tif")))
    assert len(tifs) == res["tiles"]
    r = geotiff.open_raster(tifs[0])
    assert r.crs.epsg == 32632 and r.res == (500.0, 500.0)
    assert np.isfinite(r.read_block(0, r.height, 0, r.width)).any()


def test_prep_cli_produces_servable_dataset(spark, srtm_cfg, tmp_path,
                                            capsys):
    """prep = the reference's documented dataset recipe in one command:
    warp onto a tap-aligned grid, corner-named tiles with embedded COG
    overviews, emitted serving config. The emitted config must LOAD and
    resolve elevations that match the original dataset."""
    from opentopodata_spark import config as cfg_mod
    from opentopodata_spark import geotiff as gt
    from opentopodata_spark.operators import elevation

    out = str(tmp_path / "prep")
    rc = job.main([
        "--cores", "4", "prep", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out,
        "--dst-res", str(1 / 1200), "--tile-px", "1200",
        "--overviews", "8", "--vrt", "--name", "warped",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["errors"] == 0
    assert res["filename_tile_size"] == 1.0
    # corner-named, servable, with embedded overviews
    tile = os.path.join(out, "tiles", "N00E010.tif")
    assert os.path.exists(tile)
    r = gt.open_raster(tile)
    assert len(r.overviews) == 1 and r.overviews[0].width == 150
    assert cfg_mod.filename_to_tile_corner(tile) == (0, 10)
    # the VRT mosaic opens
    assert gt.open_raster(res["vrt"]).width >= 1200
    # the emitted config serves elevations matching the source dataset
    dsets = cfg_mod.load_datasets(res["config"])
    ds_w = cfg_mod.resolve_dataset_names("warped", dsets)
    ds_s = cfg_mod.resolve_dataset_names(
        "srtm90subset", cfg_mod.load_datasets(srtm_cfg))
    pts = spark.createDataFrame(
        [(i, 0.15 + 0.07 * i, 10.2 + 0.15 * i) for i in range(10)],
        "point_id long, lat double, lon double",
    )
    got = {
        r_.point_id: r_.elevation
        for r_ in elevation.ElevationResolver(spark, ds_w, "bilinear")
        .resolve(pts).collect()
    }
    exp = {
        r_.point_id: r_.elevation
        for r_ in elevation.ElevationResolver(spark, ds_s, "bilinear")
        .resolve(pts).collect()
    }
    for i in range(10):
        assert got[i] == pytest.approx(exp[i], abs=2.0)


def test_buildvrt_and_info_cli(srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "srtm.vrt")
    rc = job.main([
        "buildvrt", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["sources"] == 2
    assert res["width"] == 2401 and res["height"] == 1201  # 1-px overlap

    rc = job.main(["info", "--raster", out])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["status"] == "OK"
    assert info["epsg"] == 4326 and info["width"] == 2401
    assert info["dtype"] == "int16"
    b = info["bounds"]
    assert b[0] == pytest.approx(10.0 - 1 / 2400) \
        and b[2] == pytest.approx(12.0 + 1 / 2400)


def test_contours_cli(spark, srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "segs")
    rc = job.main([
        "--cores", "4", "contours", "--config", srtm_cfg,
        "--dataset", "srtm90subset", "--out", out, "--levels", "1605.5,1614.5",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["segments"] > 100
    segs = spark.read.parquet(out)
    assert set(segs.columns) == {"level", "x1", "y1", "x2", "y2"}


def test_calc_cli_self_diff(spark, srtm_cfg, tmp_path, capsys):
    out = str(tmp_path / "diff")
    rc = job.main([
        "--cores", "4", "calc", "--config", srtm_cfg,
        "--dataset-a", "srtm90subset", "--dataset-b", "srtm90subset",
        "--out", out, "--expression", "a - b",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["tiles"] == 2 and res["errors"] == 0
    m = spark.read.parquet(f"{out}/_manifest")
    assert all(r["sum_value"] == 0.0 for r in m.collect())


def test_flowacc_cli(spark, tmp_path, capsys):
    # small non-overlapping 2x2 grid (flowacc requires no tile overlap)
    rng = np.random.default_rng(9)
    H = W = 40
    yy, xx = np.mgrid[0:H, 0:W]
    mosaic = 15.0 * np.sin(xx / 6.0) + 0.3 * yy + rng.normal(0, 0.3, (H, W))
    res = 0.01
    for ty in range(2):
        for tx in range(2):
            geotiff.write_geotiff(
                str(tmp_path / f"fa_{ty}_{tx}.tif"),
                mosaic[ty * 20:(ty + 1) * 20, tx * 20:(tx + 1) * 20],
                x0=5.0 + tx * 20 * res, y0=1.0 - ty * 20 * res,
                sx=res, sy=res, epsg=4326, nodata=-9999,
            )
    out = str(tmp_path / "acc")
    rc = job.main([
        "--cores", "4", "flowacc",
        "--rasters", str(tmp_path / "fa_*.tif"), "--out", out,
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["tiles"] == 4 and resj["errors"] == 0
    tifs = sorted(glob.glob(os.path.join(out, "flow_acc_*.tif")))
    assert len(tifs) == 4
    # mass balance: sum over all cells of (acc+1) counts each cell once
    # per path cell; instead pin a cheap invariant — total accumulation
    # equals total path length, and every value is a whole number >= 0
    from opentopodata_spark.operators import hydrology

    want = hydrology.mosaic_flow_accumulation(mosaic, res, res)
    got = np.full((H, W), np.nan)
    for p in tifs:
        iy, ix = map(int, os.path.basename(p)[:-4].split("_")[2:])
        r = geotiff.open_raster(p)
        got[(1 - iy) * 20:(2 - iy) * 20, ix * 20:(ix + 1) * 20] = \
            r.read_block(0, r.height, 0, r.width)
    fin = np.isfinite(want)
    assert np.array_equal(got[fin].astype(np.float64), want[fin])


def test_visibility_cli(spark, srtm_cfg, tmp_path, capsys):
    """jobs/visibility: los + viewshed subcommands end-to-end over the
    SRTM fixture config."""
    from opentopodata_spark.jobs import visibility as vjob

    pairs = str(tmp_path / "pairs.parquet")
    spark.createDataFrame(
        [(1, 0.25, 10.25, 0.85, 11.75), (2, 0.5, 10.4, 0.55, 10.9)],
        "los_id long, lat_a double, lon_a double, lat_b double, "
        "lon_b double",
    ).write.parquet(pairs)
    out = str(tmp_path / "los")
    rc = vjob.main([
        "--cores", "4", "los", "--config", srtm_cfg,
        "--datasets", "srtm90subset", "--pairs", pairs,
        "--out", out, "--n-samples", "17",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["pairs"] == 2
    rows = {r.los_id: r for r in spark.read.parquet(out).collect()}
    assert rows[1].visible is not None and rows[1].min_clearance_m is not None

    obs = str(tmp_path / "obs.parquet")
    spark.createDataFrame(
        [(7, 0.5, 10.8)], "obs_id long, lat double, lon double"
    ).write.parquet(obs)
    vout = str(tmp_path / "vs")
    rc = vjob.main([
        "--cores", "4", "viewshed", "--config", srtm_cfg,
        "--datasets", "srtm90subset", "--observers", obs, "--out", vout,
        "--radius-m", "15000", "--n-rays", "6", "--n-samples", "9",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["observers"] == 1
    samples = spark.read.parquet(f"{vout}/samples")
    assert samples.count() == 6 * 8   # n_rays * (n_samples - 1)
    s = spark.read.parquet(f"{vout}/summary").collect()[0]
    assert s.n_valid > 0 and 0.0 <= s.visible_frac <= 1.0

    # invalid interpolation -> INVALID_REQUEST exit 2
    rc = vjob.main([
        "los", "--config", srtm_cfg, "--datasets", "srtm90subset",
        "--pairs", pairs, "--out", str(tmp_path / "x"),
        "--interpolation", "bogus",
    ])
    assert rc == 2


def test_transcode_jp2_to_geotiff(spark, tmp_path, capsys):
    """JP2 tiles -> GeoTIFF via the transcode job: lossless values,
    preserved stems/georeferencing, resumable."""
    from opentopodata_spark import jp2

    src = tmp_path / "jp2src"
    src.mkdir()
    side = 48
    res = 1.0 / side
    grids = {}
    for lon0, stem in ((10.0, "N00E010"), (11.0, "N00E011")):
        y, x = np.mgrid[0:side, 0:side]
        g = (1500 + 900 * np.sin((x + lon0) / 7.0)
             * np.cos(y / 11.0)).astype(np.int16)
        grids[stem] = g
        jp2.write_jp2(str(src / f"{stem}.jp2"), g, x0=lon0, y0=1.0,
                      sx=res, sy=res, epsg=4326)
    out = str(tmp_path / "tif")
    rc = job.main([
        "--cores", "4", "transcode",
        "--rasters", str(src / "*.jp2"), "--out", out,
    ])
    assert rc == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["status"] == "OK" and r1["tiles"] == 2 and r1["errors"] == 0
    for stem, g in grids.items():
        t = geotiff.open_raster(os.path.join(out, f"{stem}.tif"))
        assert np.array_equal(t.read_window(0, side, 0, side)[0], g)
        assert t.crs.epsg == 4326 and abs(t.sx - res) < 1e-12
    # resume: outputs untouched
    mt = {p: os.path.getmtime(p)
          for p in glob.glob(os.path.join(out, "*.tif"))}
    rc = job.main([
        "--cores", "4", "transcode",
        "--rasters", str(src / "*.jp2"), "--out", out, "--skip-existing",
    ])
    assert rc == 0
    assert {p: os.path.getmtime(p)
            for p in glob.glob(os.path.join(out, "*.tif"))} == mt
    # the transcoded tiles resolve identically to the originals
    from opentopodata_spark import config, oracle

    lats = [0.05 + (i * 0.171) % 0.9 for i in range(25)]
    lons = [10.05 + (i * 0.313) % 1.9 for i in range(25)]
    ds_j = config.dataset_from_config("j", path=str(src) + "/",
                                      filename_tile_size=1)
    ds_t = config.dataset_from_config("t", path=out + "/",
                                      filename_tile_size=1)
    ej, _ = oracle.get_elevation(lats, lons, [ds_j], "bilinear")
    et, _ = oracle.get_elevation(lats, lons, [ds_t], "bilinear")
    assert ej == et


def test_sieve_cli(spark, tmp_path, capsys):
    rng = np.random.default_rng(13)
    k = rng.integers(0, 3, (40, 40)).astype(np.int16)
    res = 0.01
    for ty in range(2):
        for tx in range(2):
            geotiff.write_geotiff(
                str(tmp_path / f"sv_{ty}_{tx}.tif"),
                k[ty * 20:(ty + 1) * 20, tx * 20:(tx + 1) * 20],
                x0=5.0 + tx * 20 * res, y0=1.0 - ty * 20 * res,
                sx=res, sy=res, epsg=4326, nodata=-9999,
            )
    out = str(tmp_path / "sieved")
    rc = job.main([
        "--cores", "4", "sieve",
        "--rasters", str(tmp_path / "sv_*.tif"), "--out", out,
        "--threshold", "8",
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["tiles"] == 4
    tifs = sorted(glob.glob(os.path.join(out, "sieve_*.tif")))
    assert len(tifs) == 4
    # every surviving region in the rewritten mosaic is >= threshold
    # (salt-noise input: everything merges into a few big regions)
    from opentopodata_spark.operators import polygonize

    rows = polygonize.label_regions_sequential(
        [(int(p.split("_")[-2]), int(p.split("_")[-1][:-4]), p)
         for p in tifs]
    )
    sizes = [n for _i, _v, n, _t in rows]
    assert sum(sizes) == 1600
    # no nodata in this fixture, so nothing can hide below threshold
    assert min(sizes) >= 8


def test_fillnodata_cli(spark, tmp_path, capsys):
    z = np.full((40, 40), 5.0)
    z[18:22, 18:22] = np.nan
    for ty in range(2):
        for tx in range(2):
            sub = z[ty * 20:(ty + 1) * 20, tx * 20:(tx + 1) * 20]
            geotiff.write_geotiff(
                str(tmp_path / f"fn_{ty}_{tx}.tif"),
                np.where(np.isfinite(sub), sub, -9999.0)
                .astype(np.float32),
                x0=5.0 + tx * 0.2, y0=1.0 - ty * 0.2,
                sx=0.01, sy=0.01, epsg=4326, nodata=-9999.0,
            )
    out = str(tmp_path / "filled")
    rc = job.main([
        "--cores", "4", "fillnodata",
        "--rasters", str(tmp_path / "fn_*.tif"), "--out", out,
        "--max-distance", "6",
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["tiles"] == 4
    assert resj["filled"] == 16
    for p in sorted(glob.glob(os.path.join(out, "fill_*.tif"))):
        r = geotiff.open_raster(p)
        arr = r.read_block(0, r.height, 0, r.width)
        assert np.allclose(arr, 5.0)  # constant field fills exactly


def test_proximity_cli(spark, tmp_path, capsys):
    k = np.zeros((40, 40), dtype=np.float32)
    k[20, 20] = 1.0
    for ty in range(2):
        for tx in range(2):
            geotiff.write_geotiff(
                str(tmp_path / f"px_{ty}_{tx}.tif"),
                k[ty * 20:(ty + 1) * 20, tx * 20:(tx + 1) * 20],
                x0=5.0 + tx * 0.2, y0=1.0 - ty * 0.2,
                sx=0.01, sy=0.01, epsg=4326, nodata=-9999.0,
            )
    out = str(tmp_path / "prox")
    rc = job.main([
        "--cores", "4", "proximity",
        "--rasters", str(tmp_path / "px_*.tif"), "--out", out,
        "--target-values", "1", "--max-distance", "5",
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["tiles"] == 4
    # the target sits at geographic row 20 col 20 = the SOUTH-west
    # tile's local (0, 0). Outputs carry the CALLER's keys, and
    # _tiles_from_globs keys are iy-UP (northing order), so the
    # NORTH-west tile is prox_1_0; its bottom-right corner (19,19)
    # is sqrt(2) away from the target across the seam.
    r = geotiff.open_raster(os.path.join(out, "prox_1_0.tif"))
    d = r.read_block(0, 20, 0, 20)
    assert np.isclose(d[19, 19], np.sqrt(2.0), atol=1e-6)
    assert not np.isfinite(d[0, 0])
    # the target itself lives in the SOUTH-east tile (caller key 0,1)
    r0 = geotiff.open_raster(os.path.join(out, "prox_0_1.tif"))
    assert r0.read_block(0, 20, 0, 20)[0, 0] == 0.0


def test_colorrelief_cli(spark, tmp_path, capsys):
    geotiff.write_geotiff(
        str(tmp_path / "cr.tif"),
        np.linspace(0, 900, 64, dtype=np.float32).reshape(8, 8),
        x0=5.0, y0=1.0, sx=0.01, sy=0.01, epsg=4326, nodata=-9999.0,
    )
    ramp = str(tmp_path / "ramp.txt")
    with open(ramp, "w") as f:
        f.write("0 0 100 0\n1000 255 255 255\nnv 0 0 0 0\n")
    out = str(tmp_path / "relief")
    rc = job.main([
        "--cores", "4", "colorrelief",
        "--rasters", str(tmp_path / "cr.tif"), "--out", out,
        "--ramp", ramp,
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["tiles"] == 1
    from opentopodata_spark import png as _png

    rgba = _png.decode_png(
        open(os.path.join(out, "relief_0_0.png"), "rb").read()
    )
    assert rgba.shape == (8, 8, 4)
    assert tuple(rgba[0, 0]) == (0, 100, 0, 255)   # elevation 0
    assert rgba[7, 7][0] > 200                      # near-white at top


def test_polygonize_cli(spark, tmp_path, capsys):
    k = np.zeros((8, 8), dtype=np.int16)
    k[2:5, 2:5] = 7
    geotiff.write_geotiff(
        str(tmp_path / "pg.tif"), k, x0=5.0, y0=1.0,
        sx=0.01, sy=0.01, epsg=4326, nodata=-9999,
    )
    out = str(tmp_path / "regions.parquet")
    gj = str(tmp_path / "regions.geojson")
    rc = job.main([
        "--cores", "4", "polygonize",
        "--rasters", str(tmp_path / "pg.tif"), "--out", out,
        "--geojson", gj,
    ])
    assert rc == 0
    resj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resj["status"] == "OK" and resj["regions"] == 2
    fc = json.load(open(gj))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    by_val = {f["properties"]["value"]: f for f in fc["features"]}
    assert by_val[7]["properties"]["n_cells"] == 9
    ring = by_val[7]["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) == 5  # a clean square
    assert by_val[0]["properties"]["n_cells"] == 55
    # the background polygon carries the island as a hole
    assert len(by_val[0]["geometry"]["coordinates"]) == 2


def test_grid_cli(spark, tmp_path, capsys):
    pts = str(tmp_path / "gpts.parquet")
    rows = [
        (0.55 + 0.11 * (i % 7), 0.45 + 0.13 * (i % 9),
         float(10 * (i % 4))) for i in range(120)
    ]
    spark.createDataFrame(
        rows, "lat double, lon double, value double"
    ).write.parquet(pts)
    out = str(tmp_path / "gridded")
    rc = job.main([
        "--cores", "4", "grid", "--points", pts,
        "--grid", "0,2,0.1,0.1,20,20", "--out", out,
        "--algorithm", "invdist", "--radius", "0.3",
        "--tile-px", "10",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["tiles"] == 4
    assert res["valid_cells"] > 0
    m = spark.read.parquet(f"{out}/_manifest").collect()
    p = [r.path for r in m if r.n_valid > 0][0]
    a = geotiff.open_raster(p).read_block(0, 10, 0, 10)
    assert np.isfinite(a).any()


def test_burn_cli_geojson(spark, tmp_path, capsys):
    gj = tmp_path / "feats.geojson"
    gj.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"z": 4.0},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0.2, 1.2], [1.4, 1.2], [1.4, 1.8], [0.2, 1.8],
                  [0.2, 1.2]],
                 [[0.6, 1.4], [0.9, 1.4], [0.9, 1.6], [0.6, 1.6],
                  [0.6, 1.4]],
             ]}},
            {"type": "Feature", "properties": {"z": 9.0},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[1.0, 0.2], [1.9, 0.2], [1.9, 0.9], [1.0, 0.9],
                  [1.0, 0.2]]]}},
        ],
    }))
    out = str(tmp_path / "burned")
    rc = job.main([
        "--cores", "4", "burn", "--features", str(gj),
        "--grid", "0,2,0.1,0.1,20,20", "--out", out,
        "--attr", "z", "--tile-px", "10",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "OK" and res["tiles"] == 4
    assert res["burned_cells"] > 0
    m = {(r.tile_iy, r.tile_ix): r.path
         for r in spark.read.parquet(f"{out}/_manifest").collect()}
    a = geotiff.open_raster(m[(0, 0)]).read_block(0, 10, 0, 10)
    # (lat 1.45, lon 0.45) inside outer ring, outside hole -> 4
    assert a[5, 4] == np.float32(4.0)
    # (lat 1.45, lon 0.75) inside the hole -> init 0
    assert a[5, 7] == 0.0


def test_burn_cli_mixed_geometry_refused(tmp_path, capsys):
    gj = tmp_path / "mixed.geojson"
    gj.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "LineString",
                          "coordinates": [[0, 0], [1, 1]]}},
        ],
    }))
    rc = job.main([
        "burn", "--features", str(gj),
        "--grid", "0,2,0.1,0.1,20,20", "--out", str(tmp_path / "o"),
    ])
    assert rc == 2
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["status"] == "INVALID_REQUEST"


def test_raster_stats_cli(tmp_path, spark, capsys):
    import numpy as np

    from opentopodata_spark import geotiff
    from opentopodata_spark.jobs import raster as rjob

    rng = np.random.RandomState(4)
    arr = rng.randint(0, 500, size=(40, 50)).astype(np.int16)
    arr[:5, :5] = -9999
    p = str(tmp_path / "s.tif")
    geotiff.write_geotiff(p, arr, x0=0.0, y0=10.0, sx=0.01, sy=0.01,
                          epsg=4326, nodata=-9999)
    stats = rjob.run(["--cores", "4", "stats", "--rasters", p,
                      "--buckets", "8"])
    v = arr[arr != -9999].astype(np.float64)
    assert stats["n_valid"] == v.size and stats["n_nodata"] == 25
    assert stats["vmin"] == v.min() and stats["vmax"] == v.max()
    assert abs(stats["mean"] - v.mean()) < 1e-9
    assert sum(stats["histogram"]) == v.size and len(stats["histogram"]) == 8
