"""Tests for the spark-submit job surface (jobs.elevation, jobs.package)
and client-arg validation (args.py, reference api.py:153-269 parity)."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import zipfile

import pytest

from opentopodata_spark import args as A

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- args (P5-P8)


def test_parse_interpolation_default_and_whitelist():
    assert A.parse_interpolation(None) == "bilinear"
    assert A.parse_interpolation("cubic") == "cubic"
    with pytest.raises(A.ClientError, match="Invalid interpolation method 'lanczos'"):
        A.parse_interpolation("lanczos")


def test_parse_format():
    assert A.parse_format(None) == "json"
    assert A.parse_format("geojson") == "geojson"
    with pytest.raises(A.ClientError, match="Format must be"):
        A.parse_format("xml")


def test_parse_nodata_value():
    assert A.parse_nodata_value(None) is None
    assert A.parse_nodata_value("null") is None
    assert math.isnan(A.parse_nodata_value("NaN"))
    assert A.parse_nodata_value("-9999") == -9999
    with pytest.raises(A.ClientError, match="Invalid nodata value '1.5'"):
        A.parse_nodata_value("1.5")


def test_parse_n_samples():
    assert A.parse_n_samples(None) is None
    assert A.parse_n_samples("") is None
    assert A.parse_n_samples("5") == 5
    with pytest.raises(A.ClientError, match="at least 2 samples"):
        A.parse_n_samples("1")
    with pytest.raises(A.ClientError, match="Samples should be an integer"):
        A.parse_n_samples("2.5")
    with pytest.raises(A.ClientError, match="limit is 100"):
        A.parse_n_samples("500", max_n_locations=100)


# ---------------------------------------------------------------- package CLI


def test_package_zip_contains_modules(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "opentopodata_spark.jobs.package", "--out", str(tmp_path / "otds.zip")],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    path = out.stdout.strip()
    names = zipfile.ZipFile(path).namelist()
    assert "opentopodata_spark/operators/elevation.py" in names
    assert "opentopodata_spark/jobs/elevation.py" in names


# ------------------------------------------------------------- elevation job


def test_elevation_job_bad_args_fail_fast(tmp_path, raster_root, documents_path):
    """ClientError -> INVALID_REQUEST json + exit 2, before Spark starts."""
    from opentopodata_spark.jobs import elevation as job

    rc = job.main(
        [
            "--documents", documents_path,
            "--config", os.path.join(raster_root, "test-config.yaml"),
            "--datasets", "etopo1deg",
            "--out", str(tmp_path / "o"),
            "--interpolation", "lanczos",
        ]
    )
    assert rc == 2


def test_elevation_job_end_to_end(tmp_path, raster_root, documents_path, spark, capsys):
    """Full CLI run (reusing the session fixture's JVM via getOrCreate):
    parquet in -> results parquet out, resumable second run does nothing."""
    from opentopodata_spark.jobs import elevation as job

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    argv = [
        "--documents", documents_path,
        "--config", os.path.join(raster_root, "test-config.yaml"),
        "--datasets", "multi_eudem_etopo1",
        "--out", out,
        "--resume-dir", ckpt,
        "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["status"] == "OK"
    assert stats["rows"] > 0
    assert stats["completed_before"] == 0

    res = spark.read.parquet(f"{out}/results")
    assert {"point_id", "lat", "lon", "elevation", "dataset"} <= set(res.columns)

    # resume: everything checkpointed, nothing reprocessed
    assert job.main(argv) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["processed"] == 0
    assert stats2["completed_before"] > 0
    assert stats2["rows"] == stats["rows"]


def test_elevation_job_geojson_format(tmp_path, raster_root, documents_path, spark, capsys):
    from opentopodata_spark.jobs import elevation as job

    out = str(tmp_path / "gj")
    rc = job.main(
        [
            "--documents", documents_path,
            "--config", os.path.join(raster_root, "test-config.yaml"),
            "--datasets", "etopo1deg",
            "--out", out,
            "--format", "geojson",
            "--cores", "4",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # geojson is a serialization format: results are JSON-lines text
    lines = spark.read.text(f"{out}/results")
    assert lines.count() == stats["rows"] > 0
    feat = json.loads(lines.first().value)
    assert feat["type"] == "Feature"
    assert feat["geometry"]["type"] == "Point"
    assert len(feat["geometry"]["coordinates"]) == 3


def test_elevation_job_via_spark_submit(tmp_path, raster_root, documents_path, spark):
    """The flagship job through the REAL cluster path (see
    conftest.run_via_spark_submit)."""
    from tests.conftest import run_via_spark_submit

    out = str(tmp_path / "out")
    proc = run_via_spark_submit(
        tmp_path, "elevation",
        ["--documents", documents_path,
         "--config", os.path.join(raster_root, "test-config.yaml"),
         "--datasets", "multi_eudem_etopo1",
         "--out", out],
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["status"] == "OK" and stats["rows"] > 0
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == stats["rows"]
    assert res.where("elevation IS NOT NULL").count() > 0
