"""Shared fixtures: synthetic raster corpus, dataset registry, SparkSession."""

from __future__ import annotations

import os

import pytest

FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".fixture_cache")


@pytest.fixture(scope="session")
def raster_root() -> str:
    from opentopodata_spark import fixtures

    fixtures.make_all_rasters(FIXTURE_ROOT)
    return FIXTURE_ROOT


@pytest.fixture(scope="session")
def compressed_raster_root() -> str:
    """Same corpus written DEFLATE/LZW-compressed, tiled/stripped, with
    predictors, plus a zipped-SRTM dataset (see fixtures.COMPRESSED_STYLES)."""
    from opentopodata_spark import fixtures

    root = FIXTURE_ROOT + "_compressed"
    fixtures.make_all_rasters(
        root, styles=fixtures.COMPRESSED_STYLES, with_hgt_zip=True
    )
    return root


@pytest.fixture(scope="session")
def datasets(raster_root):
    from opentopodata_spark import config

    return config.load_datasets(os.path.join(raster_root, "test-config.yaml"))


@pytest.fixture(scope="session")
def documents_path(raster_root) -> str:
    from opentopodata_spark import fixtures

    path = os.path.join(raster_root, "documents_test.parquet")
    if not os.path.exists(path):
        fixtures.make_documents(path, n_docs=400, seed=42)
    return path


@pytest.fixture(scope="session")
def spark():
    from opentopodata_spark.session import get_spark

    spark = get_spark(app_name="opentopodata-spark-tests", cores=4, shuffle_partitions=8)
    yield spark


def run_via_spark_submit(tmp_path, job_module: str, job_args: list[str]):
    """Launch a jobs/<module> CLI through a REAL `spark-submit --py-files`
    subprocess: fresh JVM, cwd outside the repo, PYTHONPATH stripped so
    the package resolves only from the archive, get_spark deferring to
    spark-submit's --master. Returns the CompletedProcess."""
    import shutil
    import subprocess

    from opentopodata_spark.session import package_zip

    launcher = tmp_path / f"launch_{job_module}.py"
    launcher.write_text(
        "import sys\n"
        f"from opentopodata_spark.jobs import {job_module}\n"
        f"sys.exit({job_module}.main(sys.argv[1:]))\n"
    )
    zip_path = str(tmp_path / "otds.zip")
    shutil.copyfile(package_zip(), zip_path)
    env = {k: v for k, v in os.environ.items()}
    env.pop("PYTHONPATH", None)
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    return subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         str(launcher), *job_args, "--master", "external"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
