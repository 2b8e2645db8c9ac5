"""SparkSession builder with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point (and harmless locally):
- AQE on, with skew-join splitting (hot raster tiles are the known skew
  source — the reference's single-node design has no answer to this;
  SURVEY.md §4);
- Arrow enabled with bounded batch sizes (the raster-sampling UDFs hold
  one Arrow batch + one memory-mapped tile window at a time);
- broadcast threshold generous enough for tile indexes (tens of thousands
  of rows — the reference's in-memory dict lookup, config.py:367-373,
  becomes a broadcast hash join).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package for shipment to Python workers (the local-mode
    equivalent of ``spark-submit --py-files``). Cached per process."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # The package was imported FROM an archive (spark-submit
        # --py-files otds.zip): there is no directory to re-zip — the
        # archive itself IS the shippable package, and workers already
        # receive it via spark.submit.pyFiles. Walk up the virtual path
        # to the real zip file and hand that to addPyFile (a re-add of
        # an identical path is a harmless WARN).
        archive = pkg_dir
        while archive and not os.path.isfile(archive):
            parent = os.path.dirname(archive)
            if parent == archive:
                break
            archive = parent
        if archive and zipfile.is_zipfile(archive):
            return archive
        raise RuntimeError(
            f"opentopodata_spark imported from '{pkg_dir}' but no package "
            "archive found on the path — cannot ship code to workers"
        )
    out = os.path.join(
        tempfile.gettempdir(), f"opentopodata_spark_pyfiles_{os.getuid()}.zip"
    )
    newest = max(
        os.path.getmtime(os.path.join(base, fn))
        for base, _dirs, files in os.walk(pkg_dir)
        for fn in files
        if fn.endswith(".py")
    )
    if not os.path.exists(out) or os.path.getmtime(out) < newest:
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for base, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(base, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(tmp, out)
    return out


def get_spark(
    app_name: str = "opentopodata-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or join) the engine's SparkSession.

    master resolution: explicit arg > $SPARK_GRAFT_MASTER > local[cores].
    Pass master="external" (or set SPARK_GRAFT_MASTER=external) to defer
    to whatever ``spark-submit --master`` configured — the cluster path.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    builder = SparkSession.builder.appName(app_name)
    if master != "external":
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # InferFiltersFromGenerate clones the generator expression into a
        # pre-Generate filter. For explode-over-a-Python-UDF-result plans
        # (coordinate extraction) that duplicates the whole ArrowEvalPython
        # stage — measured 10x slower at local[32] on the extraction
        # pipeline. Where the inference genuinely helps (pruning empty
        # arrays at the scan) the operators carry explicit size() filters.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master != "external":
        # Scan stages need multiple task WAVES per core so a slow split
        # doesn't idle its core for the whole stage (with file-packing at
        # 128MB a 64-file input collapsed to cores-many splits — one wave,
        # zero straggler tolerance; measured 1.7s idle tail on a 13s map
        # stage). Real cluster inputs have thousands of splits; this makes
        # local mode schedule the same way. minPartitionNum only splits
        # finer than packing would — it never merges.
        builder = builder.config("spark.sql.files.minPartitionNum", str(4 * cores))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Make the package importable inside Python workers regardless of how
    # the driver found it (repo checkout, arbitrary cwd, spark-submit).
    spark.sparkContext.addPyFile(_package_zip())
    return spark


# public name: used by `python -m opentopodata_spark.jobs.package` to emit
# the archive handed to `spark-submit --py-files`.
package_zip = _package_zip
