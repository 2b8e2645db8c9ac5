"""Per-partition lineage + checkpointed resume (SURVEY.md SNK5).

The north rule requires every stage to checkpoint per-partition lineage
(tile id, row counts, elevation checksums) so a 10^12-document job can
resume mid-pipeline instead of restarting. The reference has no analog
(each HTTP request is trivially retryable); at engine scale the unit of
retry must be a *partition*, not a job.

Design:

* Work is keyed by a deterministic **bucket** = pmod(xxhash64(point_id),
  n_buckets). Buckets are the resume granularity: coarse enough that the
  lineage table stays tiny (one row per bucket), fine enough that a
  restart loses at most 1/n_buckets of the work.
* A completed bucket = its rows are in ``<out>/data/_bucket=N/`` AND a
  lineage row (run_id, stage, bucket, n_rows, checksum) exists in
  ``<out>/lineage/``. Lineage is written strictly AFTER data, so a crash
  between the two leaves an orphan partition directory that the next
  resume deletes and recomputes — exactly-once at bucket granularity.
* Resume = anti-join the input's buckets against completed lineage
  buckets; only missing buckets re-enter the resolver.
* Checksums: sum(crc32(point_id|elevation@4dp|dataset)) per bucket —
  order-independent (integer sum), cheap, and sensitive to any value or
  attribution drift. Verification re-derives them from data files.

Storage is parquet directories (this sandbox has no Iceberg catalog
jars); the layout (append-only data partitions + append-only lineage
log) is exactly an Iceberg table pair, and the swap is a format string.
Filesystem maintenance uses local os/shutil here; production would use
the Hadoop FileSystem API through the same seam (_list_buckets/_drop).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bucket_col", "lineage_stats", "resumable_resolve", "verify_lineage"]

LINEAGE_SCHEMA = "run_id string, stage string, bucket int, n_rows long, checksum long"


def bucket_col(point_id_col: str = "point_id", n_buckets: int = 64):
    return F.pmod(F.xxhash64(F.col(point_id_col)), F.lit(n_buckets)).cast("int")


def ensure_table_format(spark: SparkSession, table_format: str) -> None:
    """The table-format seam. 'parquet' is the sandbox implementation;
    'iceberg' is the production target (the north rule's wording): the
    same append-only data-partitions + lineage-log pair as two Iceberg
    tables. Requires the iceberg-spark-runtime jars and a configured
    catalog — neither obtainable in this offline sandbox, so the seam
    fails fast with setup instructions instead of a jar-loading
    stacktrace deep inside a write."""
    if table_format == "parquet":
        return
    if table_format != "iceberg":
        raise ValueError(f"Unknown table_format '{table_format}'.")
    java_conf = spark.sparkContext.getConf()
    catalogs = [
        k for k, _v in java_conf.getAll()
        if k.startswith("spark.sql.catalog.") and "iceberg" in str(_v).lower()
    ]
    if not catalogs:
        raise RuntimeError(
            "table_format='iceberg' needs the iceberg-spark-runtime jar on "
            "the classpath and an Iceberg catalog configured "
            "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog"
            " + warehouse). Neither is available in this sandbox; the "
            "parquet layout written here is table-for-table identical — "
            "swap the writes to df.writeTo('<catalog>.<ns>.results')/"
            "('<catalog>.<ns>.lineage').append() once the catalog exists."
        )


def _checksum():
    return F.sum(
        F.crc32(
            F.concat_ws(
                "|",
                F.col("point_id").cast("string"),
                F.round(F.col("elevation"), 4).cast("string"),
                F.col("dataset"),
            )
        )
    ).cast("long")


def lineage_stats(resolved: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-bucket (row count, elevation checksum) for a resolver output
    that already carries ``_bucket``."""
    return resolved.groupBy("_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"), _checksum().alias("checksum")
    ).select(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        F.col("_bucket").alias("bucket"),
        "n_rows",
        "checksum",
    )


def _data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def _list_bucket_dirs(out_dir: str) -> dict[int, str]:
    d = _data_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.startswith("_bucket="):
            out[int(name.split("=", 1)[1])] = os.path.join(d, name)
    return out


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    d = _lineage_dir(out_dir)
    if not os.path.isdir(d) or not any(
        f.endswith(".parquet") for f in os.listdir(d)
    ):
        return None
    return spark.read.parquet(d)


def resumable_resolve(
    spark: SparkSession,
    resolver,
    points: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    run_id: str = "run-0",
    stage: str = "elevation",
    table_format: str = "parquet",
) -> dict:
    """Resolve elevations with bucket-granular checkpoint/resume.

    points must carry (point_id, lat, lon). Returns stats:
    {completed_before, orphans_dropped, processed, output}. Calling it
    again after a crash (or after completion) does only missing work.
    """
    ensure_table_format(spark, table_format)
    lineage = read_lineage(spark, out_dir)
    done: set[int] = set()
    if lineage is not None:
        done = {
            r.bucket for r in lineage.where(F.col("stage") == stage).collect()
        }

    # crash hygiene: data partitions with no lineage row are partial
    # output from a dead attempt — drop and recompute them
    orphans = [
        (b, path) for b, path in _list_bucket_dirs(out_dir).items() if b not in done
    ]
    for _b, path in orphans:
        shutil.rmtree(path)

    pts = points.withColumn("_bucket", bucket_col(n_buckets=n_buckets))
    todo = pts if not done else pts.where(~F.col("_bucket").isin(*done))

    processed = 0
    if not todo.isEmpty():
        resolved = resolver.resolve(todo.drop("_bucket")).withColumn(
            "_bucket", bucket_col(n_buckets=n_buckets)
        )
        resolved.write.mode("append").partitionBy("_bucket").parquet(
            _data_dir(out_dir)
        )
        # lineage strictly after data: compute from what was WRITTEN
        written = spark.read.parquet(_data_dir(out_dir)).where(
            ~F.col("_bucket").isin(*done) if done else F.lit(True)
        )
        stats = lineage_stats(written, run_id, stage)
        processed = stats.count()
        stats.write.mode("append").parquet(_lineage_dir(out_dir))

    return {
        "completed_before": len(done),
        "orphans_dropped": len(orphans),
        "processed": processed,
        "output": _data_dir(out_dir),
    }


def verify_lineage(spark: SparkSession, out_dir: str, stage: str = "elevation") -> bool:
    """Recompute per-bucket counts+checksums from data files and compare
    with the lineage log (detects corruption / partial writes)."""
    lineage = read_lineage(spark, out_dir)
    if lineage is None:
        return False
    actual = lineage_stats(
        spark.read.parquet(_data_dir(out_dir)), "verify", stage
    ).select("bucket", "n_rows", "checksum")
    logged = lineage.where(F.col("stage") == stage).select(
        "bucket", "n_rows", "checksum"
    )
    return (
        actual.exceptAll(logged).isEmpty() and logged.exceptAll(actual).isEmpty()
    )
