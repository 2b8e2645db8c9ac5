"""Checkpoint/resume (SNK5): bucket-granular lineage, crash recovery,
checksum verification. The north-rule 'resumable from checkpoint' gate.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from opentopodata_spark import config, lineage
from opentopodata_spark.operators import elevation, extract


@pytest.fixture(scope="module")
def resolver(spark, datasets):
    ordered = config.resolve_dataset_names("multi_eudem_etopo1", datasets)
    return elevation.ElevationResolver(spark, ordered, "bilinear")


@pytest.fixture(scope="module")
def points(spark, documents_path):
    return (
        extract.with_point_id(
            extract.extract_points(spark.read.parquet(documents_path))
        )
        .where(F.col("loc_error").isNull())
        .select("point_id", "lat", "lon")
    )


N_BUCKETS = 8


def _run(spark, resolver, points, out_dir, **kw):
    return lineage.resumable_resolve(
        spark, resolver, points, out_dir, n_buckets=N_BUCKETS, **kw
    )


class TestResumableResolve:
    def test_full_run_then_noop_resume(self, spark, resolver, points, tmp_path):
        out = str(tmp_path / "run1")
        stats = _run(spark, resolver, points, out)
        assert stats["completed_before"] == 0
        assert stats["processed"] == N_BUCKETS
        n = spark.read.parquet(stats["output"]).count()
        assert n == points.count()

        again = _run(spark, resolver, points, out)
        assert again["completed_before"] == N_BUCKETS
        assert again["processed"] == 0  # nothing recomputed
        assert spark.read.parquet(stats["output"]).count() == n

    def test_crash_recovery_orphan_partition(self, spark, resolver, points, tmp_path):
        out = str(tmp_path / "run2")
        stats = _run(spark, resolver, points, out)
        full = {
            (r.point_id, r.elevation, r.dataset)
            for r in spark.read.parquet(stats["output"]).collect()
        }

        # simulate a crash AFTER data write, BEFORE lineage write for
        # bucket 3: delete its lineage rows, keep (now orphan) data
        ldir = os.path.join(out, "lineage")
        ldf = spark.read.parquet(ldir).where(F.col("bucket") != 3)
        kept = ldf.collect()
        shutil.rmtree(ldir)
        spark.createDataFrame(kept, lineage.LINEAGE_SCHEMA).write.parquet(ldir)

        resumed = _run(spark, resolver, points, out)
        assert resumed["completed_before"] == N_BUCKETS - 1
        assert resumed["orphans_dropped"] == 1
        assert resumed["processed"] == 1

        after = {
            (r.point_id, r.elevation, r.dataset)
            for r in spark.read.parquet(stats["output"]).collect()
        }
        assert after == full  # identical output, no dupes, no gaps
        assert spark.read.parquet(stats["output"]).count() == len(full)

    def test_partial_then_resume_matches_oneshot(
        self, spark, resolver, points, tmp_path
    ):
        out = str(tmp_path / "run3")
        # first attempt sees only half the buckets' points (as if the
        # job died before the rest were ingested)
        half = points.where(
            lineage.bucket_col(n_buckets=N_BUCKETS) < N_BUCKETS // 2
        )
        s1 = _run(spark, resolver, half, out)
        assert s1["processed"] == N_BUCKETS // 2
        s2 = _run(spark, resolver, points, out)
        assert s2["completed_before"] == N_BUCKETS // 2
        assert s2["processed"] == N_BUCKETS // 2

        oneshot = str(tmp_path / "run3_oneshot")
        _run(spark, resolver, points, oneshot)
        a = spark.read.parquet(os.path.join(out, "data"))
        b = spark.read.parquet(os.path.join(oneshot, "data"))
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    def test_verify_lineage(self, spark, resolver, points, tmp_path):
        out = str(tmp_path / "run4")
        _run(spark, resolver, points, out)
        assert lineage.verify_lineage(spark, out)

        # corrupt one data partition -> verification must fail
        bdirs = lineage._list_bucket_dirs(out)
        victim = bdirs[min(bdirs)]
        for f in os.listdir(victim):
            if f.endswith(".parquet"):
                os.remove(os.path.join(victim, f))
                break
        assert not lineage.verify_lineage(spark, out)


def test_iceberg_seam_fails_fast_without_catalog(spark):
    """The table-format seam: 'iceberg' without the runtime jars +
    catalog must fail fast with setup instructions, not a jar-loading
    stacktrace mid-write."""
    import pytest as _pytest

    from opentopodata_spark import lineage

    lineage.ensure_table_format(spark, "parquet")  # no-op
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        lineage.ensure_table_format(spark, "iceberg")
    with _pytest.raises(ValueError, match="Unknown table_format"):
        lineage.ensure_table_format(spark, "orc")
