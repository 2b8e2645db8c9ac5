"""Compaction job: file-count reduction, content preservation,
range-clustering, dry-run, loud refusals."""

from __future__ import annotations

import json

import pytest

from opentopodata_spark.jobs import compact


@pytest.fixture()
def shattered(tmp_path, spark):
    """A dataset written as ~40 tiny files."""
    src = str(tmp_path / "shattered")
    df = spark.createDataFrame(
        [(i, i % 7, f"payload-{i:06d}" * 20) for i in range(4000)],
        "id long, grp int, payload string",
    )
    df.repartition(40).write.parquet(src)
    return src


def test_compact_reduces_files_and_preserves_rows(shattered, tmp_path, spark):
    out = str(tmp_path / "compacted")
    stats = compact.run(compact.build_parser().parse_args([
        "--in", shattered, "--out", out, "--target-mb", "64",
    ]), spark=spark)
    assert stats["files_in"] >= 40
    assert stats["files_out"] == 1  # tiny dataset -> one target file
    assert stats["rows"] == 4000
    a = sorted((r.id, r.grp, r.payload)
               for r in spark.read.parquet(shattered).collect())
    b = sorted((r.id, r.grp, r.payload)
               for r in spark.read.parquet(out).collect())
    assert a == b


def test_compact_range_clustering(shattered, tmp_path, spark):
    """--by id: every output file holds a disjoint id range (footer
    min/max prune scans)."""
    out = str(tmp_path / "clustered")
    # force several output files by setting a tiny target
    stats = compact.run(compact.build_parser().parse_args([
        "--in", shattered, "--out", out, "--target-mb", "0.05",
        "--by", "id",
    ]), spark=spark)
    assert stats["files_out"] >= 3
    import pyarrow.parquet as pq
    import glob as _glob

    ranges = []
    for f in _glob.glob(f"{out}/*.parquet"):
        t = pq.read_table(f, columns=["id"])
        ids = t["id"].to_pylist()
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges


def test_compact_dry_run_and_refusals(shattered, tmp_path, spark):
    stats = compact.run(compact.build_parser().parse_args([
        "--in", shattered, "--out", str(tmp_path / "x"), "--dry-run",
    ]), spark=spark)
    assert stats["dry_run"] and "rows" not in stats
    import os
    assert not os.path.exists(str(tmp_path / "x"))
    with pytest.raises(ValueError, match="no parquet"):
        compact.run(compact.build_parser().parse_args([
            "--in", str(tmp_path / "empty"), "--out", str(tmp_path / "y"),
        ]), spark=spark)
    with pytest.raises(ValueError, match="not in dataset"):
        compact.run(compact.build_parser().parse_args([
            "--in", shattered, "--out", str(tmp_path / "z"),
            "--by", "nope",
        ]), spark=spark)
