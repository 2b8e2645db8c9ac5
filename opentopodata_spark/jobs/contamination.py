"""Benchmark-contamination job: score a corpus against a benchmark set.

The spark-submit-able wrapper of operators/contamination: one script
that runs identically under ``python -m
opentopodata_spark.jobs.contamination`` (local) and ``spark-submit
--py-files otds.zip contamination.py --master external``.

    documents(doc_id, text)  x  benchmark(bench_id, text)
      -> exact n-gram collisions (broadcast bench gram dictionary,
         corpus gram stream pruned before its one shuffle)
      -> BM25 top-k retrieval with benchmark items as queries
      -> full-outer composite report ({out}/report parquet) + one-line
         JSON stats on stdout

Example:

    python -m opentopodata_spark.jobs.contamination \
        --documents /root/testdata/sf0.01/documents.parquet \
        --benchmark /tmp/bench.parquet --out /tmp/contam --n 5 --k 10
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..operators import contamination as _contam
from ..session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.contamination",
        description="Score a documents corpus against a benchmark set.",
    )
    p.add_argument("--documents", required=True,
                   help="parquet path of the corpus (doc_id, text)")
    p.add_argument("--benchmark", required=True,
                   help="parquet path of the benchmark set (bench_id, text)")
    p.add_argument("--out", required=True,
                   help="output directory ({out}/report parquet)")
    p.add_argument("--n", type=int, default=5,
                   help="word n-gram size for the exact-collision signal")
    p.add_argument("--min-shared", type=int, default=1,
                   help="minimum shared distinct n-grams to flag a pair")
    p.add_argument("--k", type=int, default=10,
                   help="BM25 top-k hits kept per benchmark item")
    p.add_argument("--coverage-alert", type=float, default=0.5,
                   help="gram_coverage at or above which a pair counts as "
                        "a removal candidate in the summary stats")
    p.add_argument("--cores", type=int, default=None,
                   help="local[] cores (ignored with --master external)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None,
                   help="Spark master; 'external' defers to spark-submit")
    return p


def run(ns: argparse.Namespace, spark=None) -> dict:
    if spark is None:
        spark = get_spark(
            app_name="otds-contamination",
            cores=ns.cores,
            shuffle_partitions=ns.shuffle_partitions,
            master=ns.master,
        )
    t0 = time.time()
    docs = spark.read.parquet(ns.documents).select("doc_id", "text")
    bench = spark.read.parquet(ns.benchmark).select("bench_id", "text")

    report = _contam.contamination_check(
        docs, bench, n=ns.n, k=ns.k, min_shared=ns.min_shared
    )
    out = f"{ns.out.rstrip('/')}/report"
    report.write.mode("overwrite").parquet(out)

    # summary from the WRITTEN report (one scan, conditional aggregates)
    written = spark.read.parquet(out)
    row = written.select(
        F.count(F.lit(1)).alias("flagged_pairs"),
        F.countDistinct("doc_id").alias("flagged_docs"),
        F.countDistinct("bench_id").alias("benchmarks_hit"),
        F.sum(
            (F.col("gram_coverage") >= float(ns.coverage_alert)).cast("long")
        ).alias("removal_candidates"),
        F.sum(
            ((F.col("n_shared_grams") == 0) & F.col("bm25_rank").isNotNull())
            .cast("long")
        ).alias("bm25_only_pairs"),
    ).collect()[0]
    stats = {
        "n_benchmark": bench.count(),
        **{k: int(v) for k, v in row.asDict().items()},
        "report": out,
        "seconds": round(time.time() - t0, 3),
    }
    return stats


def main(argv=None) -> None:
    stats = run(build_parser().parse_args(argv))
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
