"""ANN index job: build an IVF-PQ index over an embeddings corpus, then
serve top-k searches from it — the encode-once / search-many split a
100 TB vector corpus requires (the index build is the one full scan;
every search afterwards reads only code streams of the probed cells).

Submit-able like the other jobs (``spark-submit --py-files otds.zip -m
opentopodata_spark.jobs.ann``). Subcommands:

  build-index  embeddings parquet -> {out}/centroids, {out}/codebooks,
               {out}/index parquet + params.json.
               Coarse cells and PQ codebooks both train with the
               engine's distributed Lloyd's k-means
               (operators/embeddings.train_kmeans_centroids).
  search       prebuilt index + queries parquet -> top-k parquet
               (query_id, neighbor_id, rank, approx_sim).

Example:

    python -m opentopodata_spark.jobs.ann build-index \
        --embeddings /root/testdata/sf0.01/embeddings.parquet \
        --out /tmp/annidx --cells 16 --pq-m 4 --pq-ksub 16
    python -m opentopodata_spark.jobs.ann search \
        --index /tmp/annidx \
        --queries /root/testdata/sf0.01/embeddings.parquet \
        --out /tmp/annres --k 5 --n-probe 2
"""

from __future__ import annotations

import argparse
import json
import time

from ..operators import embeddings as _emb
from ..session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.ann",
        description="IVF-PQ vector index build + search.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index", help="train + encode an IVF-PQ index")
    b.add_argument("--embeddings", required=True,
                   help="parquet of (vec_id, embedding)")
    b.add_argument("--out", required=True, help="index output directory")
    b.add_argument("--cells", type=int, default=64,
                   help="IVF coarse cells (k-means centers)")
    b.add_argument("--pq-m", type=int, default=4, help="PQ subspaces")
    b.add_argument("--pq-ksub", type=int, default=16,
                   help="codewords per subspace")
    b.add_argument("--n-iter", type=int, default=5, help="k-means iterations")

    s = sub.add_parser("search", help="top-k search over a prebuilt index")
    s.add_argument("--index", required=True,
                   help="directory written by build-index")
    s.add_argument("--queries", required=True,
                   help="parquet of (vec_id, embedding)")
    s.add_argument("--out", required=True, help="results output directory")
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--n-probe", type=int, default=2)

    for q in (b, s):
        q.add_argument("--id-col", default="vec_id")
        q.add_argument("--vec-col", default="embedding")
        q.add_argument("--cores", type=int, default=None)
        q.add_argument("--shuffle-partitions", type=int, default=None)
        q.add_argument("--master", default=None)
    return p


def run(ns: argparse.Namespace, spark=None) -> dict:
    if spark is None:
        spark = get_spark(
            app_name=f"otds-ann-{ns.cmd}",
            cores=ns.cores,
            shuffle_partitions=ns.shuffle_partitions,
            master=ns.master,
        )
    t0 = time.time()
    if ns.cmd == "build-index":
        corpus = spark.read.parquet(ns.embeddings)
        cents = _emb.train_kmeans_centroids(
            corpus, ns.cells, n_iter=ns.n_iter,
            id_col=ns.id_col, vec_col=ns.vec_col,
        )
        cents.write.mode("overwrite").parquet(f"{ns.out}/centroids")
        cents = spark.read.parquet(f"{ns.out}/centroids")
        cb = _emb.train_pq_codebooks(
            corpus, m=ns.pq_m, ksub=ns.pq_ksub, n_iter=ns.n_iter,
            id_col=ns.id_col, vec_col=ns.vec_col,
        )
        cb.write.mode("overwrite").parquet(f"{ns.out}/codebooks")
        cb = spark.read.parquet(f"{ns.out}/codebooks")
        # ONE full corpus scan; the index stream is (id, cell, m ints)
        _emb.encode_ivfpq(
            corpus, cents, cb, id_col=ns.id_col, vec_col=ns.vec_col
        ).write.mode("overwrite").parquet(f"{ns.out}/index")
        stats = {
            "job": "ann-build-index",
            "vectors": spark.read.parquet(f"{ns.out}/index").count(),
            "cells": ns.cells,
            "pq_m": ns.pq_m,
            "pq_ksub": ns.pq_ksub,
            "seconds": round(time.time() - t0, 3),
        }
        params = {k: getattr(ns, k.replace("-", "_"))
                  for k in ("cells", "pq_m", "pq_ksub", "id_col", "vec_col")}
        if "://" not in ns.out:
            with open(f"{ns.out}/params.json", "w") as fh:
                json.dump(params, fh)
    else:  # search
        index = spark.read.parquet(f"{ns.index}/index")
        cents = spark.read.parquet(f"{ns.index}/centroids")
        cb = spark.read.parquet(f"{ns.index}/codebooks")
        res = _emb.ivfpq_search(
            index, spark.read.parquet(ns.queries), cents, cb,
            k=ns.k, n_probe=ns.n_probe,
            id_col=ns.id_col, vec_col=ns.vec_col,
        )
        res.write.mode("overwrite").parquet(f"{ns.out}/results")
        stats = {
            "job": "ann-search",
            "result_rows": spark.read.parquet(f"{ns.out}/results").count(),
            "k": ns.k,
            "n_probe": ns.n_probe,
            "seconds": round(time.time() - t0, 3),
        }
    return stats


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    print(json.dumps(run(ns)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
