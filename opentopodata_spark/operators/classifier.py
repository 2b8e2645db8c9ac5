"""Distributed logistic-regression quality classifier.

The fastText/CCNet-style learned quality filter (GPT-3 appendix A,
RefinedWeb §3): train a linear classifier on hashed text features with
labeled seed data (trusted corpus = positive, random crawl = negative),
score every document, filter or importance-sample on the probability.

Training is FULL-BATCH gradient descent with the same distributed shape
as k-means (embeddings.train_kmeans_centroids): per iteration the
feature frame is scanned ONCE; each task emits a single partial row
(gradient sum over its rows in a dim-sized array + count) via
mapInPandas; the ~num_partitions tiny partials reduce on the driver in
numpy; the updated weight vector broadcasts back. Nothing else moves —
no shuffle at all inside an iteration. dim is the hashing-trick width
(64..2^20) so the weight vector is broadcast-sized by construction.

Inference is a pure Catalyst expression — the dot product against the
literal weight array runs JVM-side (zip_with/aggregate), so scoring
10^12 docs is a free projection on the corpus scan, no Python anywhere.

Determinism: for a fixed input layout the per-partition row order and
the driver's partition-id-sorted reduce are fixed, so reruns reproduce
bitwise; across layouts results agree to float tolerance (summation
order — inherent to distributed sums), which is why the driver query
rounds probabilities.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["LogRegModel", "train_logreg", "predict_proba"]


class LogRegModel:
    """Weights + bias of a trained binary classifier (plain data)."""

    def __init__(self, weights: np.ndarray, bias: float):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)

    @property
    def dim(self) -> int:
        return int(self.weights.shape[0])


def train_logreg(
    feats: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_iter: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    local_threshold: int = 4_000_000,
) -> LogRegModel:
    """Fit sigmoid(w.x + b) to 0/1 labels by full-batch GD.

    feats: (label 0/1, embedding array<float/double>). One corpus scan
    per iteration; gradient partials are (count, dim-array, bias-grad)
    per task, reduced driver-side in partition-id order (deterministic
    for a fixed layout).

    Size-adaptive (the dedup union-find precedent): when the feature
    matrix is at most ``local_threshold`` elements (n x dim — 4M doubles
    = 32 MB) it is collected ONCE and the GD loop runs in numpy on the
    driver — identical math, one scan instead of n_iter scans, none of
    the per-iteration task-scheduling/Arrow overhead (12 s -> ~2 s for
    the sf0.1 bench query). Above the threshold the loop is the
    distributed partial-sum shape.
    """
    first = feats.select(vec_col).first()
    if first is None:
        raise ValueError("empty feature frame")
    dim = len(first[0])
    spark = feats.sparkSession
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    # persist: every iteration scans this frame, and the features are
    # usually a COMPUTED plan (text_embed's hash aggregations) — without
    # the persist each of the n_iter scans re-runs it end to end
    # (measured 19.2 s -> ~2 s for 20 iterations on the sf0.1 bench)
    src = feats.select(
        F.col(label_col).cast("double").alias("y"), F.col(vec_col).alias("x")
    ).persist()
    n = src.count()

    if n * dim <= local_threshold:
        try:
            rows = src.collect()
        finally:
            src.unpersist()
        X = np.asarray([list(r.x) for r in rows], dtype=np.float64)
        y = np.asarray([r.y for r in rows], dtype=np.float64)
        for _ in range(n_iter):
            p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
            r = p - y
            w = w - lr * ((r @ X) / n + l2 * w)
            b = b - lr * (float(r.sum()) / n)
        return LogRegModel(w, b)

    try:
        for _ in range(n_iter):
            wb = spark.sparkContext.broadcast((w, b))
            try:
                w, b = _distributed_step(src, wb, w, b, n, lr, l2)
            finally:
                wb.destroy()
    finally:
        src.unpersist()
    return LogRegModel(w, b)


def _distributed_step(src, wb, w, b, n, lr, l2):
    import numpy as np
    import pandas as pd

    dim = w.shape[0]

    def partials(batches):
        from pyspark import TaskContext

        ww, bb = wb.value
        g = np.zeros_like(ww)
        gb = 0.0
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf["x"]), dtype=np.float64)
            y = pdf["y"].to_numpy(dtype=np.float64)
            z = X @ ww + bb
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g += r @ X
            gb += float(r.sum())
            seen += len(pdf)
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {"pid": [pid], "n": [seen], "g": [g], "gb": [gb]}
        )

    rows = src.mapInPandas(
        partials, "pid int, n long, g array<double>, gb double"
    ).collect()
    g = np.zeros(dim, dtype=np.float64)
    gb = 0.0
    # partition-id order: the reduce is reproducible run-over-run
    for r in sorted(rows, key=lambda r: r.pid):
        if r.n:
            g += np.asarray(r.g, dtype=np.float64)
            gb += r.gb
    g = g / n + l2 * w
    gb = gb / n
    return w - lr * g, b - lr * gb


def predict_proba(
    df: DataFrame,
    model: LogRegModel,
    vec_col: str = "embedding",
    out_col: str = "prob",
) -> DataFrame:
    """Append sigmoid(w.x + b) as a column — pure Catalyst expression
    (literal weight array, zip_with dot product), zero Python at
    inference, rides whatever scan produced ``df``."""
    wlit = F.array(*[F.lit(float(v)) for v in model.weights])
    z = F.aggregate(
        F.zip_with(F.col(vec_col), wlit, lambda x, wv: x.cast("double") * wv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) + F.lit(model.bias)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
