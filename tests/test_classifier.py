"""Distributed logreg vs a single-process numpy twin + behavior checks."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentopodata_spark.operators.classifier import (
    LogRegModel,
    predict_proba,
    train_logreg,
)
from opentopodata_spark.operators.embeddings import text_embed


def _np_train(X, y, n_iter=20, lr=1.0, l2=0.0):
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - y
        g = r @ X / len(y) + l2 * w
        w = w - lr * g
        b = b - lr * (r.sum() / len(y))
    return w, b


def _toy(spark, n=200, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    true_w = rng.normal(size=dim)
    y = (X @ true_w + 0.1 * rng.normal(size=n) > 0).astype(np.int64)
    rows = [(int(yi), [float(v) for v in xi]) for yi, xi in zip(y, X)]
    df = spark.createDataFrame(rows, "label long, embedding array<double>")
    return df, X, y


def test_train_matches_numpy_twin(spark):
    df, X, y = _toy(spark)
    model = train_logreg(df, n_iter=15, lr=0.5)
    w, b = _np_train(X, y.astype(float), n_iter=15, lr=0.5)
    assert np.allclose(model.weights, w, atol=1e-9)
    assert abs(model.bias - b) < 1e-9


def test_l2_matches_twin_and_shrinks(spark):
    df, X, y = _toy(spark)
    m0 = train_logreg(df, n_iter=10, lr=0.5)
    m1 = train_logreg(df, n_iter=10, lr=0.5, l2=0.5)
    w1, b1 = _np_train(X, y.astype(float), n_iter=10, lr=0.5, l2=0.5)
    assert np.allclose(m1.weights, w1, atol=1e-9)
    assert np.linalg.norm(m1.weights) < np.linalg.norm(m0.weights)


def test_predict_proba_matches_numpy_and_separates(spark):
    df, X, y = _toy(spark)
    model = train_logreg(df, n_iter=25, lr=1.0)
    got = (
        predict_proba(df, model)
        .select("label", "prob")
        .collect()
    )
    p = 1.0 / (1.0 + np.exp(-(X @ model.weights + model.bias)))
    # Catalyst dot product == numpy (same doubles, tolerance for order)
    assert np.allclose(sorted(r.prob for r in got), np.sort(p), atol=1e-12)
    # the classifier actually separates the toy task
    acc = np.mean([(r.prob > 0.5) == bool(r.label) for r in got])
    assert acc > 0.9


def test_predict_is_pure_catalyst(spark):
    df, _, _ = _toy(spark, n=5)
    model = LogRegModel(np.ones(8), 0.0)
    plan = (
        predict_proba(df, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_end_to_end_text_quality(spark):
    # clean english vs keyboard-mash: hashed char-3-gram features + logreg
    clean = [
        (i, 1, f"the weather report for day {i} says mild wind and clear sky")
        for i in range(60)
    ]
    junk = [
        (100 + i, 0, "zx%q 9#v jk$w " * (i % 4 + 2) + "@@qq zz##")
        for i in range(60)
    ]
    docs = spark.createDataFrame(clean + junk, "doc_id long, label long, text string")
    feats = text_embed(docs, dim=32).join(docs.select("doc_id", "label"), "doc_id")
    model = train_logreg(feats, n_iter=30, lr=2.0)
    scored = predict_proba(feats, model).select("doc_id", "label", "prob").collect()
    acc = np.mean([(r.prob > 0.5) == bool(r.label) for r in scored])
    assert acc == 1.0


def test_empty_frame_raises(spark):
    df = spark.createDataFrame([], "label long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        train_logreg(df)


def test_local_and_distributed_paths_agree(spark):
    df, X, y = _toy(spark, n=120)
    m_local = train_logreg(df, n_iter=12, lr=0.7)           # under threshold
    m_dist = train_logreg(df, n_iter=12, lr=0.7, local_threshold=0)
    assert np.allclose(m_local.weights, m_dist.weights, atol=1e-9)
    assert abs(m_local.bias - m_dist.bias) < 1e-9
