"""Exact distributed quantiles: numpy differential, histogram-path vs
collect-path agreement, ties, groups, dynamic-range adaptation, NaN/
null discipline, validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators.quantiles import exact_quantiles

QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _lower_quantile(arr: np.ndarray, q: float) -> float:
    arr = np.sort(arr)
    return float(arr[int(np.floor(q * (len(arr) - 1)))])


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(11)
    vals = np.concatenate([
        rng.lognormal(3, 2, 20000),
        np.repeat(7.25, 5000),          # massive tie
        rng.uniform(-50, 50, 20000),
    ])
    g = rng.randint(0, 3, len(vals))
    rows = [(int(gi), float(v)) for gi, v in zip(g, vals)]
    rows += [(0, float("nan")), (1, None)]
    df = spark.createDataFrame(rows, "g int, v double").repartition(8)
    return df, {gi: vals[g == gi] for gi in range(3)}


def test_matches_numpy_lower_quantile(spark, data):
    df, by_g = data
    out = exact_quantiles(df, "v", QS, group_cols=("g",))
    got = {(r.g, r.q): (r.n, r.value) for r in out.collect()}
    for gi, arr in by_g.items():
        for q in QS:
            n, v = got[(str(gi), q)]
            assert n == len(arr)
            assert v == _lower_quantile(arr, q), (gi, q)


def test_histogram_path_equals_collect_path(spark, data):
    df, by_g = data
    fast = exact_quantiles(df, "v", QS, group_cols=("g",))
    slow = exact_quantiles(
        df, "v", QS, group_cols=("g",),
        buckets=16, local_threshold=50,
    )
    a = {(r.g, r.q): r.value for r in fast.collect()}
    b = {(r.g, r.q): r.value for r in slow.collect()}
    assert a == b


def test_massive_tie_resolves(spark):
    df = spark.createDataFrame(
        [(7.25,)] * 5000 + [(1.0,), (2.0,), (99.0,)], "v double"
    )
    out = exact_quantiles(df, "v", [0.5], local_threshold=10, buckets=4)
    assert out.collect()[0].value == 7.25


def test_extreme_dynamic_range_adapts(spark):
    # observed bucket bounds must jump straight to the data cluster
    vals = [1e-300, 2e-300, 3e-300, 1e300]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.q: r.value for r in exact_quantiles(
        df, "v", [0.0, 0.5, 1.0], local_threshold=2, buckets=4
    ).collect()}
    assert out[0.0] == 1e-300
    assert out[0.5] == 2e-300   # rank floor(0.5*3) = 1
    assert out[1.0] == 1e300


def test_ungrouped_and_validation(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = {r.q: r.value for r in exact_quantiles(df, "v", [0.5]).collect()}
    assert out[0.5] == 49.0  # floor(0.5 * 99)
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [1.5])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5], buckets=1)


def test_null_group_key_gets_quantiles(spark):
    # ADVICE r4: the probe join matched group columns with == (not
    # null-safe), so a NULL-keyed group never matched its probe row and
    # the run died with a misleading RuntimeError instead of computing it.
    rows = [(None, float(v)) for v in range(101)]
    rows += [("a", float(v) * 2) for v in range(101)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    out = exact_quantiles(
        df, "v", [0.0, 0.5, 1.0], group_cols=("g",), local_threshold=10
    )
    got = {(r.g, r.q): r.value for r in out.collect()}
    assert got[(None, 0.0)] == 0.0
    assert got[(None, 0.5)] == 50.0
    assert got[(None, 1.0)] == 100.0
    assert got[("a", 0.5)] == 100.0
