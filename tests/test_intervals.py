"""interval_join vs Spark's own inequality join (the naive oracle)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators.intervals import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes, seconds=0.0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds)


def _mk(spark, rows, idcol):
    return spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(rows)],
        f"{idcol} long, key long, {idcol}_start timestamp, {idcol}_end timestamp",
    )


def _naive(spark, l, r, keyed=True):
    cond = (F.col("l_start") < F.col("r_end")) & (
        F.col("r_start") < F.col("l_end")
    )
    if keyed:
        j = l.join(r, "key").where(cond)
    else:
        j = l.drop("key").crossJoin(r.drop("key")).where(cond)
    return {(row.l, row.r) for row in j.select("l", "r").collect()}


def _fast(spark, l, r, keyed=True, **kw):
    out = interval_join(
        l if keyed else l.drop("key"),
        r if keyed else r.drop("key"),
        "l_start", "l_end", "r_start", "r_end",
        on=["key"] if keyed else None,
        **kw,
    )
    rows = out.select("l", "r").collect()
    pairs = [(row.l, row.r) for row in rows]
    assert len(pairs) == len(set(pairs)), "canonical-bin dedupe failed"
    return set(pairs)


def _synth(n):
    """Deterministic messy intervals: spans from seconds to many hours,
    sub-second offsets, several keys."""
    rows = []
    for i in range(n):
        k = i % 3
        start = _ts(minutes=(i * 37) % 600, seconds=(i % 7) / 3.0)
        span_min = [0.05, 2, 45, 300, 17][i % 5]
        rows.append((k, start, start + dt.timedelta(minutes=span_min)))
    return rows


def test_matches_naive_keyed(spark):
    l = _mk(spark, _synth(80), "l")
    r = _mk(spark, _synth(57)[::-1], "r")
    assert _fast(spark, l, r) == _naive(spark, l, r)


def test_matches_naive_unkeyed(spark):
    l = _mk(spark, _synth(30), "l")
    r = _mk(spark, _synth(23), "r")
    assert _fast(spark, l, r, keyed=False) == _naive(spark, l, r, keyed=False)


def test_half_open_touching_intervals_do_not_match(spark):
    l = _mk(spark, [(0, _ts(0), _ts(10))], "l")
    r = _mk(spark, [(0, _ts(10), _ts(20)), (0, _ts(9, 59.999999), _ts(20))], "r")
    got = _fast(spark, l, r)
    assert got == {(0, 1)}  # the 1-microsecond overlap matches; touch doesn't


def test_cross_bin_pairs_found_once(spark):
    # 10-hour interval vs a short one 7 hours in: different home bins,
    # overlap spans many 1h bins — must appear exactly once.
    l = _mk(spark, [(0, _ts(0), _ts(600))], "l")
    r = _mk(spark, [(0, _ts(420), _ts(425))], "r")
    assert _fast(spark, l, r, bin_width_s=3600) == {(0, 0)}


def test_bin_width_invariance(spark):
    l = _mk(spark, _synth(40), "l")
    r = _mk(spark, _synth(31), "r")
    base = _fast(spark, l, r, bin_width_s=3600)
    assert _fast(spark, l, r, bin_width_s=60) == base
    assert _fast(spark, l, r, bin_width_s=7 * 24 * 3600) == base


def test_key_separation(spark):
    l = _mk(spark, [(0, _ts(0), _ts(100))], "l")
    r = _mk(spark, [(1, _ts(0), _ts(100))], "r")
    assert _fast(spark, l, r) == set()


def test_numeric_microsecond_columns(spark):
    l = spark.createDataFrame([(0, 0, 10_000_000)], "l long, l_start long, l_end long")
    r = spark.createDataFrame([(0, 9_999_999, 30_000_000)], "r long, r_start long, r_end long")
    out = interval_join(l, r, "l_start", "l_end", "r_start", "r_end")
    assert [(x.l, x.r) for x in out.select("l", "r").collect()] == [(0, 0)]


def test_max_bucket_refuses_hot_bin(spark):
    rows = [(0, _ts(0), _ts(1))] * 50
    l = _mk(spark, rows, "l")
    r = _mk(spark, rows[:2], "r")
    with pytest.raises(ValueError, match="max_bucket"):
        interval_join(
            l, r, "l_start", "l_end", "r_start", "r_end",
            on=["key"], max_bucket=10,
        ).collect()


def test_max_bins_refuses_pathological_interval(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    l = _mk(spark, [(0, _ts(0), _ts(0) + dt.timedelta(days=400))], "l")
    r = _mk(spark, [(0, _ts(0), _ts(1))], "r")
    with pytest.raises((Py4JJavaError, PySparkException, Exception),
                       match="max_bins"):
        interval_join(
            l, r, "l_start", "l_end", "r_start", "r_end",
            on=["key"], bin_width_s=60, max_bins=1000,
        ).collect()


def test_shared_non_key_columns_rejected(spark):
    l = _mk(spark, [(0, _ts(0), _ts(1))], "x")
    with pytest.raises(ValueError, match="share non-key"):
        interval_join(l, l, "x_start", "x_end", "x_start", "x_end", on=["key"])


def test_no_cartesian_in_plan(spark):
    l = _mk(spark, _synth(20), "l")
    r = _mk(spark, _synth(20)[::-1], "r")
    plan = interval_join(
        l, r, "l_start", "l_end", "r_start", "r_end", on=["key"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
