"""As-of join vs a brute-force python twin + semantics pins."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from opentopodata_spark.operators.asof import asof_join


def _brute(left, right, tolerance=None):
    out = {}
    for lid, key, lts in left:
        best = None
        for key_r, rts, val in right:
            if key_r == key and rts <= lts and (best is None or rts > best[0]):
                best = (rts, val)
        if best is not None and tolerance is not None and best[0] < lts - tolerance:
            best = None
        out[lid] = best
    return out


def test_asof_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    left = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 1000)))
            for i in range(200)]
    right = [(int(rng.integers(0, 5)), int(rng.integers(0, 1000)),
              float(i)) for i in range(80)]
    # dedup right on (key, ts): keep max val (deterministic tie rule)
    seen = {}
    for k, t, v in right:
        seen[(k, t)] = max(seen.get((k, t), -1.0), v)
    right = [(k, t, v) for (k, t), v in seen.items()]

    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, val double")
    got = {
        r.lid: (r.right_ts, r.right_val)
        for r in asof_join(ldf, rdf, on="user_id").collect()
    }
    want = _brute(left, right)
    for lid, best in want.items():
        assert got[lid] == (best if best else (None, None))


def test_asof_equal_ts_matches_and_tolerance(spark):
    left = [(1, 7, 100), (2, 7, 99), (3, 7, 500)]
    right = [(7, 100, 1.0), (7, 50, 2.0)]
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, val double")
    got = {r.lid: (r.right_ts, r.right_val)
           for r in asof_join(ldf, rdf, on="user_id").collect()}
    assert got == {1: (100, 1.0), 2: (50, 2.0), 3: (100, 1.0)}
    # tolerance: match older than 50 ticks nulls out
    got_tol = {r.lid: (r.right_ts, r.right_val)
               for r in asof_join(ldf, rdf, on="user_id",
                                  tolerance=F.lit(50)).collect()}
    assert got_tol == {1: (100, 1.0), 2: (50, 2.0), 3: (None, None)}


def test_asof_duplicate_right_ts_tiebreaker(spark):
    left = [(1, 5, 10)]
    right = [(5, 10, 1.0, 1), (5, 10, 9.0, 2)]  # same (key, ts)
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(
        right, "user_id long, ts long, val double, seq long"
    )
    got = asof_join(
        ldf, rdf, on="user_id", right_cols=["val"], right_order="seq"
    ).collect()[0]
    assert got.right_val == 9.0  # greatest seq wins


def test_asof_no_join_node_one_exchange(spark):
    ldf = spark.createDataFrame([(1, 1, 10)], "lid long, user_id long, ts long")
    rdf = spark.createDataFrame([(1, 5, 1.0)], "user_id long, ts long, val double")
    plan = (
        asof_join(ldf, rdf, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_asof_timestamps(spark):
    ldf = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "lid long, user_id long, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    rdf = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0), (1, "2024-01-01 11:00:00", 6.0)],
        "user_id long, ts_s string, val double",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    row = asof_join(ldf, rdf, on="user_id").collect()[0]
    assert str(row.right_ts) == "2024-01-01 09:00:00" and row.right_val == 5.0
    # tolerance as an interval: 30 minutes is too tight
    row2 = asof_join(
        ldf, rdf, on="user_id", tolerance=F.expr("INTERVAL 30 MINUTES")
    ).collect()[0]
    assert row2.right_ts is None and row2.right_val is None


def test_asof_forward_direction(spark):
    left = [(1, 7, 100), (2, 7, 401), (3, 7, 900)]
    right = [(7, 100, 1.0), (7, 400, 2.0), (7, 800, 3.0)]
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, val double")
    got = {r.lid: (r.right_ts, r.right_val)
           for r in asof_join(ldf, rdf, on="user_id",
                              direction="forward").collect()}
    # equal ts matches; 401 -> next at 800; 900 -> nothing after
    assert got == {1: (100, 1.0), 2: (800, 3.0), 3: (None, None)}
    # forward tolerance
    got_tol = {r.lid: (r.right_ts, r.right_val)
               for r in asof_join(ldf, rdf, on="user_id", direction="forward",
                                  tolerance=F.lit(100)).collect()}
    assert got_tol == {1: (100, 1.0), 2: (None, None), 3: (None, None)}
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, on="user_id", direction="nearest")


def test_asof_forward_matches_brute(spark):
    rng = np.random.default_rng(5)
    left = [(i, int(rng.integers(0, 4)), int(rng.integers(0, 500)))
            for i in range(120)]
    right_raw = {(int(rng.integers(0, 4)), int(rng.integers(0, 500))): float(i)
                 for i in range(60)}
    right = [(k, t, v) for (k, t), v in right_raw.items()]
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(right, "user_id long, ts long, val double")
    got = {r.lid: (r.right_ts, r.right_val)
           for r in asof_join(ldf, rdf, on="user_id",
                              direction="forward").collect()}
    for lid, key, lts in left:
        best = None
        for k, t, v in right:
            if k == key and t >= lts and (best is None or t < best[0]):
                best = (t, v)
        assert got[lid] == (best if best else (None, None))


def test_asof_forward_duplicate_ts_tiebreaker(spark):
    left = [(1, 5, 10)]
    right = [(5, 10, 1.0, 1), (5, 10, 9.0, 2)]
    ldf = spark.createDataFrame(left, "lid long, user_id long, ts long")
    rdf = spark.createDataFrame(
        right, "user_id long, ts long, val double, seq long"
    )
    got = asof_join(
        ldf, rdf, on="user_id", right_cols=["val"], right_order="seq",
        direction="forward",
    ).collect()[0]
    assert got.right_val == 9.0  # greatest seq wins in both directions
