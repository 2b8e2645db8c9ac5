"""interval_coverage (gaps-and-islands) + topk_per_group (bounded
candidate rewrite): python differentials, ties, adjacency, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators.intervals import interval_coverage
from opentopodata_spark.operators.topk import topk_per_group


def _coverage_py(iv):
    iv = sorted((s, e) for s, e in iv if e > s)
    islands = []
    for s, e in iv:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return (len(iv), len(islands), sum(e - s for s, e in islands))


def test_coverage_matches_python_random(spark):
    rng = np.random.RandomState(3)
    rows = []
    per_g = {}
    for i in range(3000):
        g = int(rng.randint(0, 5))
        s = int(rng.randint(0, 100000))
        e = s + int(rng.randint(0, 500))
        rows.append((g, s, e))
        per_g.setdefault(g, []).append((s, e))
    df = spark.createDataFrame(rows, "g int, start long, end long").repartition(8)
    got = {r.g: (r.n_intervals, r.n_islands, r.covered_us)
           for r in interval_coverage(df, group_cols=("g",)).collect()}
    for g, iv in per_g.items():
        assert got[g] == _coverage_py(iv), g


def test_coverage_touching_merge_and_timestamps(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        (1, "2024-01-01 11:00:00", "2024-01-01 12:00:00"),  # touching
        (1, "2024-01-01 13:00:00", "2024-01-01 13:30:00"),  # gap
        (1, "2024-01-01 10:30:00", "2024-01-01 10:45:00"),  # nested
    ]
    df = spark.createDataFrame(rows, "g int, s string, e string").select(
        "g", F.col("s").cast("timestamp").alias("start"),
        F.col("e").cast("timestamp").alias("end"),
    )
    r = interval_coverage(df, group_cols=("g",)).collect()[0]
    assert (r.n_intervals, r.n_islands) == (4, 2)
    assert r.covered_us == (2 * 3600 + 1800) * 1_000_000


def test_coverage_refusals_and_empties(spark):
    df = spark.createDataFrame([(1, 10, 10), (1, 20, 30)], "g int, start long, end long")
    r = interval_coverage(df, group_cols=("g",)).collect()[0]
    assert (r.n_intervals, r.covered_us) == (1, 10)  # empty dropped
    bad = spark.createDataFrame([(1, 10, 5)], "g int, start long, end long")
    with pytest.raises(Exception, match="negative interval"):
        interval_coverage(bad, group_cols=("g",)).collect()


def test_topk_matches_window_and_is_deterministic(spark):
    rng = np.random.RandomState(8)
    rows = [(int(rng.randint(0, 7)), float(rng.randint(0, 50)), i)
            for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, v double, id long").repartition(16)
    got = topk_per_group(df, ("g",), "v", 5, ("id",)).collect()
    # reference: plain python
    per_g = {}
    for g, v, i in rows:
        per_g.setdefault(g, []).append((v, i))
    for g, vals in per_g.items():
        want = sorted(vals, key=lambda t: (-t[0], t[1]))[:5]
        mine = sorted(
            [(r.v, r.id, r.rank) for r in got if r.g == g],
            key=lambda t: t[2],
        )
        assert [(v, i) for v, i, _ in mine] == want, g
    # ascending mode
    asc = topk_per_group(df, ("g",), "v", 2, ("id",), ascending=True).collect()
    for g, vals in per_g.items():
        want = sorted(vals, key=lambda t: (t[0], t[1]))[:2]
        mine = sorted([(r.v, r.id) for r in asc if r.g == g])
        assert sorted(want) == mine, g


def test_topk_validation_and_null_order(spark):
    df = spark.createDataFrame(
        [(1, None, 1), (1, 2.0, 2)], "g int, v double, id long"
    )
    out = topk_per_group(df, ("g",), "v", 1, ("id",)).collect()
    assert [(r.id, r.rank) for r in out] == [(2, 1)]
    with pytest.raises(ValueError, match="tie_cols"):
        topk_per_group(df, ("g",), "v", 1, ())
    with pytest.raises(ValueError):
        topk_per_group(df, ("g",), "v", 0, ("id",))
    with pytest.raises(ValueError):
        topk_per_group(df, (), "v", 1, ("id",))


def test_topk_null_group_key_is_a_group(spark):
    # ADVICE r4: the pandas prune's default groupby(dropna=True) silently
    # discarded null-keyed rows while the finalize window ranks them as a
    # regular group — the null group vanished from the output entirely.
    rows = [(None, float(v), v) for v in range(40)]
    rows += [(1, float(v), v) for v in range(40)]
    df = spark.createDataFrame(rows, "g int, v double, id long").repartition(8)
    got = topk_per_group(df, ("g",), "v", 3, ("id",)).collect()
    null_rows = sorted((r.rank, r.v) for r in got if r.g is None)
    assert null_rows == [(1, 39.0), (2, 38.0), (3, 37.0)]
    one_rows = sorted((r.rank, r.v) for r in got if r.g == 1)
    assert one_rows == [(1, 39.0), (2, 38.0), (3, 37.0)]


def test_topk_null_tie_col_prune_matches_window(spark):
    # ADVICE r4: pandas sort_values put null ties LAST while the Spark
    # finalize window orders asc NULLS FIRST — with more candidates tied
    # on order_col than k in one batch, the prune could evict the row the
    # exact window ranks inside top-k. Many single-row-ish batches + heavy
    # ties on v force the prune to make the cut on the tie column alone.
    rows = []
    for g in range(3):
        rows += [(g, 1.0, None, 1000 + g * 100 + j) for j in range(4)]
        rows += [(g, 1.0, f"t{j:02d}", g * 100 + j) for j in range(20)]
    df = spark.createDataFrame(
        rows, "g int, v double, tie string, id long"
    ).repartition(24)
    got = topk_per_group(df, ("g",), "v", 3, ("tie", "id"))
    from pyspark.sql import Window
    w = Window.partitionBy("g").orderBy(
        F.col("v").desc(), F.col("tie").asc(), F.col("id").asc()
    )
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # nulls-first: every group's top-3 is entirely the null-tie rows
    for r in got.collect():
        assert r.tie is None, r
