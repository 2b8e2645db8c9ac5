"""HyperLogLog distinct sketch: accuracy, mergeability, cross-engine
determinism, null discipline, and plan shape.

The operator's whole value is that the register table is an EXACT,
engine-independent artifact (md5 -> integer shifts only), so the tests
pin (a) bit-equality between the distributed sketch and a pure-Python
replay of the same math, (b) sketch(A ∪ B) == merge(sketch(A),
sketch(B)) register-for-register, and (c) estimates inside the
published error bound against exact distinct counts.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators import sketch


def _py_registers(values, p: int) -> dict[int, int]:
    """Sequential twin of _hll_register_exprs: same md5-prefix hash,
    same index/rank split, plain dict max-merge."""
    q = 60 - p
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h >> q
        w = h & ((1 << q) - 1)
        rho = q + 1 if w == 0 else q + 1 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def _py_estimate(regs: dict[int, int], p: int) -> int:
    m = 1 << p
    v_zero = m - len(regs)
    s_num = sum(1 << (61 - p - rho) for rho in regs.values())
    pow2q1 = 1 << (61 - p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est_raw = alpha * m * m * pow2q1 / (s_num + v_zero * pow2q1)
    if est_raw <= 2.5 * m and v_zero > 0:
        return round(m * math.log(m / v_zero))
    return round(est_raw)


@pytest.fixture(scope="module")
def values_df(spark):
    # 60k rows, 20k distinct tokens, skewed repetition, plus nulls
    rows = [(i % 3, f"tok-{(i * i) % 20000}") for i in range(60000)]
    rows += [(0, None)] * 500
    return spark.createDataFrame(rows, "grp int, value string").repartition(8)


def test_registers_match_python_twin(spark, values_df):
    p = 9
    got = {
        (r.register, r.rho)
        for r in sketch.hll_sketch(values_df, "value", p=p).collect()
    }
    vals = [r.value for r in values_df.collect()]
    want = set(_py_registers(vals, p).items())
    assert got == want


def test_estimate_matches_python_twin_and_bound(spark, values_df):
    for p in (8, 12):
        row = sketch.hll_distinct(values_df, "value", p=p).collect()[0]
        vals = [r.value for r in values_df.collect() if r.value is not None]
        exact = len(set(vals))
        twin = _py_estimate(_py_registers(vals, p), p)
        assert row.est_distinct == twin
        # 4 sigma of the published RSE — deterministic fixture, no flake
        rse = 1.04 / math.sqrt(1 << p)
        assert abs(row.est_distinct - exact) <= 4 * rse * exact
        assert row.m == (1 << p)
        assert row.n_registers + row.v_zero == row.m


def test_merge_equals_sketch_of_union(spark, values_df):
    a = values_df.where(F.col("value").isNotNull() & (F.crc32("value") % 2 == 0))
    b = values_df.subtract(a)
    merged = sketch.hll_merge(
        sketch.hll_sketch(a, "value", p=10),
        sketch.hll_sketch(b, "value", p=10),
    )
    whole = sketch.hll_sketch(values_df, "value", p=10)
    assert {(r.register, r.rho) for r in merged.collect()} == {
        (r.register, r.rho) for r in whole.collect()
    }


def test_grouped_and_small_range_branch(spark):
    # tiny per-group cardinalities force the linear-counting branch
    rows = [(g, f"v{g}-{i % (10 * (g + 1))}") for g in range(3) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, value string")
    out = {
        r.grp: r
        for r in sketch.hll_distinct(
            df, "value", p=8, group_cols=("grp",)
        ).collect()
    }
    for g in range(3):
        exact = 10 * (g + 1)
        vals = {f"v{g}-{i % (10 * (g + 1))}" for i in range(400)}
        twin = _py_estimate(_py_registers(sorted(vals), 8), 8)
        assert out[g].est_distinct == twin
        assert abs(out[g].est_distinct - exact) <= max(2, 0.3 * exact)
        assert out[g].v_zero > 0  # LC branch actually exercised


def test_streaming_twin_is_lossless(spark, tmp_path):
    """The streamed sketch must be register-identical to a one-shot
    batch sketch over the full history (HLL merge is lossless), and the
    state dir must hold only the latest partition plus its merge input
    after the last batch."""
    import os

    import opentopodata_spark.streaming as st

    in_dir = tmp_path / "hll_in"
    work = str(tmp_path / "hll")
    waves = [
        [f"w{w}-{i % (50 * (w + 1))}" for i in range(400)] for w in range(3)
    ]
    for w, keys in enumerate(waves):
        spark.createDataFrame(
            [(j, k, "en", "s") for j, k in enumerate(keys)],
            "doc_id long, text string, lang string, source string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/wave{w}")
        q = st.run_hll_stream(
            st.stream_corpus(spark, str(in_dir) + "/*").select(
                F.col("text").alias("value")
            ),
            f"{work}/state", f"{work}/ckpt", p=9,
        )
        q.awaitTermination()
    all_rows = [(j, k) for w in waves for j, k in enumerate(w)]
    batch = sketch.hll_sketch(
        spark.createDataFrame(all_rows, "doc_id long, value string"),
        "value", p=9,
    )
    streamed = st.hll_state_estimate(spark, f"{work}/state")
    batches = sorted(
        d for d in os.listdir(f"{work}/state") if d.startswith("ingest_batch=")
    )
    assert len(batches) <= 2  # latest + its merge input only
    regs = spark.read.parquet(
        f"{work}/state/ingest_batch={max(int(b.split('=')[1]) for b in batches)}"
    )
    assert {(r.register, r.rho) for r in regs.collect()} == {
        (r.register, r.rho) for r in batch.collect()
    }
    est = streamed.collect()[0]
    exact = len({k for w in waves for k in w})
    assert abs(est.est_distinct - exact) <= 4 * (1.04 / math.sqrt(512)) * exact


def test_p_validation_and_plan_shape(spark, values_df):
    with pytest.raises(ValueError):
        sketch.hll_sketch(values_df, "value", p=4)
    flat = spark.createDataFrame(
        [(f"x{i}",) for i in range(100)], "value string"
    )
    plan = sketch.hll_sketch(flat, "value", p=10)._jdf.queryExecution().executedPlan().toString()
    # pure codegen map side: no Python evals anywhere in the sketch plan
    assert "Python" not in plan and "BatchEval" not in plan
    # exactly one exchange (the register aggregation)
    assert plan.count("Exchange") == 1
