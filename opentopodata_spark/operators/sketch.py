"""Bounded-memory heavy hitters: Misra-Gries candidates + exact recount.

The naive distributed top-k (`groupBy(key).count().orderBy(...)`)
shuffles EVERY distinct key — at 10^12 rows with high-cardinality keys
(URLs, n-grams, user ids) that shuffle is the job. This operator does
the candidate + verify decomposition instead:

  phase 1  per-partition Misra-Gries summaries (mapInPandas, capacity
           m): each Arrow batch is counted vectorized (value_counts),
           merged into a dict, and MG-trimmed back to m entries.
           Pigeonhole guarantee: any key with GLOBAL frequency
           > N/(m+1) exceeds the local threshold n_p/(m+1) in at least
           one partition, so it survives in that partition's summary.
  phase 2  the candidate union (<= m x partitions keys) is collected
           and broadcast.
  phase 3  exact recount of ONLY the candidates (broadcast hash join,
           map-side combined groupBy over <= m x partitions keys), then
           the deterministic top-k cut (count desc, key asc).

The result is PROVABLY the true top-k whenever the k-th count exceeds
N/(m+1) — the returned ``guaranteed`` flag states it per row, computed
from the exact counts and the exact N (summed in phase 1, no extra
scan). Two scans total, and the only shuffles carry candidate keys.

No reference analog (the reference is an elevation API); part of the
training-data telemetry family (corpus_stats, domain_stats).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mg_summarize",
    "mg_trim",
    "heavy_hitters",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "hll_distinct",
]


def mg_summarize(values, capacity: int, counts: dict | None = None) -> dict:
    """Merge an iterable of pre-counted (key -> count) pandas Series (or
    one Series) into a Misra-Gries summary of at most ``capacity``
    entries. Trimming subtracts the (capacity+1)-th largest count from
    every entry and keeps the top-capacity keys (estimates clipped at
    0) — the classic decrement step, batched; see the inline note.
    Estimates are UNDERcounts: true - sum(cuts) <= est <= true."""
    counts = {} if counts is None else counts
    if isinstance(values, pd.Series):
        values = [values]
    for vc in values:
        for key, c in vc.items():
            counts[key] = counts.get(key, 0) + int(c)
        if len(counts) > capacity:
            items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            cut = items[capacity][1]
            # keep the top-capacity keys (deterministic tie-break), a
            # SUPERSET of the strict MG survivors {v > cut}: at most
            # capacity keys can exceed the (capacity+1)-th largest, so
            # the survival guarantee is intact, the size bound is exact,
            # and a flat distribution degrades to "some candidates with
            # estimate 0" instead of an empty summary. Estimates only
            # seed the next merge; the operator recounts exactly.
            counts = {k: max(v - cut, 0) for k, v in items[:capacity]}
    return counts


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Exact top-k keys by row count with bounded memory and a bounded
    shuffle. Output: (key, cnt, guaranteed) — ``guaranteed`` is True iff
    cnt > N/(capacity+1), i.e. the Misra-Gries candidate set provably
    contains every key that could outrank this one. Rows with a null
    key are ignored. Ties cut deterministically (count desc, key asc).

    ``capacity`` defaults to 50*k: at default settings the result is
    provably exact whenever the k-th hitter covers more than ~0.2% of
    rows; raise it for flatter distributions (memory cost is
    capacity x partitions candidate keys, nothing else).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cap = capacity or 50 * k
    if cap < k:
        raise ValueError("capacity must be >= k")
    src = df.select(F.col(key_col).cast("string").alias("key")).where(
        F.col("key").isNotNull()
    )

    def summarize(batches):
        counts: dict = {}
        n = 0
        for b in batches:
            s = b["key"]
            n += len(s)
            counts = mg_summarize(s.value_counts(), cap, counts)
        yield pd.DataFrame({"key": list(counts.keys()) + [None],
                            "n_rows": [0] * len(counts) + [n]})

    summaries = src.mapInPandas(summarize, "key string, n_rows long")
    agg = summaries.agg(
        F.sum("n_rows").alias("n"),
        F.collect_set("key").alias("cands"),
    ).collect()[0]
    n_total, cands = int(agg["n"] or 0), list(agg["cands"])
    if not cands or n_total == 0:
        return src.sparkSession.createDataFrame(
            [], "key string, cnt long, guaranteed boolean"
        )
    cand_df = F.broadcast(
        src.sparkSession.createDataFrame([(c,) for c in cands], "key string")
    )
    exact = (
        src.join(cand_df, "key")
        .groupBy("key").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(k)
    )
    thresh = n_total / (cap + 1)
    return exact.select(
        "key", "cnt", (F.col("cnt") > F.lit(thresh)).alias("guaranteed")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (mergeable register tables)
# ---------------------------------------------------------------------------
#
# Why not approx_count_distinct: Spark's built-in HLL++ state lives only
# inside one aggregation — it cannot be persisted as a table, merged
# across jobs/days, or resumed from a checkpoint. At pipeline scale the
# useful artifact is the SKETCH ITSELF: a (group, register, rho) table
# of at most 2^p rows per group that any later job can union with new
# data and re-estimate, without ever rescanning the originals. That is
# what these functions produce: `hll_sketch` builds register tables with
# PURE column expressions (md5 -> 60-bit integer -> index/rank, zero
# Python, zero UDF — the whole map side stays in WholeStageCodegen),
# `hll_merge` unions sketches with one max-aggregation, and
# `hll_estimate` turns registers into cardinalities using INTEGER-exact
# harmonic sums (sum of 2^(61-p-rho) as BIGINT — no float accumulation,
# so results are layout/order independent and replayable bit-for-bit by
# any engine with md5 + integer shifts).
#
# Estimator: Flajolet et al. 2007 (raw HLL) with the standard
# small-range linear-counting switch at E <= 2.5m. The 60-bit hash makes
# the large-range (hash-collision) correction irrelevant below ~2^30
# distincts; documented out of scope. p is restricted to [7, 16] so the
# single alpha formula alpha_m = 0.7213/(1 + 1.079/m) applies (m >= 128).

_HLL_MIN_P, _HLL_MAX_P = 7, 16


def _hll_register_exprs(value_col: str, p: int):
    """(register, rho) column expressions for one value column.

    h     = first 15 hex chars of md5(value) as a 60-bit non-negative
            BIGINT (both Spark and DuckDB parse this identically, the
            repo-wide cross-engine hash idiom),
    register = top p bits of h,
    rho   = 1 + leading zeros of the remaining q = 60-p bits
          = q + 1 - bitlength(w), with the w == 0 guard explicit.

    bitlength(w) is length(bin(w)) — `bin` exists with identical
    semantics in Spark and DuckDB, keeping the oracle a pure SQL replay.
    """
    q = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    idx = F.shiftright(h, q)
    w = h.bitwiseAND(F.lit((1 << q) - 1))
    rho = F.when(w == 0, F.lit(q + 1)).otherwise(
        F.lit(q + 1) - F.length(F.bin(w))
    ).cast("int")
    return idx.cast("int").alias("register"), rho.alias("rho")


def hll_sketch(
    df: DataFrame,
    value_col: str,
    p: int = 12,
    group_cols: tuple = (),
) -> DataFrame:
    """Per-group HLL register table: (group..., hll_p, register, rho).

    One map-side-combined shuffle whose payload is at most 2^p rows per
    group — the raw values never move. Null values are ignored (the
    approx_count_distinct convention). The output IS the mergeable,
    persistable sketch state: write it to parquet and a later job can
    `hll_merge` it with fresh data without touching this data again.
    """
    if not (_HLL_MIN_P <= p <= _HLL_MAX_P):
        raise ValueError(f"p must be in [{_HLL_MIN_P}, {_HLL_MAX_P}]")
    reg, rho = _hll_register_exprs(value_col, p)
    src = df.where(F.col(value_col).isNotNull()).select(
        *[F.col(g) for g in group_cols], reg, rho
    )
    return (
        src.groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
        .select(
            *group_cols, F.lit(p).cast("int").alias("hll_p"),
            "register", "rho",
        )
    )


def hll_merge(*sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Union register tables (same p, same groups) into one sketch —
    HLL merge is exactly max(rho) per register, so merging is a single
    map-side-combined aggregation over <= 2^p rows per (group, input).
    Mixed-p inputs stay separate rows (hll_p is part of the key) —
    estimates remain correct per p, they just don't combine."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "hll_p", "register").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(sketch: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Cardinality estimates from a register table, per (group, hll_p).

    Integer-exact aggregation: the harmonic denominator is kept as the
    BIGINT pair (s_num, 2^(61-p)) — s_num = sum(2^(61-p-rho)) <= 2^61 —
    and zero registers enter as v_zero * 2^(61-p), so the only floating
    point is the final constant-folded alpha multiply and ONE division
    (IEEE-deterministic across engines). Small-range branch: linear
    counting m*ln(m/V) when est_raw <= 2.5m and V > 0.

    Output: (group..., hll_p, m, n_registers, v_zero, r_max, s_num,
    est_distinct) — everything but est_distinct is integer-exact sketch
    state, and est_distinct is a BIGINT (rounded), so the whole row is
    stable under partitioning, ordering, and engine choice.
    """
    agg = sketch.groupBy(*group_cols, "hll_p").agg(
        F.count("*").alias("n_registers"),
        F.max("rho").alias("r_max"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 61 - hll_p - rho)")
        ).alias("s_num"),
    )
    m = F.expr("shiftleft(CAST(1 AS BIGINT), hll_p)")
    pow2q1 = F.expr("shiftleft(CAST(1 AS BIGINT), 61 - hll_p)")
    md = m.cast("double")
    v = (m - F.col("n_registers")).cast("long").alias("v_zero")
    est_raw = (
        (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / md))
        * md * md * pow2q1.cast("double")
        / (F.col("s_num") + (m - F.col("n_registers")) * pow2q1).cast(
            "double"
        )
    )
    lc = md * F.log(md / (m - F.col("n_registers")).cast("double"))
    est = F.when(
        (est_raw <= F.lit(2.5) * md) & (m - F.col("n_registers") > 0), lc
    ).otherwise(est_raw)
    return agg.select(
        *group_cols,
        "hll_p",
        m.alias("m"),
        F.col("n_registers").cast("long").alias("n_registers"),
        v,
        F.col("r_max").cast("int").alias("r_max"),
        F.col("s_num").cast("long").alias("s_num"),
        F.round(est).cast("long").alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    p: int = 12,
    group_cols: tuple = (),
) -> DataFrame:
    """sketch + estimate in one call — approximate COUNT(DISTINCT value)
    per group with relative standard error ~1.04/sqrt(2^p), one shuffle
    of at most 2^p rows per group, values never leaving their tasks."""
    return hll_estimate(
        hll_sketch(df, value_col, p=p, group_cols=group_cols),
        group_cols=group_cols,
    )


def mg_trim(counts: dict, capacity: int) -> tuple[dict, int]:
    """One strict Misra-Gries decrement: subtract the (capacity+1)-th
    largest count from every entry, keep the strictly-positive survivors
    (<= capacity of them), and return (survivors, cut). ``cut`` is the
    per-key error this trim can have introduced — callers accumulate it
    for the est <= true <= est + sum(cuts) bound. Deterministic tie
    order (count desc, key asc) so a sequential replay reproduces the
    distributed stream exactly."""
    if len(counts) <= capacity:
        return dict(counts), 0
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = items[capacity][1]
    return {k: v - cut for k, v in items[:capacity] if v - cut > 0}, cut
