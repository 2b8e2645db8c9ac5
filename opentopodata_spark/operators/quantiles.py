"""Exact distributed quantiles: percentile_disc semantics at corpus
scale without a global sort.

Spark's built-in `percentile` is exact but buffers values in the
aggregation state (OOM at 10^12 rows); `percentile_approx` is a
sketch. Telemetry gates ("p99 latency", "median tokens per doc",
"p99.9 quality score") often need the EXACT order statistic — this
operator computes it with the classic distributed-selection shape:

  pass 0   one aggregation: per-group count/min/max -> target rank
           k = floor(q * (n-1)) (0-indexed lower quantile, the
           deterministic `ORDER BY v OFFSET k LIMIT 1` element).
  iterate  each unresolved (group, q) carries a candidate interval
           [lo, hi] + rank-within-interval. One scan per round builds
           equal-width histograms (``buckets`` cells) over every probe
           interval SIMULTANEOUSLY — a broadcast join of the tiny probe
           table tags rows, one map-side-combined groupBy((probe,
           bucket)) counts them and records each bucket's OBSERVED
           min/max. The driver walks cumulative counts to the bucket
           containing k and recurses on [bucket_min, bucket_max].
           Observed (not nominal) bucket bounds adapt to clustered
           data instantly, and each round shrinks the candidate VALUE
           range at least ``buckets``-fold, so rounds stay in single
           digits for real data (hard cap ``max_rounds``); a bucket
           with min == max resolves immediately (massive-tie case).
  finish   when a probe's candidate count <= ``local_threshold`` its
           values are collected in ONE final batched pass (numpy sort,
           bounded driver reduce — the classifier/codebook fast-path
           discipline).

Rows shuffled per round: ONE row per (map task, probe, bucket) —
never data rows; the scan itself stays whole-stage codegen (the only
cost of an extra round is re-reading the source).

NaNs are excluded (with nulls); ``q`` outside [0, 1] raises.
No reference analog (the reference is an elevation API); part of the
training-data telemetry family (corpus_stats, heavy_hitters, hll_*).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = ["exact_quantiles"]


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: tuple = (),
    buckets: int = 8192,
    local_threshold: int = 2_000_000,
    max_rounds: int = 64,
) -> DataFrame:
    """(group..., q, n, value): exact lower quantile per group.

    value = the element at 0-indexed rank floor(q * (n-1)) of the
    group's sorted non-null, non-NaN values — exactly ANSI
    ``ORDER BY value OFFSET floor(q*(n-1)) LIMIT 1``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    spark = df.sparkSession
    groups = list(group_cols)
    gcols = [f"_g{i}" for i in range(len(groups))]
    src = df.select(
        *[F.col(g).cast("string").alias(gc)
          for g, gc in zip(groups, gcols)],
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull() & ~F.isnan("_v"))

    base = src.groupBy(*gcols).agg(
        F.count("*").alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    ).collect()

    # live[(gkey, q)] = [lo, hi, k_within, n_candidates]
    live: dict = {}
    done: dict = {}
    n_of: dict = {}
    for r in base:
        gkey = tuple(r[c] for c in gcols)
        n_of[gkey] = int(r.n)
        for q in qs:
            k = int(np.floor(q * (r.n - 1)))
            if r.lo == r.hi:
                done[(gkey, q)] = float(r.lo)
            else:
                live[(gkey, q)] = [float(r.lo), float(r.hi), k, int(r.n)]

    pcols = [f"_pg{i}" for i in range(len(groups))]

    def _probe_join(subset: dict):
        """(joined_df, back): rows of src tagged with pid for every
        probe interval they fall in; identical (gkey, lo, hi) probes
        deduped across qs."""
        probes: dict = {}
        back: dict = {}
        for (gkey, q), (lo, hi, k, n) in subset.items():
            pid = probes.setdefault((gkey, lo, hi), len(probes))
            back.setdefault(pid, []).append((gkey, q))
        rows = [
            (pid,) + gkey + (lo, hi)
            for (gkey, lo, hi), pid in probes.items()
        ]
        schema = "pid int, " + "".join(
            f"{c} string, " for c in pcols
        ) + "plo double, phi double"
        pdf = spark.createDataFrame(rows, schema)
        cond = (F.col("_v") >= F.col("plo")) & (F.col("_v") <= F.col("phi"))
        for gc, pc in zip(gcols, pcols):
            # eqNullSafe: a NULL group key is a real group (the base agg
            # groups it), so its probe row must match — plain == would
            # never join it and the run would die with a misleading
            # "empty probe" error instead of computing its quantiles.
            cond = cond & (F.col(gc).eqNullSafe(F.col(pc)))
        return src.join(F.broadcast(pdf), cond), back

    rounds = 0
    while live:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"exact_quantiles: {len(live)} probes unresolved after "
                f"{max_rounds} rounds — raise max_rounds (data spans an "
                "extreme dynamic range) or local_threshold"
            )
        small = {kq: st for kq, st in live.items()
                 if st[3] <= local_threshold}
        if small:
            joined, back = _probe_join(small)
            vals = joined.groupBy("pid").agg(
                F.sort_array(F.collect_list("_v")).alias("vs")
            ).collect()
            got = {int(r.pid): r.vs for r in vals}
            for pid, kqs in back.items():
                arr = got.get(pid)
                for gkey, q in kqs:
                    lo, hi, k, n = live.pop((gkey, q))
                    if not arr:
                        raise RuntimeError("exact_quantiles: empty probe")
                    done[(gkey, q)] = float(arr[k])
            continue
        joined, back = _probe_join(live)
        w = F.col("phi") - F.col("plo")
        bkt = F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("_v") - F.col("plo")) / w * buckets)
                .cast("int"),
            ),
        )
        hist = joined.groupBy("pid", bkt.alias("bkt")).agg(
            F.count("*").alias("c"),
            F.min("_v").alias("bmin"),
            F.max("_v").alias("bmax"),
        ).collect()
        by_pid: dict = {}
        for r in hist:
            by_pid.setdefault(int(r.pid), []).append(
                (int(r.bkt), int(r.c), float(r.bmin), float(r.bmax))
            )
        for pid, kqs in back.items():
            cells = sorted(by_pid.get(pid, []))
            for gkey, q in kqs:
                lo, hi, k, n = live[(gkey, q)]
                acc = 0
                for _b, c, bmin, bmax in cells:
                    if acc + c > k:
                        if bmin == bmax:
                            live.pop((gkey, q))
                            done[(gkey, q)] = bmin
                        else:
                            live[(gkey, q)] = [bmin, bmax, k - acc, c]
                        break
                    acc += c
                else:
                    raise RuntimeError(
                        "exact_quantiles: rank beyond candidates (bug)"
                    )

    out_rows = [
        gkey + (float(q), n_of[gkey], float(v))
        # None group keys sort first (they can't compare against str)
        for (gkey, q), v in sorted(
            done.items(),
            key=lambda kv: tuple(
                (g is not None, g) for g in kv[0][0]
            ) + (kv[0][1],),
        )
    ]
    out_schema = "".join(
        f"{c} string, " for c in gcols
    ) + "q double, n long, value double"
    out = spark.createDataFrame(out_rows, out_schema)
    for gc, g in zip(gcols, groups):
        out = out.withColumnRenamed(gc, g)
    return out
