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

__all__ = ["mg_summarize", "mg_trim", "heavy_hitters"]


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
