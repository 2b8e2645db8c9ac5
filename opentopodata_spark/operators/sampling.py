"""Deterministic corpus sampling / data-mixing operators.

Training-data pipelines rarely train on a raw corpus: they MIX strata
(languages, sources, quality buckets) at chosen rates — e.g. "keep 100%
of books, 30% of web, 5% of boilerplate". At 100 TB the sampler must be:

* **single-scan and shuffle-free** — a pure filter expression, pushed
  into the scan; no groupBy, no window, no count() pre-pass;
* **deterministic and engine-portable** — re-running the pipeline (or
  auditing it from another engine) selects the SAME rows. Spark's
  ``df.sample`` is seeded per-partition, so any repartition or file-split
  change silently changes the selected set; a content-keyed hash does not.

Selection rule: keep a row iff the first 6 hex chars of
md5(seed || '#' || id) are lexicographically below a per-stratum
threshold ``hex(floor(rate * 16^6))``. The md5 prefix is uniform on
[0, 16^6), so P(keep) = rate quantized to 1/16.7M, and the comparison is
plain ASCII string ordering — bit-identical in every SQL engine (the
DuckDB oracle runs the same expression, same literals).

No reference analog (the reference is an elevation API); this is part of
the training-data extras family (see operators/textops.py, dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rate_threshold", "sample_key", "stratified_sample"]

_KEY_HEX_LEN = 6
_KEY_SPACE = 16**_KEY_HEX_LEN


def rate_threshold(rate: float) -> str:
    """Hex threshold string for a sampling rate in [0, 1].

    'g' sorts above every hex digit, so rate >= 1 keeps everything;
    rate <= 0 keeps nothing ('000000' is strictly below every key).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "000000"
    return format(int(rate * _KEY_SPACE), f"0{_KEY_HEX_LEN}x")


def sample_key(id_col: str = "doc_id", seed: str = "s1"):
    """The 6-hex-char uniform selection key for a row id (a Column)."""
    return F.substring(
        F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col).cast("string"))),
        1,
        _KEY_HEX_LEN,
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "s1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (strata not in
    ``rates`` use ``default_rate``), deterministically by content hash.

    Returns the input rows (all columns) plus ``sample_key`` — keeping the
    key in the output makes the selection auditable: an external check can
    recompute md5 and verify every kept row is below its threshold.

    The per-stratum threshold is a literal CASE over ``strata_col``
    (strata sets are small — languages, sources), so the whole operator is
    one codegen'd predicate: at 10^12 rows it is a parquet scan with the
    filter applied post-scan and nothing else.
    """
    thr = F.lit(rate_threshold(default_rate))
    for name, rate in sorted(rates.items()):
        thr = (
            F.when(F.col(strata_col) == name, F.lit(rate_threshold(rate)))
            .otherwise(thr)
        )
    key = sample_key(id_col, seed)
    return df.withColumn("sample_key", key).where(F.col("sample_key") < thr)


def mixture_rates(
    counts: dict[str, float],
    alpha: float = 0.0,
    token_budget: float | None = None,
) -> dict[str, float]:
    """Per-stratum keep rates for temperature-based data mixing.

    Target mixture shares follow the multilingual-training recipe
    p_i ∝ n_i^alpha (alpha=1 keeps the natural mixture, alpha=0 weights
    every stratum equally, 0<alpha<1 interpolates). This is a
    downsampling-only sampler:

    * without ``token_budget``: rates are scaled so the largest is 1.0 —
      the cheapest selection achieving the target PROPORTIONS
      (r_i ∝ n_i^(alpha-1)). alpha=1 -> every rate 1.0.
    * with ``token_budget``: water-filling — allocate the budget by p_i,
      clip strata that cannot fill their share (rate 1.0), reallocate
      the leftover among the rest until stable. Expected kept weight
      sums to min(budget, total).

    alpha=0 rates are computed as the single division n_min/n_i so an
    engine-portable oracle (DuckDB double division) reproduces the
    thresholds bit-exactly — no libm pow in that path.
    """
    import math

    n = {k: float(v) for k, v in counts.items() if v > 0}
    if not n:
        return {k: 0.0 for k in counts}
    out = {k: 0.0 for k in counts}
    if token_budget is None:
        if alpha == 0.0:
            nmin = min(n.values())
            out.update({k: nmin / n[k] for k in n})
        else:
            r = {k: math.pow(n[k], alpha - 1.0) for k in n}
            m = max(r.values())
            out.update({k: r[k] / m for k in r})
        return out
    w = {k: math.pow(v, alpha) for k, v in n.items()}
    active = set(n)
    remaining = float(token_budget)
    while active and remaining > 0:
        tw = sum(w[k] for k in active)
        clipped = [
            k for k in active if remaining * w[k] / tw >= n[k]
        ]
        if not clipped:
            for k in active:
                out[k] = (remaining * w[k] / tw) / n[k]
            return out
        for k in clipped:
            out[k] = 1.0
            active.remove(k)
            remaining -= n[k]
    return out


def temperature_mixture(
    df: DataFrame,
    strata_col: str = "lang",
    alpha: float = 0.0,
    token_budget: float | None = None,
    weight_col: str | None = None,
    id_col: str = "doc_id",
    seed: str = "s1",
) -> tuple[DataFrame, dict[str, float]]:
    """Temperature-mixed corpus sample: one tiny per-stratum aggregate
    (sum of ``weight_col``, or row count) pulled to the driver (K rows,
    K = #strata), rates from :func:`mixture_rates`, then the same
    single-scan deterministic hash predicate as
    :func:`stratified_sample`. Returns (sampled_df, rates) so pipelines
    can log the realized mixture. Two scans of the input total — the
    aggregate is map-side-combined and the filter is a pure predicate."""
    agg = (
        df.groupBy(strata_col).agg(
            (F.sum(weight_col) if weight_col else F.count("*")).alias("n")
        )
    )
    counts = {r[0]: r[1] for r in agg.collect()}
    rates = mixture_rates(counts, alpha=alpha, token_budget=token_budget)
    return (
        stratified_sample(
            df, rates, strata_col=strata_col, id_col=id_col, seed=seed,
            default_rate=0.0,
        ),
        rates,
    )


def stratified_take(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "s1",
    prefilter_rate: float | None = None,
) -> DataFrame:
    """EXACTLY-k-per-stratum deterministic sample (corpus inspection /
    eval-set carving): rank rows within each stratum by their md5
    sample key (doc id as tiebreak) and keep rank <= k. Unlike
    rate-based sampling the output size is exact; like it, the
    selection is content-keyed — layout- and engine-independent, and
    auditable from the emitted sample_key.

    Scale shape: one window shuffle partitioned by stratum. For a
    stratum with 10^10 rows that window sorts everything, so pass
    ``prefilter_rate`` (e.g. 100*k/n_min_stratum): the codegen'd
    sample_key < threshold predicate cuts the scan FIRST and the window
    ranks only survivors — the ranking is unchanged because the
    prefilter keeps a prefix of the same order. Each stratum must
    retain >= k rows under the prefilter or fewer rows come back
    (the caller knows its stratum sizes; pick the rate accordingly).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    key = sample_key(id_col, seed)
    out = df.withColumn("sample_key", key)
    if prefilter_rate is not None:
        out = out.where(
            F.col("sample_key") < F.lit(rate_threshold(prefilter_rate))
        )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("sample_key").asc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )
