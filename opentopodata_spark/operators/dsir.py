"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — pick raw-corpus documents that look like a target
corpus, by hashed-n-gram importance weights.

    features   hashed unigram+bigram counts over normalized tokens
               (lowercase, [^a-z0-9 ] -> space, collapse): bucket(g) =
               poly-31 char hash mod 1e9+7 mod n_buckets — a pinned
               integer hash both Spark exprs and ANSI SQL can compute,
               not a library hash the oracle can't replay
    weights    log p_target(b) - log p_raw(b) per bucket with add-s
               smoothing; a document's log importance weight is the sum
               over its gram occurrences
    resample   Gumbel-top-k: key = w + G, G = -ln(-ln(u)) with u drawn
               from a 6-hex md5 prefix (the sampling.py uniform-key
               convention) — deterministic, seedable, and EXACTLY the
               softmax-without-replacement sample the paper's
               importance resampling wants

Scale shape (raw corpus is the big side — think 10^12 docs):

    grams             narrow codegen'd exprs (exprutil.tokens /
                      word_ngram_array / explode)
    bucket counts     groupBy(bucket).count() per corpus — map-side
                      combined, output bounded by n_buckets
    logratio table    n_buckets rows, built on the driver, BROADCAST
                      back — never a shuffle side
    per-doc weight    exploded raw grams JOIN broadcast(logratio) ->
                      groupBy(doc_id).sum — ONE shuffle, partial-agg
                      combined; raw text is scanned twice total (counts
                      + scoring), the paper's own two-pass shape
    top-k             TakeOrdered on the gumbel key (distributed
                      reduction, no global sort, no single-task window)

Determinism discipline: per-bucket log ratios are rounded to 6dp and
stored as INTEGER micro-units, so the per-doc reduction is an exact
integer sum — order-independent, hence identical under any layout and
bit-reproducible by the ANSI-SQL oracle (float log sums would drift
~1e-10 across engines, a real 6dp-boundary hazard at corpus scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprutil import bind_once, tokens, word_ngram_array

__all__ = ["dsir_weights", "dsir_sample", "HASH_MOD"]

HASH_MOD = 1_000_000_007


def _norm(text_col: str):
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def _gram_rows(df: DataFrame, id_col: str, text_col: str,
               n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per unigram/bigram OCCURRENCE."""
    toks = bind_once(
        tokens("_norm_text"),
        lambda tk: F.concat(tk, word_ngram_array(tk, 2, False)),
    )
    return (
        df.withColumn("_norm_text", _norm(text_col))
        .select(F.col(id_col).alias("doc_id"), toks.alias("_grams"))
        .select("doc_id", F.explode("_grams").alias("gram"))
        .where(F.col("gram") != "")
        .select(
            "doc_id",
            F.expr(
                "aggregate(sequence(1, length(gram)), 0L,"
                " (acc, i) -> (acc * 31 + ascii(substring(gram, i, 1)))"
                f" % {HASH_MOD}) % {n_buckets}"
            ).alias("bucket"),
        )
    )


def _bucket_counts(grams: DataFrame) -> dict[int, int]:
    rows = grams.groupBy("bucket").count().collect()
    return {int(r["bucket"]): int(r["count"]) for r in rows}


def _logratio_micro(target_cnt: dict, raw_cnt: dict, n_buckets: int,
                    smoothing: float) -> list[tuple[int, int]]:
    """(bucket, round(1e6 * (ln p_t - ln p_r))) for EVERY bucket —
    unseen buckets still carry the smoothed-prior ratio."""
    tt = sum(target_cnt.values())
    tr = sum(raw_cnt.values())
    dt = tt + smoothing * n_buckets
    dr = tr + smoothing * n_buckets
    out = []
    for b in range(n_buckets):
        lt = math.log((target_cnt.get(b, 0) + smoothing) / dt)
        lr = math.log((raw_cnt.get(b, 0) + smoothing) / dr)
        out.append((b, int(round((lt - lr) * 1e6))))
    return out


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document log importance weight of every ``raw`` document
    toward ``target``: (doc_id, n_grams, log_weight). Docs with no
    grams (empty/whitespace text) weigh 0.0 with n_grams 0."""
    if n_buckets < 2 or n_buckets > 1_000_000:
        raise ValueError("n_buckets must be in [2, 1e6]")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (unsmoothed log(0))")
    spark: SparkSession = raw.sparkSession
    raw_grams = _gram_rows(raw, id_col, text_col, n_buckets)
    tgt_grams = _gram_rows(target, id_col, text_col, n_buckets)
    micro = _logratio_micro(
        _bucket_counts(tgt_grams), _bucket_counts(raw_grams),
        n_buckets, smoothing,
    )
    lr = spark.createDataFrame(micro, "bucket long, lr_micro long")
    scored = (
        raw_grams.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_micro").alias("_w_micro"),
        )
    )
    ids = raw.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
        .alias("n_grams"),
        (F.coalesce(F.col("_w_micro"), F.lit(0)) / F.lit(1e6))
        .alias("log_weight"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    smoothing: float = 1.0,
    seed: str = "dsir",
    round_to: int = 6,
) -> DataFrame:
    """Gumbel-top-k importance resampling over :func:`dsir_weights`:
    (doc_id, n_grams, log_weight, gumbel_key, selected) for every raw
    doc; exactly ``min(k, n_docs)`` rows carry selected=true. The
    selection is the TakeOrdered top-k by (rounded gumbel key desc,
    doc_id asc) — deterministic given ``seed``, reproducible by any SQL
    engine from the same md5 uniforms."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = dsir_weights(raw, target, id_col=id_col, text_col=text_col,
                     n_buckets=n_buckets, smoothing=smoothing)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit(seed), F.col("doc_id"))),
                1, 6,
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(16777216.0)
    keyed = w.withColumn(
        "gumbel_key",
        F.round(F.col("log_weight") - F.log(-F.log(u)), round_to),
    )
    top = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col("doc_id"))
        .limit(k)
        .select(F.col("doc_id").alias("_sel_id"))
    )
    return keyed.join(
        F.broadcast(top), keyed.doc_id == F.col("_sel_id"), "left"
    ).select(
        "doc_id", "n_grams", "log_weight", "gumbel_key",
        F.col("_sel_id").isNotNull().alias("selected"),
    )
