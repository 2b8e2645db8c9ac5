"""Benchmark-contamination scoring: corpus documents vs a benchmark set.

No analog in the reference (an elevation server); this is the composite
decontamination pass a training-data pipeline runs before training
(GPT-3 appendix C / PaLM-style n-gram collision checks — public): a
corpus document is contamination-suspect when it shares exact word
n-grams with a benchmark item (hard evidence, the span-dedup signal) or
retrieves highly for the benchmark text under BM25 (soft evidence, the
retrieval signal). The composite keeps both, full-outer-joined, so the
report distinguishes verbatim leakage (high gram coverage) from mere
topical overlap (BM25 hit, zero shared grams).

Scale shape (10^12-doc corpus, 10^3..10^5 benchmark items):

* the benchmark side is SMALL by construction: its gram dictionary and
  per-item gram counts broadcast; the corpus gram stream is pruned by
  that broadcast join BEFORE its one (doc, bench) aggregate shuffle —
  the same postings-pruning shape as operators/search.bm25_topk.
* gram semantics are the engine's shared builder (dedup.word_shingles:
  distinct grams per doc, short docs contribute one partial gram), so
  contamination, near-dup, and span-dedup all agree on what a gram is.
* the final full-outer join runs on two already-reduced frames keyed by
  (bench_id, doc_id) — cardinality is flagged rows, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles
from .search import bm25_topk

__all__ = ["benchmark_ngram_overlap", "contamination_check"]


def benchmark_ngram_overlap(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Exact word-n-gram collisions: (bench_id, doc_id, n_shared_grams,
    gram_coverage) for every (benchmark item, document) pair sharing at
    least ``min_shared`` distinct n-grams. gram_coverage = shared grams
    / the benchmark item's distinct gram count — 1.0 means the document
    contains every gram of the benchmark item (verbatim inclusion up to
    gram granularity)."""
    bgr = word_shingles(
        bench, id_col=bench_id_col, text_col=bench_text_col, n=n
    ).select(F.col("doc_id").alias("bench_id"), F.col("shingle").alias("gram"))
    bsz = bgr.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_n_grams"))
    dgr = word_shingles(docs, id_col=id_col, text_col=text_col, n=n).select(
        "doc_id", F.col("shingle").alias("gram")
    )
    shared = (
        dgr.join(F.broadcast(bgr), "gram")  # prunes the corpus gram stream
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        shared.join(F.broadcast(bsz), "bench_id")
        .where(F.col("n_shared_grams") >= int(min_shared))
        .select(
            "bench_id",
            "doc_id",
            "n_shared_grams",
            F.round(
                F.col("n_shared_grams") / F.col("bench_n_grams"), 6
            ).alias("gram_coverage"),
        )
    )


def contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    k: int = 10,
    min_shared: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """The composite report: one row per (bench_id, doc_id) flagged by
    EITHER signal — columns n_shared_grams / gram_coverage (0 when only
    BM25 fired) and bm25_rank / bm25_score (null when only grams fired).
    Rows with high gram_coverage are removal candidates; BM25-only rows
    are reviewer triage."""
    ov = benchmark_ngram_overlap(
        docs, bench, n=n, min_shared=min_shared, id_col=id_col,
        text_col=text_col, bench_id_col=bench_id_col,
        bench_text_col=bench_text_col,
    )
    queries = bench.select(
        F.col(bench_id_col).alias("query_id"),
        F.col(bench_text_col).alias("query"),
    )
    hits = bm25_topk(
        docs, queries, k=k, k1=k1, b=b, max_df_frac=max_df_frac,
        id_col=id_col, text_col=text_col
    ).select(
        F.col("query_id").alias("bench_id"),
        "doc_id",
        F.col("rank").alias("bm25_rank"),
        F.col("score").alias("bm25_score"),
    )
    return ov.join(hits, ["bench_id", "doc_id"], "full_outer").select(
        "bench_id",
        "doc_id",
        F.coalesce(F.col("n_shared_grams"), F.lit(0).cast("long")).alias(
            "n_shared_grams"
        ),
        F.coalesce(F.col("gram_coverage"), F.lit(0.0)).alias("gram_coverage"),
        "bm25_rank",
        "bm25_score",
    )
