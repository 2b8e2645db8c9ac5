"""Full-text relevance search (BM25) over a document corpus.

No analog in the reference (an elevation server); this is the retrieval
primitive a training-data pipeline needs for corpus exploration, dataset
curation ("find documents about X"), and contamination checks (query the
corpus with benchmark strings before training).

Scoring is Okapi BM25 (Robertson et al., TREC-3 — public):

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                            (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Scale shape (the design point is a 10^12-document corpus and a small
query batch):

* Document length and corpus stats (N, avgdl) are NARROW: ``size()`` of
  the token array per row plus one global aggregate — no explode, no
  per-token shuffle for lengths.
* The posting stream is pruned BEFORE its shuffle: tokens explode and
  are immediately broadcast-semi-joined against the (tiny) query-term
  dictionary, so the (doc, term) aggregate shuffles only occurrences of
  terms someone actually asked about — a thousand query terms prune a
  100 TB token stream down map-side.
* df(t) is computed from the pruned posting list (one more tiny agg on
  term — correct corpus-wide df, since pruning keeps every doc that
  contains a query term) and broadcast back.
* The final per-(query, doc) sum + top-k window partitions by query_id —
  cardinality = |queries| × |matching docs|, already reduced.

Tokenization is the engine-wide whitespace rule (exprutil.tokens). The
DuckDB oracle runs the same ln()/rounding expressions; unlike the repo's
other scored operators (integer-count Jaccard, fold-ordered cosine),
BM25's per-(query, doc) sum of double contributions is summation-order-
dependent at the ~1-ulp level, so cross-engine equality after
round(·, 6) holds only when no true score sits within ~1e-12 of a
0.5e-6 rounding boundary. For the driver fixtures this is TESTED, not
hoped: tests/test_training_ops.py pins every emitted fixture score
≥ 1e-10 from the nearest boundary and an unambiguous rank-k cut
(≥10^5 × the summation noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exprutil import tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    round_to: int = 6,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-k BM25 results per query: (query_id, doc_id, rank, score).

    ``queries`` is a small frame (query_id, query text); it is broadcast.
    Ties broken by ascending doc_id after rounding to ``round_to`` —
    deterministic across partitionings and engines.

    ``max_df_frac``: optionally elide query terms whose document
    frequency exceeds this fraction of the corpus (Lucene-style stopword
    elision). A term with df ≈ N contributes idf ≈ ln(1 + 0.5/N) ≈ 0 to
    every score but multiplies the scoring stream by |docs containing
    it| × |queries containing it| — the dominant cost when queries share
    ubiquitous words. Exactly equivalent to deleting those terms from
    the query strings. Default None scores every term (exact Okapi)."""
    # query-term dictionary: distinct terms per query (BM25 sums each
    # distinct query term once; repeated terms in a query don't stack)
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(query_col))).alias("term"),
    ).where(F.col("term") != "")

    # corpus stats: one narrow aggregate (N docs, average token count)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )

    # pruned postings: dl rides along with each occurrence so no second
    # corpus-keyed join is needed; the semi join against the broadcast
    # term dictionary prunes before the (doc, term) shuffle
    bound = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    occ = bound.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    ).join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
    tf = occ.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )

    # corpus-wide document frequency per query term: a window count over
    # the tf stream (one row per doc containing the term — pruning keeps
    # every such doc, so this df is exact). A window, NOT a separate
    # groupBy+join: the join form makes the posting subtree a second
    # consumer and Spark re-scans + re-aggregates the whole corpus for it
    # (verified in the physical plan); the window re-exchanges only the
    # already-tiny tf stream.
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    if max_df_frac is not None:
        # before the qterms fanout join: the elision's whole point is to
        # keep (ubiquitous term × every query containing it) rows out of
        # the scoring stream
        n_docs_bc = F.broadcast(stats.select("n_docs"))
        tf = tf.crossJoin(n_docs_bc).where(
            F.col("df") <= F.lit(float(max_df_frac)) * F.col("n_docs")
        ).drop("n_docs")

    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), round_to).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )
