"""Sequence packing: documents -> fixed-length training-sequence layout.

The step between a cleaned corpus and a training run: concatenate the
token stream in a canonical document order and cut it into fixed-length
sequences, emitting for every document the (sequence, in-sequence
position, in-document token slice) assignments — including documents
that straddle a sequence boundary and appear in two or more sequences.
This is the "contiguous packing" most LLM data loaders implement
single-node; here the layout is computed distributively and
deterministically, so two runs (or two engines) produce the identical
packing.

The core is a DISTRIBUTED PREFIX SUM over the canonical order. A naive
``Window.orderBy(doc_id)`` with no partition key collapses the whole
corpus into ONE task — the classic window scale-killer. Instead:

1. each doc gets a coarse ORDER-PRESERVING bucket (doc_id >> bucket_shift
   — range arithmetic, not hashing, so bucket order == id order);
2. per-bucket token totals aggregate map-side (one small shuffle of
   n_buckets rows), cumulate on the driver (bounded by bucket count,
   ~corpus_size / 2^shift rows), and broadcast back;
3. the within-bucket running sum is a window partitioned BY BUCKET —
   parallel across buckets, each task bounded by one bucket's docs.

offset(doc) = bucket_base + within_bucket_cumsum - n_tok. Every doc's
global token offset is exact, no single-task stage anywhere.

Zero-token documents occupy no stream positions and are dropped from
the packing (documented; count them upstream via token_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exprutil import tokens

__all__ = ["pack_sequences"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bucket_shift: int = 12,
    n_tok_col: str | None = None,
) -> DataFrame:
    """(seq_id, doc_id, doc_from, doc_to, seq_from) packing assignments.

    Documents are laid out in ascending ``doc_id`` order as one token
    stream and cut every ``seq_len`` tokens:

    * ``seq_id``   — 0-based sequence index the slice lands in
    * ``doc_from`` — first token of the doc in this slice (0-based,
      inclusive)
    * ``doc_to``   — last token of the doc in this slice (inclusive)
    * ``seq_from`` — position inside the sequence where the slice starts

    A doc spanning k boundaries emits k+1 rows. ``bucket_shift`` sizes
    the prefix-sum buckets (2^shift ids per bucket); the driver-side
    cumulation holds one row per NON-EMPTY bucket.

    ``n_tok_col``: use a precomputed token-count column instead of the
    whitespace rule — how a BPE-tokenized pipeline packs (token_stats
    n_bpe_tokens, or bpe.encode lengths) without re-tokenizing here.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n_tok = (
        F.col(n_tok_col) if n_tok_col is not None else F.size(tokens(text_col))
    )
    d = docs.select(
        F.col(doc_id).cast("long").alias("doc_id"),
        n_tok.cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    d = d.withColumn("bucket", F.shiftright(F.col("doc_id"), bucket_shift))

    # per-bucket totals -> driver cumsum -> broadcast base offsets.
    # deterministic: plain integer addition in bucket order.
    totals = d.groupBy("bucket").agg(F.sum("n_tok").alias("btok")).collect()
    base, acc = [], 0
    for row in sorted(totals, key=lambda r: r.bucket):
        base.append((row.bucket, acc))
        acc += row.btok
    spark = docs.sparkSession
    bases = F.broadcast(
        spark.createDataFrame(base, "bucket long, bucket_base long")
    )

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        d.join(bases, "bucket")
        .withColumn(
            "offset", F.col("bucket_base") + F.sum("n_tok").over(w) - F.col("n_tok")
        )
        .drop("bucket", "bucket_base")
    )

    # explode one row per sequence the doc touches
    first_seq = F.floor(F.col("offset") / F.lit(seq_len))
    last_seq = F.floor((F.col("offset") + F.col("n_tok") - 1) / F.lit(seq_len))
    d = d.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    seq_start = F.col("seq_id") * F.lit(seq_len)  # stream pos where seq begins
    doc_from = F.greatest(seq_start - F.col("offset"), F.lit(0))
    doc_to = F.least(
        seq_start + F.lit(seq_len) - 1 - F.col("offset"), F.col("n_tok") - 1
    )
    seq_from = F.greatest(F.col("offset") - seq_start, F.lit(0))
    return d.select(
        "seq_id",
        "doc_id",
        doc_from.alias("doc_from"),
        doc_to.alias("doc_to"),
        seq_from.alias("seq_from"),
    )
