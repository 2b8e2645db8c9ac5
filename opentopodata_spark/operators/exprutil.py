"""Shared Catalyst expression helpers for the operator family."""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["bind_once", "tokens", "word_ngram_array"]


def tokens(text_col: str):
    """Whitespace tokens of a text column, empty strings dropped — the
    tokenization every text operator (dedup, textops, search) shares, and
    the one the DuckDB oracles replay as
    ``list_filter(string_split(text, ' '), x -> x <> '')``."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))


def bind_once(col, fn):
    """Evaluate ``col`` ONCE per row and hand the value to ``fn`` as a
    lambda variable (single-element-array form of the zip_with binding in
    operators/extract.py:114).

    A plain expression referenced inside an HOF lambda body is
    RE-EVALUATED on every lambda invocation: e.g.
    ``transform(seq, i -> slice(split(text), i, n))`` re-splits the text
    per output element — O(tokens) splits per row (measured 4.6s → 1.25s
    on the sf0.1 repetition_stats bench, ~2× on extraction in round 1).
    Lambda variables are materialized values, immune to that and to
    CollapseProject inlining.

    ``fn`` MUST be a single-parameter callable: PySpark derives the HOF
    arity from the python signature, so a second parameter — even with a
    default like ``lambda t, n=n:`` — switches transform to its
    (value, index) form and silently passes the element index as the
    second argument. Use a factory closure to parameterize.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_ngram_array(toks, n: int, include_partial: bool):
    """Space-joined word n-gram array over a BOUND token array (see
    bind_once) — THE shared gram builder; the two legal short-doc
    semantics are an explicit flag, not two drifting copies:

    * ``include_partial=True`` (shingling/dedup semantics): a doc shorter
      than ``n`` tokens yields its whole text as ONE partial gram, so
      short docs still fingerprint and exact-duplicate short docs still
      collide.
    * ``include_partial=False`` (repetition-metric semantics): the same
      doc yields an EMPTY array — a partial gram is not an n-gram, so
      n-gram counts and fractions stay well-defined.

    ``slice`` (not element_at) clamps at the array end and the
    when-guard keeps the discarded branch from tripping ANSI-mode bounds
    errors; ``sequence(1, 0)`` would otherwise produce the descending
    [1, 0] with null-padded grams.
    """
    count = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    if include_partial:
        # count <= 0 -> the single i=1 gram is slice(toks, 1, n): the
        # whole (short) text; an empty token array gives "" (callers
        # filter empties).
        return grams
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))
