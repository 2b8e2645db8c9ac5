"""Shared Catalyst expression helpers for the operator family."""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["bind_once"]


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
