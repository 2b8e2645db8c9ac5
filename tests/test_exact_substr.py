"""True ExactSubstr span dedup (suffix-array prefix-doubling classes):
planted goldens, brute-force differential, non-power-of-two lengths,
composition with the n-gram removal step, edges."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators import dedup


def _brute_spans(docs, L):
    """Definitional replay: repeated L-grams (>=2 occurrences corpus
    wide) -> covered starts -> merged [p, p+L) islands (touch merges)."""
    occ = {}
    toks = {d: t.split() for d, t in docs}
    for d, t in toks.items():
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p:p + L]), []).append((d, p))
    out = {}
    for gram, where in occ.items():
        if len(where) >= 2:
            for d, p in where:
                out.setdefault(d, []).append(p)
    spans = {}
    for d, starts in out.items():
        starts.sort()
        merged = []
        for p in starts:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + L)
            else:
                merged.append([p, p + L])
        spans[d] = [tuple(m) for m in merged]
    return spans


def _got_spans(spark, docs, L):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = dedup.exact_substr_spans(df, min_len=L).collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, []).append((r.start, r.end))
    return {d: sorted(v) for d, v in out.items()}


def test_planted_cross_doc_repeat(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        ("a", f"alpha beta {shared} gamma delta"),
        ("b", f"one two three four {shared} five"),
        ("c", "totally unrelated words without any overlap here at all"),
    ]
    got = _got_spans(spark, docs, 5)
    # the shared 10-token sentence is covered in both docs, c untouched
    assert got["a"] == [(2, 12)]
    assert got["b"] == [(4, 14)]
    assert "c" not in got
    # within-doc repetition is also a repeat
    got2 = _got_spans(
        spark, [("x", "p q r s t u p q r s t u tail words here")], 6)
    assert got2["x"] == [(0, 12)]


@pytest.mark.parametrize("L", [2, 4, 5, 7, 8])
def test_differential_vs_brute_force(spark, L):
    rng = np.random.RandomState(31 + L)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> many repeats
    docs = []
    for d in range(14):
        n = int(rng.randint(3, 40))
        docs.append(
            (f"d{d:02d}", " ".join(rng.choice(vocab, n))))
    assert _got_spans(spark, docs, L) == _brute_spans(docs, L)


def test_composition_matches_ngram_removal(spark):
    # on a corpus of >=L-token docs, true-ExactSubstr coverage == the
    # fixed-n repeated_ngrams removal list applied by
    # remove_repeated_spans (the theorem in exact_substr_spans' doc)
    L = 4
    rng = np.random.RandomState(7)
    vocab = [f"t{i}" for i in range(9)]
    docs = [(f"d{d}", " ".join(rng.choice(vocab, int(rng.randint(L, 30)))))
            for d in range(12)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    spans = dedup.exact_substr_spans(df, min_len=L)
    a = {r.doc_id: (r.clean, r.n_spans_removed > 0)
         for r in dedup.remove_exact_substr(df, spans).collect()}
    removal = dedup.repeated_ngrams(df, n=L, min_count=2)
    b = {r.doc_id: (r.clean, r.n_spans_removed > 0)
         for r in dedup.remove_repeated_spans(df, removal, n=L).collect()}
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in b.items()}


def test_edges(spark):
    docs = [("a", "x y"), ("b", "x y"), ("c", "")]
    # docs shorter than L can never host an L-repeat
    assert _got_spans(spark, docs, 3) == {}
    # identical 2-token docs ARE a length-2 repeat
    assert _got_spans(spark, docs, 2) == {"a": [(0, 2)], "b": [(0, 2)]}
    with pytest.raises(ValueError, match="min_len"):
        dedup.exact_substr_spans(
            spark.createDataFrame(docs, "doc_id string, text string"),
            min_len=0)
    # apply step: untouched docs verbatim, covered tokens stripped
    df = spark.createDataFrame(
        [("a", "k l m n o p"), ("b", "z k l m n q"), ("c", "solo words")],
        "doc_id string, text string")
    spans = dedup.exact_substr_spans(df, min_len=4)
    got = {r.doc_id: (r.clean, r.n_spans_removed)
           for r in dedup.remove_exact_substr(df, spans).collect()}
    assert got["a"] == ("o p", 1)
    assert got["b"] == ("z q", 1)
    assert got["c"] == ("solo words", 0)


def test_plan_shape(spark):
    # every doubling round is a window over the key partition + one
    # self-join on (doc_id, pos): no cartesian, no BNLJ, no Python in
    # the class rounds, and no PARTITION-LESS window (the global-sort
    # single-task killer) — the island window partitions by doc_id
    docs = spark.createDataFrame(
        [(f"d{i}", "a b c d e f g a b c d e f g") for i in range(6)],
        "doc_id string, text string")
    plan = dedup.exact_substr_spans(docs, min_len=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # no partition-less window (the global-sort single-task killer)
    assert "windowspecdefinition()" not in plan.replace(" ", "")
