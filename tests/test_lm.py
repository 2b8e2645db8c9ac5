"""Bigram LM train + perplexity vs a single-process Python twin."""

import math

from pyspark.sql import functions as F

from opentopodata_spark.operators.lm import BOS, EOS, perplexity, train_bigram_lm

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat sat on the mat"),  # exact dup of 1: identical score
    (4, "colorless green ideas sleep furiously"),
    (5, ""),  # empty: single <s> -> </s> bigram
    (6, "the the the the"),  # repetition: high self-probability
]


def _py_bigrams(text):
    toks = [t for t in text.split(" ") if t != ""]
    frame = [BOS] + toks + [EOS]
    return list(zip(frame, frame[1:]))


def _py_model(docs, min_count=1):
    counts = {}
    for _, text in docs:
        for bg in _py_bigrams(text):
            counts[bg] = counts.get(bg, 0) + 1
    return {k: v for k, v in counts.items() if v >= min_count}


def _py_scores(docs, model, alpha=0.1):
    ctx = {}
    for (w1, _), c in model.items():
        ctx[w1] = ctx.get(w1, 0) + c
    v = len({w2 for (_, w2) in model})
    out = {}
    for did, text in docs:
        lps = [
            math.log(
                (model.get(bg, 0) + alpha) / (ctx.get(bg[0], 0) + alpha * v)
            )
            for bg in _py_bigrams(text)
        ]
        lp = sum(lps)
        out[did] = (len(lps), round(lp, 4), round(math.exp(-lp / len(lps)), 4))
    return out


def test_train_matches_python_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.w1, r.w2): r.c for r in train_bigram_lm(docs).collect()
    }
    assert got == _py_model(DOCS)


def test_min_count_prunes(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.w1, r.w2): r.c for r in train_bigram_lm(docs, min_count=2).collect()}
    assert got == _py_model(DOCS, min_count=2)
    assert all(c >= 2 for c in got.values())
    assert (BOS, "the") in got  # docs 1,2,3 share it


def test_perplexity_matches_python_twin(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_bigram_lm(docs)
    got = {
        r.doc_id: (r.n_bigrams, r.logprob, r.ppl)
        for r in perplexity(docs, model).collect()
    }
    assert got == _py_scores(DOCS, _py_model(DOCS))


def test_dup_docs_score_identically_and_ranking(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_bigram_lm(docs)
    ppl = {r.doc_id: r.ppl for r in perplexity(docs, model).collect()}
    assert ppl[1] == ppl[3]
    # in-corpus sentences score far better than the one-off oddball
    assert ppl[1] < ppl[4]
    # empty doc has exactly one bigram
    nb = {r.doc_id: r.n_bigrams for r in perplexity(docs, model).collect()}
    assert nb[5] == 1


def test_score_against_foreign_model(spark):
    # train on docs 1-3, score doc 4: all bigrams unseen; interior
    # contexts unseen too (p = 1/V), but the <s> context IS in the model
    train = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    test = spark.createDataFrame([DOCS[3]], "doc_id long, text string")
    model = train_bigram_lm(train)
    row = perplexity(test, model).collect()[0]
    expected = _py_scores([DOCS[3]], _py_model(DOCS[:3]))[4]
    assert (row.n_bigrams, row.logprob, row.ppl) == expected
    # and it scores much worse than an in-corpus doc
    in_row = perplexity(
        spark.createDataFrame([DOCS[0]], "doc_id long, text string"), model
    ).collect()[0]
    assert row.ppl > in_row.ppl * 3


def test_no_python_udfs_in_plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_bigram_lm(docs)
    plan = (
        perplexity(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_text_not_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, None)], "doc_id long, text string"
    )
    model = train_bigram_lm(docs)
    rows = {r.doc_id: r.n_bigrams for r in perplexity(docs, model).collect()}
    assert rows == {1: 3, 2: 1}  # NULL scores like empty, not dropped


def test_collocations_pmi(spark):
    from opentopodata_spark.operators.lm import collocations

    # "san francisco" always co-occurs; "the" pairs with everything
    rows = [(i, f"the city of san francisco is near the bay {i % 3}")
            for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(docs, min_count=3, k=10).collect()
    got = {(r.w1, r.w2): (r.c, r.pmi) for r in out}
    assert ("san", "francisco") in got
    # python twin for the pmi value
    import math
    from collections import Counter

    bigs = Counter()
    for _, t in rows:
        toks = t.split()
        bigs.update(zip(toks, toks[1:]))
    n = sum(bigs.values())
    c12 = bigs[("san", "francisco")]
    c1 = sum(v for (a, _), v in bigs.items() if a == "san")
    c2 = sum(v for (_, b), v in bigs.items() if b == "francisco")
    assert got[("san", "francisco")] == (c12, round(math.log(c12 * n / (c1 * c2)), 6))
    # a promiscuous left word scores lower than the exclusive pair
    the_pairs = [v[1] for k, v in got.items() if k[0] == "the"]
    assert all(p < got[("san", "francisco")][1] for p in the_pairs)
    # deterministic k cut: rank by (pmi desc, w1, w2)
    ordered = [(r.pmi, r.w1, r.w2) for r in out]
    assert ordered == sorted(ordered, key=lambda t: (-t[0], t[1], t[2]))
