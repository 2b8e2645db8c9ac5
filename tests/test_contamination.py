"""Benchmark-contamination composite (operators/contamination + jobs CLI).

Hand-checked corpus: one document contains a benchmark item verbatim
(gram coverage 1.0), one shares only topical vocabulary (BM25-only),
one is unrelated.
"""

import json

import pytest
from pyspark.sql import functions as F

from opentopodata_spark.operators import contamination


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1 contains bench 100 verbatim -> every bench gram shared
        (1, "intro words then what is the capital of france paris "
            "closing words after the question"),
        # doc 2 shares vocabulary (france, capital) but no full 5-gram
        (2, "france has one capital and many rivers and mountains"),
        # doc 3 unrelated
        (3, "completely different text about marine biology and whales"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of france paris")],
        "bench_id long, text string",
    )


class TestNgramOverlap:
    def test_verbatim_inclusion_has_full_coverage(self, corpus, bench):
        got = contamination.benchmark_ngram_overlap(corpus, bench, n=5)
        rows = {r.doc_id: r for r in got.collect()}
        assert 1 in rows
        assert rows[1].gram_coverage == 1.0
        # bench text has 7 tokens -> 3 distinct 5-grams, all shared
        assert rows[1].n_shared_grams == 3
        # docs 2 and 3 share no 5-gram
        assert 2 not in rows and 3 not in rows

    def test_min_shared_filters(self, corpus, bench):
        got = contamination.benchmark_ngram_overlap(
            corpus, bench, n=5, min_shared=4
        )
        assert got.count() == 0

    def test_short_bench_partial_gram(self, spark, corpus):
        # bench shorter than n contributes one partial gram; a doc
        # containing those exact tokens as a window does NOT match the
        # partial gram (doc grams are full-width) unless the doc is
        # itself short -- semantics shared with dedup.word_shingles.
        short = spark.createDataFrame(
            [(7, "capital of france")], "bench_id long, text string"
        )
        got = contamination.benchmark_ngram_overlap(corpus, short, n=5)
        assert got.count() == 0


class TestComposite:
    def test_two_signals_distinguished(self, corpus, bench):
        rep = contamination.contamination_check(corpus, bench, n=5, k=2)
        rows = {r.doc_id: r for r in rep.collect()}
        # verbatim doc: gram signal fired, and it must be the BM25 top hit
        assert rows[1].gram_coverage == 1.0
        assert rows[1].bm25_rank == 1
        # k=2 keeps a second retrieval hit with zero shared grams
        bm25_only = [
            r for r in rows.values()
            if r.n_shared_grams == 0 and r.bm25_rank is not None
        ]
        assert len(bm25_only) == 1
        assert bm25_only[0].doc_id == 2  # topical-overlap doc outranks whales
        # no row is all-null on both signals
        for r in rows.values():
            assert r.n_shared_grams > 0 or r.bm25_rank is not None

    def test_gram_only_rows_survive_small_k(self, spark, bench):
        # with k=1 and a corpus where another doc wins BM25, a verbatim
        # doc found only by grams still appears (full-outer semantics)
        docs = spark.createDataFrame(
            [
                (1, "x y z what is the capital of france paris q r s"),
                # repeats the query terms -> higher tf, wins BM25 top-1
                (2, "capital capital capital france france paris paris "
                    "what what is is the the of of"),
            ],
            "doc_id long, text string",
        )
        rep = contamination.contamination_check(docs, bench, n=5, k=1)
        rows = {r.doc_id: r for r in rep.collect()}
        assert rows[1].gram_coverage == 1.0
        ranked = [r for r in rows.values() if r.bm25_rank == 1]
        assert len(ranked) == 1


def test_job_cli(tmp_path, spark, corpus, bench, capsys):
    from opentopodata_spark.jobs import contamination as job

    docs_p = str(tmp_path / "docs.parquet")
    bench_p = str(tmp_path / "bench.parquet")
    corpus.write.parquet(docs_p)
    bench.write.parquet(bench_p)
    out = str(tmp_path / "contam")
    job.main([
        "--documents", docs_p,
        "--benchmark", bench_p,
        "--out", out,
        "--n", "5",
        "--k", "2",
        "--coverage-alert", "0.5",
        "--cores", "4",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_benchmark"] == 1
    assert stats["removal_candidates"] == 1
    assert stats["bm25_only_pairs"] == 1
    assert stats["flagged_pairs"] >= 2
    written = spark.read.parquet(f"{out}/report")
    assert written.count() == stats["flagged_pairs"]
    cols = set(written.columns)
    assert {"bench_id", "doc_id", "n_shared_grams", "gram_coverage",
            "bm25_rank", "bm25_score"} <= cols


def test_bm25_max_df_frac_equals_query_term_removal(spark):
    """Eliding df > frac*N terms == deleting those terms from the query
    strings: identical scores and ranks (exact equivalence, not approx)."""
    from opentopodata_spark.operators.search import bm25_topk
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "the common filler " + ("alpha " if i % 7 == 0 else "beta ")
          + f"word{i % 11} tail the")
         for i in range(70)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "the alpha word3"), (2, "the beta filler word5")],
        "query_id long, query string",
    )
    # 'the'/'common'/'filler' are in every doc -> df = N > 0.9N
    pruned = bm25_topk(docs, queries, k=5, max_df_frac=0.9)
    stripped_queries = spark.createDataFrame(
        [(1, "alpha word3"), (2, "beta word5")],
        "query_id long, query string",
    )
    expect = bm25_topk(docs, stripped_queries, k=5)
    got = {(r.query_id, r.doc_id, r.rank, r.score) for r in pruned.collect()}
    want = {(r.query_id, r.doc_id, r.rank, r.score) for r in expect.collect()}
    assert got == want and got
