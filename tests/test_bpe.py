"""BPE tokenizer: training determinism, encode/detokenize contracts, the
Spark word-count trainer, and the BPE modes of token_stats /
chunk_documents against a pure-Python twin.

No reference analog (opentopodata has no text pipeline); the algorithm
is the public Sennrich et al. 2016 word-level BPE.
"""

import numpy as np
import pytest

from opentopodata_spark import bpe
from opentopodata_spark.operators import textops


class TestTrain:
    def test_hand_example(self):
        # classic toy corpus: 'lo' pairs dominate
        counts = {"low": 5, "lower": 2, "lowest": 1}
        merges = bpe.train_bpe(counts, num_merges=3)
        # 'l o' is the most frequent pair (8 occurrences)
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w") or merges[1][0] == "lo"

    def test_deterministic(self):
        counts = {"aba": 3, "abb": 3, "bab": 3, "ba": 2}
        assert bpe.train_bpe(counts, 10) == bpe.train_bpe(counts, 10)

    def test_stops_on_singletons(self):
        merges = bpe.train_bpe({"xyz": 1}, num_merges=10)
        assert merges == []  # nothing occurs twice: nothing to learn

    def test_merges_file_roundtrip(self, tmp_path):
        merges = bpe.train_bpe({"low": 5, "lower": 2, "west": 4}, 8)
        p = str(tmp_path / "merges.txt")
        bpe.save_merges(merges, p)
        assert bpe.load_merges(p) == merges
        tok = bpe.BPETokenizer.from_file(p)
        assert tok.merges == merges


class TestEncode:
    def test_encode_applies_merges_in_rank_order(self):
        tok = bpe.BPETokenizer([("l", "o"), ("lo", "w</w>")])
        assert tok.encode("low") == ["low</w>"]
        assert tok.encode("lot") == ["lo", "t</w>"]
        assert tok.encode("go") == ["g", "o</w>"]

    def test_end_of_word_marker(self):
        tok = bpe.BPETokenizer([])
        assert tok.encode("ab ab") == ["a", "b</w>", "a", "b</w>"]

    def test_detokenize_roundtrip(self):
        tok = bpe.BPETokenizer([("t", "h"), ("th", "e</w>")])
        for text in ("the theater the", "a", "", "x y z the"):
            pieces = tok.encode(text)
            assert bpe.BPETokenizer.detokenize(pieces) == " ".join(text.split())

    def test_trained_tokenizer_compresses(self):
        words = {"running": 20, "runner": 15, "run": 30, "jumping": 10}
        tok = bpe.BPETokenizer(bpe.train_bpe(words, 30))
        assert len(tok.encode("running")) < len("running") + 0


class TestSparkIntegration:
    def test_word_counts_and_train(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb aa"), (2, "aa bb cc"), (3, "  aa\t aa ")],
            "doc_id long, text string",
        )
        rows = {r.word: r["count"] for r in bpe.word_counts_spark(df).collect()}
        assert rows == {"aa": 5, "bb": 2, "cc": 1}
        merges = bpe.train_bpe_spark(df, num_merges=5)
        assert merges == bpe.train_bpe(rows, 5)

    def test_token_stats_bpe_matches_python_twin(self, spark):
        texts = [
            "the cat sat on the mat",
            "the the the cat cat",
            "unseen wordforms entirely",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        tok = bpe.BPETokenizer(bpe.train_bpe_spark(df, num_merges=20))
        got = {
            r.doc_id: r.n_bpe_tokens
            for r in textops.token_stats(df, tokenizer=tok).collect()
        }
        want = {i: len(tok.encode(t)) for i, t in enumerate(texts)}
        assert got == want

    def test_chunk_documents_bpe_matches_python_twin(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "tiny",
            "",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        tok = bpe.BPETokenizer(bpe.train_bpe_spark(df, num_merges=15))
        got = sorted(
            (r.doc_id, r.chunk_idx, r.chunk, r.n_tokens)
            for r in textops.chunk_documents(
                df, chunk_tokens=5, stride=3, tokenizer=tok
            ).collect()
        )
        want = []
        for i, t in enumerate(texts):
            pieces = tok.encode(t)
            k = 0
            start = 0
            while start < len(pieces):
                window = pieces[start : start + 5]
                want.append(
                    (i, k, bpe.BPETokenizer.detokenize(window), len(window))
                )
                k += 1
                start += 3
        assert got == sorted(want)

    def test_chunk_documents_default_mode_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        got = sorted(
            (r.chunk_idx, r.chunk)
            for r in textops.chunk_documents(df, chunk_tokens=2).collect()
        )
        assert got == [(0, "a b"), (1, "c d"), (2, "e")]
