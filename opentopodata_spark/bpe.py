"""Byte-pair-encoding subword tokenizer (train + encode), no external deps.

Whitespace tokens diverge from how training sequences are actually
packed, so the chunking / token-stats operators need a real subword
vocabulary. This is the classic word-level BPE (Sennrich et al. 2016,
public): words split to characters with an end-of-word marker, then the
most frequent adjacent symbol pair is merged repeatedly; encoding
replays the merge list in priority order.

Design for the 100 TB pipeline:

* TRAIN on an aggregate, not the corpus: the input is a word -> count
  mapping. ``word_counts_spark`` computes it distributed (one groupBy,
  map-side combined, top-N capped so the driver pull is bounded);
  training itself is a driver-side loop over the (tiny) unique-word set
  — exactly how production tokenizers are built (they sample).
* ENCODE distributed with per-word memoization: Zipf means a batch of
  documents contains few distinct words, so the Arrow-batched UDF in
  operators/textops.py tokenizes each distinct word once per worker.
* Merges persist to a plain text file (one "left right" pair per line,
  rank = line order) so vocabularies are versioned artifacts, loadable
  anywhere — same format the original BPE release used.

Determinism: pair selection ties break on (count desc, pair lexicographic),
so identical counts always yield identical merge lists.
"""

from __future__ import annotations

import functools
from collections import Counter

__all__ = [
    "END_OF_WORD",
    "BPETokenizer",
    "train_bpe",
    "save_merges",
    "load_merges",
    "word_counts_spark",
    "train_bpe_spark",
]

END_OF_WORD = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + END_OF_WORD,)


def train_bpe(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merge rules from a word -> count map.

    Stops early when no pair occurs twice (merging singletons would just
    memorize the sample). Pure Python on the UNIQUE-word set — the
    corpus-scale work (counting words) happens before this, in Spark."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in sorted(word_counts.items()):
        # keys must be single words: whitespace inside a "word" would
        # produce merges the space-separated file format cannot express
        if not w or any(ch.isspace() for ch in w):
            continue
        words.append(list(_word_symbols(w)))
        counts.append(int(c))

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b))
        ab = a + b
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: otds-bpe-1\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b))
    return merges


class BPETokenizer:
    """Apply a learned merge list. Pieces carry the end-of-word marker;
    ``detokenize(encode(text))`` reconstructs the whitespace-normalized
    text exactly (same single-space convention the whitespace operators
    use), so chunk windows remain real text."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._encode_word = functools.lru_cache(maxsize=65536)(
            self._encode_word_uncached
        )

    @classmethod
    def from_file(cls, path: str) -> "BPETokenizer":
        return cls(load_merges(path))

    def _encode_word_uncached(self, word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        ranks = self.ranks
        while len(syms) > 1:
            best_i = -1
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_i < 0:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def encode(self, text: str) -> list[str]:
        """text -> list of subword pieces (last piece of each word ends
        with the end-of-word marker)."""
        out: list[str] = []
        for word in text.split():
            out.extend(self._encode_word(word))
        return out

    @staticmethod
    def detokenize(pieces: list[str]) -> str:
        return "".join(
            p[: -len(END_OF_WORD)] + " " if p.endswith(END_OF_WORD) else p
            for p in pieces
        ).rstrip(" ")


def word_counts_spark(df, text_col: str = "text", top_n: int = 1_000_000):
    """Distributed word -> count aggregate for tokenizer training:
    ONE explode + groupBy (map-side combined), capped at the top_n most
    frequent words so the driver pull is bounded no matter the corpus
    size (the tail of hapax words contributes no mergeable pairs worth
    learning; production tokenizers cap or sample the same way)."""
    from pyspark.sql import functions as F

    counts = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(int(top_n))
    )
    return counts


def train_bpe_spark(df, text_col: str = "text", num_merges: int = 200,
                    top_n: int = 1_000_000) -> list[tuple[str, str]]:
    """Spark word counting + driver-side merge learning."""
    rows = word_counts_spark(df, text_col, top_n).collect()
    return train_bpe({r["word"]: r["count"] for r in rows}, num_merges)
