"""Embedding similarity search: brute-force cosine top-k, hyperplane-LSH
bucketing, IVF-style coarse search, and embedding near-duplicate pairs.

Engine extras for training-data pipelines (no reference analog). The
dot products run as Catalyst higher-order array expressions
(zip_with + aggregate) — JVM-side, no Python. That is deliberately the
*baseline*; the scale paths are:

* ``hyperplane_lsh_buckets``: partition vectors into 2^n_planes sign
  buckets. At 100 TB, bucket once, bucket-join queries, and brute-force
  only within (bucket ∪ hamming-1 neighbors). The planes here are
  axis-aligned (dims 0..n-1) for cross-engine determinism; production
  would broadcast a seeded random rotation first — same plan shape.
* ``ivf_topk``: inverted-file search — assign every vector to its
  nearest of K centroids (broadcast), then search only the query's
  ``n_probe`` closest cells. Equi-join on cell id => shuffle bounded by
  cell sizes instead of |queries| × |corpus|.

Determinism: sums fold left-to-right over the array in both Spark's
``aggregate`` and the DuckDB oracle's ordered ``list_``/unnest sums, so
doubles match bitwise; results are rounded once at the end anyway.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "text_embed",
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "hyperplane_lsh_buckets",
    "near_duplicate_pairs",
    "ivf_topk",
    "train_kmeans_centroids",
    "train_pq_codebooks",
    "encode_ivfpq",
    "ivfpq_topk",
    "ivfpq_search",
    "semantic_dedup",
]


def train_kmeans_centroids(
    corpus: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means for IVF cell centroids.

    The iterative-algorithm shape that scales to 10^9 vectors:

    * init: k-means++ (D²-weighted, seeded — deterministic) over a
      hash-ordered sample of max(4k, 2048) vectors: the sample comes
      from one top-k-by-xxhash64 scan (TakeOrdered — no full sort, no
      corpus collect), and the D² seeding runs in numpy on the driver.
      Naive k-random-vectors init measurably converges to split-cluster
      local minima; D² seeding is the standard fix;
    * assign: the (k × dim) centroid matrix is a closed-over numpy array
      (centroids are small BY DEFINITION); each Arrow batch computes a
      matrix argmax — a pure map, no crossJoin, no window, no shuffle;
    * update: each task emits ONE partial row per cell it saw
      (cell_id, count, sum-vector) — the map-side combine — and the
      k × num_partitions partial rows (tiny) are reduced on the driver
      in numpy. Per iteration the corpus is scanned once and nothing
      else moves.
    * empty cells keep their previous centroid (standard Lloyd fix).

    Returns (cell_id, centroid) ready for ``ivf_topk``. Determinism: for
    a fixed input layout the partial-sum grouping is fixed, so reruns
    reproduce bitwise; across layouts results agree to float tolerance
    (summation order differs — inherent to any distributed mean).
    Convergence (inertia strictly non-increasing) is pinned in
    tests/test_training_ops.py.
    """
    if k <= 0:
        raise ValueError("k must be positive.")
    # --- init: hash-ordered sample (one TakeOrdered scan) + seeded
    # k-means++ on the driver ---
    n_sample = max(4 * k, 2048)
    seed_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(n_sample)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    X = np.asarray([list(r[vec_col]) for r in seed_rows], dtype=np.float64)
    rng = np.random.default_rng(0)
    chosen = [int(rng.integers(len(X)))]
    d2 = ((X - X[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total <= 0:  # all remaining points coincide with a centroid
            # fill with arbitrary distinct sample rows
            rest = [i for i in range(len(X)) if i not in chosen]
            chosen.append(rest[0])
        else:
            chosen.append(int(rng.choice(len(X), p=d2 / total)))
        d2 = np.minimum(d2, ((X - X[chosen[-1]]) ** 2).sum(axis=1))
    centroids = X[chosen].copy()
    dim = centroids.shape[1]

    spark = corpus.sparkSession
    vecs = corpus.select(vec_col)

    for _ in range(n_iter):
        mat_bc = spark.sparkContext.broadcast(centroids)

        def partials(batches):
            mat = mat_bc.value  # (k, dim)
            counts = np.zeros(len(mat), dtype=np.int64)
            sums = np.zeros_like(mat)
            for pdf in batches:
                v = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                if not len(v):
                    continue
                # nearest centroid by euclidean distance: argmin ||v-c||^2
                # = argmax (v.c - ||c||^2/2); ties -> lowest cell id
                score = v @ mat.T - 0.5 * (mat * mat).sum(axis=1)
                cell = np.argmax(score, axis=1)
                np.add.at(counts, cell, 1)
                np.add.at(sums, cell, v)
            seen = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cell_id": seen.astype(np.int64),
                    "n": counts[seen],
                    "sums": [row for row in sums[seen]],
                }
            )

        rows = vecs.mapInPandas(
            partials, "cell_id long, n long, sums array<double>"
        ).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for r in rows:
            counts[r.cell_id] += r.n
            sums[r.cell_id] += np.asarray(r.sums, dtype=np.float64)
        nonempty = counts > 0
        centroids = np.where(
            nonempty[:, None], sums / np.maximum(counts, 1)[:, None], centroids
        )
        mat_bc.destroy()

    return spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell_id long, centroid array<double>",
    )


def text_embed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    ngram: int = 3,
    normalize: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Hashing-trick character-n-gram embedding: (doc_id, embedding
    array<float> of ``dim``) — the feature-hashing projection (Weinberger
    et al. 2009) that lets the ANN family run end-to-end from raw text
    with no external model. Each char n-gram hashes to a bucket
    (60-bit md5 prefix mod dim — md5 so any SQL engine reproduces it,
    same convention as simhash) with a ±1 sign from an independent high
    bit; bucket weights are signed counts, L2-normalized.

    Plan shape: one md5 + one (bucket, ±1) entry per gram (narrow),
    then TWO integer hash aggregations — (doc, bucket) partial sums with
    map-side combine, then per-doc map assembly — and a dense-vector
    projection. Work is O(grams + dim) per doc and the shuffles carry at
    most ``dim`` rows per document. (A previous revision accumulated
    buckets with a per-bucket aggregate over the gram array — zero
    shuffles but O(dim × grams) work, and higher-order-function
    expressions are NOT whole-stage-codegen'd, so the interpreted
    element loop dominated: 7.9 s → ~1 s on the sf0.1 bench for the
    same output. The shuffle is the cheaper currency here.)

    Contract: ``id_col`` identifies a document uniquely (duplicate ids
    would sum their gram streams into one vector).

    ``partitions``: optional pre-repartition of the input. The gram+md5
    work runs in the SCAN stage, so a few-file input (one parquet file =
    one task) serializes it; a production many-file corpus already has
    scan parallelism and should leave this None. Measured on the
    one-file sf0.1 fixture: 4.0 s -> 1.1 s at 32 cores.
    """
    if dim <= 0 or ngram <= 0:
        raise ValueError("dim and ngram must be positive")
    if partitions:
        df = df.repartition(partitions, id_col)
    from .exprutil import bind_once

    t = F.col(text_col)
    n_grams = F.length(t) - (ngram - 1)
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.substring(t, i, ngram),
        ),
    ).otherwise(F.array().cast("array<string>"))

    # one md5 per gram -> (bucket, sign); explode_outer keeps gram-less
    # docs (they must still emit a zero vector, not vanish)
    entries = F.transform(
        grams,
        lambda g: bind_once(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            lambda h: F.struct(
                F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
                F.when(
                    F.shiftright(h, 55).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                )
                .otherwise(F.lit(-1))
                .cast("long")
                .alias("sign"),
            ),
        ),
    )
    per_bucket = (
        df.select(F.col(id_col).alias("doc_id"), F.explode_outer(entries).alias("e"))
        .groupBy("doc_id", F.col("e.bucket").alias("bucket"))
        .agg(F.sum("e.sign").alias("w"))
    )
    assembled = per_bucket.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("bucket").isNotNull(), F.struct("bucket", "w"))
            )
        ).alias("_m")
    )
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    if not normalize:
        emb = F.transform(weights, lambda w: w.cast("float"))
    else:

        def _norm(ws):
            ss = F.sqrt(
                F.aggregate(
                    ws,
                    F.lit(0.0),
                    lambda acc, w: acc + w.cast("double") * w.cast("double"),
                )
            )
            return F.transform(
                ws,
                lambda w: F.when(ss > 0, w.cast("double") / ss)
                .otherwise(F.lit(0.0))
                .cast("float"),
            )

        emb = bind_once(weights, _norm)
    return assembled.select("doc_id", emb.alias("embedding"))


def dot(a, b):
    """Σ a_i * b_i in double, left-to-right (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank, cos_sim).

    queries is broadcast (the typical shape: few queries, huge corpus),
    so the corpus is scanned once with no shuffle before the per-query
    top-k window. Ties break on neighbor_id for determinism. Self-hits
    (query_id == neighbor_id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qvec"), F.col("cvec")), round_to))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-pattern bucket over the first n_planes dims.

    bucket = Σ_b [v_b > 0] << b. Axis-aligned planes keep the hash
    engine-agnostic; see module docstring for the rotated variant.
    """
    bucket = None
    for b in range(n_planes):
        bit = F.when(
            F.element_at(F.col(vec_col), b + 1).cast("double") > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(
        F.col(id_col).alias("vec_id"), bucket.cast("long").alias("bucket")
    )


def near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding near-duplicates: (vec_a, vec_b, cos_sim >= threshold).

    LSH-blocked: exact cosine is evaluated only for pairs landing in the
    same sign bucket (near-identical vectors always do). The bucket
    equi-join bounds cost by bucket sizes — the 100 TB-safe shape —
    at the price of missing near-dups straddling a hyperplane; raise
    recall with multiple rotated bucketings at scale.
    """
    withb = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(
        hyperplane_lsh_buckets(df, n_planes, id_col, vec_col), "vec_id"
    )
    a = withb.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), "bucket"
    )
    b = withb.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), "bucket"
    )
    return (
        a.join(b, ["bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), round_to))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    centroids: (cell_id, centroid array). Corpus vectors are assigned to
    their single nearest cell; each query probes its n_probe nearest
    cells; candidates = equi-join on cell_id; exact cosine + window
    top-k on the candidates only.

    Cell assignment is a NARROW projection: the centroid matrix (small by
    definition — K cells) is collected once and closed over by an
    Arrow-batched pandas UDF that computes a per-batch matrix argmax
    (batch × K matmul on unit-normalized centroids). No crossJoin, no
    window, no exchange on the corpus side before the cell-id join — at
    10^9 vectors × 1024 centroids the former crossJoin+window shape was a
    10^12-row sort; this is a pure map. The only corpus shuffle left is
    the cell-id candidate equi-join itself.
    """
    cell_ids, unit = _centroid_arrays(centroids)

    def _sims(vec_series: pd.Series) -> np.ndarray:
        v = np.asarray(list(vec_series), dtype=np.float64)  # (batch, dim)
        return v @ unit.T  # (batch, K)

    # mapInPandas (not a scalar pandas_udf in a projection) on purpose:
    # Catalyst infers IsNotNull(cell_id) from the downstream equi-join and
    # rewrites it through a projection, cloning the UDF into a second
    # ArrowEvalPython stage (2x the assignment cost). mapInPandas is
    # opaque to predicate rewriting, so assignment runs exactly once —
    # under any session config.
    def assign_corpus(batches):
        for pdf in batches:
            out = pdf.rename(columns={id_col: "neighbor_id", vec_col: "cvec"})
            # argmax takes the first max -> lowest cell_id wins exact ties
            out["cell_id"] = cell_ids[np.argmax(_sims(out["cvec"]), axis=1)]
            yield out

    def probe_queries(batches):
        for pdf in batches:
            # stable argsort on -sims: ties keep ascending cell_id order
            order = np.argsort(-_sims(pdf[vec_col]), axis=1, kind="stable")[
                :, :n_probe
            ]
            out = pdf.loc[pdf.index.repeat(order.shape[1])].reset_index(drop=True)
            out = out.rename(columns={id_col: "query_id", vec_col: "qvec"})
            out["cell_id"] = cell_ids[order].ravel()
            yield out

    vec_type = dict(zip(corpus.columns, [f.dataType.simpleString() for f in corpus.schema]))[vec_col]
    id_type = dict(zip(corpus.columns, [f.dataType.simpleString() for f in corpus.schema]))[id_col]
    c = corpus.select(id_col, vec_col).mapInPandas(
        assign_corpus, f"neighbor_id {id_type}, cvec {vec_type}, cell_id long"
    )
    q = queries.select(id_col, vec_col).mapInPandas(
        probe_queries, f"query_id {id_type}, qvec {vec_type}, cell_id long"
    )
    scored = (
        c.join(q, ["cell_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("qvec"), F.col("cvec")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _centroid_arrays(coarse_centroids: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect the (tiny, broadcast-sized) coarse-centroid frame ONCE into
    (cell_ids, unit-normalized row matrix). Cosine ranking is invariant to
    the vector's own norm, so argmax over ``unit`` — first max, i.e.
    lowest cell_id on exact ties — IS the cell-assignment rule; every IVF
    entry point shares it through this helper."""
    rows = sorted(
        coarse_centroids.select("cell_id", "centroid").collect(),
        key=lambda r: r.cell_id,
    )
    if not rows:
        raise ValueError(
            "coarse_centroids is empty — train centroids first "
            "(train_kmeans_centroids)"
        )
    cell_ids = np.asarray([r.cell_id for r in rows], dtype=np.int64)
    mat = np.asarray([list(r.centroid) for r in rows], dtype=np.float64)
    return cell_ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _codebook_tensor(codebooks: DataFrame) -> np.ndarray:
    """(m, ksub, dsub) float64 tensor from a (sub_id, code_id, codeword)
    frame. Codebooks are tiny by construction (m*ksub rows), so collecting
    them is the PQ equivalent of broadcasting the IVF centroid matrix."""
    rows = codebooks.select("sub_id", "code_id", "codeword").collect()
    if not rows:
        raise ValueError(
            "codebooks is empty — train codebooks first (train_pq_codebooks)"
        )
    m = max(r.sub_id for r in rows) + 1
    ksub = max(r.code_id for r in rows) + 1
    dsub = len(rows[0].codeword)
    cb = np.zeros((m, ksub, dsub), dtype=np.float64)
    seen = set()
    for r in rows:
        cb[r.sub_id, r.code_id] = np.asarray(list(r.codeword), dtype=np.float64)
        seen.add((r.sub_id, r.code_id))
    if len(seen) != m * ksub:
        raise ValueError(
            f"codebooks must cover every (sub_id, code_id) in "
            f"[0,{m})x[0,{ksub}); got {len(seen)} of {m * ksub}"
        )
    return np.ascontiguousarray(cb)


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks: the embedding is split into ``m``
    contiguous subspaces and an independent ``ksub``-center k-means
    (train_kmeans_centroids — the same distributed Lloyd's) runs per
    subspace on the sliced vectors. Returns (sub_id, code_id, codeword).

    m distributed k-means passes over dim/m-wide slices — same total work
    as one k-means at full dim."""
    first = corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError(
            f"corpus has no non-null '{vec_col}' rows — cannot train PQ codebooks"
        )
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    dsub = dim // m
    parts = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col)
        )
        cents = train_kmeans_centroids(
            sub, ksub, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
        parts.append(
            cents.select(
                F.lit(s).alias("sub_id"),
                F.col("cell_id").cast("int").alias("code_id"),
                F.col("centroid").alias("codeword"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def encode_ivfpq(
    corpus: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ encoding: (vec_id, cell_id, codes) — the 100 TB index shape.

    One narrow mapInPandas pass (coarse centroids and PQ codebooks are
    both broadcast-sized): each vector gets its nearest coarse cell
    (cosine argmax, identical rule to ivf_topk) and an m-entry PQ code
    (per-subspace L2-nearest codeword, lowest code_id on exact ties).
    A 1024-dim float32 vector (4 KB) compresses to m small ints — the
    candidate stream a search shuffles is orders of magnitude smaller
    than raw vectors, which is the entire point of PQ at corpus scale."""
    return _encode_ivfpq(
        corpus, _centroid_arrays(coarse_centroids), _codebook_tensor(codebooks),
        id_col, vec_col,
    )


def _encode_ivfpq(
    corpus: DataFrame,
    cent: tuple[np.ndarray, np.ndarray],
    cb: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """encode_ivfpq body over pre-collected (cell_ids, unit) / codebook
    arrays, so composite pipelines (ivfpq_topk) collect each tiny frame
    exactly once instead of re-running its plan per consumer."""
    cell_ids, unit = cent
    m, ksub, dsub = cb.shape
    # argmin_c ||v - cw||^2 == argmin_c (||cw||^2 - 2 v.cw): ||v||^2 cancels
    cw_sq = (cb**2).sum(axis=2)  # (m, ksub)

    def encode(batches):
        for pdf in batches:
            v = np.ascontiguousarray(
                np.asarray(list(pdf[vec_col]), dtype=np.float64)
            )
            out = pdf[[id_col]].rename(columns={id_col: "vec_id"})
            out["cell_id"] = cell_ids[np.argmax(v @ unit.T, axis=1)]
            vs = v.reshape(len(v), m, dsub)
            d2 = cw_sq[None, :, :] - 2.0 * np.einsum("bmd,mkd->bmk", vs, cb)
            codes = np.argmin(d2, axis=2).astype(np.int32)  # first min wins
            out["codes"] = list(codes)
            yield out

    id_type = dict(
        zip(corpus.columns, [f.dataType.simpleString() for f in corpus.schema])
    )[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        encode, f"vec_id {id_type}, cell_id long, codes array<int>"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ approximate top-k by asymmetric distance computation (ADC):
    the classic Jégou et al. 2011 scheme (public), inner-product variant.

    Raw corpus vectors are never shuffled: the index side is
    encode_ivfpq's (vec_id, cell_id, m-int codes) stream. Queries probe
    their n_probe nearest coarse cells (same rule as ivf_topk),
    candidates come from the cell-id equi-join, and each candidate is
    scored WITHOUT its raw vector:
    approx_sim = sum_s q_sub(s) . codeword[s, codes[s]] — per Arrow batch
    one einsum builds the (batch, m, ksub) query/codeword table and a
    take_along_axis gathers each candidate's m entries.

    vs ivf_topk (which joins raw vectors): the shuffled candidate payload
    shrinks from dim floats to m ints, and per-candidate scoring flops
    drop from dim to m once the table is built — the standard PQ
    memory/recall trade (recall bounded by quantization error; pytest
    pins recall on the clustered fixture). The einsum reduction runs over
    the contiguous dsub axis only, so every scored value is independent
    of Arrow batch composition — bit-reproducible against the
    single-process oracle."""
    cent = _centroid_arrays(coarse_centroids)
    cb = _codebook_tensor(codebooks)
    index = _encode_ivfpq(corpus, cent, cb, id_col, vec_col)
    return _ivfpq_search(
        index, queries, cent, cb,
        k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
        round_to=round_to,
    )


def ivfpq_search(
    index: DataFrame,
    queries: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """ADC search over a PREBUILT IVF-PQ index (vec_id, cell_id, codes) —
    the encode-once / search-many production split: a 100 TB corpus pays
    its one encoding scan when the index is built (jobs/ann.py
    build-index) and every query batch afterwards touches only the
    m-int code stream of the probed cells."""
    return _ivfpq_search(
        index, queries, _centroid_arrays(coarse_centroids),
        _codebook_tensor(codebooks),
        k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
        round_to=round_to,
    )


def _ivfpq_search(
    index: DataFrame,
    queries: DataFrame,
    cent: tuple[np.ndarray, np.ndarray],
    cb: np.ndarray,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    round_to: int,
) -> DataFrame:
    """ivfpq_search body over pre-collected centroid/codebook arrays (see
    _encode_ivfpq)."""
    cell_ids, unit = cent
    m, ksub, dsub = cb.shape

    index = index.withColumnRenamed("vec_id", "neighbor_id")

    def probe_queries(batches):
        for pdf in batches:
            v = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            order = np.argsort(-(v @ unit.T), axis=1, kind="stable")[:, :n_probe]
            out = pdf.loc[pdf.index.repeat(order.shape[1])].reset_index(drop=True)
            out = out.rename(columns={id_col: "query_id", vec_col: "qvec"})
            out["cell_id"] = cell_ids[order].ravel()
            yield out

    types = dict(
        zip(queries.columns, [f.dataType.simpleString() for f in queries.schema])
    )
    id_type, vec_type = types[id_col], types[vec_col]
    q = queries.select(id_col, vec_col).mapInPandas(
        probe_queries, f"query_id {id_type}, qvec {vec_type}, cell_id long"
    )

    cands = index.join(q, ["cell_id"]).where(
        F.col("query_id") != F.col("neighbor_id")
    )

    def adc_score(batches):
        for pdf in batches:
            qv = np.ascontiguousarray(
                np.asarray(list(pdf["qvec"]), dtype=np.float64)
            ).reshape(len(pdf), m, dsub)
            lut = np.einsum("bmd,mkd->bmk", qv, cb)  # (b, m, ksub)
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (b, m)
            sim = np.take_along_axis(lut, codes[:, :, None], axis=2)[
                :, :, 0
            ].sum(axis=1)
            out = pdf[["query_id", "neighbor_id"]].copy()
            out["approx_sim"] = sim
            yield out

    scored = cands.mapInPandas(
        adc_score, f"query_id {id_type}, neighbor_id {id_type}, approx_sim double"
    ).withColumn("approx_sim", F.round(F.col("approx_sim"), round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_sim")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    eps: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning via cluster-then-compare.

    Every vector is assigned to its max-cosine centroid (one NARROW
    mapInPandas pass, centroids broadcast by closure — k x dim is small
    by definition); within each cluster, items are visited from the
    FARTHEST-from-centroid inward (the paper's keep-the-low-
    centroid-similarity rule, ties by id) and an item is dropped when
    its cosine to any already-kept cluster member exceeds ``1 - eps``.
    Returns (vec_id, cell_id, centroid_cos, keep).

    Scale shape: the ONE shuffle is groupBy(cell_id) — O(corpus) rows
    carrying (id, vec); the within-cluster sweep is vectorized
    (kept-matrix dot per item) and bounded by ``max_cluster`` with a
    LOUD refusal, the LSH-bucket discipline — a degenerate centroid set
    must not silently become an all-pairs task. Raw pairwise work never
    crosses clusters, which is the paper's own scalability argument.

    Determinism: every cosine is rounded to ``round_to`` dp BEFORE any
    comparison (assignment argmax, first-occurrence tie -> lowest
    cell_id; greedy threshold; sort keys), so results are
    layout-independent and an independent per-pair twin reproduces them
    exactly.
    """
    if not (0 < eps < 1):
        raise ValueError("eps must be in (0, 1)")
    cent_ids, unitC = _centroid_arrays(centroids)  # already unit rows
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((cent_ids, unitC))

    def assign(batches):
        ids_c, U = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            nv = np.sqrt((V * V).sum(axis=1))
            cos = np.round(
                (V @ U.T) / np.maximum(nv, 1e-300)[:, None], round_to
            )
            best = np.argmax(cos, axis=1)  # first max -> lowest cell
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(np.int64),
                "vec": list(pdf[vec_col]),
                "cell_id": ids_c[best].astype(np.int64),
                "centroid_cos": cos[np.arange(len(V)), best],
            })

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign,
        "vec_id long, vec array<float>, cell_id long,"
        " centroid_cos double",
    )
    thr = 1.0 - eps

    def sweep(key, pdf):
        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster {int(key[0])} has {len(pdf)} > max_cluster="
                f"{max_cluster} vectors — the within-cluster sweep is "
                "O(n^2); train more centroids or raise max_cluster"
            )
        pdf = pdf.sort_values(["centroid_cos", "vec_id"],
                              kind="stable")
        V = np.asarray(list(pdf["vec"]), dtype=np.float64)
        nv = np.sqrt((V * V).sum(axis=1))
        keep = np.zeros(len(pdf), dtype=bool)
        kept_rows: list[int] = []
        for i in range(len(pdf)):
            if kept_rows:
                K = V[kept_rows]
                kn = nv[kept_rows]
                sims = np.round(
                    (K @ V[i]) / np.maximum(kn * nv[i], 1e-300),
                    round_to,
                )
                if (sims > thr).any():
                    continue
            keep[i] = True
            kept_rows.append(i)
        out = pdf[["vec_id", "cell_id", "centroid_cos"]].copy()
        out["keep"] = keep
        return out

    return assigned.groupBy("cell_id").applyInPandas(
        sweep,
        "vec_id long, cell_id long, centroid_cos double, keep boolean",
    )
