"""SemDeDup: embedding-cluster semantic near-duplicate pruning.

Anchors: keep-farthest-from-centroid golden, greedy chain behavior,
distributed == an independent per-pair twin on random corpora with
synthesized near-dups, cluster-cap refusal.
"""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark.operators.embeddings import semantic_dedup


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _corpus_df(spark, ids, vecs):
    return _df(
        spark,
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )


def _cents_df(spark, cents):
    return _df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell_id long, centroid array<double>",
    )


def _twin(ids, vecs, cents, eps, round_to=6):
    """Independent per-pair replay: assignment + farthest-first greedy,
    scalar np.dot per pair, everything rounded before comparing."""
    V = np.asarray(vecs, dtype=np.float64)
    C = np.asarray(cents, dtype=np.float64)
    U = C / np.linalg.norm(C, axis=1, keepdims=True)
    items = []
    for i, vid in enumerate(ids):
        v = np.asarray(V[i].astype(np.float32), dtype=np.float64)
        nv = float(np.sqrt(np.dot(v, v)))
        cos = [round(float(np.dot(v, U[j])) / max(nv, 1e-300), round_to)
               for j in range(len(U))]
        best = int(np.argmax(cos))
        items.append((int(vid), best, cos[best], v, nv))
    out = []
    thr = 1.0 - eps
    for cell in sorted({it[1] for it in items}):
        mem = sorted((it for it in items if it[1] == cell),
                     key=lambda it: (it[2], it[0]))
        kept = []
        for vid, _c, ccos, v, nv in mem:
            dup = any(
                round(float(np.dot(v, kv)) / max(nv * knv, 1e-300),
                      round_to) > thr
                for _kid, kv, knv in kept
            )
            if not dup:
                kept.append((vid, v, nv))
            out.append((vid, cell, ccos, not dup))
    return sorted(out)


def _run(spark, ids, vecs, cents, eps, **kw):
    rows = semantic_dedup(
        _corpus_df(spark, ids, vecs), _cents_df(spark, cents),
        eps=eps, **kw,
    ).collect()
    return sorted((r.vec_id, r.cell_id, r.centroid_cos, r.keep)
                  for r in rows)


class TestGoldens:
    def test_farthest_from_centroid_is_kept(self, spark):
        # two near-identical vectors; id 1 is farther from the centroid
        cents = [[1.0, 0.0], [0.0, 1.0]]
        vecs = [[1.0, 0.05], [1.0, 0.30]]
        got = _run(spark, [0, 1], vecs, cents, eps=0.05)
        by_id = {r[0]: r for r in got}
        assert by_id[1][3] is True and by_id[0][3] is False
        assert by_id[0][1] == 0 and by_id[1][1] == 0

    def test_distinct_vectors_all_kept(self, spark):
        cents = [[1.0, 0.0], [0.0, 1.0]]
        vecs = [[1.0, 0.1], [0.1, 1.0], [-1.0, 0.4]]
        got = _run(spark, [0, 1, 2], vecs, cents, eps=0.05)
        assert all(r[3] for r in got)

    def test_greedy_chain(self, spark):
        # a ~ b, b ~ c, a !~ c at eps=0.002: farthest-first keeps a and
        # c (b dropped against a) — the chain does NOT collapse to one
        ang = [0.00, 0.05, 0.10]  # radians; cos(0.05)≈0.99875
        vecs = [[float(np.cos(t)), float(np.sin(t))] for t in ang]
        cents = [[1.0, 0.0]]
        got = _run(spark, [0, 1, 2], vecs, cents, eps=0.002)
        by_id = {r[0]: r[3] for r in got}
        assert by_id[2] is True    # farthest kept first
        assert by_id[1] is False   # ~ both, dropped
        assert by_id[0] is True    # !~ kept c2

    def test_eps_validation(self, spark):
        with pytest.raises(ValueError, match="eps"):
            semantic_dedup(
                _corpus_df(spark, [0], [[1.0, 0.0]]),
                _cents_df(spark, [[1.0, 0.0]]), eps=1.5,
            )

    def test_cluster_cap_refused(self, spark):
        vecs = [[1.0, float(i) * 1e-4] for i in range(20)]
        with pytest.raises(Exception, match="max_cluster"):
            semantic_dedup(
                _corpus_df(spark, range(20), vecs),
                _cents_df(spark, [[1.0, 0.0]]), eps=0.5,
                max_cluster=10,
            ).collect()


class TestTwinEquality:
    @pytest.mark.parametrize("eps", [0.05, 0.35])
    def test_random_corpus_with_dups(self, spark, eps):
        rng = np.random.default_rng(17)
        base = rng.normal(size=(120, 16))
        # synthesized near-dups: perturbed copies of every 3rd vector
        dup = base[::3] * (1.0 + 0.001 * rng.normal(size=(40, 16)))
        vecs = np.vstack([base, dup]).astype(np.float32)
        ids = list(range(120)) + [1000 + i for i in range(40)]
        cents = rng.normal(size=(8, 16))
        got = _run(spark, ids, list(vecs), list(cents), eps=eps)
        want = _twin(ids, list(vecs), list(cents), eps=eps)
        assert got == want
        if eps == 0.05:
            dropped = sum(1 for r in got if not r[3])
            assert dropped >= 30  # the synthesized dups actually drop

    def test_layout_independence(self, spark):
        rng = np.random.default_rng(23)
        vecs = rng.normal(size=(60, 8)).astype(np.float32)
        cents = rng.normal(size=(4, 8))
        ids = list(range(60))
        a = _run(spark, ids, list(vecs), list(cents), eps=0.3)
        # different partitioning of the same input
        df = _corpus_df(spark, ids, list(vecs)).repartition(13)
        rows = semantic_dedup(df, _cents_df(spark, list(cents)),
                              eps=0.3).collect()
        b = sorted((r.vec_id, r.cell_id, r.centroid_cos, r.keep)
                   for r in rows)
        assert a == b
