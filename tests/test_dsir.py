"""DSIR importance weighting + Gumbel-top-k resampling.

Anchors: direction golden (target-looking docs weigh higher), exact
equality vs a pure-Python twin (hash, smoothing, integer micro-sum,
md5 gumbel), empty-doc discipline, layout independence, refusals.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from opentopodata_spark.operators.dsir import (
    HASH_MOD, dsir_sample, dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# -- pure-Python twin ------------------------------------------------------

def _twin_grams(text):
    t = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", (text or "").lower())
               ).strip()
    toks = [w for w in t.split(" ") if w]
    grams = list(toks)
    if len(toks) >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return grams


def _twin_bucket(gram, n_buckets):
    acc = 0
    for ch in gram:
        acc = (acc * 31 + ord(ch)) % HASH_MOD
    return acc % n_buckets


def _twin_weights(raw, target, n_buckets, smoothing):
    def counts(docs):
        c: dict[int, int] = {}
        for _i, txt in docs:
            for g in _twin_grams(txt):
                b = _twin_bucket(g, n_buckets)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target), counts(raw)
    dt = sum(ct.values()) + smoothing * n_buckets
    dr = sum(cr.values()) + smoothing * n_buckets
    micro = {
        b: int(round((math.log((ct.get(b, 0) + smoothing) / dt)
                      - math.log((cr.get(b, 0) + smoothing) / dr))
                     * 1e6))
        for b in range(n_buckets)
    }
    out = {}
    for did, txt in raw:
        grams = _twin_grams(txt)
        w = sum(micro[_twin_bucket(g, n_buckets)] for g in grams)
        out[did] = (len(grams), w / 1e6)
    return out


def _twin_sample(raw, target, k, n_buckets, smoothing, seed="dsir"):
    w = _twin_weights(raw, target, n_buckets, smoothing)
    rows = []
    for did, (ng, lw) in w.items():
        h = hashlib.md5(f"{seed}#{did}".encode()).hexdigest()[:6]
        u = (int(h, 16) + 0.5) / 16777216.0
        gk = round(lw - math.log(-math.log(u)), 6)
        rows.append([did, ng, lw, gk])
    order = sorted(rows, key=lambda r: (-r[3], r[0]))
    chosen = {r[0] for r in order[:k]}
    return sorted(
        (r[0], r[1], r[2], r[3], r[0] in chosen) for r in rows
    )


def _mk_corpora():
    # target talks about terrain; raw mixes terrain docs with noise
    target = [(f"t{i}", f"elevation raster tile {i} slope aspect")
              for i in range(8)]
    raw = []
    for i in range(30):
        if i % 3 == 0:
            raw.append((f"r{i}", f"raster elevation slope tile {i}"))
        else:
            raw.append((f"r{i}", f"stock market report {i} quarterly"))
    raw.append(("r_empty", "   "))
    raw.append(("r_null", None))
    return raw, target


class TestWeights:
    def test_direction_and_twin_equality(self, spark):
        raw, target = _mk_corpora()
        got = {
            r.doc_id: (r.n_grams, r.log_weight)
            for r in dsir_weights(
                _docs(spark, raw), _docs(spark, target),
                n_buckets=512, smoothing=0.5,
            ).collect()
        }
        want = _twin_weights(raw, target, 512, 0.5)
        assert got == want
        terrainish = [got[f"r{i}"][1] for i in range(0, 30, 3)]
        noise = [got[f"r{i}"][1] for i in range(30) if i % 3]
        assert min(terrainish) > max(noise)

    def test_empty_and_null_docs(self, spark):
        raw, target = _mk_corpora()
        got = {r.doc_id: r for r in dsir_weights(
            _docs(spark, raw), _docs(spark, target), n_buckets=64,
        ).collect()}
        assert got["r_empty"].n_grams == 0
        assert got["r_empty"].log_weight == 0.0
        assert got["r_null"].n_grams == 0

    def test_refusals(self, spark):
        raw, target = _mk_corpora()
        with pytest.raises(ValueError, match="n_buckets"):
            dsir_weights(_docs(spark, raw), _docs(spark, target),
                         n_buckets=1)
        with pytest.raises(ValueError, match="smoothing"):
            dsir_weights(_docs(spark, raw), _docs(spark, target),
                         smoothing=0.0)
        with pytest.raises(ValueError, match="k"):
            dsir_sample(_docs(spark, raw), _docs(spark, target), 0)


class TestSample:
    def test_twin_equality_and_k(self, spark):
        raw, target = _mk_corpora()
        rows = dsir_sample(
            _docs(spark, raw), _docs(spark, target), 10,
            n_buckets=512, smoothing=0.5,
        ).collect()
        got = sorted((r.doc_id, r.n_grams, r.log_weight, r.gumbel_key,
                      r.selected) for r in rows)
        want = _twin_sample(raw, target, 10, 512, 0.5)
        assert got == want
        assert sum(1 for r in got if r[4]) == 10

    def test_layout_independence(self, spark):
        raw, target = _mk_corpora()
        a = sorted(
            (r.doc_id, r.gumbel_key, r.selected)
            for r in dsir_sample(
                _docs(spark, raw), _docs(spark, target), 7,
                n_buckets=256,
            ).collect()
        )
        b = sorted(
            (r.doc_id, r.gumbel_key, r.selected)
            for r in dsir_sample(
                _docs(spark, raw).repartition(11),
                _docs(spark, target).repartition(5), 7,
                n_buckets=256,
            ).collect()
        )
        assert a == b

    def test_k_larger_than_corpus_selects_all(self, spark):
        raw, target = _mk_corpora()
        rows = dsir_sample(
            _docs(spark, raw), _docs(spark, target), 10_000,
            n_buckets=64,
        ).collect()
        assert all(r.selected for r in rows)
