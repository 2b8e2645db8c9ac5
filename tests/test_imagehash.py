"""Perceptual image hashing + exact banded near-dup join: vectorized ==
loop-built twins, pigeonhole exactness vs brute force, robustness
invariances, decode plumbing, refusals."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentopodata_spark import png as _png
from opentopodata_spark.operators import imagehash as ih


def _imgs(n=12, h=36, w=48, seed=5):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        base = (
            110.0 + 70.0 * np.sin(xx / (2.5 + i) + i)
            + 35.0 * np.cos(yy / (2.0 + 0.3 * i))
            + rng.uniform(-5, 5, (h, w))
        )
        out.append(np.clip(base, 0, 255).astype(np.uint8))
    return out


def test_vectorized_matches_sequential_twins():
    for img in _imgs(6):
        assert ih.phash_bits(img) == ih.phash_sequential(img)
        assert ih.dhash_bits(img) == ih.dhash_sequential(img)
    # RGB path (luma reduction) too
    rgb = np.dstack([_imgs(1)[0], _imgs(1, seed=6)[0], _imgs(1, seed=7)[0]])
    assert ih.phash_bits(rgb) == ih.phash_sequential(rgb)
    assert ih.dhash_bits(rgb) == ih.dhash_sequential(rgb)


def test_resize_area_exactness():
    # constant image resizes to the constant; integral (mass) preserved
    c = np.full((30, 42), 7.25)
    r = ih.resize_area(c, 8, 9)
    np.testing.assert_allclose(r, 7.25, rtol=1e-12)
    a = np.arange(20 * 24, dtype=float).reshape(20, 24)
    r = ih.resize_area(a, 5, 6)
    assert abs(r.mean() - a.mean()) < 1e-9


def test_invariances():
    img = _imgs(1)[0]
    # dHash: global brightness shift flips nothing
    brighter = np.clip(img.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    assert ih.dhash_bits(img) == ih.dhash_bits(brighter)
    # pHash: 2x nearest upscale is a tiny Hamming distance, unrelated
    # images are far
    up = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    d_same = bin(ih.phash_bits(img) ^ ih.phash_bits(up)).count("1")
    assert d_same <= 4, d_same
    other = _imgs(2, seed=99)[1]
    d_diff = bin(ih.phash_bits(img) ^ ih.phash_bits(other)).count("1")
    assert d_diff > 12, d_diff


def test_banded_join_is_exact_vs_brute_force(spark):
    # hash population with planted close pairs at every distance 0..7
    rng = np.random.RandomState(17)
    hashes = []
    base = rng.randint(0, 2 ** 63, 40, dtype=np.int64)
    for i, h in enumerate(base):
        hashes.append((f"a{i:02d}", int(h)))
        d = i % 9  # distances 0..8 — 8 must be EXCLUDED by the join
        flipped = int(h)
        for bit in rng.choice(64, size=d, replace=False):
            flipped ^= 1 << int(bit)
        hashes.append((f"b{i:02d}", np.int64(np.uint64(flipped)).item()))
    df = spark.createDataFrame(hashes, "media_ref string, phash long")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in ih.near_dup_pairs(
            df, hash_col="phash", max_distance=7, n_bands=8).collect()
    }
    want = set()
    for i, (ia, ha) in enumerate(hashes):
        for ib, hb in hashes[i + 1:]:
            d = bin((ha ^ hb) & (2 ** 64 - 1)).count("1")
            if d <= 7:
                want.add((min(ia, ib), max(ia, ib), d))
    assert got == want
    assert any(d == 7 for *_ids, d in want)  # the guarantee boundary


def test_hash_images_decodes_and_nulls(spark):
    imgs = _imgs(3)
    rows = [("p0", _png.encode_png(imgs[0])),
            ("p1", _png.encode_png(imgs[1])),
            ("bad", b"\x00\x01not-an-image"),
            ("nul", None)]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r.media_ref: r for r in ih.hash_images(df).collect()}
    assert got["p0"].phash == ih._to_signed(ih.phash_bits(imgs[0]))
    assert got["p0"].dhash == ih._to_signed(ih.dhash_bits(imgs[0]))
    assert (got["p0"].width, got["p0"].height) == (48, 36)
    assert got["p1"].phash == ih._to_signed(ih.phash_bits(imgs[1]))
    assert got["bad"].phash is None and got["nul"].phash is None


def test_refusals(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "media_ref string, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        ih.near_dup_pairs(df, max_distance=8, n_bands=8)
    with pytest.raises(ValueError, match="divide"):
        ih.near_dup_pairs(df, max_distance=2, n_bands=7)
    # hot bucket: many identical hashes blow the cap loudly
    same = spark.createDataFrame(
        [(f"x{i}", 42) for i in range(30)], "media_ref string, phash long")
    with pytest.raises(RuntimeError, match="max_bucket"):
        ih.near_dup_pairs(same, max_distance=3, n_bands=8, max_bucket=10)


def test_plan_shape(spark):
    # the banded join must be an equi-join on (band, v) — never a
    # cartesian / BNLJ — and the verify predicate must stay codegen
    # (no Python UDF in the pair path; the only Python is the decode)
    df = spark.createDataFrame(
        [(f"m{i}", i * 7919) for i in range(50)],
        "media_ref string, phash long")
    plan = ih.near_dup_pairs(df, max_distance=7, n_bands=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
