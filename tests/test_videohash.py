"""Perceptual video fingerprint: twin bit-equality, frame-rate/noise
robustness, decode plumbing, pair join reuse."""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import y4m as _y4m
from opentopodata_spark.operators import videohash as vh
from opentopodata_spark.operators.imagehash import _to_signed

YY, XX = np.mgrid[0:36, 0:48]


def _clip(i, n=8, seed=0, noise=5.0):
    r = np.random.RandomState(100 + seed)
    frames = []
    for f in range(n):
        img = (120 + 60 * np.sin(XX / (3.0 + i) + i + 0.3 * f)
               + 40 * np.cos(YY / (2.0 + 0.5 * i) - 0.2 * f)
               + noise * r.randn(36, 48))
        frames.append(np.clip(img, 0, 255))
    return np.array(frames).astype(np.uint8)


def test_twin_equality_and_robustness():
    for i in range(4):
        c = _clip(i, seed=i)
        h = vh.videohash_bits(c)
        assert h == vh.videohash_sequential(c)
        # per-pixel +-1 noise twin: tiny distance
        tw = np.clip(
            c.astype(np.int32)
            + np.random.RandomState(7 + i).choice([-1, 0, 1], c.shape),
            0, 255).astype(np.uint8)
        assert bin(h ^ vh.videohash_bits(tw)).count("1") <= 7
    # the mean is order- and rate-free: a static scene hashes
    # identically at any frame count or order (smooth SYNTHETIC motion
    # is deliberately not pinned — median-threshold pHash bits hover
    # near the cut on noise-free gradients; the noise-twin and
    # unrelated-distance pins above are the meaningful contract)
    still = np.repeat(_clip(2, n=1, seed=9), 8, axis=0)
    assert vh.videohash_bits(still) == vh.videohash_bits(still[:3])
    assert vh.videohash_bits(still) == vh.videohash_bits(still[::-1])
    hs = [vh.videohash_bits(_clip(i, seed=i)) for i in range(6)]
    dd = [bin(a ^ b).count("1") for i, a in enumerate(hs)
          for b in hs[i + 1:]]
    assert min(dd) > 14
    with pytest.raises(ValueError, match="n_frames"):
        vh.videohash_bits(np.zeros((36, 48)))


def test_hash_video_and_pairs(spark):
    rows = []
    for i in range(4):
        c = _clip(i, seed=i)
        rows.append((f"v{i}", _y4m.encode_y4m(c)))
        tw = np.clip(
            c.astype(np.int32)
            + np.random.RandomState(50 + i).choice([-1, 0, 1], c.shape),
            0, 255).astype(np.uint8)
        rows.append((f"v{i}t", _y4m.encode_y4m(tw)))
    rows.append(("bad", b"not video"))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    hashed = vh.hash_video(df)
    got = {r.media_ref: r for r in hashed.collect()}
    assert got["v0"].vhash == _to_signed(
        vh.videohash_bits(_clip(0, seed=0)))
    assert (got["v0"].n_frames, got["v0"].width, got["v0"].height) == (
        8, 48, 36)
    assert got["bad"].vhash is None
    pairs = {(r.id_a, r.id_b) for r in
             vh.video_near_dup_pairs(hashed, max_distance=7).collect()}
    for i in range(4):
        assert (f"v{i}", f"v{i}t") in pairs, i
    assert all(a[:2] == b[:2] for a, b in pairs)
