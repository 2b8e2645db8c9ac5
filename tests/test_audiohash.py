"""Perceptual audio fingerprint: twin bit-equality, gain invariance,
planted distances, decode plumbing, pair join reuse."""

from __future__ import annotations

import numpy as np
import pytest

from opentopodata_spark import wav as _wav
from opentopodata_spark.operators import audiohash as ah
from opentopodata_spark.operators.imagehash import _to_signed


def _clip(i, n=8000, noise=0.05, seed=11):
    rng = np.random.RandomState(seed + i)
    t = np.arange(n) / 8000.0
    return (0.5 * np.sin(2 * np.pi * (200 + 60 * i) * t)
            + 0.3 * np.sin(2 * np.pi * (900 + 120 * i) * t + i)
            + noise * rng.randn(n))


def test_vectorized_matches_sequential_and_gain_invariance():
    for i in range(6):
        c = _clip(i)
        h = ah.audiohash_bits(c)
        assert h == ah.audiohash_sequential(c)
        assert ah.audiohash_bits(c * 0.25) == h      # volume invariant
        assert ah.audiohash_bits(np.stack([c, c], axis=1)) == h  # stereo
    # unrelated clips are far apart
    hs = [ah.audiohash_bits(_clip(i)) for i in range(6)]
    dd = [bin(a ^ b).count("1") for i, a in enumerate(hs)
          for b in hs[i + 1:]]
    assert min(dd) > 14


def test_too_short_refuses():
    with pytest.raises(ValueError, match="too short"):
        ah.audiohash_bits(np.zeros(64))


def test_hash_audio_and_pairs(spark):
    rows = []
    for i in range(5):
        c = _clip(i)
        rows.append((f"a{i}", _wav.encode_wav(c, 8000)))
        rng = np.random.RandomState(99 + i)
        rows.append((f"a{i}t",
                     _wav.encode_wav(c + 0.005 * rng.randn(len(c)), 8000)))
    rows.append(("bad", b"not audio"))
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    hashed = ah.hash_audio(df)
    got = {r.media_ref: r for r in hashed.collect()}
    assert got["a0"].ahash == _to_signed(ah.audiohash_bits(_clip(0)))
    assert got["a0"].sample_rate == 8000 and got["a0"].n_samples == 8000
    assert got["bad"].ahash is None
    pairs = {(r.id_a, r.id_b) for r in
             ah.audio_near_dup_pairs(hashed, max_distance=7).collect()}
    # every planted twin pair found (16-bit PCM quantization +- light
    # noise stays within 7 bits for these clips), nothing else
    for i in range(5):
        assert (f"a{i}", f"a{i}t") in pairs, i
    assert all(a[:2] == b[:2] for a, b in pairs)
