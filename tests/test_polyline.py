"""Polyline codec: scalar/vectorized parity + adversarial inputs.

decode() mirrors the reference's `polyline` package semantics
(/root/reference/opentopodata/api.py:302-340); decode_batch() is the
vectorized Arrow-batch hot path and must agree with decode() on EVERY
input, including ones where decode() raises (-> None).
"""

import time

import numpy as np
import pytest

from opentopodata_spark import polyline_codec as pc

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


def scalar_or_none(s):
    try:
        return pc.decode(s)
    except ValueError:
        return None


def test_roundtrip_simple():
    coords = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
    assert pc.decode(pc.encode(coords)) == coords


def test_known_google_example():
    # the canonical example from Google's polyline algorithm docs
    assert pc.decode("_p~iF~ps|U_ulLnnqC_mqNvxq`@") == [
        (38.5, -120.2), (40.7, -120.95), (43.252, -126.453)
    ]


def test_batch_matches_scalar_random_roundtrips():
    rng = np.random.default_rng(7)
    strings = []
    for _ in range(500):
        n = int(rng.integers(1, 9))
        coords = [
            (round(float(rng.uniform(-90, 90)), 5),
             round(float(rng.uniform(-180, 180)), 5))
            for _ in range(n)
        ]
        strings.append(pc.encode(coords))
    got = pc.decode_batch(strings)
    for s, g in zip(strings, got):
        assert g == scalar_or_none(s)


def test_batch_matches_scalar_adversarial():
    rng = np.random.default_rng(8)
    strings = []
    # random polyline-alphabet garbage (mostly truncated / out-of-range)
    for _ in range(1000):
        L = int(rng.integers(1, 40))
        strings.append("".join(chr(c) for c in rng.integers(63, 127, L)))
    strings += [
        "ridge", "valley", "_" * 25, "~" * 41, "?", "??", "a" * 13 + "b",
        "\x7f" * 7, "A",
        # chars below the alphabet offset -> invalid character
        "_p~iF~ps|U" + chr(40),
        # long varints (int64-overflow territory -> scalar fallback path)
        *("z" * k + "A" for k in range(10, 22)),
        # non-latin-1 -> whole batch falls back to scalar semantics
        "éé",
    ]
    got = pc.decode_batch(strings)
    for s, g in zip(strings, got):
        assert g == scalar_or_none(s), repr(s)


def test_batch_none_and_empty():
    assert pc.decode_batch([None, "", "_p~iF~ps|U"]) == [
        None, None, [(38.5, -120.2)]
    ]


if HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=63, max_codepoint=126),
                min_size=0,
                max_size=60,
            ),
            min_size=0,
            max_size=20,
        )
    )
    def test_batch_matches_scalar_hypothesis(strings):
        got = pc.decode_batch(strings)
        for s, g in zip(strings, got):
            assert g == (scalar_or_none(s) if s else None)


def test_batch_is_faster_on_valid_polylines():
    """The vectorized decoder must beat the scalar loop on realistic
    batches (conservative 1.3x bar to avoid CI flakes; measured ~2x on
    this VM — see docs/BENCH.md)."""
    rng = np.random.default_rng(9)
    strings = []
    for _ in range(2000):
        n = int(rng.integers(2, 6))
        coords = [
            (round(float(rng.uniform(-90, 90)), 5),
             round(float(rng.uniform(-180, 180)), 5))
            for _ in range(n)
        ]
        strings.append(pc.encode(coords))
    pc.decode_batch(strings[:100])  # warm numpy kernels
    big = strings * 5
    t0 = time.time()
    for s in big:
        scalar_or_none(s)
    t1 = time.time()
    best = float("inf")
    for _ in range(3):
        ts = time.time()
        pc.decode_batch(big)
        best = min(best, time.time() - ts)
    assert (t1 - t0) / best > 1.3
