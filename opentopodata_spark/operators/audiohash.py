"""Perceptual audio fingerprinting: spectral-band hash + the exact
Hamming band join — the audio sibling of operators/imagehash.py.

A crawl's audio tail carries re-encoded / gain-shifted / padded copies
that byte-level dedup never sees. Each clip reduces to a 64-bit
fingerprint:

* mono-mix, split into 16 equal time segments;
* per segment, 4 log-spaced frequency-band energies from the real FFT,
  normalized by the segment's total energy (GAIN invariance — the
  fingerprint is unchanged under volume scaling);
* bit(b, s) = band b's share in segment s above the MEDIAN share of
  band b across segments (per-band adaptive threshold — robust to
  codec-flat spectral tilt), 64 bits = 4 bands x 16 segments, MSB
  first, band-major.

Shares are 6dp-quantized before the median/compare so the vectorized
rFFT path and the DFT-matrix sequential twin (different numerics on
purpose) produce identical bits — the imagehash discipline.

Pair finding reuses the pigeonhole band join (imagehash.near_dup_pairs
— exact for Hamming d < n_bands, band keys only shuffle, loud
max_bucket); decoding rides wav.py's pure-numpy PCM/G.711/IMA-ADPCM
reader inside one Arrow-batched mapInPandas (undecodable payloads ->
null, data not errors).

No reference analog; part of the multimodal training-data family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "audiohash_bits", "audiohash_sequential", "hash_audio",
    "audio_near_dup_pairs",
]

N_SEGMENTS = 16
N_BANDS = 4


def _mono(samples: np.ndarray) -> np.ndarray:
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    return a


def _band_edges(n_bins: int) -> list:
    """4 log-spaced band edges over bins [1, n_bins) (DC excluded)."""
    if n_bins < N_BANDS + 1:
        raise ValueError("clip too short for the fingerprint")
    edges = np.unique(np.round(np.logspace(
        0, np.log10(n_bins - 1), N_BANDS + 1)).astype(int))
    while len(edges) < N_BANDS + 1:  # degenerate tiny spectra
        edges = np.append(edges, edges[-1] + 1)
    return list(edges[:N_BANDS + 1])


def _shares_from_spectrum(power: np.ndarray) -> np.ndarray:
    """(N_BANDS,) energy shares of one segment's power spectrum
    (DC excluded), 6dp-quantized; silent segments -> zeros."""
    edges = _band_edges(len(power))
    bands = np.array([
        power[edges[b]:edges[b + 1]].sum() for b in range(N_BANDS)
    ])
    total = bands.sum()
    if total <= 0.0:
        return np.zeros(N_BANDS)
    return np.round(bands / total, 6)


def audiohash_bits(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint of (n,) or (n, ch) float samples."""
    a = _mono(samples)
    seg_len = len(a) // N_SEGMENTS
    if seg_len < 2 * (N_BANDS + 1):
        raise ValueError(
            f"audiohash: clip of {len(a)} samples too short "
            f"(needs >= {2 * (N_BANDS + 1) * N_SEGMENTS})")
    shares = np.zeros((N_BANDS, N_SEGMENTS))
    for s in range(N_SEGMENTS):
        seg = a[s * seg_len:(s + 1) * seg_len]
        spec = np.fft.rfft(seg)
        power = (spec.real ** 2 + spec.imag ** 2)[1:]  # DC excluded
        shares[:, s] = _shares_from_spectrum(power)
    out = 0
    for b in range(N_BANDS):
        med = round(float(np.median(shares[b])), 6)
        for s in range(N_SEGMENTS):
            out = (out << 1) | int(shares[b, s] > med)
    return out


def audiohash_sequential(samples: np.ndarray) -> int:
    """Sequential twin: DFT-matrix spectra (different numerics/
    bookkeeping than rFFT on purpose), per-bit python loops."""
    a = _mono(samples)
    seg_len = len(a) // N_SEGMENTS
    if seg_len < 2 * (N_BANDS + 1):
        raise ValueError("audiohash: clip too short")
    n_bins = seg_len // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(seg_len)[None, :]
    dft = np.exp(-2j * np.pi * k * n / seg_len)
    shares = []
    for s in range(N_SEGMENTS):
        seg = a[s * seg_len:(s + 1) * seg_len]
        spec = dft @ seg
        power = (np.abs(spec) ** 2)[1:]
        shares.append(_shares_from_spectrum(power))
    out = 0
    for b in range(N_BANDS):
        med = round(float(np.median([sh[b] for sh in shares])), 6)
        for s in range(N_SEGMENTS):
            out = (out << 1) | int(shares[s][b] > med)
    return out


def hash_audio(fetched: DataFrame, id_col: str = "media_ref",
               payload_col: str = "payload") -> DataFrame:
    """(id, ahash, n_samples, sample_rate) per decodable WAV payload;
    undecodable / too-short clips yield nulls. One Arrow-batched
    mapInPandas, no shuffle."""
    from .imagehash import _to_signed

    def run(batches):
        from .. import wav as _wav

        for b in batches:
            ids, hs, ns, rs = [], [], [], []
            for ref, payload in zip(b[id_col], b[payload_col]):
                ids.append(ref)
                try:
                    samples, rate = _wav.decode_wav(bytes(payload))
                    hs.append(_to_signed(audiohash_bits(samples)))
                    ns.append(samples.shape[0])
                    rs.append(rate)
                except Exception:
                    hs.append(None)
                    ns.append(None)
                    rs.append(None)
            yield pd.DataFrame({
                id_col: ids,
                "ahash": pd.array(hs, dtype="Int64"),
                "n_samples": pd.array(ns, dtype="Int64"),
                "sample_rate": pd.array(rs, dtype="Int32"),
            })

    return fetched.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} string, ahash long, n_samples long, sample_rate int",
    )


def audio_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "media_ref",
    max_distance: int = 7,
    n_bands: int = 8,
    max_bucket: int = 100_000,
) -> DataFrame:
    """All clip pairs within Hamming ``max_distance`` on the spectral
    fingerprint — the EXACT pigeonhole band join from imagehash."""
    from .imagehash import near_dup_pairs

    return near_dup_pairs(
        hashed, id_col=id_col, hash_col="ahash",
        max_distance=max_distance, n_bands=n_bands,
        max_bucket=max_bucket)
