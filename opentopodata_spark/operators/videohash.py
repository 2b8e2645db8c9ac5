"""Perceptual video fingerprinting — the third modality of the
near-dup family (text spans / images / audio / video).

A clip reduces to the 64-bit pHash of its TEMPORAL MEAN luma frame:
re-encoded, re-sampled (frame-rate changed) or lightly-noised copies
keep a near-identical mean frame, while different footage diverges in
the low-frequency DCT immediately. The mean is intentionally
order-free (a reversed clip is the same footage for dedup purposes);
per-frame temporal structure is the multimodal feature vector's job
(operators/multimodal.video_features), not the dedup key's.

The vectorized path means frames with one ``np.mean``; the sequential
twin accumulates frame-by-frame in python loops — both land on
imagehash's 6dp-quantized pHash, so the bits are identical (the
established cross-path discipline). Pair finding reuses the exact
pigeonhole band join. Decoding rides y4m.py's pure-numpy reader in one
Arrow-batched mapInPandas; undecodable payloads yield nulls.

No reference analog; part of the multimodal training-data family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .imagehash import _to_signed, near_dup_pairs, phash_bits, \
    phash_sequential

__all__ = [
    "videohash_bits", "videohash_sequential", "hash_video",
    "video_near_dup_pairs",
]


def videohash_bits(y_frames: np.ndarray) -> int:
    """64-bit fingerprint of (n_frames, h, w) uint8/float luma."""
    a = np.asarray(y_frames, dtype=np.float64)
    if a.ndim != 3 or a.shape[0] < 1:
        raise ValueError("videohash needs (n_frames, h, w)")
    return phash_bits(a.mean(axis=0))


def videohash_sequential(y_frames: np.ndarray) -> int:
    """Sequential twin: frame-by-frame accumulation loops + the
    loop-built pHash."""
    a = np.asarray(y_frames, dtype=np.float64)
    if a.ndim != 3 or a.shape[0] < 1:
        raise ValueError("videohash needs (n_frames, h, w)")
    acc = np.zeros(a.shape[1:], dtype=np.float64)
    for i in range(a.shape[0]):
        acc = acc + a[i]
    return phash_sequential(acc / a.shape[0])


def hash_video(fetched: DataFrame, id_col: str = "media_ref",
               payload_col: str = "payload") -> DataFrame:
    """(id, vhash, n_frames, width, height) per decodable Y4M payload;
    undecodable payloads yield nulls. One Arrow-batched mapInPandas."""
    def run(batches):
        from .. import y4m as _y4m

        for b in batches:
            ids, hs, nf, ws, hts = [], [], [], [], []
            for ref, payload in zip(b[id_col], b[payload_col]):
                ids.append(ref)
                try:
                    y, _u, _v, meta = _y4m.decode_y4m(bytes(payload))
                    hs.append(_to_signed(videohash_bits(y)))
                    nf.append(y.shape[0])
                    ws.append(meta.width)
                    hts.append(meta.height)
                except Exception:
                    hs.append(None)
                    nf.append(None)
                    ws.append(None)
                    hts.append(None)
            yield pd.DataFrame({
                id_col: ids,
                "vhash": pd.array(hs, dtype="Int64"),
                "n_frames": pd.array(nf, dtype="Int32"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hts, dtype="Int32"),
            })

    return fetched.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} string, vhash long, n_frames int, width int,"
        " height int",
    )


def video_near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "media_ref",
    max_distance: int = 7,
    n_bands: int = 8,
    max_bucket: int = 100_000,
) -> DataFrame:
    """All clip pairs within Hamming ``max_distance`` on the mean-frame
    fingerprint — the EXACT pigeonhole band join from imagehash."""
    return near_dup_pairs(
        hashed, id_col=id_col, hash_col="vhash",
        max_distance=max_distance, n_bands=n_bands,
        max_bucket=max_bucket)
