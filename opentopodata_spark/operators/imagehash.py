"""Perceptual image near-duplicate detection: dHash + pHash over
decoded pixels, Hamming-banded candidate join, exact verification.

The image-dedup step every multimodal training pipeline needs (VERDICT
r4 Next #5): exact payload dedup misses re-encoded / lightly-edited
copies, so images are reduced to 64-bit perceptual fingerprints —

* **dHash** (difference hash): area-mean resize to 8x9 luma, bit =
  right pixel brighter than its left neighbour (row-major, MSB first).
  Robust to global brightness/contrast shifts and resampling.
* **pHash** (DCT hash): area-mean resize to 32x32 luma, orthonormal
  2-D DCT-II, keep the low-frequency 8x8 block, bit = coefficient
  above the median of the 63 non-DC coefficients. Robust to blur,
  noise and mild geometric edits.

Pair finding never goes all-pairs: the 64-bit hash splits into
``n_bands`` byte bands and candidates must share at least one exact
band — the pigeonhole guarantee (two hashes within Hamming distance d
agree on some band whenever ``n_bands > d``) makes the banded join
EXACT for ``max_distance < n_bands``, not approximate. Candidates are
then verified with ``bit_count(xor)`` in whole-stage codegen. The
banded self-join shuffles (band, value) keys only; a hot bucket (e.g.
millions of solid-black thumbnails — identical hash) is a real quadratic
blowup and refuses loudly at ``max_bucket``, the LSH discipline from
operators/dedup.py.

Decoding rides the existing pure-numpy codecs (png.py / jpeg.py /
jp2.py) inside one Arrow-batched mapInPandas; per-image work is
independent, so results are partition-layout invariant. The sequential
twins (``phash_sequential`` / ``dhash_sequential``) use different
bookkeeping on purpose (per-coefficient cosine loops, per-cell resize
loops) — fixture builders and differential tests.

No reference analog (the reference serves elevation points); part of
the multimodal training-data family (operators/multimodal.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "luma", "resize_area", "dhash_bits", "phash_bits", "hash_images",
    "band_rows", "near_dup_pairs", "dhash_sequential",
    "phash_sequential",
]


def luma(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8/uint16 -> float64 luma (BT.601 weights)."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            a = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        else:
            a = a[:, :, 0]
    return a


def _axis_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) exact fractional-coverage area weights: output
    cell i covers [i*n_in/n_out, (i+1)*n_in/n_out) of the input axis,
    each weight the overlap length; rows sum to n_in/n_out."""
    w = np.zeros((n_out, n_in), dtype=np.float64)
    step = n_in / n_out
    for i in range(n_out):
        lo = i * step
        hi = lo + step
        j0 = int(math.floor(lo))
        j1 = min(n_in, int(math.ceil(hi)))
        for j in range(j0, j1):
            w[i, j] = min(hi, j + 1) - max(lo, j)
    return w


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-mean resize (float64, deterministic): two small
    weight-matrix products, W_y @ img @ W_x^T / cell_area."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape
    wy = _axis_weights(h, out_h)
    wx = _axis_weights(w, out_w)
    area = (h / out_h) * (w / out_w)
    return (wy @ a @ wx.T) / area


def dhash_bits(img: np.ndarray) -> int:
    """64-bit dHash of a (H, W[, C]) image. Bit k (MSB first, row
    major over the 8x8 comparison grid) = right pixel > left pixel.
    Pixels are 6dp-quantized before comparing so the vectorized and
    loop-built resizes produce identical bits (the semantic_dedup
    layout-independence discipline)."""
    g = np.round(resize_area(luma(img), 8, 9), 6)
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * math.sqrt(2.0 / n)
        d[0, :] *= 1.0 / math.sqrt(2.0)
        _DCT32 = d
    return _DCT32


def phash_bits(img: np.ndarray) -> int:
    """64-bit pHash: 32x32 area resize, orthonormal 2-D DCT-II, low
    8x8 block, bit = coefficient > median of the 63 non-DC coeffs
    (MSB first, row major; the DC bit uses the same threshold)."""
    g = resize_area(luma(img), 32, 32)
    d = _dct_matrix(32)
    # 6dp quantization before the median/compare: matrix-product and
    # loop-built DCTs agree to ~1e-10, so rounded coefficients (and
    # therefore every bit) are identical across the two paths
    coeffs = np.round((d @ g @ d.T)[:8, :8].ravel(), 6)
    med = float(np.median(coeffs[1:]))
    out = 0
    for c in coeffs:
        out = (out << 1) | int(c > med)
    return out


# -- sequential twins: same definition, different bookkeeping ------------

def _resize_area_loops(img, out_h, out_w):
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape
    out = np.zeros((out_h, out_w))
    sy, sx = h / out_h, w / out_w
    for i in range(out_h):
        for j in range(out_w):
            y0, y1 = i * sy, (i + 1) * sy
            x0, x1 = j * sx, (j + 1) * sx
            acc = 0.0
            for yy in range(int(math.floor(y0)), int(math.ceil(y1))):
                wy = min(y1, yy + 1) - max(y0, yy)
                for xx in range(int(math.floor(x0)), int(math.ceil(x1))):
                    wx = min(x1, xx + 1) - max(x0, xx)
                    acc += wy * wx * a[yy, xx]
            out[i, j] = acc / (sy * sx)
    return out


def dhash_sequential(img: np.ndarray) -> int:
    g = np.round(_resize_area_loops(luma(img), 8, 9), 6)
    out = 0
    for y in range(8):
        for x in range(8):
            out = (out << 1) | int(g[y, x + 1] > g[y, x])
    return out


def phash_sequential(img: np.ndarray) -> int:
    g = _resize_area_loops(luma(img), 32, 32)
    n = 32
    coeffs = []
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for y in range(n):
                for x in range(n):
                    acc += (
                        g[y, x]
                        * math.cos(math.pi * (2 * y + 1) * u / (2 * n))
                        * math.cos(math.pi * (2 * x + 1) * v / (2 * n))
                    )
            cu = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
            cv = math.sqrt(1.0 / n) if v == 0 else math.sqrt(2.0 / n)
            coeffs.append(round(cu * cv * acc, 6))
    med = float(np.median(np.array(coeffs[1:])))
    out = 0
    for c in coeffs:
        out = (out << 1) | int(c > med)
    return out


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _decode_gray(payload: bytes):
    from .. import jp2 as _jp2
    from .. import jpeg as _jpeg
    from .. import png as _png

    b = bytes(payload)
    if _png.is_png(b):
        return _png.decode_png(b)
    if _jpeg.is_jpeg(b):
        img = _jpeg.decode_jpeg(b)
        if img.dtype == np.uint16:
            img = (img >> 4).astype(np.uint8)
        return img
    if b[:4] == b"\xff\x4f\xff\x51" or (
            len(b) > 12 and b[4:12] == b"jP\x20\x20\x0d\x0a\x87\x0a"):
        arr, _geo = _jp2.decode_jp2(b)
        return arr[:, :, None] if arr.ndim == 2 else arr
    return None


def hash_images(fetched: DataFrame, id_col: str = "media_ref",
                payload_col: str = "payload") -> DataFrame:
    """(id, phash, dhash, width, height) per decodable image payload
    (PNG / JPEG / JP2 via the pure-numpy codecs); undecodable payloads
    yield null hashes — at corpus scale they are data, not errors.
    One Arrow-batched mapInPandas, no shuffle."""
    def run(batches):
        for b in batches:
            ids, ph, dh, ws, hs = [], [], [], [], []
            for ref, payload in zip(b[id_col], b[payload_col]):
                ids.append(ref)
                img = None
                if payload is not None:
                    try:
                        img = _decode_gray(payload)
                    except Exception:
                        img = None
                if img is None:
                    ph.append(None)
                    dh.append(None)
                    ws.append(None)
                    hs.append(None)
                    continue
                ph.append(_to_signed(phash_bits(img)))
                dh.append(_to_signed(dhash_bits(img)))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
            yield pd.DataFrame({
                id_col: ids,
                "phash": pd.array(ph, dtype="Int64"),
                "dhash": pd.array(dh, dtype="Int64"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
            })

    return fetched.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} string, phash long, dhash long, width int, height int",
    )


def band_rows(
    hashed: DataFrame,
    id_col: str = "media_ref",
    hash_col: str = "phash",
    n_bands: int = 8,
) -> DataFrame:
    """(id, h, band, v): the hash split into ``n_bands`` equal-width
    band values — the pigeonhole join key (shared by near_dup_pairs and
    the streaming incremental index)."""
    if 64 % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    src = hashed.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    return src.select(
        "id", "h",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("h"), i * width)
                .bitwiseAND(F.lit(mask)).alias("v"),
            ) for i in range(n_bands)
        ])).alias("bv"),
    ).select("id", "h", F.col("bv.band").alias("band"),
             F.col("bv.v").alias("v"))


def near_dup_pairs(
    hashed: DataFrame,
    id_col: str = "media_ref",
    hash_col: str = "phash",
    max_distance: int = 6,
    n_bands: int = 8,
    max_bucket: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, distance): all pairs within Hamming
    ``max_distance`` of each other on ``hash_col`` — EXACT, via the
    pigeonhole band join (requires ``n_bands > max_distance``; 64 must
    divide by n_bands). Shuffles band keys only; buckets above
    ``max_bucket`` refuse loudly (a quadratic hot bucket means the
    corpus needs exact dedup first)."""
    if max_distance >= n_bands:
        raise ValueError(
            f"max_distance={max_distance} needs n_bands > max_distance "
            f"(got {n_bands}) for the pigeonhole guarantee — more bands "
            "or a smaller distance")
    bands = band_rows(hashed, id_col, hash_col, n_bands)
    counts = bands.groupBy("band", "v").count()
    hot = counts.where(F.col("count") > max_bucket).limit(1).collect()
    if hot:
        r = hot[0]
        raise RuntimeError(
            f"near_dup_pairs: band bucket (band={r['band']}, v={r['v']}) "
            f"holds {r['count']} > max_bucket={max_bucket} images — a "
            "quadratic hot bucket; exact-dedup the corpus first or raise "
            "max_bucket deliberately")
    a = bands.select(
        F.col("band"), F.col("v"), F.col("id").alias("id_a"),
        F.col("h").alias("ha"))
    b = bands.select(
        F.col("band"), F.col("v"), F.col("id").alias("id_b"),
        F.col("h").alias("hb"))
    pairs = (
        a.join(b, ["band", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                .alias("distance"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("distance") <= max_distance)
    )
    return pairs
