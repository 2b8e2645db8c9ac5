"""JPEG 2000 Part 1 (ITU-T T.800 / ISO 15444-1) — lossless grayscale
raster codec with GeoJP2 georeferencing.

The reference engine reads JPEG2000 DEMs through GDAL's JP2 drivers
(/root/reference/opentopodata/backend.py:89,
docs/notes/performance-optimisation.md); this module closes that last
named format gap for the pure-numpy pipeline.

Scope (the DEM distribution profile):
* reversible 5/3 integer wavelet (lossless: decode(encode(x)) == x
  EXACTLY — the round-trip against the source array is the correctness
  contract, stronger than an entropy-twin test)
* single tile, single component; uint8 / uint16 / int16 samples
* EBCOT tier-1: MQ-coded code-blocks (64x64), the three coding passes
  (significance propagation, magnitude refinement, cleanup with
  run-length mode), 19-context model of T.800 Annex D
* tier-2: one quality layer, LRCP, default (maximal) precincts,
  tag-tree inclusion / zero-bitplane coding, Lblock length signalling
* codestream: SOC SIZ COD QCD (COM) SOT SOD ... EOC; raw .j2k or the
  JP2 box container; GeoJP2 georeferencing (the degenerate-GeoTIFF
  UUID box GDAL emits by default)

The MQ coder reuses jpeg_arith's QM/MQ-family interval coder (the
branch structure is identical; T.800 Table C.2 supplies the 47-state
estimator and the interval is 15-bit). Like jpeg_arith, encoder and
decoder are exact duals built from the spec flowcharts; here the
lossless round-trip additionally pins the whole transform/entropy
chain to the source samples bit-for-bit.

Performance note: tier-1 is a per-decision loop, run over flat Python
lists with a precomputed context LUT (~0.9-1.2 s per 512x512 int16
tile per direction, ~4x the naive numpy-scalar version). That is fine
for fixture/test tiles and one-off reads; for serving a large JP2 DEM
catalog the prescribed path is `jobs/raster.py transcode` — decode
each tile once, cluster-parallel, and serve windowed GeoTIFF reads
thereafter (the same prep step the reference's performance notes
prescribe for every format). The distributed pipeline parallelizes
across tiles, never within one.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .jpeg_arith import _ArithDecoder, _ArithEncoder, _Stats, _deframe_bits

__all__ = ["Jp2Error", "encode_jp2", "decode_jp2", "write_jp2",
           "open_jp2"]


class Jp2Error(ValueError):
    pass


# T.800 Table C.2 in jpeg_arith's column order: (Qe, Next_Index_LPS,
# Next_Index_MPS, Switch_MPS), 47 states.
_MQ = (
    (0x5601, 1, 1, 1), (0x3401, 6, 2, 0), (0x1801, 9, 3, 0),
    (0x0AC1, 12, 4, 0), (0x0521, 29, 5, 0), (0x0221, 33, 38, 0),
    (0x5601, 6, 7, 1), (0x5401, 14, 8, 0), (0x4801, 14, 9, 0),
    (0x3801, 14, 10, 0), (0x3001, 17, 11, 0), (0x2401, 18, 12, 0),
    (0x1C01, 20, 13, 0), (0x1601, 21, 29, 0), (0x5601, 14, 15, 1),
    (0x5401, 14, 16, 0), (0x5101, 15, 17, 0), (0x4801, 16, 18, 0),
    (0x3801, 17, 19, 0), (0x3401, 18, 20, 0), (0x3001, 19, 21, 0),
    (0x2801, 19, 22, 0), (0x2401, 20, 23, 0), (0x2201, 21, 24, 0),
    (0x1C01, 22, 25, 0), (0x1801, 23, 26, 0), (0x1601, 24, 27, 0),
    (0x1401, 25, 28, 0), (0x1201, 26, 29, 0), (0x1101, 27, 30, 0),
    (0x0AC1, 28, 31, 0), (0x09C1, 29, 32, 0), (0x08A1, 30, 33, 0),
    (0x0521, 31, 34, 0), (0x0441, 32, 35, 0), (0x02A1, 33, 36, 0),
    (0x0221, 34, 37, 0), (0x0141, 35, 38, 0), (0x0111, 36, 39, 0),
    (0x0085, 37, 40, 0), (0x0049, 38, 41, 0), (0x0025, 39, 42, 0),
    (0x0015, 40, 43, 0), (0x0009, 41, 44, 0), (0x0005, 42, 45, 0),
    (0x0001, 43, 45, 0), (0x5601, 46, 46, 0),
)

# context indices (T.800 D.2/D.3): 0-8 significance (orientation-mapped),
# 9-13 sign, 14-16 magnitude refinement, 17 run-length, 18 uniform
_CTX_RUN = 17
_CTX_UNI = 18
_N_CTX = 19


def _fresh_ctx() -> _Stats:
    st = _Stats(_N_CTX)
    st.idx[0] = 4       # all-zero-neighborhood significance context
    st.idx[_CTX_RUN] = 3
    st.idx[_CTX_UNI] = 46
    return st


def _mq_encoder() -> _ArithEncoder:
    return _ArithEncoder(table=_MQ, a_init=0x8000, init_bits=15)


def _mq_decoder(data: bytes) -> _ArithDecoder:
    return _ArithDecoder(_deframe_bits(data), table=_MQ, a_init=0x8000,
                         init_bits=15)


# --------------------------------------------------------------------------
# significance / sign context tables (T.800 Tables D.1, D.2)


def _sig_ctx(h: int, v: int, d: int, orient: str) -> int:
    if orient == "HL":  # vertical high-pass: swap roles of h and v
        h, v = v, h
    if orient != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)
    if d >= 3:
        return 8
    hv = h + v
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


_SIGN_LUT = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


# --------------------------------------------------------------------------
# tier-1: EBCOT code-block coding


class _Block:
    """Shared scan/context machinery for one code-block, on flat Python
    lists (numpy scalar indexing costs ~10x in the per-decision loops).
    The encoder and decoder subclasses differ only in where decision
    bits come from — identical control flow keeps them in lockstep by
    construction."""

    def __init__(self, h: int, w: int, orient: str):
        self.h, self.w = h, w
        W = w + 2
        self.W = W
        self.sig = [0] * ((h + 2) * W)  # 1-px apron
        self.sgn = [0] * ((h + 2) * W)  # -1/0/+1, nonzero only when sig
        self.visited = [0] * ((h + 2) * W)
        self.refined = [0] * ((h + 2) * W)
        self.ctx = _fresh_ctx()
        # significance-context LUT: idx = (h*3 + v)*5 + min(d, 4)
        lut = [0] * 45
        for hh in range(3):
            for vv in range(3):
                for dd in range(5):
                    lut[(hh * 3 + vv) * 5 + dd] = _sig_ctx(
                        hh, vv, dd, orient)
        self.lut = lut

    def _sign_ctx(self, i: int):
        g, W = self.sgn, self.W
        hc = g[i - 1] + g[i + 1]
        vc = g[i - W] + g[i + W]
        hc = 1 if hc > 0 else (-1 if hc < 0 else 0)
        vc = 1 if vc > 0 else (-1 if vc < 0 else 0)
        return _SIGN_LUT[(hc, vc)]


class _BlockEncoder(_Block):
    def __init__(self, coefs: np.ndarray, orient: str, n_planes: int):
        h, w = coefs.shape
        super().__init__(h, w, orient)
        self.mag = np.abs(coefs.astype(np.int64)).ravel().tolist()
        self.neg = (coefs < 0).ravel().tolist()
        self.n_planes = n_planes
        self.mq = _mq_encoder()

    def _code_sign(self, i, j):
        ctx, xor = self._sign_ctx(i)
        neg = self.neg[j]
        self.mq.encode(self.ctx, ctx, (1 if neg else 0) ^ xor)
        self.sig[i] = 1
        self.sgn[i] = -1 if neg else 1

    def run(self) -> tuple[bytes, int]:
        """Encode all bit-planes; returns (chunk bytes, n_passes)."""
        P = self.n_planes
        if P <= 0:
            raise Jp2Error("empty code-block must not be encoded")
        for p in range(P - 1, -1, -1):
            bit = 1 << p
            if p < P - 1:
                self._pass_spp(bit)
                self._pass_mrp(bit)
            self._pass_cup(bit)
            v = self.visited
            for k in range(len(v)):
                v[k] = 0
        return self.mq.finish(), 3 * (P - 1) + 1

    def _pass_spp(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, lut, mag = self.sig, self.visited, self.lut, self.mag
        enc, ctx = self.mq.encode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                i0 = (r0 + 1) * W + c + 1
                j0 = r0 * w + c
                for r in range(r0, rend):
                    i = i0 + (r - r0) * W
                    if sig[i]:
                        continue
                    hh = sig[i - 1] + sig[i + 1]
                    vv = sig[i - W] + sig[i + W]
                    dd = (sig[i - W - 1] + sig[i - W + 1]
                          + sig[i + W - 1] + sig[i + W + 1])
                    if hh + vv + dd == 0:
                        continue
                    vis[i] = 1
                    j = j0 + (r - r0) * w
                    b = 1 if mag[j] & bit else 0
                    enc(ctx, lut[(hh * 3 + vv) * 5
                                 + (dd if dd < 4 else 4)], b)
                    if b:
                        self._code_sign(i, j)

    def _pass_mrp(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, ref, mag = self.sig, self.visited, self.refined, self.mag
        enc, ctx = self.mq.encode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                for r in range(r0, rend):
                    i = (r + 1) * W + c + 1
                    if not sig[i] or vis[i]:
                        continue
                    if ref[i]:
                        cx = 16
                    else:
                        nb = (sig[i - 1] + sig[i + 1] + sig[i - W]
                              + sig[i + W] + sig[i - W - 1]
                              + sig[i - W + 1] + sig[i + W - 1]
                              + sig[i + W + 1])
                        cx = 15 if nb > 0 else 14
                    enc(ctx, cx, 1 if mag[r * w + c] & bit else 0)
                    ref[i] = 1
                    vis[i] = 1

    def _pass_cup(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, lut, mag = self.sig, self.visited, self.lut, self.mag
        enc, ctx = self.mq.encode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                r = r0
                i0 = (r0 + 1) * W + c + 1
                if rend == r0 + 4:
                    clean = True
                    for k in range(4):
                        i = i0 + k * W
                        if (sig[i] or vis[i] or sig[i - 1] or sig[i + 1]
                                or sig[i - W] or sig[i + W]
                                or sig[i - W - 1] or sig[i - W + 1]
                                or sig[i + W - 1] or sig[i + W + 1]):
                            clean = False
                            break
                    if clean:
                        first = None
                        for k in range(4):
                            if mag[(r0 + k) * w + c] & bit:
                                first = k
                                break
                        if first is None:
                            enc(ctx, _CTX_RUN, 0)
                            continue
                        enc(ctx, _CTX_RUN, 1)
                        enc(ctx, _CTX_UNI, (first >> 1) & 1)
                        enc(ctx, _CTX_UNI, first & 1)
                        r = r0 + first
                        self._code_sign(i0 + first * W, r * w + c)
                        r += 1
                for rr in range(r, rend):
                    i = i0 + (rr - r0) * W
                    if sig[i] or vis[i]:
                        continue
                    hh = sig[i - 1] + sig[i + 1]
                    vv = sig[i - W] + sig[i + W]
                    dd = (sig[i - W - 1] + sig[i - W + 1]
                          + sig[i + W - 1] + sig[i + W + 1])
                    j = rr * w + c
                    b = 1 if mag[j] & bit else 0
                    enc(ctx, lut[(hh * 3 + vv) * 5
                                 + (dd if dd < 4 else 4)], b)
                    if b:
                        self._code_sign(i, j)


class _BlockDecoder(_Block):
    def __init__(self, data: bytes, h: int, w: int, orient: str,
                 n_planes: int, n_passes: int):
        super().__init__(h, w, orient)
        self.mag = [0] * (h * w)
        self.mq = _mq_decoder(data)
        self.n_planes = n_planes
        self.n_passes = n_passes

    def run(self) -> np.ndarray:
        P, left = self.n_planes, self.n_passes
        h, w, W = self.h, self.w, self.W
        for p in range(P - 1, -1, -1):
            bit = 1 << p
            if p < P - 1:
                if left <= 0:
                    break
                self._pass_spp(bit)
                left -= 1
                if left <= 0:
                    break
                self._pass_mrp(bit)
                left -= 1
            if left <= 0:
                break
            self._pass_cup(bit)
            left -= 1
            v = self.visited
            for k in range(len(v)):
                v[k] = 0
        out = np.array(self.mag, dtype=np.int64).reshape(h, w)
        sgn = np.array(self.sgn, dtype=np.int64).reshape(h + 2, W)
        neg = sgn[1:-1, 1:-1] < 0
        out[neg] = -out[neg]
        return out

    def _dec_sign(self, i):
        ctx, xor = self._sign_ctx(i)
        neg = self.mq.decode(self.ctx, ctx) ^ xor
        self.sig[i] = 1
        self.sgn[i] = -1 if neg else 1

    def _pass_spp(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, lut, mag = self.sig, self.visited, self.lut, self.mag
        dec, ctx = self.mq.decode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                i0 = (r0 + 1) * W + c + 1
                for r in range(r0, rend):
                    i = i0 + (r - r0) * W
                    if sig[i]:
                        continue
                    hh = sig[i - 1] + sig[i + 1]
                    vv = sig[i - W] + sig[i + W]
                    dd = (sig[i - W - 1] + sig[i - W + 1]
                          + sig[i + W - 1] + sig[i + W + 1])
                    if hh + vv + dd == 0:
                        continue
                    vis[i] = 1
                    if dec(ctx, lut[(hh * 3 + vv) * 5
                                    + (dd if dd < 4 else 4)]):
                        mag[r * w + c] |= bit
                        self._dec_sign(i)

    def _pass_mrp(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, ref, mag = self.sig, self.visited, self.refined, self.mag
        dec, ctx = self.mq.decode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                for r in range(r0, rend):
                    i = (r + 1) * W + c + 1
                    if not sig[i] or vis[i]:
                        continue
                    if ref[i]:
                        cx = 16
                    else:
                        nb = (sig[i - 1] + sig[i + 1] + sig[i - W]
                              + sig[i + W] + sig[i - W - 1]
                              + sig[i - W + 1] + sig[i + W - 1]
                              + sig[i + W + 1])
                        cx = 15 if nb > 0 else 14
                    if dec(ctx, cx):
                        mag[r * w + c] |= bit
                    ref[i] = 1
                    vis[i] = 1

    def _pass_cup(self, bit):
        h, w, W = self.h, self.w, self.W
        sig, vis, lut, mag = self.sig, self.visited, self.lut, self.mag
        dec, ctx = self.mq.decode, self.ctx
        for r0 in range(0, h, 4):
            rend = min(r0 + 4, h)
            for c in range(w):
                r = r0
                i0 = (r0 + 1) * W + c + 1
                if rend == r0 + 4:
                    clean = True
                    for k in range(4):
                        i = i0 + k * W
                        if (sig[i] or vis[i] or sig[i - 1] or sig[i + 1]
                                or sig[i - W] or sig[i + W]
                                or sig[i - W - 1] or sig[i - W + 1]
                                or sig[i + W - 1] or sig[i + W + 1]):
                            clean = False
                            break
                    if clean:
                        if not dec(ctx, _CTX_RUN):
                            continue
                        first = (dec(ctx, _CTX_UNI) << 1) | dec(
                            ctx, _CTX_UNI)
                        r = r0 + first
                        mag[r * w + c] |= bit
                        self._dec_sign(i0 + first * W)
                        r += 1
                for rr in range(r, rend):
                    i = i0 + (rr - r0) * W
                    if sig[i] or vis[i]:
                        continue
                    hh = sig[i - 1] + sig[i + 1]
                    vv = sig[i - W] + sig[i + W]
                    dd = (sig[i - W - 1] + sig[i - W + 1]
                          + sig[i + W - 1] + sig[i + W + 1])
                    if dec(ctx, lut[(hh * 3 + vv) * 5
                                    + (dd if dd < 4 else 4)]):
                        mag[rr * w + c] |= bit
                        self._dec_sign(i)



class _TagTree:
    def __init__(self, w: int, h: int):
        self.dims = []
        ww, hh = max(w, 1), max(h, 1)
        while True:
            self.dims.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww, hh = (ww + 1) // 2, (hh + 1) // 2
        self.dims.reverse()  # root first
        self.value = [np.zeros((d[1], d[0]), dtype=np.int64)
                      for d in self.dims]
        self.state = [np.zeros((d[1], d[0]), dtype=np.int64)
                      for d in self.dims]
        self.known = [np.zeros((d[1], d[0]), dtype=bool)
                      for d in self.dims]

    def set_values(self, leaves: np.ndarray) -> None:
        self.value[-1][:, :] = leaves
        for lvl in range(len(self.dims) - 2, -1, -1):
            below = self.value[lvl + 1]
            w, hgt = self.dims[lvl]
            for j in range(hgt):
                for i in range(w):
                    blk = below[2 * j:2 * j + 2, 2 * i:2 * i + 2]
                    self.value[lvl][j, i] = blk.min()

    def _chain(self, i: int, j: int):
        n = len(self.dims)
        for lvl in range(n):
            shift = n - 1 - lvl
            yield lvl, j >> shift, i >> shift

    def encode(self, out: list, i: int, j: int, threshold: int) -> None:
        lo = 0
        for lvl, jj, ii in self._chain(i, j):
            if self.state[lvl][jj, ii] < lo:
                self.state[lvl][jj, ii] = lo
            while (self.state[lvl][jj, ii] < threshold
                   and not self.known[lvl][jj, ii]):
                if self.value[lvl][jj, ii] > self.state[lvl][jj, ii]:
                    out.append(1)
                    self.state[lvl][jj, ii] += 1
                else:
                    out.append(0)
                    self.known[lvl][jj, ii] = True
            lo = (self.value[lvl][jj, ii] if self.known[lvl][jj, ii]
                  else self.state[lvl][jj, ii])

    def decode(self, bits, i: int, j: int, threshold: int) -> bool:
        """True iff leaf value >= threshold (not yet resolved below)."""
        lo = 0
        for lvl, jj, ii in self._chain(i, j):
            if self.state[lvl][jj, ii] < lo:
                self.state[lvl][jj, ii] = lo
            while (self.state[lvl][jj, ii] < threshold
                   and not self.known[lvl][jj, ii]):
                if bits.read():
                    self.state[lvl][jj, ii] += 1
                else:
                    self.known[lvl][jj, ii] = True
                    self.value[lvl][jj, ii] = self.state[lvl][jj, ii]
            lo = (self.value[lvl][jj, ii] if self.known[lvl][jj, ii]
                  else self.state[lvl][jj, ii])
        leaf = len(self.dims) - 1
        return not (self.known[leaf][j, i]
                    and self.value[leaf][j, i] < threshold)


# --------------------------------------------------------------------------
# packet-header bit IO (FF-stuffed, byte-aligned per packet header)


class _HeaderWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bit: int) -> None:
        self.acc = (self.acc << 1) | (bit & 1)
        self.n += 1
        limit = 7 if self.out and self.out[-1] == 0xFF else 8
        if self.n == limit:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0

    def write_bits(self, v: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.write((v >> k) & 1)

    def finish(self) -> bytes:
        while self.n:
            self.write(0)
        if self.out and self.out[-1] == 0xFF:  # headers must not end FF
            self.out.append(0x00)
        return bytes(self.out)


class _HeaderReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def read(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise Jp2Error("JP2 packet header truncated")
            b = self.data[self.pos]
            self.pos += 1
            self.acc = b & (0x7F if self.prev_ff else 0xFF)
            self.n = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read()
        return v

    def align(self) -> int:
        """Byte-align; returns the byte position where the body starts.
        A trailing 0xFF header byte carries a stuffed 0x00 after it."""
        self.n = 0
        if self.prev_ff:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise Jp2Error("JP2 packet header ends with unstuffed FF")
            self.pos += 1
            self.prev_ff = False
        return self.pos


class _BitList:
    """Raw-bit sink with the _HeaderWriter interface — stuffing is
    applied once, when the collected bits replay through the real
    writer (a codeword spliced through a stuffing writer would corrupt
    bit order whenever its first byte happens to be 0xFF)."""

    __slots__ = ("bits",)

    def __init__(self, bits: list):
        self.bits = bits

    def write(self, bit: int) -> None:
        self.bits.append(bit & 1)

    def write_bits(self, v: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.bits.append((v >> k) & 1)


def _passes_codeword(w, n: int) -> None:
    if n == 1:
        w.write(0)
    elif n == 2:
        w.write_bits(0b10, 2)
    elif n <= 5:
        w.write_bits(0b11, 2)
        w.write_bits(n - 3, 2)
    elif n <= 36:
        w.write_bits(0b1111, 4)
        w.write_bits(n - 6, 5)
    elif n <= 164:
        w.write_bits(0b111111111, 9)
        w.write_bits(n - 37, 7)
    else:
        raise Jp2Error(f"too many coding passes ({n})")


def _read_passes(r: _HeaderReader) -> int:
    if not r.read():
        return 1
    if not r.read():
        return 2
    v = r.read_bits(2)
    if v < 3:
        return 3 + v
    v = r.read_bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.read_bits(7)


# --------------------------------------------------------------------------
# 5/3 reversible wavelet (T.800 Annex F, integer lifting)


def _fwd53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Along the last axis; returns (low, high). Symmetric extension."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(np.int64, copy=True), x[..., :0].astype(np.int64)
    x = x.astype(np.int64, copy=False)
    even = x[..., 0::2]
    odd = x[..., 1::2]
    ne = even.shape[-1]
    # right neighbor of odd[i] is even[i+1]; reflect at the right edge
    even_r = even[..., 1:] if ne > 1 else even[..., :0]
    if odd.shape[-1] > even_r.shape[-1]:
        even_r = np.concatenate([even_r, even[..., -1:]], axis=-1)
    high = odd - ((even[..., : odd.shape[-1]] + even_r) >> 1)
    # low update: left neighbor of even[i] is high[i-1]; reflect
    h_l = np.concatenate([high[..., :1], high], axis=-1)[..., : ne]
    h_r = high if high.shape[-1] >= ne else np.concatenate(
        [high, high[..., -1:]], axis=-1)
    h_r = h_r[..., : ne]
    low = even + ((h_l + h_r + 2) >> 2)
    return low, high


def _inv53_1d(low: np.ndarray, high: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return low.astype(np.int64, copy=True)
    low = low.astype(np.int64, copy=False)
    high = high.astype(np.int64, copy=False)
    ne = low.shape[-1]
    h_l = np.concatenate([high[..., :1], high], axis=-1)[..., : ne]
    h_r = high if high.shape[-1] >= ne else np.concatenate(
        [high, high[..., -1:]], axis=-1)
    h_r = h_r[..., : ne]
    even = low - ((h_l + h_r + 2) >> 2)
    even_r = even[..., 1:] if ne > 1 else even[..., :0]
    if high.shape[-1] > even_r.shape[-1]:
        even_r = np.concatenate([even_r, even[..., -1:]], axis=-1)
    odd = high + ((even[..., : high.shape[-1]] + even_r) >> 1)
    out = np.empty(low.shape[:-1] + (n,), dtype=np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _fwd53_2d(x: np.ndarray) -> dict:
    """One decomposition level: vertical then horizontal lifting."""
    lo_v, hi_v = _fwd53_1d(np.swapaxes(x, -1, -2))
    lo_v = np.swapaxes(lo_v, -1, -2)
    hi_v = np.swapaxes(hi_v, -1, -2)
    ll, hl = _fwd53_1d(lo_v)
    lh, hh = _fwd53_1d(hi_v)
    return {"LL": ll, "HL": hl, "LH": lh, "HH": hh}


def _inv53_2d(sub: dict, h: int, w: int) -> np.ndarray:
    lo_v = _inv53_1d(sub["LL"], sub["HL"], w)
    hi_v = _inv53_1d(sub["LH"], sub["HH"], w)
    x = _inv53_1d(np.swapaxes(lo_v, -1, -2), np.swapaxes(hi_v, -1, -2), h)
    return np.swapaxes(x, -1, -2)


def _dwt_forward(x: np.ndarray, levels: int) -> list:
    """Returns [LL_n, {HL,LH,HH}_n, ..., {HL,LH,HH}_1]."""
    bands = []
    cur = x.astype(np.int64)
    for _ in range(levels):
        s = _fwd53_2d(cur)
        bands.append({"HL": s["HL"], "LH": s["LH"], "HH": s["HH"]})
        cur = s["LL"]
    bands.append(cur)
    bands.reverse()
    return bands


def _dwt_inverse(bands: list, h: int, w: int, levels: int) -> np.ndarray:
    # reconstruct level sizes top-down
    sizes = [(h, w)]
    for _ in range(levels):
        hh, ww = sizes[-1]
        sizes.append(((hh + 1) // 2, (ww + 1) // 2))
    cur = bands[0]
    for lvl in range(levels):
        th, tw = sizes[levels - 1 - lvl]
        det = bands[1 + lvl]
        cur = _inv53_2d(
            {"LL": cur, "HL": det["HL"], "LH": det["LH"],
             "HH": det["HH"]}, th, tw)
    return cur


# --------------------------------------------------------------------------
# tier-2: packets + codestream

_CB = 64  # code-block side (exponent 6; coded as 6-2=4 in COD)
_GUARD = 2
_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}
_ORIENTS = ("HL", "LH", "HH")


def _subband_list(levels: int) -> list:
    """Per resolution r: [(band_index_into_dwt, orient), ...]."""
    out = [[(0, "LL")]]
    for r in range(1, levels + 1):
        out.append([(r, o) for o in _ORIENTS])
    return out


def _blocks_of(arr: np.ndarray) -> list:
    """(r0, c0, view) tiles of the code-block grid, raster order."""
    h, w = arr.shape
    out = []
    for r0 in range(0, h, _CB):
        for c0 in range(0, w, _CB):
            out.append((r0, c0,
                        arr[r0:min(r0 + _CB, h), c0:min(c0 + _CB, w)]))
    return out


def _grid_dims(shape: tuple) -> tuple:
    h, w = shape
    return (-(-w // _CB) if w else 0, -(-h // _CB) if h else 0)


def _encode_packets(bands: list, levels: int, mbs: dict) -> bytes:
    out = bytearray()
    sublist = _subband_list(levels)
    for r in range(levels + 1):
        hw = _HeaderWriter()
        bodies = []
        any_block = any(
            bands[bi][o].size if bi else bands[0].size
            for bi, o in sublist[r]
        )
        hw.write(1 if any_block else 0)
        if any_block:
            for bi, o in sublist[r]:
                arr = bands[bi][o] if bi else bands[0]
                if arr.size == 0:
                    continue
                gw, gh = _grid_dims(arr.shape)
                incl = _TagTree(gw, gh)
                zbp = _TagTree(gw, gh)
                blocks = _blocks_of(arr)
                mb = mbs[o if bi else "LL"]
                incl_v = np.zeros((gh, gw), dtype=np.int64)
                zbp_v = np.zeros((gh, gw), dtype=np.int64)
                coded = {}
                for n, (r0, c0, blk) in enumerate(blocks):
                    j, i = r0 // _CB, c0 // _CB
                    nz = int(np.abs(blk).max()) if blk.size else 0
                    if nz == 0:
                        incl_v[j, i] = 1  # never included
                        continue
                    planes = int(nz).bit_length()
                    if planes > mb:
                        raise Jp2Error(
                            f"coefficient overflow: {planes} > Mb={mb}")
                    zbp_v[j, i] = mb - planes
                    orient = o if bi else "LL"
                    data, n_passes = _BlockEncoder(
                        blk, orient, planes).run()
                    coded[(j, i)] = (data, n_passes)
                incl.set_values(incl_v)
                zbp.set_values(zbp_v)
                bits: list = []
                lblock = {}
                for n, (r0, c0, blk) in enumerate(blocks):
                    j, i = r0 // _CB, c0 // _CB
                    incl.encode(bits, i, j, 1)
                    if (j, i) not in coded:
                        continue
                    for t in range(1, int(zbp_v[j, i]) + 2):
                        zbp.encode(bits, i, j, t)
                    data, n_passes = coded[(j, i)]
                    _passes_codeword(_BitList(bits), n_passes)
                    lb = lblock.setdefault((j, i), 3)
                    lbits = lb + int(np.floor(np.log2(n_passes)))
                    need = max(len(data).bit_length(), 1)
                    while need > lbits:
                        bits.append(1)
                        lb += 1
                        lbits += 1
                    bits.append(0)
                    lblock[(j, i)] = lb
                    for k in range(lbits - 1, -1, -1):
                        bits.append((len(data) >> k) & 1)
                    bodies.append(data)
                # replay collected bits through the stuffing writer
                for b in bits:
                    hw.write(b)
        out += hw.finish()
        for body in bodies:
            out += body
    return bytes(out)


def _decode_packets(data: bytes, pos: int, levels: int, mbs: dict,
                    band_shapes: list) -> tuple[list, int]:
    """Returns (bands structure with int64 arrays, end position)."""
    bands: list = [np.zeros(band_shapes[0]["LL"], dtype=np.int64)]
    for lvl in range(1, levels + 1):
        bands.append({o: np.zeros(band_shapes[lvl][o], dtype=np.int64)
                      for o in _ORIENTS})
    sublist = _subband_list(levels)
    for r in range(levels + 1):
        hr = _HeaderReader(data, pos)
        chunks = []
        if hr.read():
            for bi, o in sublist[r]:
                arr = bands[bi][o] if bi else bands[0]
                if arr.size == 0:
                    continue
                gw, gh = _grid_dims(arr.shape)
                incl = _TagTree(gw, gh)
                zbp = _TagTree(gw, gh)
                mb = mbs[o if bi else "LL"]
                for r0 in range(0, arr.shape[0], _CB):
                    for c0 in range(0, arr.shape[1], _CB):
                        j, i = r0 // _CB, c0 // _CB
                        if incl.decode(hr, i, j, 1):
                            continue  # not in this (only) layer
                        zb = 0
                        while zbp.decode(hr, i, j, zb + 1):
                            zb += 1
                        n_passes = _read_passes(hr)
                        lb = 3
                        while hr.read():
                            lb += 1
                        lbits = lb + int(np.floor(np.log2(n_passes)))
                        length = hr.read_bits(lbits)
                        chunks.append((arr, r0, c0, o if bi else "LL",
                                       mb - zb, n_passes, length))
        pos = hr.align()
        for arr, r0, c0, orient, planes, n_passes, length in chunks:
            blk = data[pos:pos + length]
            if len(blk) != length:
                raise Jp2Error("JP2 packet body truncated")
            pos += length
            h = min(_CB, arr.shape[0] - r0)
            w = min(_CB, arr.shape[1] - c0)
            vals = _BlockDecoder(blk, h, w, orient, planes,
                                 n_passes).run()
            arr[r0:r0 + h, c0:c0 + w] = vals
    return bands, pos


def _band_shapes(h: int, w: int, levels: int) -> list:
    """[{'LL': shape}, {'HL','LH','HH'}_n .. _1] matching _dwt_forward."""
    sizes = [(h, w)]
    for _ in range(levels):
        hh, ww = sizes[-1]
        sizes.append(((hh + 1) // 2, (ww + 1) // 2))
    out = [{"LL": sizes[levels]}]
    for lvl in range(levels, 0, -1):
        ph, pw = sizes[lvl - 1]
        lo_h, hi_h = (ph + 1) // 2, ph // 2
        lo_w, hi_w = (pw + 1) // 2, pw // 2
        out.append({"HL": (lo_h, hi_w), "LH": (hi_h, lo_w),
                    "HH": (hi_h, hi_w)})
    return out


def _mbs_for(depth: int) -> dict:
    return {o: depth + g + _GUARD - 1 for o, g in _GAIN.items()}


# --------------------------------------------------------------------------
# codestream


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jp2_codestream(array: np.ndarray, levels: int = 5) -> bytes:
    """Raw JPEG2000 codestream (SOC..EOC), lossless 5/3."""
    array = np.asarray(array)
    if array.ndim != 2:
        raise Jp2Error("JP2 encoder takes a 2-D single-band array")
    if array.dtype == np.uint8:
        depth, signed = 8, False
    elif array.dtype == np.uint16:
        depth, signed = 16, False
    elif array.dtype == np.int16:
        depth, signed = 16, True
    else:
        raise Jp2Error(f"unsupported dtype {array.dtype} "
                       "(uint8/uint16/int16)")
    h, w = array.shape
    if h == 0 or w == 0:
        raise Jp2Error("empty image")
    levels = max(0, min(levels,
                        max(min(h, w) - 1, 1).bit_length() - 1))
    x = array.astype(np.int64)
    if not signed:
        x -= 1 << (depth - 1)  # DC level shift (B.1.1)
    bands = _dwt_forward(x, levels)
    mbs = _mbs_for(depth)

    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, 1)
    siz += bytes([(depth - 1) | (0x80 if signed else 0), 1, 1])
    out += _seg(0xFF51, siz)
    cod = bytes([0])  # Scod: default precincts, no SOP/EPH
    cod += bytes([0, 0, 1])  # LRCP, 1 layer (u16 hi/lo), then MCT=0...
    # SGcod is: progression (1) + layers (2) + MCT (1)
    cod = bytes([0, 0, 0, 1, 0])
    cod += bytes([levels, _CB.bit_length() - 3, _CB.bit_length() - 3,
                  0, 1])  # SPcod: levels, xcb-2, ycb-2, style, 5/3
    out += _seg(0xFF52, cod)
    qcd = bytes([(_GUARD << 5) | 0])  # Sqcd: no quantization, G guard
    for o in (["LL"] + [oo for _ in range(levels)
                        for oo in _ORIENTS]):
        qcd += bytes([(depth + _GAIN[o]) << 3])
    out += _seg(0xFF5C, qcd)

    body = _encode_packets(bands, levels, mbs)
    psot = 12 + 2 + len(body)  # SOT seg (12) + SOD (2) + data
    out += _seg(0xFF90, struct.pack(">HIBB", 0, psot, 0, 1))
    out += b"\xff\x93"  # SOD
    out += body
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def decode_jp2_codestream(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\x4f":
        raise Jp2Error("not a JPEG2000 codestream (missing SOC)")
    pos = 2
    siz = cod = qcd = None
    tile_pos = None
    while pos + 4 <= len(data):
        marker, ln = struct.unpack(">HH", data[pos:pos + 4])
        if marker == 0xFF90:  # SOT
            tile_pos = pos
            break
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xFF51:
            siz = body
        elif marker == 0xFF52:
            cod = body
        elif marker == 0xFF5C:
            qcd = body
        elif marker in (0xFF53, 0xFF5D):  # COC / QCC
            raise Jp2Error("per-component COC/QCC overrides are not "
                           "supported")
        pos += 2 + ln
    if siz is None or cod is None or qcd is None or tile_pos is None:
        raise Jp2Error("JP2 codestream missing SIZ/COD/QCD/SOT")

    (_cap, xsiz, ysiz, x0, y0, xt, yt, xt0, yt0, ncomp) = struct.unpack(
        ">HIIIIIIIIH", siz[:36])
    if ncomp != 1:
        raise Jp2Error(f"multi-component JP2 ({ncomp}) is not supported")
    if x0 or y0 or xt0 or yt0 or xt < xsiz or yt < ysiz:
        raise Jp2Error("multi-tile / offset JP2 canvases are not "
                       "supported")
    ssiz, xr, yr = siz[36], siz[37], siz[38]
    if xr != 1 or yr != 1:
        raise Jp2Error("subsampled components are not supported")
    signed = bool(ssiz & 0x80)
    depth = (ssiz & 0x7F) + 1
    if depth > 16:
        raise Jp2Error(f"{depth}-bit JP2 samples are not supported")

    scod = cod[0]
    if scod & 0x01:
        raise Jp2Error("user-defined precincts are not supported")
    layers = (cod[2] << 8) | cod[3]
    if layers != 1:
        raise Jp2Error(f"{layers}-layer JP2 is not supported (1 only)")
    levels = cod[5]
    xcb, ycb = cod[6] + 2, cod[7] + 2
    if (1 << xcb) != _CB or (1 << ycb) != _CB:
        raise Jp2Error("only 64x64 code-blocks are supported")
    if cod[8] != 0:
        raise Jp2Error("code-block style modes (bypass/termall/...) are "
                       "not supported")
    if cod[9] != 1:
        raise Jp2Error("only the reversible 5/3 transform is supported "
                       "(lossy 9/7 streams need a full decoder)")

    sqcd = qcd[0]
    if (sqcd & 0x1F) != 0:
        raise Jp2Error("quantization styles are not supported "
                       "(reversible streams carry none)")
    guard = sqcd >> 5
    exps = [b >> 3 for b in qcd[1:]]
    mbs = {"LL": exps[0] + guard - 1}
    if levels:
        # all levels share our emitted exponents per orientation; trust
        # the finest-level triple (they differ only if an encoder chose
        # per-level exponents — read per subband below instead)
        pass

    # tile-part: SOT + SOD
    marker, ln = struct.unpack(">HH", data[tile_pos:tile_pos + 4])
    isot, psot, tpsot, tnsot = struct.unpack(
        ">HIBB", data[tile_pos + 4:tile_pos + 12])
    if isot != 0 or tpsot != 0:
        raise Jp2Error("multi-tile(-part) JP2 is not supported")
    sod = tile_pos + 2 + ln
    if data[sod:sod + 2] != b"\xff\x93":
        raise Jp2Error("JP2 tile-part missing SOD")
    body_start = sod + 2

    shapes = _band_shapes(ysiz, xsiz, levels)
    # per-subband Mb from the QCD exponent list (order: LL, then per
    # level HL, LH, HH from the coarsest)
    mbs_list = [{"LL": exps[0] + guard - 1}]
    k = 1
    for _ in range(levels):
        mbs_list.append({
            "HL": exps[k] + guard - 1,
            "LH": exps[k + 1] + guard - 1,
            "HH": exps[k + 2] + guard - 1,
        })
        k += 3

    # _decode_packets takes one Mb dict; feed per-resolution values via
    # a shim dict that dispatches on orientation per resolution
    bands, _end = _decode_packets_multi(data, body_start, levels,
                                        mbs_list, shapes)
    x = _dwt_inverse(bands, ysiz, xsiz, levels)
    if not signed:
        x += 1 << (depth - 1)
        lo, hi = 0, (1 << depth) - 1
    else:
        lo, hi = -(1 << (depth - 1)), (1 << (depth - 1)) - 1
    x = np.clip(x, lo, hi)
    if depth <= 8 and not signed:
        return x.astype(np.uint8)
    return x.astype(np.int16 if signed else np.uint16)


def _decode_packets_multi(data, pos, levels, mbs_list, band_shapes):
    bands: list = [np.zeros(band_shapes[0]["LL"], dtype=np.int64)]
    for lvl in range(1, levels + 1):
        bands.append({o: np.zeros(band_shapes[lvl][o], dtype=np.int64)
                      for o in _ORIENTS})
    sublist = _subband_list(levels)
    for r in range(levels + 1):
        hr = _HeaderReader(data, pos)
        chunks = []
        if hr.read():
            for bi, o in sublist[r]:
                arr = bands[bi][o] if bi else bands[0]
                if arr.size == 0:
                    continue
                gw, gh = _grid_dims(arr.shape)
                incl = _TagTree(gw, gh)
                zbp = _TagTree(gw, gh)
                mb = mbs_list[bi][o] if bi else mbs_list[0]["LL"]
                for r0 in range(0, arr.shape[0], _CB):
                    for c0 in range(0, arr.shape[1], _CB):
                        j, i = r0 // _CB, c0 // _CB
                        if incl.decode(hr, i, j, 1):
                            continue
                        zb = 0
                        while zbp.decode(hr, i, j, zb + 1):
                            zb += 1
                        n_passes = _read_passes(hr)
                        lb = 3
                        while hr.read():
                            lb += 1
                        lbits = lb + int(np.floor(np.log2(n_passes)))
                        length = hr.read_bits(lbits)
                        chunks.append((arr, r0, c0, o if bi else "LL",
                                       mb - zb, n_passes, length))
        pos = hr.align()
        for arr, r0, c0, orient, planes, n_passes, length in chunks:
            blk = data[pos:pos + length]
            if len(blk) != length:
                raise Jp2Error("JP2 packet body truncated")
            pos += length
            h = min(_CB, arr.shape[0] - r0)
            w = min(_CB, arr.shape[1] - c0)
            vals = _BlockDecoder(blk, h, w, orient, planes,
                                 n_passes).run()
            arr[r0:r0 + h, c0:c0 + w] = vals
    return bands, pos


# --------------------------------------------------------------------------
# JP2 container + GeoJP2 (degenerate-GeoTIFF UUID box, GDAL's default
# georeferencing for JP2 — a tiny 1x1 TIFF carrying only the geo tags)

_GEOJP2_UUID = bytes.fromhex("b14bf8bd083d4b43a5ae8cd7d5a6ce03")


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _geotiff_payload(x0: float, y0: float, sx: float, sy: float,
                     epsg: int) -> bytes:
    geographic = 4000 <= epsg <= 4999
    keys = [(1024, 0, 1, 2 if geographic else 1),  # GTModelType
            (1025, 0, 1, 1)]                       # GTRasterType=PixelIsArea
    keys.append((2048 if geographic else 3072, 0, 1, epsg))
    gkd = struct.pack("<4H", 1, 1, 0, len(keys))
    for k in keys:
        gkd += struct.pack("<4H", *k)

    tags = []  # (tag, type, count, value_or_offset_payload)
    # offsets are laid out after the 11-tag IFD: header(8) + count(2) +
    # 11*12 + next-IFD(4) = 146
    off = 8 + 2 + 11 * 12 + 4
    pixel = struct.pack("<3d", sx, sy, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0)
    extras = bytearray()

    def extra(data: bytes) -> int:
        nonlocal extras
        pos = off + len(extras)
        extras += data
        return pos

    strip_off = extra(b"\x00")
    tags = [
        (256, 3, 1, 1), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, strip_off), (277, 3, 1, 1),
        (279, 4, 1, 1),
        (33550, 12, 3, extra(pixel)),
        (33922, 12, 6, extra(tie)),
    ]
    gkd_off = extra(gkd)
    tags.append((34735, 3, len(gkd) // 2, gkd_off))
    assert len(tags) == 11  # the offset base above assumes exactly 11
    tags.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(tags))
    for tag, ftype, count, val in tags:
        out += struct.pack("<HHI", tag, ftype, count)
        if ftype == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += b"\x00\x00\x00\x00"  # next IFD
    out += extras
    return bytes(out)


def _parse_geotiff_payload(data: bytes):
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise Jp2Error("GeoJP2 UUID box does not contain a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (ntags,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    tags = {}
    for k in range(ntags):
        p = ifd_off + 2 + 12 * k
        tag, ftype, count = struct.unpack(bo + "HHI", data[p:p + 8])
        tags[tag] = (ftype, count, p + 8)

    def doubles(tag):
        ftype, count, vp = tags[tag]
        (off,) = struct.unpack(bo + "I", data[vp:vp + 4])
        return struct.unpack(bo + f"{count}d", data[off:off + 8 * count])

    if 33550 not in tags or 33922 not in tags:
        raise Jp2Error("GeoJP2 TIFF lacks ModelPixelScale/ModelTiepoint")
    sx, sy, _ = doubles(33550)
    tie = doubles(33922)
    x0 = tie[3] - tie[0] * sx
    y0 = tie[4] + tie[1] * sy
    epsg = None
    if 34735 in tags:
        ftype, count, vp = tags[34735]
        (off,) = struct.unpack(bo + "I", data[vp:vp + 4])
        vals = struct.unpack(bo + f"{count}H", data[off:off + 2 * count])
        nkeys = vals[3]
        for k in range(nkeys):
            kid, loc, cnt, val = vals[4 + 4 * k:8 + 4 * k]
            if kid in (2048, 3072) and loc == 0:
                epsg = int(val)
    return x0, y0, sx, sy, epsg


def encode_jp2(array: np.ndarray, *, x0: float, y0: float, sx: float,
               sy: float, epsg: int = 4326, levels: int = 5) -> bytes:
    """Full JP2 container (signature/ftyp/jp2h/GeoJP2 uuid/jp2c)."""
    array = np.asarray(array)
    cs = encode_jp2_codestream(array, levels=levels)
    depth = array.dtype.itemsize * 8
    signed = array.dtype.kind == "i"
    h, w = array.shape
    ihdr = struct.pack(">IIHBBBB", h, w, 1,
                       (depth - 1) | (0x80 if signed else 0), 7, 0, 0)
    colr = bytes([1, 0, 0]) + struct.pack(">I", 17)  # enum greyscale
    jp2h = _box(b"ihdr", ihdr) + _box(b"colr", colr)
    out = bytearray()
    out += _box(b"jP\x20\x20", b"\x0d\x0a\x87\x0a")
    out += _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    out += _box(b"jp2h", jp2h)
    out += _box(b"uuid",
                _GEOJP2_UUID + _geotiff_payload(x0, y0, sx, sy, epsg))
    out += _box(b"jp2c", cs)
    return bytes(out)


def decode_jp2(data: bytes):
    """JP2 container or raw codestream -> (array, geo dict | None)."""
    if data[:2] == b"\xff\x4f":
        return decode_jp2_codestream(data), None
    if data[4:8] != b"jP\x20\x20":
        raise Jp2Error("not a JP2 file (bad signature box)")
    pos = 0
    cs = None
    geo = None
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body_off = pos + 8
        if ln == 1:  # extended 64-bit length
            (ln,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body_off = pos + 16
        elif ln == 0:  # box runs to EOF
            ln = n - pos
        body = data[body_off:pos + ln]
        if btype == b"jp2c":
            cs = body
        elif btype == b"uuid" and body[:16] == _GEOJP2_UUID:
            x0, y0, sx, sy, epsg = _parse_geotiff_payload(body[16:])
            geo = {"x0": x0, "y0": y0, "sx": sx, "sy": sy, "epsg": epsg}
        pos += ln
    if cs is None:
        raise Jp2Error("JP2 file has no jp2c codestream box")
    return decode_jp2_codestream(cs), geo


def write_jp2(path: str, array: np.ndarray, *, x0: float, y0: float,
              sx: float, sy: float, epsg: int = 4326,
              levels: int = 5) -> None:
    with open(path, "wb") as f:
        f.write(encode_jp2(array, x0=x0, y0=y0, sx=sx, sy=sy, epsg=epsg,
                           levels=levels))


def open_jp2(path: str):
    """Open a GeoJP2 file as a geotiff.Raster (full-image decode; the
    per-tile file is the distributed pipeline's parallelism unit, so
    windowing happens on the decoded array)."""
    with open(path, "rb") as f:
        data = f.read()
    return open_jp2_bytes(path, data)


def open_jp2_bytes(path: str, data: bytes):
    """open_jp2 over already-fetched bytes (the remote full-object
    path — a JP2 codestream has no random access worth ranging into
    without a windowed tier-1, so remote tiles fetch whole)."""
    from .geotiff import CRSInfo, Raster, RasterOpenError

    try:
        arr, geo = decode_jp2(data)
    except Jp2Error as exc:
        raise RasterOpenError(f"'{path}': {exc}") from exc
    if geo is None:
        raise RasterOpenError(
            f"'{path}': JP2 without a GeoJP2 UUID box has no "
            "georeferencing (GMLJP2-only files are not supported)"
        )
    return Raster(
        path=path, width=arr.shape[1], height=arr.shape[0],
        dtype=arr.dtype, nodata=None,
        crs=CRSInfo(epsg=geo["epsg"]),
        x0=geo["x0"], y0=geo["y0"], sx=geo["sx"], sy=abs(geo["sy"]),
        _data=arr,
    )
