"""Arithmetic-coded sequential JPEG entropy codec (ITU-T T.81, Annexes
D/E/F).

The reference engine reads any GDAL-supported raster, which includes
arithmetic-coded JPEG-in-TIFF (/root/reference/opentopodata/backend.py:89
delegates to rasterio/GDAL, whose libjpeg build decodes SOF9 streams).
This module closes that format gap for the pure-numpy pipeline: it
implements the QM-coder (T.81 Annex D probability-estimation state
machine, Table D.3) plus the sequential-DCT DC/AC statistical models of
F.1.4 (encode) / F.2.4 (decode), layered under jpeg.py's existing frame
parser, DCT, and plane assembly.

Implementation notes
--------------------
* The QM coder is re-derived from the T.81 software-convention
  flowcharts (D.16-D.20): the LPS owns the bottom ``[0, Qe)`` of the
  current interval, the MPS the top, with the usual conditional
  interval exchange when renormalization makes ``A - Qe < Qe``.  Both
  directions were verified branch-by-branch against each other — the
  encoder below is the exact dual of the decoder, and the round-trip
  property tests in tests/test_jpeg_arith.py are the correctness
  contract (no external arithmetic-JPEG decoder exists in this
  environment to cross-check byte-exactness against).
* Rather than the spec's windowed 32-bit C register with BYTEOUT carry
  stacks, the encoder keeps the interval base as an arbitrary-precision
  integer (carry resolution is then ordinary addition) and flushes the
  carry-stable prefix incrementally: a 0-bit above the 16-bit
  arithmetic window is a carry barrier, so every bit above the lowest
  such 0 is final.  The decoder symmetrically consumes a plain bit
  list.  Both sides share the byte framing rule of the interchange
  format: a 0xFF data byte is followed by a byte whose top bit is
  stuffed to 0 (7 payload bits), and any 0xFF followed by a byte
  > 0x8F terminates the entropy segment (marker).
* Statistical bins follow Tables F.5/F.6: per-DC-table 49 bins
  (5 context classes x 4 decision bins, X1..X15 at offset 20, M2..M15
  at +14), per-AC-table 245 bins (3 per zigzag index k, the low/high
  X2.. chains at 189/217 selected by the Kx conditioning, M bins at
  +14).  Conditioning defaults L=0, U=1, Kx=5; a DAC segment overrides
  them per table id.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decode_scan_arith",
    "encode_entropy_arith",
    "parse_dac",
    "DC_COND_DEFAULT",
    "AC_COND_DEFAULT",
]

DC_COND_DEFAULT = (0, 1)  # (L, U)
AC_COND_DEFAULT = 5  # Kx

# T.81 Table D.3: Qe value, Next_Index_LPS, Next_Index_MPS, Switch_MPS.
# Index 113 is the non-adapting ~equiprobable state used for AC signs
# (F.1.4.3.1: "fixed probability estimate of 0.5").
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    # fixed ~0.5 bin: never adapts
    (0x5A1D, 113, 113, 0),
)

_FIXED_BIN = 113

# Stat-area layout (Tables F.5/F.6)
_DC_STAT_BINS = 49
_DC_X1 = 20
_AC_STAT_BINS = 245
_AC_XLOW = 189  # X2.. chain for k <= Kx
_AC_XHIGH = 217  # X2.. chain for k > Kx


class _Stats:
    """One statistics area: per-bin Qe-table index + MPS sense."""

    __slots__ = ("idx", "mps")

    def __init__(self, nbins: int):
        self.idx = bytearray(nbins)
        self.mps = bytearray(nbins)


def parse_dac(body: bytes, dc_cond: dict, ac_cond: dict) -> None:
    """DAC segment (T.81 B.2.4.3): pairs of (Tc<<4|Tb, Cs). DC tables:
    Cs = U<<4 | L; AC tables: Cs = Kx in [1, 63]."""
    from .jpeg import JpegError

    if len(body) % 2:
        raise JpegError("DAC segment length must be even")
    for j in range(0, len(body), 2):
        tc, tb = body[j] >> 4, body[j] & 0x0F
        cs = body[j + 1]
        if tb > 3:
            raise JpegError(f"DAC table id {tb} out of range")
        if tc == 0:
            low, up = cs & 0x0F, cs >> 4
            if low > up:
                raise JpegError("DAC DC conditioning requires L <= U")
            dc_cond[tb] = (low, up)
        elif tc == 1:
            if not 1 <= cs <= 63:
                raise JpegError(f"DAC AC conditioning Kx={cs} out of range")
            ac_cond[tb] = cs
        else:
            raise JpegError(f"DAC table class {tc} invalid")


# --------------------------------------------------------------------------
# QM coder — decoder side


class _ArithDecoder:
    """QM/MQ-family decoder over a de-framed bit list (MSB-first entropy
    bits).

    Maintains ``c_off`` = (code value prefix) - (accumulated interval
    base), which the interval updates keep inside [0, A).  Exhausted
    input feeds 1-bits, matching the marker-feeds-1s rule of BYTEIN.
    The table/interval parameters default to T.81's QM coder; T.800's
    MQ coder (jp2.py) shares the identical branch structure with its
    own 47-state table and a 15-bit interval.
    """

    __slots__ = ("bits", "pos", "n", "a", "c_off", "table")

    def __init__(self, bits: list, table=None, a_init: int = 0x10000,
                 init_bits: int = 16):
        self.bits = bits
        self.n = len(bits)
        self.table = _QE if table is None else table
        v = 0
        for i in range(init_bits):
            v = (v << 1) | (bits[i] if i < self.n else 1)
        self.pos = init_bits
        self.a = a_init
        self.c_off = v

    def _renorm(self):
        bits, n = self.bits, self.n
        a, c, pos = self.a, self.c_off, self.pos
        while a < 0x8000:
            a <<= 1
            c = (c << 1) | (bits[pos] if pos < n else 1)
            pos += 1
        self.a, self.c_off, self.pos = a, c, pos

    def decode(self, st: _Stats, i: int) -> int:
        qe, nlps, nmps, sw = self.table[st.idx[i]]
        a = self.a - qe
        if self.c_off < qe:
            # bottom subinterval: LPS unless the exchange applies
            if a < qe:
                d = st.mps[i]
                st.idx[i] = nmps
            else:
                d = st.mps[i] ^ 1
                if sw:
                    st.mps[i] ^= 1
                st.idx[i] = nlps
            self.a = qe
            self._renorm()
            return d
        self.c_off -= qe
        if a & 0x8000:
            self.a = a
            return st.mps[i]
        if a < qe:
            d = st.mps[i] ^ 1
            if sw:
                st.mps[i] ^= 1
            st.idx[i] = nlps
        else:
            d = st.mps[i]
            st.idx[i] = nmps
        self.a = a
        self._renorm()
        return d


# --------------------------------------------------------------------------
# QM coder — encoder side


class _ArithEncoder:
    """QM/MQ-family encoder: big-int interval base + incremental
    stable-prefix flush; ``finish()`` returns the framed entropy bytes
    (FF-stuffed). Parameters as in _ArithDecoder."""

    __slots__ = ("a", "base", "pending", "out", "accv", "accn", "last_ff",
                 "table")

    def __init__(self, table=None, a_init: int = 0x10000,
                 init_bits: int = 16):
        self.table = _QE if table is None else table
        self.a = a_init
        self.base = 0
        self.pending = init_bits  # bits currently represented by `base`
        self.out = bytearray()
        self.accv = 0  # bit accumulator value
        self.accn = 0  # bits in accumulator
        self.last_ff = False

    def encode(self, st: _Stats, i: int, d: int) -> None:
        qe, nlps, nmps, sw = self.table[st.idx[i]]
        a = self.a - qe
        if d == st.mps[i]:
            if a & 0x8000:
                self.base += qe
                self.a = a
                return
            if a < qe:  # exchange: MPS takes the bottom [0, qe)
                self.a = qe
            else:
                self.base += qe
                self.a = a
            st.idx[i] = nmps
        else:
            if a < qe:  # exchange: LPS takes the top [qe, a)
                self.base += qe
                self.a = a
            else:
                self.a = qe
            if sw:
                st.mps[i] ^= 1
            st.idx[i] = nlps
        # renormalize; flush carry-stable prefix when base grows
        while self.a < 0x8000:
            self.a <<= 1
            self.base <<= 1
            self.pending += 1
        if self.pending > 96:
            self._flush_stable()

    def _flush_stable(self):
        # Interval updates only ever add <= 17-bit values to `base`, so a
        # 0-bit at position >= 18 is a carry barrier: bits strictly above
        # the lowest such 0 are final.
        base, pending = self.base, self.pending
        z = 18
        while z < pending and (base >> z) & 1:
            z += 1
        stable = pending - z - 1
        if stable <= 0:
            return
        self._push_bits(base >> (z + 1), stable)
        self.base = base & ((1 << (z + 1)) - 1)
        self.pending = z + 1

    def _push_bits(self, v: int, nbits: int) -> None:
        self.accv = (self.accv << nbits) | v
        self.accn += nbits
        accv, accn = self.accv, self.accn
        out = self.out
        need = 7 if self.last_ff else 8
        while accn >= need:
            b = (accv >> (accn - need)) & ((1 << need) - 1)
            accn -= need
            out.append(b)  # 7-bit bytes have their top bit stuffed to 0
            self.last_ff = b == 0xFF
            need = 7 if self.last_ff else 8
        self.accv = accv & ((1 << accn) - 1) if accn else 0
        self.accn = accn

    def finish(self) -> bytes:
        # Any value in [base, base+a) decodes correctly; emit base+a-1 so
        # the decoder's trailing 1-bit feed stays inside the interval.
        v = self.base + self.a - 1
        self._push_bits(v, self.pending)
        if self.accn:  # zero-pad the final partial byte
            need = 7 if self.last_ff else 8
            self._push_bits(0, need - self.accn)
        return bytes(self.out)


def _deframe_bits(raw: bytes) -> list:
    """Framed entropy bytes -> bit list: every byte contributes 8 bits
    except a byte following 0xFF, which contributes its low 7 (the
    stuffed-0 convention). The caller strips markers beforehand."""
    bits: list = []
    prev_ff = False
    for b in raw:
        if prev_ff:
            for k in range(6, -1, -1):
                bits.append((b >> k) & 1)
        else:
            for k in range(7, -1, -1):
                bits.append((b >> k) & 1)
        prev_ff = b == 0xFF
    return bits


def _split_scan_raw(data: bytes, start: int):
    """Entropy byte ranges from `start` split at RSTn markers, bytes kept
    verbatim (arithmetic streams use bit stuffing, not 0xFF00 byte
    stuffing — jpeg._split_scan's de-stuffing would corrupt them).
    Returns (intervals, pos_of_first_non_RST_marker)."""
    intervals = []
    buf = bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m <= 0x8F:  # stuffed data byte pair: keep both
            buf.append(0xFF)
            buf.append(m)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            intervals.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:
            break
    intervals.append(bytes(buf))
    return intervals, i


# --------------------------------------------------------------------------
# statistical models (T.81 F.1.4 encode / F.2.4 decode)


def _dc_classify(m: int, sign: int, low: int, up: int) -> int:
    """Conditioning class of a just-coded nonzero DC difference, from
    its magnitude-category power `m` (0 when |diff| == 1) and sign —
    the stat-area offset for the NEXT block (F.1.4.4.1.2). Zero diffs
    take class 0 directly at the call sites."""
    if m < ((1 << low) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + (sign << 2)
    return 4 + (sign << 2)


def _decode_dc(dec, st: _Stats, ctx: int, low: int, up: int):
    """Returns (diff, next_ctx)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    pos = ctx + 2 + sign
    m = 0
    if dec.decode(st, pos):
        m = 1
        pos = _DC_X1
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                from .jpeg import JpegError

                raise JpegError("arithmetic DC magnitude overflow")
            pos += 1
    nxt = _dc_classify(m, sign, low, up)
    v = m
    mag = pos + 14
    while m > 1:
        m >>= 1
        if dec.decode(st, mag):
            v |= m
    v += 1
    return (-v if sign else v), nxt


def _encode_dc(enc, st: _Stats, ctx: int, diff: int, low: int, up: int):
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    pos = ctx + 2 + sign
    v = (-diff if sign else diff) - 1
    if v == 0:
        enc.encode(st, pos, 0)
        m = 0
    else:
        enc.encode(st, pos, 1)
        m = 1
        pos = _DC_X1
        while (m << 1) <= v:
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(st, pos, 0)
    nxt = _dc_classify(m, sign, low, up)
    mag = pos + 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st, mag, 1 if v & mm else 0)
    return nxt


def _decode_ac_block(dec, st: _Stats, fixed: _Stats, coefs, kx: int):
    """Fill zigzag coefficients 1..63 of one block (F.2.4.2)."""
    from .jpeg import JpegError

    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > 63:
                raise JpegError("arithmetic AC run overflow")
            base = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        pos = base + 2
        m = 0
        if dec.decode(st, pos):
            m = 1
            if dec.decode(st, pos):
                m = 2
                pos = _AC_XLOW if k <= kx else _AC_XHIGH
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegError("arithmetic AC magnitude overflow")
                    pos += 1
        v = m
        mag = pos + 14
        while m > 1:
            m >>= 1
            if dec.decode(st, mag):
                v |= m
        v += 1
        coefs[k] = -v if sign else v
        k += 1


def _encode_ac_block(enc, st: _Stats, fixed: _Stats, coefs, kx: int):
    nz = np.nonzero(coefs[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    k = 1
    while k <= last:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while int(coefs[k]) == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        val = int(coefs[k])
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        pos = base + 2
        v = (-val if sign else val) - 1
        if v == 0:
            enc.encode(st, pos, 0)
            m = 0
        elif v == 1:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 0)
            m = 1
        else:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 1)
            m = 2
            pos = _AC_XLOW if k <= kx else _AC_XHIGH
            while (m << 1) <= v:
                enc.encode(st, pos, 1)
                m <<= 1
                pos += 1
            enc.encode(st, pos, 0)
        mag = pos + 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(st, mag, 1 if v & mm else 0)
        k += 1
    if last < 63:
        enc.encode(st, 3 * last, 1)  # EOB decision at k = last + 1


# --------------------------------------------------------------------------
# scan-level entry points


def decode_scan_arith(data, start, frame, quant, dc_cond, ac_cond,
                      restart_interval):
    """Sequential arithmetic scan -> decoded image array; mirrors
    jpeg._decode_scan's MCU walk and reuses its assembly tail."""
    from .jpeg import JpegError, _assemble_image

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise JpegError("empty JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        hmax = vmax = comps[0]["h"] = comps[0]["v"] = 1
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    intervals, _ = _split_scan_raw(data, start)

    for c in comps:
        if c["tq"] not in quant:
            raise JpegError("JPEG quant table missing")
        c["blocks"] = np.zeros((n_mcu * c["h"] * c["v"], 64), dtype=np.float64)

    expected = restart_interval if restart_interval else n_mcu
    mcu = 0
    for ivl in intervals:
        if mcu >= n_mcu:
            break
        dec = _ArithDecoder(_deframe_bits(ivl))
        fixed = _Stats(1)
        fixed.idx[0] = _FIXED_BIN
        dc_stats = {c["dc"]: _Stats(_DC_STAT_BINS) for c in comps}
        ac_stats = {c["ac"]: _Stats(_AC_STAT_BINS) for c in comps}
        pred = {id(c): 0 for c in comps}
        dcctx = {id(c): 0 for c in comps}
        for _ in range(min(expected, n_mcu - mcu)):
            for c in comps:
                low, up = dc_cond.get(c["dc"], DC_COND_DEFAULT)
                kx = ac_cond.get(c["ac"], AC_COND_DEFAULT)
                dst, ast = dc_stats[c["dc"]], ac_stats[c["ac"]]
                nblk = c["h"] * c["v"]
                base = mcu * nblk
                for b in range(nblk):
                    coefs = c["blocks"][base + b]
                    diff, dcctx[id(c)] = _decode_dc(
                        dec, dst, dcctx[id(c)], low, up
                    )
                    pred[id(c)] += diff
                    coefs[0] = pred[id(c)]
                    _decode_ac_block(dec, ast, fixed, coefs, kx)
            mcu += 1
    if mcu != n_mcu:
        raise JpegError("JPEG truncated: missing MCUs")
    return _assemble_image(frame, quant, mcux, mcuy, hmax, vmax)


def encode_entropy_arith(comps_zz, comp_dc, nblk, table_of, n_mcu,
                         restart_interval, dc_cond, ac_cond):
    """Entropy-code quantized zigzag blocks (the encoder pipeline's
    comp_zz/comp_dc arrays) -> list of framed entropy segments, one per
    restart interval (the caller interleaves RSTn markers)."""
    ncomp = len(comps_zz)
    segments = []
    idx = [0] * ncomp
    mcu = 0
    while mcu < n_mcu:
        run = min(
            restart_interval if restart_interval else n_mcu, n_mcu - mcu
        )
        enc = _ArithEncoder()
        fixed = _Stats(1)
        fixed.idx[0] = _FIXED_BIN
        dc_stats = {}
        ac_stats = {}
        dcctx = [0] * ncomp
        for ci in range(ncomp):
            t = table_of[ci]
            dc_stats.setdefault(t, _Stats(_DC_STAT_BINS))
            ac_stats.setdefault(t, _Stats(_AC_STAT_BINS))
        for _ in range(run):
            for ci in range(ncomp):
                t = table_of[ci]
                low, up = dc_cond.get(t, DC_COND_DEFAULT)
                kx = ac_cond.get(t, AC_COND_DEFAULT)
                for _b in range(nblk[ci]):
                    d = int(comp_dc[ci][idx[ci]])
                    zz = comps_zz[ci][idx[ci]]
                    idx[ci] += 1
                    dcctx[ci] = _encode_dc(
                        enc, dc_stats[t], dcctx[ci], d, low, up
                    )
                    _encode_ac_block(enc, ac_stats[t], fixed, zz, kx)
            mcu += 1
        segments.append(enc.finish())
    return segments
