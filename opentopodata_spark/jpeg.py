"""Minimal pure-numpy baseline JPEG codec (decode + encode).

JPEG is the dominant media type in any web crawl, so the multimodal
``decoder='real'`` path must handle it — but this container has no
PIL/libjpeg/ffmpeg. Like png.py, the codec is implemented from the
public specification (ITU-T T.81 / ISO 10918-1): marker segment
parsing, canonical Huffman entropy coding, 8x8 DCT-II with the standard
zigzag scan, YCbCr <-> RGB (JFIF/BT.601 full-range), and 4:4:4 / 4:2:2 /
4:2:0 chroma subsampling.

Scope (deliberately the baseline web subset):

* baseline sequential DCT (SOF0; SOF1 extended-sequential accepted — the
  decode path is identical for 8-bit), 8-bit samples
* 1-component (grayscale) and 3-component (YCbCr) images
* sampling factors up to 2x2 (covers 4:4:4, 4:2:2, 4:2:0)
* restart markers (DRI / RSTn), 0xFF00 byte stuffing
* progressive (SOF2), arithmetic coding, 12-bit, and CMYK raise JpegError
  with a message naming the feature — they are resolvable seams, not
  silent corruption.

The encoder exists so fixtures and differential tests have deterministic
real JPEG bytes without external tools. It is two-pass: symbol
frequencies are counted, then per-table canonical Huffman codes are
built from the actual data (any spec-conformant decoder reads the DHT
segments it emits, so the stream is fully standard) — this avoids
shipping the Annex K typical tables from memory while producing
*smaller* files than they would.

Decode structure: the per-bit Huffman walk is a Python loop (entropy
coding is inherently sequential), but everything after it — dequantize,
un-zigzag, IDCT, level shift, chroma upsampling, color transform — runs
as one vectorized numpy pass over ALL blocks of a component at once, so
batch featurization of many small crawl images stays cheap.

Reference: ITU-T T.81 (public); no reference-repo analog (opentopodata
has no media path).
"""

from __future__ import annotations

import heapq
import itertools
import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "encode_jpeg", "is_jpeg"]


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and bytes(data[:3]) == b"\xff\xd8\xff"


# --------------------------------------------------------------------------
# shared tables


def _zigzag_pairs() -> list[tuple[int, int]]:
    """(row, col) in zigzag scan order, generated (not transcribed):
    anti-diagonals s = r+c in increasing order; even diagonals walk
    bottom-left -> top-right, odd ones top-right -> bottom-left."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()
        out.extend(diag)
    return out


_ZZ = _zigzag_pairs()
# raster index (row*8+col) for each zigzag position
_ZZ_RASTER = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)
# zigzag position for each raster index (the inverse permutation)
_ZZ_POS = np.argsort(_ZZ_RASTER)

# Annex K.1/K.2 example quantization tables (the de-facto web defaults)
_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _dct_basis() -> np.ndarray:
    """8x8 DCT-II basis C with C[u, x] = a(u) cos((2x+1)u pi/16):
    coef = C @ block @ C.T, block = C.T @ coef @ C (orthonormal)."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / 16.0)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_C = _dct_basis()


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) spatial samples
    (still level-shifted by -128)."""
    return np.einsum("ux,nuv,vy->nxy", _C, coef, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> quant table convention."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    return np.clip(np.floor((table * scale + 50.0) / 100.0), 1, 255)


# --------------------------------------------------------------------------
# decoder


def _build_huff_decoder(counts: list[int], symbols: bytes) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} canonical map."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8)).tolist()
        self.pos = 0
        self.n = len(self.bits)

    def read_huff(self, table: dict) -> int:
        code = 0
        pos = self.pos
        bits = self.bits
        n = self.n
        for length in range(1, 17):
            if pos >= n:
                raise JpegError("JPEG entropy stream truncated")
            code = (code << 1) | bits[pos]
            pos += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = pos
                return sym
        raise JpegError("invalid JPEG Huffman code")

    def receive_extend(self, t: int) -> int:
        if t == 0:
            return 0
        pos = self.pos
        if pos + t > self.n:
            raise JpegError("JPEG entropy stream truncated")
        v = 0
        bits = self.bits
        for _ in range(t):
            v = (v << 1) | bits[pos]
            pos += 1
        self.pos = pos
        if v < (1 << (t - 1)):  # EXTEND: negative branch
            v -= (1 << t) - 1
        return v


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from `start` split at RSTn markers, with 0xFF00
    stuffing removed in each interval. Returns (intervals, pos_of_marker)
    where the marker at pos is the first non-RST marker (EOI/next seg)."""
    intervals: list[bytes] = []
    buf = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            buf.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:  # stuffed FF
            buf.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            intervals.append(bytes(buf))
            buf = bytearray()
            i += 2
        else:  # real marker: scan over
            break
    intervals.append(bytes(buf))
    return intervals, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (height, width, channels) uint8 (channels 1 or 3).

    Raises JpegError on anything outside the baseline subset.
    """
    data = bytes(data)
    if not is_jpeg(data):
        raise JpegError("not a JPEG (bad signature)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("JPEG marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2")
                    j += 128
                q = np.zeros(64, dtype=np.float64)
                q[_ZZ_RASTER] = tbl  # stored in zigzag order
                quant[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            precision = body[0]
            if precision != 8:
                raise JpegError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise JpegError(f"unsupported sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise JpegError(f"unsupported JPEG SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                counts = list(body[j + 1 : j + 17])
                total = sum(counts)
                symbols = body[j + 17 : j + 17 + total]
                tbl = _build_huff_decoder(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                j += 17 + total
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("JPEG SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tds = body[1 + 2 * c : 3 + 2 * c]
                comp = next(
                    (cc for cc in frame["comps"] if cc["id"] == cs), None
                )
                if comp is None:
                    raise JpegError("JPEG scan references unknown component")
                comp["dc"] = tds >> 4
                comp["ac"] = tds & 0x0F
                scan_comps.append(comp)
            if len(scan_comps) != len(frame["comps"]):
                raise JpegError("partial JPEG scans not supported")
            scan_start = pos + 2 + seglen
            return _decode_scan(
                data, scan_start, frame, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    raise JpegError("JPEG missing SOS")


def _decode_scan(data, start, frame, quant, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise JpegError("empty JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(comps) == 1:
        # single-component scans are not interleaved: the MCU is one block
        hmax = vmax = comps[0]["h"] = comps[0]["v"] = 1
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    intervals, _ = _split_scan(data, start)

    for c in comps:
        if c["tq"] not in quant:
            raise JpegError("JPEG quant table missing")
        if c["dc"] not in huff_dc or c["ac"] not in huff_ac:
            raise JpegError("JPEG Huffman table missing")
        c["blocks"] = np.zeros(
            (n_mcu * c["h"] * c["v"], 64), dtype=np.float64
        )

    expected_per_interval = (
        restart_interval if restart_interval else n_mcu
    )
    mcu = 0
    for ivl in intervals:
        if mcu >= n_mcu:
            break
        reader = _BitReader(ivl)
        pred = {id(c): 0 for c in comps}
        for _ in range(min(expected_per_interval, n_mcu - mcu)):
            for c in comps:
                dct, act = huff_dc[c["dc"]], huff_ac[c["ac"]]
                nblk = c["h"] * c["v"]
                base = mcu * nblk
                for b in range(nblk):
                    coefs = c["blocks"][base + b]
                    t = reader.read_huff(dct)
                    if t > 11:
                        raise JpegError("invalid JPEG DC category")
                    diff = reader.receive_extend(t)
                    pred[id(c)] += diff
                    coefs[0] = pred[id(c)]
                    k = 1
                    while k < 64:
                        rs = reader.read_huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("JPEG AC run overflow")
                        coefs[k] = reader.receive_extend(s)
                        k += 1
            mcu += 1
    if mcu != n_mcu:
        raise JpegError("JPEG truncated: missing MCUs")

    # vectorized tail: dequantize + un-zigzag + IDCT per component,
    # then stitch MCU block grids into planes and upsample
    planes = []
    for c in comps:
        q = quant[c["tq"]].reshape(64)[_ZZ_RASTER]  # zigzag-ordered
        coef_zz = c["blocks"] * q
        coef = np.zeros_like(coef_zz)
        coef[:, _ZZ_RASTER] = coef_zz
        spatial = _idct_blocks(coef.reshape(-1, 8, 8)) + 128.0
        ch, cv = c["h"], c["v"]
        # blocks are stored MCU-major, then v-major then h within the MCU
        grid = spatial.reshape(mcuy, mcux, cv, ch, 8, 8)
        plane = grid.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcuy * cv * 8, mcux * ch * 8
        )
        # upsample to full resolution (sample replication)
        ry, rx = vmax // cv, hmax // ch
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder


def _bit_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _build_huff_encoder(freqs: dict[int, int]) -> tuple[list[int], bytes, dict]:
    """Symbol frequencies -> (BITS counts, HUFFVAL symbols, {sym: (code,
    len)}) canonical Huffman. Uses a plain Huffman tree (depth > 16 can't
    occur at our block counts; guarded anyway by a fixed-length fallback
    that is also spec-valid)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        # a single symbol still needs a 1-bit code
        lengths = {syms[0]: 1}
    else:
        heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
        heapq.heapify(heap)
        counter = itertools.count(len(heap))
        depth: dict[int, int] = {s: 0 for s in syms}
        while len(heap) > 1:
            f1, _, g1 = heapq.heappop(heap)
            f2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (f1 + f2, next(counter), g1 + g2))
        lengths = depth
        if max(lengths.values()) > 16:  # pragma: no cover - needs 2^16 blocks
            L = max(1, (len(syms)).bit_length())
            lengths = {s: L for s in syms}
    # canonical assignment: shorter codes first, symbol order within length
    order = sorted(syms, key=lambda s: (lengths[s], s))
    counts = [0] * 16
    for s in order:
        counts[lengths[s] - 1] += 1
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = lengths[order[0]]
    for s in order:
        code <<= lengths[s] - prev_len
        prev_len = lengths[s]
        codes[s] = (code, lengths[s])
        code += 1
    return counts, bytes(order), codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding per spec
        return bytes(self.out)


def _component_ac_symbols(coef_zz: np.ndarray):
    """Quantized zigzag coefficients (n_blocks, 64) -> per-block AC
    symbol streams [(rs, ac_val), ...] (run/size coding + ZRL + EOB)."""
    out = []
    for i in range(coef_zz.shape[0]):
        acs = []
        run = 0
        row = coef_zz[i]
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0))  # ZRL
                run -= 16
            acs.append(((run << 4) | _bit_category(v), v))
            run = 0
        if last < 63:
            acs.append((0x00, 0))  # EOB
        out.append(acs)
    return out


def _dc_diffs(raw_dc: np.ndarray, blocks_per_mcu: int,
              restart_interval: int) -> np.ndarray:
    """Per-block DC differences in scan order, with the predictor reset
    at every restart boundary (exactly what the decoder will undo)."""
    prev = np.concatenate([[0], raw_dc[:-1]])
    if restart_interval:
        n_mcu = len(raw_dc) // blocks_per_mcu
        resets = np.arange(restart_interval, n_mcu, restart_interval)
        prev[resets * blocks_per_mcu] = 0
    return raw_dc - prev


def encode_jpeg(array: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 1|3) uint8 -> baseline JFIF bytes.

    subsampling: "444" (no chroma subsampling) or "420" (2x2). Grayscale
    input emits a single-component stream. restart_interval > 0 emits a
    DRI segment and RSTn markers every that many MCUs (DC predictors
    reset, bitstream byte-aligned) — what real encoders do for error
    resilience, and what exercises the decoder's interval splitting.
    Deterministic: same input -> same bytes (Huffman tables are derived
    from the data, canonically)."""
    array = np.asarray(array, dtype=np.uint8)
    if array.ndim == 2:
        array = array[:, :, None]
    if array.ndim != 3 or array.shape[2] not in (1, 3):
        raise JpegError(f"unsupported array shape {array.shape}")
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling '{subsampling}'")
    h, w, nchan = array.shape
    if h == 0 or w == 0:
        raise JpegError("empty image")

    gray = nchan == 1
    if gray:
        planes = [array[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
    else:
        rgb = array.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            samps = [(2, 2), (1, 1), (1, 1)]
            # chroma planes: average 2x2 neighborhoods (pad to even first)
            def ds(p):
                ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:]])
                ph = ph if ph.shape[1] % 2 == 0 else np.hstack(
                    [ph, ph[:, -1:]]
                )
                return 0.25 * (
                    ph[0::2, 0::2] + ph[0::2, 1::2]
                    + ph[1::2, 0::2] + ph[1::2, 1::2]
                )
            planes = [y, ds(cb), ds(cr)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qtables = {0: _quality_scale(_QUANT_LUMA, quality)}
    if not gray:
        qtables[1] = _quality_scale(_QUANT_CHROMA, quality)

    # per component: pad plane to the MCU grid, FDCT, quantize, zigzag
    comp_zz = []
    for plane, (sh, sv), qid in zip(planes, samps, qids):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded = np.empty((ph, pw), dtype=np.float64)
        padded[: plane.shape[0], : plane.shape[1]] = plane
        padded[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        padded[:, plane.shape[1]:] = padded[:, plane.shape[1] - 1 : plane.shape[1]]
        # MCU-major, v-major then h inside the MCU (the scan block order)
        blocks = (
            padded.reshape(mcuy, sv, 8, mcux, sh, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(-1, 8, 8)
        ) - 128.0
        coef = _fdct_blocks(blocks)
        q = qtables[qid]
        qz = np.round(coef / q).astype(np.int64).reshape(-1, 64)
        comp_zz.append(qz[:, _ZZ_RASTER])  # raster -> zigzag order
    comp_acs = [_component_ac_symbols(zz) for zz in comp_zz]
    nblk = [sh * sv for sh, sv in samps]
    comp_dc = [
        _dc_diffs(zz[:, 0], nb, restart_interval)
        for zz, nb in zip(comp_zz, nblk)
    ]

    # Huffman table classes: 0 = luma (component 0), 1 = chroma (1, 2)
    table_of = [0] + ([1, 1] if not gray else [])
    dc_freq: dict[int, dict[int, int]] = {0: {}, 1: {}}
    ac_freq: dict[int, dict[int, int]] = {0: {}, 1: {}}
    for ci in range(len(comp_zz)):
        t = table_of[ci]
        for d in comp_dc[ci]:
            dcat = _bit_category(int(d))
            dc_freq[t][dcat] = dc_freq[t].get(dcat, 0) + 1
        for acs in comp_acs[ci]:
            for rs, _ in acs:
                ac_freq[t][rs] = ac_freq[t].get(rs, 0) + 1

    huff = {}
    for t in (0, 1):
        if dc_freq[t]:
            huff[("dc", t)] = _build_huff_encoder(dc_freq[t])
        if ac_freq[t]:
            huff[("ac", t)] = _build_huff_encoder(ac_freq[t])

    # ---- emit segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in qtables.items():
        zz = q.reshape(64)[_ZZ_RASTER].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    out += seg(0xC0, sof)
    for (kind, t), (counts, symbols, _) in sorted(huff.items()):
        tc = 0 if kind == "dc" else 1
        out += seg(0xC4, bytes([(tc << 4) | t]) + bytes(counts) + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = table_of[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += seg(0xDA, sos)

    # ---- entropy-coded data: interleave components per MCU
    writer = _BitWriter()
    n_mcu = mcux * mcuy
    idx = [0] * ncomp
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()  # byte-align before the marker
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
        for ci in range(ncomp):
            t = table_of[ci]
            _, _, dc_codes = huff[("dc", t)]
            _, _, ac_codes = huff[("ac", t)]
            for _b in range(nblk[ci]):
                d = int(comp_dc[ci][idx[ci]])
                acs = comp_acs[ci][idx[ci]]
                idx[ci] += 1
                dcat = _bit_category(d)
                code, ln = dc_codes[dcat]
                writer.write(code, ln)
                if dcat:
                    v = d if d >= 0 else d + (1 << dcat) - 1
                    writer.write(v, dcat)
                for rs, av in acs:
                    code, ln = ac_codes[rs]
                    writer.write(code, ln)
                    s = rs & 0x0F
                    if s:
                        v = av if av >= 0 else av + (1 << s) - 1
                        writer.write(v, s)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
