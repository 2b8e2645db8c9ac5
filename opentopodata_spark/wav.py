"""Pure-numpy RIFF/WAVE (PCM) codec for the multimodal audio path.

The audio analog of png.py / jpeg.py: the sandbox has no soundfile/
ffmpeg, and shipping binary codecs to every executor is exactly what a
pure-numpy decoder avoids. Covers the formats a crawl corpus actually
contains in WAV containers: PCM 8-bit unsigned, 16/24/32-bit signed
little-endian, IEEE float32 (format 3), G.711 mu-law/A-law (formats
7/6 — the telephony pair, via the public Sun g711.c formulas), and
IMA/DVI ADPCM (format 0x11, the 4-bit block-adaptive codec), any
channel count. Remaining compressed flavors (MS ADPCM, GSM) raise
``WavError('... not supported')`` so the multimodal decode stage can
degrade that payload to 'unsupported' rather than 'corrupt'.

All decoders return float64 samples normalized to [-1, 1], shape
(n_frames, channels).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "is_wav", "decode_wav", "encode_wav",
           "encode_wav_compressed"]


class WavError(Exception):
    pass


def is_wav(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def decode_wav(b: bytes):
    """(samples float64 (n_frames, channels) in [-1, 1], sample_rate)."""
    if not is_wav(b):
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                raise WavError("truncated data chunk")
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt
    if channels < 1 or rate < 1:
        raise WavError("invalid channel count or sample rate")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
            x = x / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise WavError(f"PCM bit depth {bits} not supported")
    elif audio_format == 3:  # IEEE float
        if bits != 32:
            raise WavError(f"float bit depth {bits} not supported")
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif audio_format == 6:  # G.711 A-law
        x = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)] / 32768.0
    elif audio_format == 7:  # G.711 mu-law
        x = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)] / 32768.0
    elif audio_format == 0x11:  # IMA/DVI ADPCM
        balign = fmt[4]
        pcm = _decode_ima_adpcm(data, channels, balign)
        return pcm.astype(np.float64) / 32768.0, int(rate)
    else:
        raise WavError(f"audio format {audio_format} not supported")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), int(rate)


# --------------------------------------------------------------------------
# G.711 mu-law / A-law (public spec; the classic Sun g711.c formulas)


def _build_ulaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.float64)
    for u in range(256):
        v = ~u & 0xFF
        t = ((v & 0x0F) << 3) + 0x84
        t <<= (v & 0x70) >> 4
        out[u] = (0x84 - t) if (v & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    out = np.empty(256, dtype=np.float64)
    for a in range(256):
        v = a ^ 0x55
        t = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[a] = t if (v & 0x80) else -t
    return out


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()
# encoders: invert by nearest-value search over the 256 decoded levels
_ULAW_ENC_ORDER = np.argsort(_ULAW_TABLE, kind="stable")
_ALAW_ENC_ORDER = np.argsort(_ALAW_TABLE, kind="stable")


def _g711_encode(linear: np.ndarray, table: np.ndarray,
                 order: np.ndarray) -> np.ndarray:
    """int16 samples -> companded bytes, choosing the codeword whose
    decoded level is nearest (ties toward the lower level) — exactly the
    quantization the segment-wise reference encoder performs."""
    levels = table[order]
    idx = np.searchsorted(levels, linear.astype(np.float64))
    idx = np.clip(idx, 0, 255)
    lo = np.clip(idx - 1, 0, 255)
    pick_lo = np.abs(levels[lo] - linear) <= np.abs(levels[idx] - linear)
    return order[np.where(pick_lo, lo, idx)].astype(np.uint8)


# --------------------------------------------------------------------------
# IMA / DVI ADPCM (format 0x11; public IMA ADPCM reference algorithm)

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)


def _ima_decode_nibble(nib: int, state: list) -> int:
    pred, index = state
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        diff = -diff
    pred = min(max(pred + diff, -32768), 32767)
    index = min(max(index + int(_IMA_INDEX_ADJ[nib]), 0), 88)
    state[0], state[1] = pred, index
    return pred


def _decode_ima_adpcm(data: bytes, channels: int, block_align: int):
    """IMA ADPCM blocks -> int16 (n_frames, channels). Per-channel
    4-byte block headers (predictor, step index), then 4-byte channel-
    interleaved nibble groups, low nibble first."""
    if block_align < 4 * channels or channels < 1:
        raise WavError("invalid IMA ADPCM block alignment")
    spb = (block_align - 4 * channels) * 2 // channels + 1  # frames/block
    frames = []
    for off in range(0, len(data) - block_align + 1, block_align):
        block = data[off : off + block_align]
        states = []
        for c in range(channels):
            pred, index = struct.unpack_from("<hB", block, 4 * c)
            if index > 88:
                raise WavError("invalid IMA ADPCM step index")
            states.append([pred, index])
        out = np.empty((spb, channels), dtype=np.int16)
        out[0] = [s[0] for s in states]
        frame = 1
        pos = 4 * channels
        while frame < spb:
            for c in range(channels):
                group = block[pos : pos + 4]
                pos += 4
                f = frame
                for byte in group:
                    for nib in (byte & 0x0F, byte >> 4):
                        if f < spb:
                            out[f, c] = _ima_decode_nibble(nib, states[c])
                        f += 1
            frame += 8
        frames.append(out)
    if not frames:
        raise WavError("IMA ADPCM stream has no complete block")
    return np.concatenate(frames)


def _encode_ima_adpcm(samples_i16: np.ndarray, block_frames: int = 505):
    """int16 (n, channels) -> (blocks bytes, block_align, frames/block).
    Standard IMA encoder: quantize the diff against the current step,
    update predictor/index exactly as the decoder will."""
    n, channels = samples_i16.shape
    spb = block_frames
    if spb % 8 != 1 or spb < 9:
        raise WavError("IMA ADPCM frames/block must be 8k+1")
    balign = 4 * channels + (spb - 1) // 2 * channels
    # pad to whole blocks by repeating the last frame
    nblocks = -(-n // spb)
    pad = nblocks * spb - n
    if pad:
        samples_i16 = np.vstack([samples_i16,
                                 np.repeat(samples_i16[-1:], pad, axis=0)])
    out = bytearray()
    states = [[0, 0] for _ in range(channels)]
    for b in range(nblocks):
        blk = samples_i16[b * spb : (b + 1) * spb].astype(np.int64)
        for c in range(channels):
            states[c][0] = int(blk[0, c])
            # the step index travels in the block header, so pick the one
            # whose step best matches this block's slope — avoids the
            # cold-start slope-overload transient a 0-index would cause
            mean_diff = float(np.mean(np.abs(np.diff(blk[:, c])))) if spb > 1 else 0.0
            states[c][1] = int(np.clip(
                np.searchsorted(_IMA_STEPS, max(mean_diff, 1.0)), 0, 88
            ))
            out += struct.pack("<hBB", states[c][0], states[c][1], 0)
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for f in range(1, spb):
            for c in range(channels):
                pred, index = states[c]
                step = int(_IMA_STEPS[index])
                diff = int(blk[f, c]) - pred
                nib = 0
                if diff < 0:
                    nib = 8
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                _ima_decode_nibble(nib, states[c])
                nibbles[c].append(nib)
        for c in range(channels):
            if len(nibbles[c]) % 2:
                nibbles[c].append(0)
        # 4-byte channel-interleaved groups, low nibble first
        per_chan = [bytes(
            (nibbles[c][i] | (nibbles[c][i + 1] << 4))
            for i in range(0, len(nibbles[c]), 2)
        ) for c in range(channels)]
        for g in range(0, len(per_chan[0]), 4):
            for c in range(channels):
                out += per_chan[c][g : g + 4].ljust(4, b"\x00")
    return bytes(out), balign, spb


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float [-1,1] (n,) or (n, channels) -> PCM WAV bytes (8 or 16 bit)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    s = np.clip(s, -1.0, 1.0)
    # symmetric with the decoder's /128 and /32768 (an x*127-style
    # encode decodes back with an |x|/128 scale error — caught by the
    # hypothesis round-trip property); +1.0 clips to the top code
    if bits == 16:
        pcm = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (
            (np.clip(np.round(s * 128.0), -128, 127) + 128)
            .astype(np.uint8)
            .tobytes()
        )
    else:
        raise WavError(f"encode supports 8/16 bit, got {bits}")
    balign = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * balign, balign, bits
    )
    return _riff(fmt, pcm)


def _riff(fmt: bytes, pcm: bytes) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_compressed(samples: np.ndarray, sample_rate: int,
                          codec: str = "ulaw") -> bytes:
    """float [-1,1] -> compressed WAV: G.711 'ulaw' (format 7) / 'alaw'
    (format 6), or 'ima_adpcm' (format 0x11). The telephony and retro-
    game formats a crawl's audio tail actually contains."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    i16 = np.clip(np.round(np.clip(s, -1.0, 1.0) * 32768.0),
                  -32768, 32767).astype(np.int64)
    if codec in ("ulaw", "alaw"):
        tbl, order = ((_ULAW_TABLE, _ULAW_ENC_ORDER) if codec == "ulaw"
                      else (_ALAW_TABLE, _ALAW_ENC_ORDER))
        payload = _g711_encode(i16.reshape(-1), tbl, order).tobytes()
        afmt, bits, balign = (7 if codec == "ulaw" else 6), 8, channels
        fmt = struct.pack("<HHIIHH", afmt, channels, sample_rate,
                          sample_rate * balign, balign, bits)
        return _riff(fmt, payload)
    if codec == "ima_adpcm":
        payload, balign, spb = _encode_ima_adpcm(i16.astype(np.int16))
        byterate = -(-sample_rate // spb) * balign
        fmt = struct.pack("<HHIIHH", 0x11, channels, sample_rate, byterate,
                          balign, 4)
        fmt += struct.pack("<HH", 2, spb)  # cbSize, samplesPerBlock
        return _riff(fmt, payload)
    raise WavError(f"unknown codec '{codec}'")
