"""Pure-numpy RIFF/WAVE (PCM) codec for the multimodal audio path.

The audio analog of png.py / jpeg.py: the sandbox has no soundfile/
ffmpeg, and shipping binary codecs to every executor is exactly what a
pure-numpy decoder avoids. Covers the formats a crawl corpus actually
contains in WAV containers: PCM 8-bit unsigned, 16/24/32-bit signed
little-endian, and IEEE float32 (format 3), any channel count. Compressed
WAV (ADPCM, mu-law) raises ``WavError('... not supported')`` so the
multimodal decode stage can degrade that payload to 'unsupported'
rather than 'corrupt'.

All decoders return float64 samples normalized to [-1, 1], shape
(n_frames, channels).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["WavError", "is_wav", "decode_wav", "encode_wav"]


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
    else:
        raise WavError(f"audio format {audio_format} not supported")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), int(rate)


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
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
