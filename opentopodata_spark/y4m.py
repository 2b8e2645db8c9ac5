"""Pure-numpy YUV4MPEG2 (.y4m) codec for the multimodal video path.

The video analog of png.py / jpeg.py / wav.py: the sandbox has no
ffmpeg, and the YUV4MPEG2 container (the uncompressed interchange format
mjpegtools/ffmpeg/x264 pipelines use) is a public, trivially-parseable
spec — an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I?]
[A?:?] [C<colorspace>] [X...]\\n`` followed by frames, each ``FRAME[
params]\\n`` plus raw planar YUV bytes. Compressed video codecs (H.264,
VP9, AV1 — entropy-coded transforms, realistically library territory)
raise nothing here: their containers simply aren't Y4M, so the
multimodal decode stage degrades them to 'unsupported'. A valid-but-
unsupported Y4M flavor (interlaced, 10-bit) raises
``Y4mError('... not supported')`` for the same degrade path.

Supported colorspaces: C420 (+jpeg/paldv/mpeg2 siting variants — the
chroma SITING tags don't change the byte layout), C422, C444, Cmono.

Decoders return the planes as uint8 arrays: ``(y, u, v, meta)`` with
y shape (n_frames, h, w) and u/v (n_frames, hc, wc) or None for mono.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Y4mError", "is_y4m", "decode_y4m", "encode_y4m", "Y4mMeta"]

_MAGIC = b"YUV4MPEG2 "

# colorspace -> (chroma width divisor, chroma height divisor); mono -> None
_CHROMA = {
    "420": (2, 2), "420jpeg": (2, 2), "420paldv": (2, 2), "420mpeg2": (2, 2),
    "422": (2, 1), "444": (1, 1),
}


class Y4mError(Exception):
    pass


class Y4mMeta:
    """Stream parameters: width, height, fps as (num, den), colorspace."""

    __slots__ = ("width", "height", "fps_num", "fps_den", "colorspace")

    def __init__(self, width, height, fps_num, fps_den, colorspace):
        self.width = width
        self.height = height
        self.fps_num = fps_num
        self.fps_den = fps_den
        self.colorspace = colorspace


def is_y4m(b: bytes) -> bool:
    return b[: len(_MAGIC)] == _MAGIC


def _parse_header(line: bytes, path_desc: str):
    width = height = None
    fps_num, fps_den = 25, 1  # spec default when F is absent
    colorspace = "420jpeg"  # spec default
    for tok in line.split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", errors="replace")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            colorspace = val
        elif tag == b"I":
            if val not in ("p", "?"):
                raise Y4mError(
                    f"interlaced Y4M (I{val}) not supported"
                )
        # A (aspect) and X (extensions) don't affect the byte layout
    if not width or not height or width <= 0 or height <= 0:
        raise Y4mError(f"{path_desc}: missing/bad W or H in Y4M header")
    if fps_num <= 0 or fps_den <= 0:
        raise Y4mError(f"{path_desc}: bad frame rate in Y4M header")
    if colorspace != "mono" and colorspace not in _CHROMA:
        raise Y4mError(f"Y4M colorspace C{colorspace} not supported")
    return Y4mMeta(width, height, fps_num, fps_den, colorspace)


def decode_y4m(b: bytes):
    """-> (y (n, h, w) uint8, u, v ((n, hc, wc) uint8 or None), meta).

    Frames are dense views into one contiguous parse — no per-frame
    Python loop over pixels, just reshapes over the raw buffer."""
    if not is_y4m(b):
        raise Y4mError("not a YUV4MPEG2 stream")
    nl = b.find(b"\n")
    if nl < 0:
        raise Y4mError("unterminated Y4M stream header")
    meta = _parse_header(b[:nl], "stream")
    w, h = meta.width, meta.height
    if meta.colorspace == "mono":
        cw = ch = 0
    else:
        dw, dh = _CHROMA[meta.colorspace]
        if w % dw or h % dh:
            raise Y4mError(
                f"C{meta.colorspace} requires dimensions divisible by "
                f"{dw}x{dh}, got {w}x{h}"
            )
        cw, ch = w // dw, h // dh
    frame_bytes = w * h + 2 * cw * ch
    ys, us, vs = [], [], []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            raise Y4mError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + frame_bytes > len(b):
            raise Y4mError("truncated Y4M frame payload")
        raw = np.frombuffer(b, dtype=np.uint8, count=frame_bytes, offset=pos)
        ys.append(raw[: w * h].reshape(h, w))
        if cw:
            us.append(raw[w * h : w * h + cw * ch].reshape(ch, cw))
            vs.append(raw[w * h + cw * ch :].reshape(ch, cw))
        pos += frame_bytes
    if not ys:
        raise Y4mError("Y4M stream contains no frames")
    y = np.stack(ys)
    u = np.stack(us) if us else None
    v = np.stack(vs) if vs else None
    return y, u, v, meta


def encode_y4m(
    y: np.ndarray,
    u: np.ndarray | None = None,
    v: np.ndarray | None = None,
    fps: tuple[int, int] = (25, 1),
    colorspace: str | None = None,
) -> bytes:
    """Encode planar uint8 frames. y: (n, h, w); u/v: (n, hc, wc) or None
    for mono. The colorspace is inferred from the chroma shape unless
    given explicitly."""
    y = np.ascontiguousarray(y, dtype=np.uint8)
    if y.ndim != 3:
        raise ValueError("y must be (n_frames, h, w)")
    n, h, w = y.shape
    if (u is None) != (v is None):
        raise ValueError("u and v must both be given or both None")
    if u is None:
        cs = colorspace or "mono"
        if cs != "mono":
            raise ValueError("chromaless frames must be Cmono")
    else:
        u = np.ascontiguousarray(u, dtype=np.uint8)
        v = np.ascontiguousarray(v, dtype=np.uint8)
        if u.shape != v.shape or u.shape[0] != n:
            raise ValueError("u/v shape mismatch")
        dw, dh = w // u.shape[2], h // u.shape[1]
        inferred = {(2, 2): "420jpeg", (2, 1): "422", (1, 1): "444"}.get(
            (dw, dh)
        )
        cs = colorspace or inferred
        if cs not in _CHROMA or u.shape[1] * dh != h or u.shape[2] * dw != w:
            raise ValueError(f"chroma shape {u.shape} does not match {w}x{h}")
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n"
    ).encode("ascii")
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(y[i].tobytes())
        if u is not None:
            parts.append(u[i].tobytes())
            parts.append(v[i].tobytes())
    return b"".join(parts)
