"""YUV4MPEG2 codec (y4m.py): golden bytes hand-assembled from the public
spec, encode/decode round-trips per colorspace, error paths, and the
real-decode video path through the multimodal operator."""

import numpy as np
import pytest

from opentopodata_spark import y4m


def test_golden_bytes_from_spec():
    """2x2 C420jpeg stream with 2 frames, assembled byte-by-byte from the
    YUV4MPEG2 spec (independent of encode_y4m)."""
    b = (
        b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n"
        b"FRAME\n" + bytes([10, 20, 30, 40, 128, 130])
        + b"FRAME\n" + bytes([50, 60, 70, 80, 140, 150])
    )
    assert y4m.is_y4m(b)
    y, u, v, meta = y4m.decode_y4m(b)
    assert (meta.width, meta.height) == (2, 2)
    assert (meta.fps_num, meta.fps_den) == (25, 1)
    assert meta.colorspace == "420jpeg"
    assert y.shape == (2, 2, 2) and u.shape == (2, 1, 1)
    assert y[0].tolist() == [[10, 20], [30, 40]]
    assert int(u[0, 0, 0]) == 128 and int(v[0, 0, 0]) == 130
    assert y[1].tolist() == [[50, 60], [70, 80]]
    assert int(u[1, 0, 0]) == 140 and int(v[1, 0, 0]) == 150


def test_header_defaults_and_extensions():
    # F omitted -> 25:1 default; A/X tokens ignored; C omitted -> 420jpeg
    b = b"YUV4MPEG2 W2 H2 XCOLORRANGE=FULL\nFRAME\n" + bytes(6)
    y, u, v, meta = y4m.decode_y4m(b)
    assert (meta.fps_num, meta.fps_den) == (25, 1)
    assert meta.colorspace == "420jpeg" and y.shape == (1, 2, 2)


@pytest.mark.parametrize("cs,div", [
    ("420jpeg", (2, 2)), ("422", (2, 1)), ("444", (1, 1)), ("mono", None),
])
def test_round_trip(cs, div):
    rng = np.random.default_rng(7)
    n, h, w = 3, 6, 8
    y = rng.integers(0, 256, size=(n, h, w)).astype(np.uint8)
    if div is None:
        u = v = None
    else:
        dw, dh = div
        u = rng.integers(0, 256, size=(n, h // dh, w // dw)).astype(np.uint8)
        v = rng.integers(0, 256, size=(n, h // dh, w // dw)).astype(np.uint8)
    b = y4m.encode_y4m(y, u, v, fps=(30000, 1001), colorspace=cs)
    y2, u2, v2, meta = y4m.decode_y4m(b)
    assert meta.colorspace == cs
    assert (meta.fps_num, meta.fps_den) == (30000, 1001)
    assert np.array_equal(y, y2)
    if div is None:
        assert u2 is None and v2 is None
    else:
        assert np.array_equal(u, u2) and np.array_equal(v, v2)


def test_420_siting_variants_same_layout():
    base = y4m.encode_y4m(
        np.zeros((1, 2, 2), np.uint8), np.zeros((1, 1, 1), np.uint8),
        np.zeros((1, 1, 1), np.uint8),
    )
    for variant in (b"C420", b"C420paldv", b"C420mpeg2"):
        y, u, v, meta = y4m.decode_y4m(base.replace(b"C420jpeg", variant))
        assert y.shape == (1, 2, 2) and u.shape == (1, 1, 1)


def test_errors():
    with pytest.raises(y4m.Y4mError, match="not a YUV4MPEG2"):
        y4m.decode_y4m(b"RIFF....")
    with pytest.raises(y4m.Y4mError, match="missing/bad W or H"):
        y4m.decode_y4m(b"YUV4MPEG2 W0 H2\nFRAME\n")
    with pytest.raises(y4m.Y4mError, match="interlaced.*not supported"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 It\nFRAME\n" + bytes(6))
    with pytest.raises(y4m.Y4mError, match="not supported"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 C420p10\nFRAME\n" + bytes(12))
    with pytest.raises(y4m.Y4mError, match="divisible"):
        y4m.decode_y4m(b"YUV4MPEG2 W3 H2 C420\nFRAME\n" + bytes(8))
    with pytest.raises(y4m.Y4mError, match="truncated"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + bytes(3))
    with pytest.raises(y4m.Y4mError, match="bad FRAME marker"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 C420\nXRAME\n" + bytes(6))
    with pytest.raises(y4m.Y4mError, match="no frames"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 C420\n")


def test_synthetic_payload_decodes_and_features():
    from opentopodata_spark.operators import multimodal

    seen_cs = set()
    for i in range(40):
        b = multimodal.synthetic_y4m_payload(f"vid{i}")
        y, u, v, meta = y4m.decode_y4m(b)
        seen_cs.add(meta.colorspace)
        f = multimodal.video_features(y, u, v, meta, y.shape[0])
        assert f.shape == (multimodal.FEATURE_DIM,)
        assert np.all(f >= 0.0) and np.all(f <= 1.0)
        if y.shape[0] > 1:
            assert f[6] > 0.0  # drifting luma -> nonzero motion
    assert "mono" in seen_cs and len(seen_cs) >= 3


def test_frame_sampling_caps_work():
    """Statistics run over <= _VIDEO_SAMPLE_FRAMES frames: a long stream
    with garbage in the unsampled frames must match one where the
    unsampled frames are replaced, proving they are never read."""
    from opentopodata_spark.operators import multimodal

    rng = np.random.default_rng(3)
    n = 100
    y = rng.integers(0, 256, size=(n, 4, 4)).astype(np.uint8)
    meta = y4m.Y4mMeta(4, 4, 25, 1, "mono")
    idx = np.unique(np.linspace(0, n - 1, 16).astype(np.int64))
    y_alt = y.copy()
    mask = np.ones(n, dtype=bool)
    mask[idx] = False
    y_alt[mask] = 0  # clobber everything unsampled
    a = multimodal.video_features(y, None, None, meta, n)
    b = multimodal.video_features(y_alt, None, None, meta, n)
    assert np.array_equal(a, b)
