"""wav.py codec: round-trips, format coverage, error taxonomy."""

import struct

import numpy as np
import pytest

from opentopodata_spark import wav


def _sine(n=800, rate=8000, channels=1, freq=440.0):
    t = np.arange(n) / rate
    s = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.repeat(s[:, None], channels, axis=1)


def test_roundtrip_16bit_mono():
    s = _sine()
    b = wav.encode_wav(s, 8000, bits=16)
    assert wav.is_wav(b)
    got, rate = wav.decode_wav(b)
    assert rate == 8000 and got.shape == s.shape
    assert np.abs(got - s).max() < 1.0 / 32000


def test_roundtrip_8bit_stereo():
    s = _sine(channels=2)
    b = wav.encode_wav(s, 44100, bits=8)
    got, rate = wav.decode_wav(b)
    assert rate == 44100 and got.shape == s.shape
    assert np.abs(got - s).max() < 1.0 / 100  # 8-bit quantization


def test_24bit_and_float32_decode():
    # hand-assemble 24-bit PCM and float32 WAVs (encode_wav doesn't emit them)
    vals = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float64)
    i24 = np.round(vals * (1 << 23)).astype(np.int64)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in (i24 & 0xFFFFFF)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    b24 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got, rate = wav.decode_wav(b24)
    assert rate == 16000
    assert np.allclose(got[:, 0], vals, atol=1e-6)

    f32 = vals.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(f32)) + f32
    bf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got, rate = wav.decode_wav(bf)
    assert rate == 48000
    assert np.allclose(got[:, 0], vals, atol=1e-7)


def test_unsupported_vs_corrupt():
    # ADPCM (format 2): valid container, no decoder -> 'not supported'
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(wav.WavError, match="not supported"):
        wav.decode_wav(b)
    # missing data chunk
    body = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(wav.WavError, match="missing"):
        wav.decode_wav(b)
    assert not wav.is_wav(b"nonsense bytes")


def test_odd_chunk_padding_and_extra_chunks():
    # a LIST chunk with odd size before fmt/data must be skipped via pad
    s = _sine(n=100)
    b = wav.encode_wav(s, 8000)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # 3 bytes + pad
    patched = b[:12] + odd + b[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    got, rate = wav.decode_wav(patched)
    assert rate == 8000 and got.shape == s.shape


def test_multimodal_audio_branch(spark):
    from opentopodata_spark.operators import multimodal

    refs = [f"clip-{i}" for i in range(40)]
    payloads = [multimodal.synthetic_wav_payload(r) for r in refs]
    assert all(wav.is_wav(b) for b in payloads)
    df = spark.createDataFrame(
        [(str(i), 0, r) for i, r in enumerate(refs)],
        "doc_id string, span_pos int, media_ref string",
    )
    fetched = multimodal.fetch_media(df, fetcher=multimodal.synthetic_wav_payload)
    rows = multimodal.decode_and_featurize(fetched, decoder="real").collect()
    assert len(rows) == 40
    for r in rows:
        assert r.media_kind == "audio"
        assert r.width is None and r.height is None
        assert len(r.features) == multimodal.FEATURE_DIM
        # independent single-process re-derivation of the features
        samples, rate = wav.decode_wav(
            multimodal.synthetic_wav_payload(r.media_ref)
        )
        expect = multimodal.audio_features(samples, rate)
        assert tuple(r.features) == tuple(float(x) for x in expect)
        assert 0.2 < r.features[0] < 0.7  # sine RMS ~0.42, sane range


def test_mixed_corpus_contains_all_kinds(spark):
    from opentopodata_spark.operators import multimodal

    kinds = {}
    for i in range(120):
        b = multimodal.synthetic_media_payload(f"m-{i}")
        from opentopodata_spark import jpeg, png

        if png.is_png(b):
            kinds["png"] = kinds.get("png", 0) + 1
        elif jpeg.is_jpeg(b):
            kinds["jpeg"] = kinds.get("jpeg", 0) + 1
        elif wav.is_wav(b):
            kinds["wav"] = kinds.get("wav", 0) + 1
        else:
            kinds["opaque"] = kinds.get("opaque", 0) + 1
    assert set(kinds) == {"png", "jpeg", "wav", "opaque"}
