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


def test_g711_codeword_level_identity():
    """Encoding any exactly-representable G.711 level returns a codeword
    that decodes back to that same level — the quantizer is the nearest-
    level map, so its fixed points are the 256 table levels."""
    for tbl, order in ((wav._ULAW_TABLE, wav._ULAW_ENC_ORDER),
                       (wav._ALAW_TABLE, wav._ALAW_ENC_ORDER)):
        enc = wav._g711_encode(tbl.astype(np.int64), tbl, order)
        assert np.array_equal(tbl[enc], tbl)


def test_g711_known_codewords():
    """Anchors from the public G.711 tables: mu-law 0xFF decodes to 0,
    0x7F to -0 region (=0), and the extreme codes to +-32124 (mu-law)
    / +-(0xF8-coded) 32256-family values are sign-symmetric."""
    assert wav._ULAW_TABLE[0xFF] == 0.0
    assert wav._ULAW_TABLE[0x80] == 32124.0  # max positive
    assert wav._ULAW_TABLE[0x00] == -32124.0
    # A-law: sign bit set = positive; table is sign-symmetric
    assert np.array_equal(
        wav._ALAW_TABLE[0x80:], -wav._ALAW_TABLE[:0x80]
    )


@pytest.mark.parametrize("codec,tol_p99", [
    ("ulaw", 0.017), ("alaw", 0.017), ("ima_adpcm", 0.05),
])
def test_compressed_wav_round_trip(codec, tol_p99):
    rng = np.random.default_rng(5)
    t = np.arange(4000) / 8000.0
    sig = (0.5 * np.sin(2 * np.pi * 300 * t)[:, None]
           + 0.05 * rng.standard_normal((4000, 2)))
    b = wav.encode_wav_compressed(sig, 8000, codec=codec)
    dec, rate = wav.decode_wav(b)
    assert rate == 8000 and dec.shape[1] == 2
    n = min(len(dec), len(sig))
    err = np.abs(dec[:n] - np.clip(sig[:n], -1.0, 1.0))
    assert float(np.percentile(err, 99)) < tol_p99
    assert float(np.sqrt((err ** 2).mean())) < tol_p99 / 2


def test_ima_adpcm_decoder_matches_encoder_reconstruction():
    """The encoder tracks its own reconstruction through the same state
    machine the decoder runs, so decode(encode(x)) must equal the
    encoder's internal prediction EXACTLY (bit-level, both channels)."""
    rng = np.random.default_rng(9)
    i16 = (rng.integers(-8000, 8000, size=(1200, 2))).astype(np.int16)
    payload, balign, spb = wav._encode_ima_adpcm(i16, block_frames=249)
    dec = wav._decode_ima_adpcm(payload, 2, balign)
    # replay the encoder's state machine independently
    n, ch = i16.shape
    nblocks = -(-n // spb)
    pad = nblocks * spb - n
    x = np.vstack([i16, np.repeat(i16[-1:], pad, axis=0)]).astype(np.int64)
    recon = np.empty_like(x)
    states = [[0, 0] for _ in range(ch)]
    import struct as _s
    for b in range(nblocks):
        blk = x[b * spb : (b + 1) * spb]
        for c in range(ch):
            off = b * balign + 4 * c
            pred, idx = _s.unpack_from("<hB", payload, off)
            states[c] = [pred, idx]
            recon[b * spb, c] = pred
        for f in range(1, spb):
            for c in range(ch):
                pred, index = states[c]
                step = int(wav._IMA_STEPS[index])
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
                recon[b * spb + f, c] = wav._ima_decode_nibble(nib, states[c])
    assert np.array_equal(dec.astype(np.int64), recon)


def test_ima_adpcm_bad_block_align():
    fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 4000, 4, 4)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 8) + b"\x00" * 8
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(wav.WavError, match="block alignment|no complete"):
        wav.decode_wav(b)


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
