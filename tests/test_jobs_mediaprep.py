"""mediaprep job: mixed-modality decode + exact + perceptual dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from opentopodata_spark import png as _png
from opentopodata_spark import wav as _wav
from opentopodata_spark import y4m as _y4m
from opentopodata_spark.jobs import mediaprep


def test_mediaprep_end_to_end(spark, tmp_path):
    rng = np.random.RandomState(21)
    yy, xx = np.mgrid[0:36, 0:48]
    img = np.clip(120 + 60 * np.sin(xx / 3.0) + 40 * np.cos(yy / 2.0)
                  + rng.uniform(-5, 5, (36, 48)), 0, 255).astype(np.uint8)
    img_twin = np.clip(
        img.astype(np.int32)
        + (rng.rand(36, 48) < 0.25) * rng.choice([-1, 1], (36, 48)),
        0, 255).astype(np.uint8)
    img_other = np.clip(rng.uniform(0, 255, (36, 48)), 0, 255
                        ).astype(np.uint8)
    t = np.arange(8000) / 8000.0
    clip = (0.5 * np.sin(2 * np.pi * 300 * t)
            + 0.3 * np.sin(2 * np.pi * 1000 * t)
            + 0.05 * rng.randn(8000))
    clip_twin = clip + 0.005 * rng.randn(8000)
    frames = np.repeat(img[None, :, :], 6, axis=0)
    frames_twin = np.clip(
        frames.astype(np.int32) + rng.choice([-1, 0, 1], frames.shape),
        0, 255).astype(np.uint8)

    rows = {
        "media_ref": ["i1", "i1_copy", "i1_twin", "i2",
                      "a1", "a1_twin", "v1", "v1_twin", "junk"],
        "payload": [
            _png.encode_png(img), _png.encode_png(img),  # byte-identical
            _png.encode_png(img_twin), _png.encode_png(img_other),
            _wav.encode_wav(clip, 8000),
            _wav.encode_wav(clip_twin, 8000),
            _y4m.encode_y4m(frames), _y4m.encode_y4m(frames_twin),
            b"\x00\x01mystery bytes",
        ],
    }
    media = str(tmp_path / "media.parquet")
    pq.write_table(pa.table(rows), media)
    out = str(tmp_path / "clean")
    ns = mediaprep.build_parser().parse_args([
        "--media", media, "--out", out, "--max-distance", "7",
    ])
    stats = mediaprep.run(ns, spark=spark)
    got = {r.media_ref: r for r in
           spark.read.parquet(f"{out}/corpus").collect()}
    # i1_copy: exact dedup; i1_twin/a1_twin/v1_twin: perceptual dedup
    assert set(got) == {"i1", "i2", "a1", "v1", "junk"}
    assert got["i1"].modality == "image"
    assert got["a1"].modality == "audio"
    assert got["v1"].modality == "video"
    assert got["junk"].modality == "unknown"
    assert got["junk"].perceptual_hash is None
    assert got["i1"].perceptual_hash is not None
    assert stats["input_media"] == 9
    assert stats["after_exact_dedup"] == 8
    assert stats["near_dup_dropped"] == {
        "image": 1, "audio": 1, "video": 1}
    assert stats["output_media"] == 5
