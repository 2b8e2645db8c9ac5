"""Media-corpus cleaning job: payloads -> decoded, perceptually
deduplicated media corpus.

The media-side counterpart of jobs/dataprep.py: one spark-submit-able
script over a parquet corpus of (media_ref, payload binary) rows — the
image/audio/video tail of a crawl.

Pipeline (one decode pass, one band-join shuffle per modality):

    media(media_ref, payload)
      -> sniff + decode + fingerprint in ONE Arrow-batched pass per
         modality (imagehash.hash_images for PNG/JPEG/JP2,
         audiohash.hash_audio for WAV, videohash.hash_video for Y4M;
         a payload is probed by magic bytes, so each decoder only sees
         its own modality)
      -> exact payload dedup (md5 of the bytes, keep min media_ref) —
         byte-identical copies never reach the perceptual stage
      -> perceptual near-dup drop per modality (--max-distance): the
         exact pigeonhole band join finds every pair within Hamming d,
         the larger media_ref of each pair drops (kept media are
         pairwise non-near-dup — the dataprep 'pairs' semantics)
      -> admitted corpus parquet (media_ref, modality, hash, dims) +
         one-line JSON stats

Example:

    python -m opentopodata_spark.jobs.mediaprep \
        --media crawl_media.parquet --out /tmp/media_clean \
        --max-distance 7 --cores 8
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.mediaprep",
        description="Decode + perceptually deduplicate a media corpus.",
    )
    p.add_argument("--media", required=True,
                   help="parquet of (media_ref string, payload binary)")
    p.add_argument("--out", required=True,
                   help="output directory (corpus parquet + stats.json)")
    p.add_argument("--max-distance", type=int, default=7,
                   help="Hamming near-dup threshold (< --n-bands)")
    p.add_argument("--n-bands", type=int, default=8)
    p.add_argument("--keep-payloads", action="store_true",
                   help="carry the raw payload column into the output "
                        "corpus (default: metadata + hashes only)")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    return p


def _modality(payload_col):
    """Magic-byte sniff as a pure column expression (no decode)."""
    head = F.substring(payload_col, 1, 12)
    return (
        F.when(F.substring(payload_col, 1, 8)
               == F.lit(b"\x89PNG\r\n\x1a\n"), "image")
        .when(F.substring(payload_col, 1, 2) == F.lit(b"\xff\xd8"), "image")
        .when(F.substring(payload_col, 1, 4)
              == F.lit(b"\xff\x4f\xff\x51"), "image")
        .when(F.substring(payload_col, 5, 8)
              == F.lit(b"jP\x20\x20\x0d\x0a\x87\x0a"), "image")
        .when((F.substring(payload_col, 1, 4) == F.lit(b"RIFF"))
              & (F.substring(payload_col, 9, 4) == F.lit(b"WAVE")),
              "audio")
        .when(F.substring(head, 1, 9) == F.lit(b"YUV4MPEG2"), "video")
        .otherwise("unknown")
    )


def run(ns: argparse.Namespace, spark=None) -> dict:
    from ..operators import audiohash as _ah
    from ..operators import imagehash as _ih
    from ..operators import videohash as _vh

    if spark is None:
        spark = get_spark(
            app_name="otds-mediaprep", cores=ns.cores,
            shuffle_partitions=ns.shuffle_partitions, master=ns.master,
        )
    t0 = time.time()
    stats: dict = {"job": "mediaprep"}
    raw = spark.read.parquet(ns.media).where(
        F.col("payload").isNotNull())
    raw = raw.withColumn("modality", _modality(F.col("payload")))
    stats["input_media"] = raw.count()

    # exact payload dedup first: byte-identical copies keep min ref
    from pyspark.sql import Window as _W

    w = _W.partitionBy(F.md5("payload")).orderBy("media_ref")
    exact = raw.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1).drop("_rn")
    exact = exact.persist()
    stats["after_exact_dedup"] = exact.count()

    admitted_parts = []
    drops = {}
    for modality, hasher, hash_col in (
            ("image", _ih.hash_images, "phash"),
            ("audio", _ah.hash_audio, "ahash"),
            ("video", _vh.hash_video, "vhash")):
        sub = exact.where(F.col("modality") == modality)
        hashed = hasher(sub).persist()
        try:
            pairs = _ih.near_dup_pairs(
                hashed, id_col="media_ref", hash_col=hash_col,
                max_distance=ns.max_distance, n_bands=ns.n_bands)
            losers = pairs.select(
                F.col("id_b").alias("media_ref")).distinct()
            kept = hashed.join(losers, "media_ref", "left_anti")
            part = kept.select(
                "media_ref",
                F.lit(modality).alias("modality"),
                F.col(hash_col).alias("perceptual_hash"),
            )
            part = part.localCheckpoint()
            drops[modality] = hashed.count() - part.count()
            admitted_parts.append(part)
        finally:
            hashed.unpersist()
    unknown = exact.where(F.col("modality") == "unknown").select(
        "media_ref", "modality",
        F.lit(None).cast("long").alias("perceptual_hash"),
    )
    admitted = admitted_parts[0]
    for part in admitted_parts[1:]:
        admitted = admitted.unionByName(part)
    admitted = admitted.unionByName(unknown)
    out_cols = admitted
    if ns.keep_payloads:
        out_cols = admitted.join(
            exact.select("media_ref", "payload"), "media_ref")
    out_corpus = f"{ns.out}/corpus"
    out_cols.write.mode("overwrite").parquet(out_corpus)
    stats["near_dup_dropped"] = drops
    stats["output_media"] = spark.read.parquet(out_corpus).count()
    exact.unpersist()
    stats["seconds"] = round(time.time() - t0, 3)
    if "://" not in ns.out:
        with open(f"{ns.out}/stats.json", "w") as fh:
            json.dump(stats, fh)
    return stats


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    stats = run(ns)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
