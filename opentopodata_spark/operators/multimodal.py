"""Multimodal (media) span processing: real Spark plumbing, stubbed codecs.

The input documents interleave text and media spans (BASELINE.json
input_hint: spans may carry ``media_ref`` instead of text). This module
gives media spans the same first-class treatment text gets:

* ``media_spans``: posexplode + filter — the media twin of
  operators/extract.explode_text_spans, preserving (doc_id, span_pos)
  so the span-sequence invariant survives.
* ``fetch_media``: resolves media_ref -> binary payload. In production
  this reads an object store / an Iceberg binary column; here the
  fetcher is injectable and the default is a deterministic fake
  (seeded bytes derived from the ref) so the batch shape, schema and
  partitioning are real and testable.
* ``decode_and_featurize``: mapInPandas over Arrow batches producing
  typed metadata + a feature vector per media item. The actual image /
  audio decode is STUBBED: the container has no codec libraries, so
  ``decoder='real'`` raises NotImplementedError at the exact seam where
  PIL/ffmpeg would slot in; ``decoder='fake'`` derives deterministic
  pseudo-features from the payload hash. Everything around the seam —
  schema, batching, partition sizing — is the production shape.

Scale notes: media blobs dominate bytes at 100 TB. The fetch+decode
stage is therefore isolated behind one ``repartition(n)`` whose n is
chosen by payload bytes, not row count (``target_rows_per_task``), and
the pipeline never shuffles decoded payloads — features (small) are
what flows onward.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["media_spans", "fetch_media", "decode_and_featurize", "FEATURE_DIM"]

FEATURE_DIM = 8

_FETCH_SCHEMA = "doc_id string, span_pos int, media_ref string, payload binary"
_FEAT_SCHEMA = (
    "doc_id string, span_pos int, media_ref string, media_kind string,"
    " n_bytes long, width int, height int, features array<float>"
)


def media_spans(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, span_pos, media_ref) for media spans only."""
    return (
        documents.select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", "span_pos", F.col("span.media_ref").alias("media_ref"))
    )


def _fake_payload(ref: str) -> bytes:
    """Deterministic stand-in for an object-store GET (seeded by ref)."""
    seed = hashlib.sha256(ref.encode()).digest()
    reps = 1 + seed[0] % 4
    return seed * reps


def fetch_media(spans: DataFrame, fetcher=None, partitions: int | None = None) -> DataFrame:
    """Attach binary payloads to media spans via mapInPandas.

    fetcher: Callable[[str], bytes]; default = deterministic fake.
    The repartition isolates fetch I/O into its own stage so slow blobs
    don't convoy the text pipeline.
    """
    fetch = fetcher or _fake_payload

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                None if r is None else fetch(r) for r in pdf["media_ref"]
            ]
            yield pdf

    df = spans if partitions is None else spans.repartition(partitions, "media_ref")
    return df.mapInPandas(run, _FETCH_SCHEMA)


def decode_and_featurize(fetched: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads and extract fixed-dim features (Arrow-batched).

    decoder='real' is the seam for PIL/ffmpeg/soundfile — intentionally
    NotImplementedError in this container. decoder='fake' derives
    deterministic metadata + features from the payload bytes so the
    full distributed plumbing is exercised end-to-end.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"Unknown decoder '{decoder}'.")

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            kinds, widths, heights, feats, nbytes = [], [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    kinds.append(None)
                    widths.append(None)
                    heights.append(None)
                    feats.append(None)
                    nbytes.append(0)
                    continue
                if decoder == "real":
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg (not in this "
                        "container); wire them in here"
                    )
                b = bytes(payload)
                h = hashlib.sha256(b).digest()
                kinds.append(["image", "audio", "video"][h[0] % 3])
                widths.append(16 + h[1] % 240)
                heights.append(16 + h[2] % 240)
                feats.append(
                    (np.frombuffer(h[:FEATURE_DIM * 4], dtype=np.uint8)
                     .reshape(FEATURE_DIM, 4)
                     .sum(axis=1)
                     .astype(np.float32) / 1020.0)
                )
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_pos": pdf["span_pos"],
                    "media_ref": pdf["media_ref"],
                    "media_kind": kinds,
                    "n_bytes": np.array(nbytes, dtype=np.int64),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "features": feats,
                }
            )

    return fetched.mapInPandas(run, _FEAT_SCHEMA)
