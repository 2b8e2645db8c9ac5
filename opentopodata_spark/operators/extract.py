"""Coordinate extraction from interleaved text+media documents (P1/P2).

Input: documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
— the BASELINE.json input_hint schema. Output: one row per extracted
coordinate (doc_id, span_pos, point_pos, lat, lon, loc_error).

The reference parses a request's ``locations`` argument as either
"lat,lon|lat,lon" pipe lists or a Google polyline, dispatching on the
presence of ',' (/root/reference/opentopodata/api.py:272-299). Here the
same grammar is applied per text span:

* spans containing ',' are scanned with regexp_extract_all (pure Catalyst,
  whole-stage codegen) for lat,lon pairs;
* spans with no comma that look like polylines (optional ``enc:`` prefix,
  polyline alphabet only) are decoded in an Arrow-batched pandas UDF
  (pure-Python decode, vectorized per batch — the reference uses the
  ``polyline`` package the same way, api.py:302-340);
* out-of-range coordinates become ``loc_error`` rows — at 10^12-document
  scale errors are data, not exceptions (reference raises 400s instead:
  api.py:389-397).

The span-sequence invariant is trivially preserved: this operator only
*derives* rows; the documents table is never rewritten. Results re-attach
by (doc_id, span_pos, point_pos).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

from .. import polyline_codec

LAT_MIN, LAT_MAX = -90.0, 90.0
LON_MIN, LON_MAX = -180.0, 180.0

_PAIR_REGEX = r"(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)"
# polyline alphabet: ASCII 63..126, no spaces/commas
_POLYLINE_REGEX = r"^(enc:)?[\?-~]+$"

_POINT_SCHEMA = ArrayType(
    StructType(
        [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
    )
)


@F.pandas_udf(_POINT_SCHEMA)
def _decode_polyline_udf(texts: pd.Series) -> pd.Series:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        s = t[4:] if t.startswith("enc:") else t
        try:
            pts = polyline_codec.decode(s)
        except Exception:
            out.append(None)
            continue
        if not pts or not all(
            LAT_MIN <= la <= LAT_MAX and LON_MIN <= lo <= LON_MAX for la, lo in pts
        ):
            out.append(None)
            continue
        out.append([{"lat": float(la), "lon": float(lo)} for la, lo in pts])
    return pd.Series(out)


def explode_text_spans(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, span_pos, text) for text spans only.

    Column pruning matters: only doc_id + spans are read from the scan."""
    return (
        documents.select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .where(F.col("span.kind") == "text")
        .select("doc_id", "span_pos", F.col("span.text").alias("text"))
    )


def extract_points(documents: DataFrame) -> DataFrame:
    """Full extraction: returns (doc_id, span_pos, point_pos, lat, lon,
    loc_error). loc_error is null for valid points; rows with a non-null
    loc_error carry the offending token instead of coordinates."""
    spans = explode_text_spans(documents).where(F.col("text").isNotNull())

    has_comma = spans.where(F.col("text").contains(","))
    pairs = (
        has_comma.select(
            "doc_id",
            "span_pos",
            F.posexplode(F.regexp_extract_all("text", F.lit(_PAIR_REGEX), F.lit(0)))
            .alias("point_pos", "pair"),
        )
        .select(
            "doc_id",
            "span_pos",
            "point_pos",
            F.split("pair", ",").getItem(0).cast("double").alias("lat"),
            F.split("pair", ",").getItem(1).cast("double").alias("lon"),
            F.col("pair"),
        )
        .select(
            "doc_id",
            "span_pos",
            "point_pos",
            "lat",
            "lon",
            F.when(
                F.col("lat").between(LAT_MIN, LAT_MAX)
                & F.col("lon").between(LON_MIN, LON_MAX),
                F.lit(None).cast("string"),
            )
            .otherwise(F.col("pair"))
            .alias("loc_error"),
        )
        .withColumn(
            "lat", F.when(F.col("loc_error").isNull(), F.col("lat"))
        )
        .withColumn(
            "lon", F.when(F.col("loc_error").isNull(), F.col("lon"))
        )
    )

    poly = (
        spans.where(
            ~F.col("text").contains(",") & F.col("text").rlike(_POLYLINE_REGEX)
        )
        .withColumn("pts", _decode_polyline_udf("text"))
        .where(F.col("pts").isNotNull())
        .select(
            "doc_id",
            "span_pos",
            F.posexplode("pts").alias("point_pos", "pt"),
        )
        .select(
            "doc_id",
            "span_pos",
            "point_pos",
            F.col("pt.lat").alias("lat"),
            F.col("pt.lon").alias("lon"),
            F.lit(None).cast("string").alias("loc_error"),
        )
    )

    return pairs.unionByName(poly)


def with_point_id(points: DataFrame) -> DataFrame:
    """Attach a globally-unique long point_id (order-free; identity is the
    (doc_id, span_pos, point_pos) triple — the id exists so downstream
    windows/joins partition on a single long)."""
    return points.withColumn(
        "point_id",
        F.xxhash64("doc_id", "span_pos", "point_pos"),
    )
