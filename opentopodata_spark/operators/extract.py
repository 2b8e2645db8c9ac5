"""Coordinate extraction from interleaved text+media documents (P1/P2).

Input: documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
— the BASELINE.json input_hint schema. Output: one row per extracted
coordinate (doc_id, span_pos, point_pos, lat, lon, loc_error).

The reference parses a request's ``locations`` argument as either
"lat,lon|lat,lon" pipe lists or a Google polyline, dispatching on the
presence of ',' (/root/reference/opentopodata/api.py:272-299). Here the
same grammar is applied per text span, in ONE pass over the table:

* the scan happens once (doc_id + spans only — column pruning);
* spans containing ',' are parsed with regexp_extract_all + transform
  into an array of point structs (pure Catalyst, whole-stage codegen);
* spans that look like polylines (optional ``enc:`` prefix, polyline
  alphabet only) are decoded by an Arrow-batched pandas UDF into the
  same struct array. Non-polyline rows enter the UDF as NULL (the UDF
  is unconditionally evaluated per batch — masking its *input* keeps
  the per-row cost at a null check);
* one posexplode of the unified array yields the point rows.

A naive implementation unions a CSV branch and a polyline branch — two
full scans of a 100 TB table; this shape was chosen off the physical
plan (.explain showed the double Scan parquet + a double UDF eval).

Out-of-range lat/lon become ``loc_error`` rows — at 10^12-document scale
errors are data, not exceptions (the reference raises 400s instead:
api.py:389-397). Undecodable polylines yield no rows (the reference
rejects the whole request; silently-empty is the scale analog).

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
    StringType,
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
        [
            StructField("lat", DoubleType()),
            StructField("lon", DoubleType()),
            StructField("err", StringType()),
        ]
    )
)


@F.pandas_udf(_POINT_SCHEMA)
def _decode_polyline_udf(texts: pd.Series) -> pd.Series:
    """P2: Google polyline -> point structs. Null in, null out (the
    caller masks non-polyline rows to null, so this is a fast skip).
    The whole Arrow batch decodes in one vectorized numpy pass
    (polyline_codec.decode_batch) — no per-string varint loop."""
    stripped = [
        None if t is None else (t[4:] if t.startswith("enc:") else t)
        for t in texts
    ]
    decoded = polyline_codec.decode_batch(stripped)
    out = []
    for pts in decoded:
        if not pts or not all(
            LAT_MIN <= la <= LAT_MAX and LON_MIN <= lo <= LON_MAX for la, lo in pts
        ):
            out.append(None)
            continue
        out.append(
            [{"lat": float(la), "lon": float(lo), "err": None} for la, lo in pts]
        )
    return pd.Series(out)


def _csv_points(text):
    """P1: 'lat,lon|lat,lon' grammar as a pure column expression.
    Range-invalid pairs become err rows (errors are data).

    Split once per pair in its own transform: higher-order-function
    lambdas are interpreted (no whole-stage codegen, no subexpression
    elimination), so every reference re-evaluates — binding the split
    result via zip_with leaves only cheap array-index+cast
    re-evaluations (measured ~2x faster than splitting inline)."""
    pairs = F.regexp_extract_all(text, F.lit(_PAIR_REGEX), F.lit(0))

    def parse(pair, s):
        lat = s.getItem(0).cast("double")
        lon = s.getItem(1).cast("double")
        valid = lat.between(LAT_MIN, LAT_MAX) & lon.between(LON_MIN, LON_MAX)
        return F.struct(
            F.when(valid, lat).alias("lat"),
            F.when(valid, lon).alias("lon"),
            F.when(~valid, pair).alias("err"),
        )

    return F.zip_with(
        pairs, F.transform(pairs, lambda p: F.split(p, ",")), parse
    )


def explode_text_spans(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, span_pos, text) for text spans only.

    Column pruning matters: only doc_id + spans are read from the scan.
    The explicit size() predicate replaces InferFiltersFromGenerate
    (excluded session-wide, see session.get_spark) so empty-span docs are
    still dropped at the parquet scan."""
    return (
        documents.where(F.size("spans") > 0)
        .select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .where(F.col("span.kind") == "text")
        .select("doc_id", "span_pos", F.col("span.text").alias("text"))
    )


def extract_points(documents: DataFrame) -> DataFrame:
    """Full extraction: returns (doc_id, span_pos, point_pos, lat, lon,
    loc_error). loc_error is null for valid points; rows with a non-null
    loc_error carry the offending token instead of coordinates."""
    spans = explode_text_spans(documents).where(F.col("text").isNotNull())

    text = F.col("text")
    is_pair = text.contains(",")
    is_poly = (~is_pair) & text.rlike(_POLYLINE_REGEX)
    pts = F.when(is_pair, _csv_points(text)).otherwise(
        _decode_polyline_udf(F.when(is_poly, text))
    )

    # NOTE: no null/empty filter on pts — posexplode already emits zero
    # rows for null and empty arrays, and an explicit filter makes
    # Catalyst push the predicate below the projection, evaluating the
    # whole extraction expression (and the polyline UDF) TWICE per row
    # (seen in .explain: duplicate ArrowEvalPython + the transform inside
    # both Filter and Project).
    return (
        spans.select("doc_id", "span_pos", pts.alias("pts"))
        .select("doc_id", "span_pos", F.posexplode("pts").alias("point_pos", "pt"))
        .select(
            "doc_id",
            "span_pos",
            "point_pos",
            F.col("pt.lat").alias("lat"),
            F.col("pt.lon").alias("lon"),
            F.col("pt.err").alias("loc_error"),
        )
    )


def with_point_id(points: DataFrame) -> DataFrame:
    """Attach a globally-unique long point_id (order-free; identity is the
    (doc_id, span_pos, point_pos) triple — the id exists so downstream
    windows/joins partition on a single long)."""
    return points.withColumn(
        "point_id",
        F.xxhash64("doc_id", "span_pos", "point_pos"),
    )
