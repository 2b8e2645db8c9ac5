"""As-of (temporal) join: match each left row to the most recent right row.

The time-series join Spark's DataFrame API lacks (pandas merge_asof,
DuckDB ASOF JOIN, kdb aj): for every left event, the right row with the
greatest right.ts <= left.ts for the same key — how a pipeline stamps
events with the prevailing profile/config/price at event time.

Implementation is the UNION + running-last trick, not a range join:

1. tag both sides and union them on (key, ts, side) — right payload
   columns ride along, null on left rows;
2. ONE window per key ordered by (ts, side, right-order) computes
   ``last(col, ignorenulls=True)`` for every right payload column —
   i.e. "the most recent right value seen so far";
3. keep the left rows.

One shuffle (the window's hash partition on the key), no join node at
all, no per-row search. The right side rides the same exchange — at
10^12 left rows x 10^9 right rows this is the only shape that doesn't
explode: a naive inequality join is O(|L| x |R|) per key, and Spark
would plan it as a broadcast-nested-loop.

Ties (right.ts == left.ts) match, per the usual backward-asof contract:
the union sort key places right rows before left rows at equal ts.
Multiple right rows at the SAME (key, ts) are unspecified unless a
``right_order`` tiebreaker column is given (greatest wins) — callers
with true (key, ts) duplicates must pass one (or pre-aggregate) for a
deterministic result.

``tolerance``: a right match older than ``tolerance`` (a Column or
literal in the ts column's own arithmetic, e.g. F.expr("INTERVAL 1
HOUR") for timestamps) nulls out — merge_asof's tolerance semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "right_",
    tolerance=None,
    right_order: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + the latest right row at-or-before
    (``direction="backward"``, default) or the earliest right row
    at-or-after (``direction="forward"``) — merge_asof's two directions.

    left: any frame with (on, ts, ...); right: (on, ts, payload...).
    right_cols: payload columns to carry (default: every right column
    except ``on``); each appears on the output as ``prefix + name``,
    plus ``prefix + ts`` = the matched right timestamp (null if no right
    row in the direction, or outside ``tolerance``).

    Forward is backward on the reversed time axis: the same one-exchange
    union + running-last window, ordered descending.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    order_col = (
        F.col(right_order).cast("double") if right_order else F.lit(0.0)
    )

    lhs = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{prefix}{ts}"),
        F.lit(None).cast("double").alias("_rord"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    rhs_base = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(ts).alias(f"{prefix}{ts}"),
        order_col.alias("_rord"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    left_only = [c for c in lhs.columns if c not in rhs_base.columns]
    rhs = rhs_base.select(
        "*", *[F.lit(None).cast(lhs.schema[c].dataType).alias(c) for c in left_only]
    )
    u = lhs.unionByName(rhs)

    # right rows sort before left rows at equal ts (equal-ts rights DO
    # match); among equal-(key, ts) right rows the greatest _rord wins.
    # forward mode reverses the time axis: descending ts, so "last seen"
    # is the earliest at-or-after.
    if direction == "backward":
        order = [F.col(ts).asc(), F.col("_side").asc(), F.col("_rord").asc()]
    else:
        # _rord stays ASC: the window keeps the LAST-seen right row, so
        # ascending order makes the greatest tiebreaker win in both modes
        order = [F.col(ts).desc(), F.col("_side").asc(), F.col("_rord").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{prefix}{ts}"] + [f"{prefix}{c}" for c in right_cols]
    out = u.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carried
        ],
    ).where(F.col("_side") == 1)
    if tolerance is not None:
        if direction == "backward":
            ok = F.col(f"_m_{prefix}{ts}") >= (F.col(ts) - tolerance)
        else:
            ok = F.col(f"_m_{prefix}{ts}") <= (F.col(ts) + tolerance)
        matched = {
            c: F.when(ok, F.col(f"_m_{c}")).otherwise(F.lit(None)) for c in carried
        }
    else:
        matched = {c: F.col(f"_m_{c}") for c in carried}
    return out.select(
        *[c for c in left.columns],
        *[matched[c].alias(c) for c in carried],
    )
