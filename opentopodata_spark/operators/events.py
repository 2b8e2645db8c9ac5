"""Event-stream rollups (batch + Structured Streaming).

The reference has zero streaming semantics (request/response only —
SURVEY.md "Streaming operators"); these are the engine extras for the
events table. The same column logic serves both the batch rollup used
by the DuckDB-checked contract queries and a Structured Streaming
variant with watermarked state for live ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_rollup", "streaming_tumbling_rollup", "sessionize"]


def tumbling_rollup(events: DataFrame, width: str = "hour") -> DataFrame:
    """(window_start, event_type, n_events, sum_value, n_users).

    sum_value is accumulated in DECIMAL(28,6): exact, and therefore
    independent of partial-aggregation order — double sums are not
    reproducible across partition layouts, decimals are. Cast back to
    double at the edge.
    """
    return (
        events.groupBy(
            F.date_trunc(width, F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def streaming_tumbling_rollup(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Structured Streaming twin of ``tumbling_rollup``.

    events must be a streaming DataFrame (spark.readStream...). Late
    rows beyond the watermark are dropped; state is bounded by
    (#windows in watermark horizon) x (#event types).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization: (user_id, session_id, session_start,
    session_end, n_events). A session breaks when the gap to the
    previous event exceeds ``gap_minutes``. One shuffle (window by
    user); the cumulative-sum-of-breaks trick keeps it a single pass.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # exact integer microseconds: reproducible in any engine (epoch_us),
    # unlike second-truncated casts. Parquet NTZ timestamps need a cast
    # before unix_micros; only *differences* are used, so the session-tz
    # offset the cast introduces cancels out.
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    ts_col = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts_col = ts_col.cast("timestamp_ltz")
    us = F.unix_micros(ts_col)
    breaks = (
        F.when(us - F.lag(us, 1).over(w) > gap, 1).otherwise(0).alias("brk")
    )
    with_sess = events.select("user_id", "ts", breaks).withColumn(
        "session_id", F.sum("brk").over(w)
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def geofence_rollup(
    events: DataFrame,
    polygons: list,
    width: str = "hour",
    level: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-(polygon, window) presence counts: the geofencing aggregate.

    (window_start, polygon_id, n_events, n_users) for every event whose
    coordinate falls inside a polygon — the spatial-join trio's PIP
    member (operators/spatial.point_in_polygon_join: broadcast S2 cover,
    proven-interior fast path, exact ray-cast only on boundary cells)
    composed with the tumbling rollup. An event in k overlapping fences
    counts toward all k. One broadcast join + one hash aggregation.
    """
    from . import spatial as _spatial

    hits = _spatial.point_in_polygon_join(
        events, polygons, level=level, lat_col=lat_col, lon_col=lon_col
    )
    return hits.groupBy(
        F.date_trunc(width, F.col("ts")).alias("window_start"),
        F.col("polygon_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def streaming_geofence_rollup(
    events: DataFrame,
    polygons: list,
    width: str = "1 hour",
    watermark: str = "2 hours",
    level: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Structured Streaming twin of ``geofence_rollup`` (live geofencing).

    The PIP join is STATELESS (broadcast polygon cover + per-batch
    refine), so only the windowed aggregate carries state — bounded by
    (#windows in the watermark horizon) x (#polygons). n_users uses
    approx_count_distinct: exact distinct inside streaming state would
    buffer every user id per (window, polygon); the HLL sketch is the
    honest unbounded-cardinality choice, and the batch twin stays exact.
    """
    from . import spatial as _spatial

    hits = _spatial.point_in_polygon_join(
        events, polygons, level=level, lat_col=lat_col, lon_col=lon_col
    )
    return (
        hits.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("win"), F.col("polygon_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "polygon_id",
            "n_events",
            "n_users_approx",
        )
    )


def geofence_transitions(
    events: DataFrame,
    polygons: list,
    level: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user fence ENTER/EXIT transitions (batch form).

    (user_id, ts, polygon_id, transition) — one row per fence whose
    membership changed relative to the user's PREVIOUS event (ordered by
    ts, then ``id_col`` for deterministic ties). A user's first event
    emits an 'enter' for every fence it is already inside. Events with
    no membership change emit nothing.

    Shape: PIP join -> per-event membership set (sort_array(collect_set)
    keyed by the event) -> RANGE-partitioned per-user lag -> set
    difference explode. A plain Window.partitionBy(user_id) serializes a
    hot user (one Zipf user owning half the events runs in ONE task);
    instead the frame is repartitionByRange(user, ts, id) — a hot user's
    timeline SPLITS across consecutive partitions — the lag runs inside
    each (partition, user) slice, and each slice head gets its true
    predecessor from a tiny boundary frame (the last row of the previous
    partition: one row per partition, broadcast back). Task skew is
    bounded by the range partitioner regardless of the user histogram;
    results are identical to the single-window form (pinned by test).
    """
    from pyspark.sql import Window

    from . import spatial as _spatial

    hits = _spatial.point_in_polygon_join(
        events, polygons, level=level, lat_col=lat_col, lon_col=lon_col
    ).select(id_col, "polygon_id")
    memb = (
        events.join(hits, id_col, "left")
        .groupBy(id_col, "user_id", "ts")
        .agg(
            F.sort_array(
                F.filter(
                    F.collect_set("polygon_id"), lambda p: p.isNotNull()
                )
            ).alias("inside")
        )
    )
    rp = (
        memb.repartitionByRange("user_id", "ts", id_col)
        .sortWithinPartitions("user_id", "ts", id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # global sort order is (user, ts, id): a user's rows are contiguous
    # across partition boundaries, so a slice head's true predecessor is
    # the previous partition's LAST row iff that row is the same user.
    last_rows = rp.groupBy("_pid").agg(
        F.max_by(
            F.struct("user_id", "inside"), F.struct("ts", F.col(id_col))
        ).alias("_last")
    ).select(
        "_pid",
        F.col("_last.user_id").alias("_last_user"),
        F.col("_last.inside").alias("_last_inside"),
    )
    # chain through EMPTY partitions: slice p's predecessor is the last
    # row of the nearest non-empty partition BEFORE p. The frame is one
    # row per non-empty partition (tiny), so the single-task window +
    # gap-filling sequence explode are driver-scale work done on
    # executors — and the range exchange under both branches is one
    # ReusedExchange in the final plan.
    wl = Window.orderBy("_pid")
    lasts = (
        last_rows.withColumn("_next", F.lead("_pid").over(wl))
        .select(
            F.explode(
                F.sequence(
                    F.col("_pid") + 1,
                    F.coalesce(F.col("_next"), F.col("_pid") + 1),
                )
            ).alias("_pid"),
            "_last_user",
            "_last_inside",
        )
    )
    w = Window.partitionBy("_pid", "user_id").orderBy(
        F.col("ts").asc(), F.col(id_col).asc()
    )
    lagged = rp.withColumn("_prev_local", F.lag("inside").over(w))
    joined = lagged.join(F.broadcast(lasts), "_pid", "left")
    prev = F.coalesce(
        F.col("_prev_local"),
        F.when(F.col("_last_user") == F.col("user_id"),
               F.col("_last_inside")),
        F.array().cast("array<string>"),
    )
    diff = joined.select(
        "user_id",
        "ts",
        F.array_except(F.col("inside"), prev).alias("_enter"),
        F.array_except(prev, F.col("inside")).alias("_exit"),
    )
    enters = diff.select(
        "user_id", "ts", F.explode("_enter").alias("polygon_id"),
        F.lit("enter").alias("transition"),
    )
    exits = diff.select(
        "user_id", "ts", F.explode("_exit").alias("polygon_id"),
        F.lit("exit").alias("transition"),
    )
    return enters.unionByName(exits)


def funnel(
    events: DataFrame,
    steps: list[str],
    within=None,
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts: (step, step_index, n_users).

    A user converts at step i when an event of ``steps[i]`` exists
    AT-OR-AFTER their step i-1 conversion time, taking the EARLIEST
    possible chain (greedy — for unwindowed funnels earliest-chain
    completion is equivalent to any-chain completion).
    ``within``: optional bound on total funnel duration — every step
    must land at-or-before t0 + within (e.g. F.expr("INTERVAL 1 DAY")),
    with FIRST-TOUCH attribution: t0 is the user's first step-0 event
    (the standard product-analytics rule — a user whose first touch
    times out is not re-attributed to a later touch).

    Shape: k-1 LEFT join+min rounds over PER-STEP MINIMA — state per
    round is one row per step-0 user carrying nullable conversion times
    t0..ti (never a per-user event array); a user who drops out keeps a
    null ti instead of leaving the frame. All k counts then come from
    ONE aggregate over the final frame (count(ti) per step, unpivoted
    with stack), so the whole funnel is a single linear plan that scans
    each step's events exactly once — no per-step re-execution of the
    join chain (the old k-row-of-aggregates form re-ran step i's joins
    for every j >= i).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    e0 = events.where(F.col(type_col) == steps[0]).select(
        F.col(user).alias("_u"), F.col(ts).alias("_t")
    )
    prev = e0.groupBy("_u").agg(F.min("_t").alias("t0"))
    for i, st in enumerate(steps[1:], start=1):
        e_i = events.where(F.col(type_col) == st).select(
            F.col(user).alias(f"_u{i}"), F.col(ts).alias("_t")
        )
        cond = (F.col("_u") == F.col(f"_u{i}")) & (
            F.col("_t") >= F.col(f"t{i - 1}")
        )
        if within is not None:
            cond = cond & (F.col("_t") <= F.col("t0") + within)
        carried = [f"t{j}" for j in range(i)]
        # LEFT join: a non-qualifying user keeps a null _t, so min()
        # yields null ti and the user stays in the frame for counting.
        prev = (
            prev.join(e_i, cond, "left")
            .groupBy("_u", *carried)
            .agg(F.min("_t").alias(f"t{i}"))
        )
    per_step = prev.agg(
        *[F.count(F.col(f"t{i}")).alias(f"n{i}") for i in range(len(steps))]
    )
    stack_args = ", ".join(
        "'{}', {}L, n{}".format(st.replace("\\", "\\\\").replace("'", "\\'"), i, i)
        for i, st in enumerate(steps)
    )
    return per_step.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_index, n_users)"
    )


def retention(
    events: DataFrame,
    anchor: str = "signup",
    return_types: list[str] | None = None,
    max_periods: int = 7,
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention: (cohort_date, period, n_cohort, n_active).

    Users cohort by the DATE of their first ``anchor`` event; for each
    day offset 0..max_periods a user is active if any event (or any of
    ``return_types``) lands on cohort_date + period. Every (cohort,
    period <= max_periods) cell is emitted, zeros included — a missing
    cell and an empty cell are different facts in a retention table.

    Shape: one aggregation for cohorts, one (user) equi-join to tag
    activity days, one distinct + one aggregation — activity is counted
    on (user, day) so event volume collapses before the final shuffle.
    The dense (cohort x period) grid comes from a sequence explode of
    the (tiny) cohort frame, never a cross join.
    """
    cohorts = (
        events.where(F.col(type_col) == anchor)
        .groupBy(F.col(user).alias("_u"))
        .agg(F.min(F.to_date(ts)).alias("cohort_date"))
    )
    act = events
    if return_types is not None:
        act = act.where(F.col(type_col).isin(list(return_types)))
    active_days = act.select(
        F.col(user).alias("_u"), F.to_date(ts).alias("_day")
    ).distinct()
    hits = (
        cohorts.join(active_days, "_u")
        .select(
            "cohort_date",
            "_u",
            F.datediff(F.col("_day"), F.col("cohort_date")).alias("period"),
        )
        .where((F.col("period") >= 0) & (F.col("period") <= max_periods))
        .distinct()
        .groupBy("cohort_date", "period")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    grid = sizes.select(
        "cohort_date",
        "n_cohort",
        F.explode(F.sequence(F.lit(0), F.lit(int(max_periods)))).alias("period"),
    )
    return grid.join(hits, ["cohort_date", "period"], "left").select(
        "cohort_date",
        F.col("period").cast("long").alias("period"),
        "n_cohort",
        F.coalesce(F.col("n_active"), F.lit(0)).cast("long").alias("n_active"),
    )
