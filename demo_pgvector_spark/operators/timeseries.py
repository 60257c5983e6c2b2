"""Time-series resampling — irregular events onto a fixed time grid
with forward fill.

Extension surface (the reference has no time-series tooling): the
feature-engineering step behavioral/training pipelines run before
windowed models — "give me each user's state at every hour, carrying
the last observation forward". Pandas calls it ``resample().ffill()``;
here it is three Catalyst stages, all distributed:

1. per-(key, bucket) LAST observation — one hash aggregate keyed on
   (key, bucket) with a ``max_by`` over the (ts, id) total order (no
   window over raw events, so the event stream is never re-sorted
   whole);
2. per-key grid — ``sequence(min_bucket, max_bucket, interval)`` off a
   tiny per-key min/max aggregate, exploded; grid size is
   span/step × keys, INDEPENDENT of the event count (the 100 TB shape:
   1e12 events over a month still explode to the same 720×keys grid);
3. forward fill — grid LEFT JOIN observations, then
   ``last(value, ignorenulls)`` over (key ORDER BY bucket) — one
   exchange on the key, one in-partition sort of GRID rows (not event
   rows).

Determinism: the in-bucket pick orders on the (ts, id) total order;
values pass through untouched from storage (both engines read the same
parquet doubles), so parity is exact with no rounding contract needed
beyond the output's display rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}


def resample_ffill(
    events: DataFrame,
    step: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, bucket, value_ff, n_obs) for every grid point of every
    key's [first, last] observation span. ``value_ff`` is the last
    observed value at or before the bucket (forward fill; the first
    bucket always has an observation by construction), ``n_obs`` the
    observation count inside the bucket (0 for gap rows)."""
    qty, unit = step.split()
    unit = unit.rstrip("s")  # "1 hour" -> hour
    # Buckets are date_trunc'd to the bare unit while the grid steps by
    # the full interval: a multi-unit step ("2 hours") would leave the
    # off-grid buckets unjoined — observations silently dropped. Fail
    # loudly instead (ADVICE r7 #1).
    if qty != "1":
        raise ValueError(
            f"resample_ffill supports single-unit steps only ('1 hour', "
            f"'1 day', ...); got {step!r} — observations in off-grid "
            f"date_trunc buckets would be silently dropped"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = (
        events.groupBy(F.col(key_col), bucket.alias("bucket"))
        .agg(
            F.max_by(
                F.col(value_col), F.struct(F.col(ts_col), F.col(id_col))
            ).alias("v_last"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    grid = (
        events.groupBy(key_col)
        .agg(
            F.date_trunc(unit, F.min(ts_col)).alias("b0"),
            F.date_trunc(unit, F.max(ts_col)).alias("b1"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("b0", "b1", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "bucket"], "left")
        .select(
            key_col,
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.last("v_last", ignorenulls=True).over(w).alias("value_ff"),
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        )
    )


def resample_interpolate(
    events: DataFrame,
    step: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(key, bucket, value_li, n_obs): the LINEAR-interpolation
    complement of ``resample_ffill`` — pandas
    ``resample().interpolate('linear')`` at bucket granularity. Observed
    buckets keep their in-bucket last value (the ffill pick); gap
    buckets get ``v0 + (v1 − v0) · (i − i0)/(i1 − i0)`` between the
    surrounding observed buckets. The grid spans each key's [first,
    last] span, so both neighbors always exist at a gap — no
    extrapolation case.

    Same three-stage distributed shape as ``resample_ffill`` (per-bucket
    aggregate, span-sized exploded grid, one exchange + one in-partition
    sort of GRID rows); the prev/next lookups are two frames over the
    SAME window partitioning, so no extra shuffle. Float contract: the
    interpolation is the identical IEEE expression on both engines
    (integer bucket-index differences cast to double, one divide, one
    multiply, one add — same parenthesization), then 6dp display
    rounding; operands are parquet doubles, so parity is exact."""
    qty, unit = step.split()
    unit = unit.rstrip("s")
    if qty != "1" or unit not in _UNIT_SECONDS:
        raise ValueError(
            f"resample_interpolate supports steps of '1 hour'/'1 day'/"
            f"'1 minute'; got {step!r}"
        )
    unit_s = _UNIT_SECONDS[unit]
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = events.groupBy(F.col(key_col), bucket.alias("bucket")).agg(
        F.max_by(
            F.col(value_col), F.struct(F.col(ts_col), F.col(id_col))
        ).alias("v_last"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    grid = (
        events.groupBy(key_col)
        .agg(
            F.date_trunc(unit, F.min(ts_col)).alias("b0"),
            F.date_trunc(unit, F.max(ts_col)).alias("b1"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("b0", "b1", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    # integer bucket index; only DIFFERENCES feed the interpolation, so
    # any constant epoch/timezone offset cancels
    idx = F.expr(f"unix_timestamp(bucket) div {unit_s}")
    obs_idx = F.when(F.col("v_last").isNotNull(), F.col("_i"))
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = grid.join(obs, [key_col, "bucket"], "left").withColumn("_i", idx)
    j = (
        j.withColumn("_vp", F.last("v_last", ignorenulls=True).over(w_prev))
        .withColumn("_ip", F.last(obs_idx, ignorenulls=True).over(w_prev))
        .withColumn("_vn", F.first("v_last", ignorenulls=True).over(w_next))
        .withColumn("_in", F.first(obs_idx, ignorenulls=True).over(w_next))
    )
    frac = (F.col("_i") - F.col("_ip")).cast("double") / (
        F.col("_in") - F.col("_ip")
    ).cast("double")
    value_li = F.when(F.col("v_last").isNotNull(), F.col("v_last")).otherwise(
        F.col("_vp") + (F.col("_vn") - F.col("_vp")) * frac
    )
    return j.select(
        key_col,
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        value_li.alias("value_li"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
    )


def ewma_trailing(
    events: DataFrame,
    half_window: int = 16,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially weighted moving average (α = 1/2) over each key's
    trailing ``half_window`` observations INCLUSIVE of the current row
    — the smoothing step telemetry/metrics pipelines run before
    thresholding (pandas ``ewm(alpha=.5).mean()`` with a finite
    window), fifth time-series member after resample / interpolate /
    sessionize / anomaly.

    α = 1/2 is chosen so every weight is an exact power of two:
    the observation at lag d (d = 0 is the current row) weighs
    2^(W−1−d), so numerator and denominator are EXACT BIGINT sums of
    dyadically-scaled micro-integers (floor(value·1e6 + 0.5), the
    ts_anomaly contract) — bit-identical on any engine in any
    accumulation order. The displayed mean follows the module's
    floor-micro display contract (the ts_interpolate/graph.py:650
    form): ``ewma_e6 = cast(floor(num/den + 0.5) as bigint)`` — the
    quotient is already in micro units, the ONE double division is
    IEEE-correctly-rounded identically on both engines, and floor
    avoids the Spark-HALF_UP-vs-DuckDB-float round() divergence that
    flipped 8/2000 rows on graph_hyperball at 4 dp. Overflow headroom:
    |value| ≤ 1e12 · 2^15 · 16 ≈ 5e17 < 2^63 even for 1e6-magnitude
    values.

    Plan shape: one shuffle on the key, one in-partition sort, a
    ROWS-frame ``collect_list`` of the scaled values (frame order =
    the (ts, id) total order, engine-identical), and a scan-fused
    indexed fold — no self-join, no per-row explode. The frame list is
    ≤ W elements per row; state is the W-row frame, the same
    streaming-friendly class as ts_anomaly's moment windows."""
    w = (
        Window.partitionBy(key_col)
        .orderBy("_ts", id_col)
        .rowsBetween(-(half_window - 1), 0)
    )
    scaled = events.select(
        F.col(id_col),
        F.col(key_col),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("_ts_s"),
        F.col(ts_col).alias("_ts"),
        F.expr(f"cast(floor({value_col} * 1000000 + 0.5) as bigint)").alias(
            "_v"
        ),
    )
    arr = scaled.select(
        id_col,
        key_col,
        "_ts_s",
        "_v",
        F.collect_list("_v").over(w).alias("_arr"),
    )
    # element p (1-based) of an n-element frame list sits at lag
    # d = n − p, so its weight is 2^(W−1−d) = shiftleft(1, W−1−n+p)
    num = (
        f"aggregate(transform(sequence(1, size(_arr)),"
        f" p -> element_at(_arr, p)"
        f" * shiftleft(cast(1 as bigint), {half_window} - 1 - size(_arr) + p)),"
        f" cast(0 as bigint), (acc, x) -> acc + x)"
    )
    den = (
        f"shiftleft(cast(1 as bigint), {half_window})"
        f" - shiftleft(cast(1 as bigint), {half_window} - size(_arr))"
    )
    return arr.select(
        id_col,
        key_col,
        F.col("_ts_s").alias(ts_col),
        F.col("_v").alias("v_scaled"),
        F.size("_arr").cast("int").alias("n_window"),
        F.expr(
            f"cast(floor(cast({num} as double) / cast({den} as double)"
            f" + 0.5d) as bigint)"
        ).alias("ewma_e6"),
    )
