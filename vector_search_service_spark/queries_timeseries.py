"""Registry entry — time-series resample + gap-fill (hypertable-style
rollup): regularize an event stream onto an hourly grid, zero-filling
count/sum gaps and carrying the last observation forward (LOCF).

Not in the reference (no time-series surface); this is the standard
"hypertable rollup" shape (TimescaleDB ``time_bucket_gapfill`` +
``locf``) re-expressed as DataFrame plans: one hourly pre-aggregation,
a per-key ``sequence()`` grid (generated, never shuffled), a left
join back, and one window pass for the carry-forward."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

# bound the output: resampling all 150 users × full span is the same
# plan; 10 users keeps the correctness artifact compact
_USERS = 10


@register(
    "timeseries_gapfill",
    survey_ref="extension: resample + gap-fill + LOCF (hypertable rollup shape)",
    tags=("streaming", "relational"),
    oracle=f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS mic,
         date_trunc('hour', ts) AS h
  FROM events WHERE user_id < {_USERS}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, h
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM ev
),
hourly AS (
  SELECT user_id, h, count(*) AS n_events, sum(mic) AS sum_micros,
         max(CASE WHEN rn = 1 THEN mic END) AS last_mic
  FROM ranked GROUP BY user_id, h
),
span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span
),
filled AS (
  SELECT g.user_id, g.h,
         coalesce(n_events, 0) AS n_events,
         coalesce(sum_micros, 0) AS sum_micros,
         last_mic
  FROM grid g LEFT JOIN hourly USING (user_id, h)
)
SELECT user_id,
       CAST(epoch_ms(h) AS BIGINT) AS hour_ms,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(sum_micros AS BIGINT) AS sum_micros,
       CAST(last_value(last_mic IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS locf_micros
FROM filled ORDER BY user_id, hour_ms
""",
)
def q_timeseries_gapfill(spark, sf_dir):
    """Hourly resample with gap fill: empty hours appear with
    n_events=0/sum=0 and the last observed value carried forward.
    Scale shape: the hourly pre-aggregation shuffles once on
    (user, hour) partials; the grid is GENERATED per key with
    ``sequence()`` (no cross join against a calendar table); the
    gap-join and the LOCF window both ride the same (user) hash
    partitioning, so AQE plans one shuffle family. State per key is
    one row — streaming-safe (cf. streaming/windows.py watermarks).
    Value sums are exact integer micros (order-independent)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < _USERS)
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 1_000_000).cast("long").alias("mic"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
    )
    w_last = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        ev.withColumn("rn", F.row_number().over(w_last))
        .groupBy("user_id", "h")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("mic").alias("sum_micros"),
            F.max(F.when(F.col("rn") == 1, F.col("mic"))).alias("last_mic"),
        )
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w_ff = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .withColumn("locf_micros", F.last("last_mic", ignorenulls=True).over(w_ff))
        .select(
            "user_id",
            F.unix_millis(F.col("h")).alias("hour_ms"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("sum_micros", F.lit(0)).cast("long").alias("sum_micros"),
            F.col("locf_micros").cast("long"),
        )
        .orderBy("user_id", "hour_ms")
    )


@register(
    "expsmooth_forecast",
    survey_ref="extension: time-series forecasting — exponential "
               "smoothing as a declarative sequential fold",
    tags=("streaming", "profile"),
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
series AS (
  SELECT event_type, list(x ORDER BY h) AS xs
  FROM hourly GROUP BY event_type
)
-- 0.5e0: a bare 0.5 literal is DECIMAL in DuckDB and would drag the
-- whole fold into decimal arithmetic
SELECT event_type,
       CAST(len(xs) AS BIGINT) AS n_hours,
       round(list_reduce(xs, (a, x) -> 0.5e0 * x + 0.5e0 * a), 6) AS level_r,
       -- + 0.0e0 normalizes the signed zero: round() of a tiny
       -- negative residual is -0.0 in DuckDB, +0.0 in Spark
       round(xs[len(xs)]
             - list_reduce(xs, (a, x) -> 0.5e0 * x + 0.5e0 * a), 6)
         + 0.0e0 AS resid_r
FROM series
ORDER BY event_type
""",
)
def q_expsmooth_forecast(spark, sf_dir):
    """Exponential smoothing over the per-type hourly event-count
    series — the time-series FORECASTING family (``timeseries_gapfill``
    regularizes a series; this projects it forward): the smoothed
    level IS the one-step forecast, and the last observation's
    deviation from it (``resid_r``) is the standard smoothing anomaly
    score. Update: l' = x/2 + l/2, init l = x₁, α = 1/2.

    Exactness: the recursive fold is one fixed chain of scalar double
    ops from exact integer counts, executed in the identical order by
    both engines (the bm25/KN discipline — for a multi-hundred-step
    recursion op-order identity is the ONLY cross-engine guarantee;
    rounding happens once, in the output). The state is deliberately a
    SINGLE scalar: a Holt (level+trend) variant was attempted and its
    oracle is not expressible — DuckDB's ``list_reduce`` struct
    accumulator is reused across chained steps, so the second field's
    expression observes the first field's already-updated value
    (reproduced: [1,2,4] folds to b=0.46875 where the spec chain gives
    0.8125). Trend forecasting on Spark would use the same
    ``F.aggregate`` with a struct accumulator, which does evaluate
    against the pre-step state.

    Scale: the hourly pre-aggregation is the only corpus-sized shuffle
    (map-side combined); the fold runs over the per-type hourly series
    — thousands of points per YEAR, bounded by calendar time, not
    event volume — inside ONE codegen'd ``F.aggregate`` expression, no
    UDF, no window, no driver loop. A streaming deployment maintains
    the level per key in state instead of re-folding (the fold IS the
    state-update function)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("double").alias("x"))
    series = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("h", "x"))).alias("s")
    )
    xs = F.transform(F.col("s"), lambda r: r["x"])
    level = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda a, x: F.lit(0.5) * x + F.lit(0.5) * a,
    )
    return (
        series.select(
            "event_type",
            F.size("s").cast("long").alias("n_hours"),
            level.alias("level"),
            F.element_at(xs, F.size("s")).alias("last_x"),
        )
        .select(
            "event_type",
            "n_hours",
            F.round("level", 6).alias("level_r"),
            # + 0.0 mirrors the oracle's signed-zero normalization
            (F.round(F.col("last_x") - F.col("level"), 6) + F.lit(0.0)).alias(
                "resid_r"
            ),
        )
        .orderBy("event_type")
    )
