"""Registry entries — event-time windowed aggregation over ``events``
(batch mode; the identical plans run as Structured Streaming with
watermarks in ``streaming/windows.py`` — tests assert batch==stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table
from .streaming.windows import session_windows, sliding_user_activity, tumbling_counts

_SUM_MICROS = "sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0"


@register(
    "events_tumbling_hourly",
    survey_ref="extension: event-time tumbling windows (§2.10)",
    tags=("streaming", "headline"),
    oracle=f"""
SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {_SUM_MICROS} AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY window_start_ms, event_type
""",
)
def q_events_tumbling_hourly(spark, sf_dir):
    """Tumbling 1h windows × event_type: counts + exact integer-micro
    value sums (order-independent, reproducible under any partitioning
    or streaming trigger sequence)."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, width="1 hour").orderBy("window_start_ms", "event_type")


@register(
    "events_sliding_2h",
    survey_ref="extension: sliding windows (§2.10)",
    tags=("streaming",),
    oracle="""
WITH b AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
),
w AS (
  SELECT user_id, h AS ws FROM b
  UNION
  SELECT user_id, h - INTERVAL 1 HOUR AS ws FROM b
)
SELECT CAST(epoch_ms(ws) AS BIGINT) AS window_start_ms,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY 1 ORDER BY window_start_ms
""",
)
def q_events_sliding_2h(spark, sf_dir):
    """Sliding 2h/1h windows: distinct active users (each event lands
    in two windows; the oracle replays the expansion explicitly)."""
    ev = load_table(spark, sf_dir, "events")
    return sliding_user_activity(ev, width="2 hours", slide="1 hour").orderBy("window_start_ms")


@register(
    "events_sessions",
    survey_ref="extension: session windows (§2.10)",
    tags=("streaming",),
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id,
       CAST(epoch_ms(min(ts)) AS BIGINT) AS session_start_ms,
       CAST(epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS BIGINT) AS session_end_ms,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_no
ORDER BY user_id, session_start_ms
""",
)
def q_events_sessions(spark, sf_dir):
    """Per-user 30-minute-gap sessionization via native
    ``session_window``; the oracle is the classic gaps-and-islands
    rewrite (lag → flag → cumulative sum), independently implemented.

    NOTE: the result is O(corpus) (one row per session — 9.55M rows at
    sf10), which is fine for the engine (linear, 8.9 s at sf10) but
    makes GRADING wall-dominated by result hashing at big SF
    (docs/ROUND11.md §15). Big-SF sweeps grade the bounded sibling
    ``events_sessions_topk`` instead (identical sessionization plan,
    O(k) result)."""
    ev = load_table(spark, sf_dir, "events")
    return session_windows(ev, gap="30 minutes").orderBy("user_id", "session_start_ms")


@register(
    "events_sessions_topk",
    survey_ref="extension: session windows (§2.10), bounded-output grading tier",
    tags=("streaming",),
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
),
g AS (
  SELECT user_id,
         CAST(epoch_ms(min(ts)) AS BIGINT) AS session_start_ms,
         CAST(epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS BIGINT) AS session_end_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, session_no
)
SELECT * FROM g
ORDER BY n_events DESC, user_id, session_start_ms LIMIT 1000
""",
)
def q_events_sessions_topk(spark, sf_dir):
    """``events_sessions`` with a bounded result (r11 verdict
    next-round #5): the FULL corpus is sessionized by the identical
    ``session_window`` plan — the engine work doesn't shrink — but
    only the top-1000 busiest sessions are returned, so oracle
    grading at sf10 hashes 1000 rows instead of 9.55M. Total order:
    (user_id, session_start_ms) is unique per session, so the
    (n_events DESC, user_id, session_start_ms) sort is deterministic.
    At scale this is TakeOrderedAndProject over the session aggregate
    — no full sort, no corpus-sized collect."""
    ev = load_table(spark, sf_dir, "events")
    return (
        session_windows(ev, gap="30 minutes")
        .orderBy(F.col("n_events").desc(), "user_id", "session_start_ms")
        .limit(1000)
    )


@register(
    "events_status_filter",
    survey_ref="P8,A3",
    tags=("streaming",),
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors
FROM events WHERE event_type = 'error'
GROUP BY user_id ORDER BY n_errors DESC, user_id ASC LIMIT 20
""",
)
def q_events_status_filter(spark, sf_dir):
    """Status-enum filter (P8, ``src/core/job_manager.py:122-129``
    shape) + top error producers."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id").agg(F.count("*").alias("n_errors"))
        .orderBy(F.col("n_errors").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "events_retention_filter",
    survey_ref="P9",
    tags=("streaming",),
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
GROUP BY event_type ORDER BY event_type
""",
)
def q_events_retention_filter(spark, sf_dir):
    """Retention cutoff (P9, ``src/core/job_manager.py:283-299``):
    keep only the trailing 24h relative to corpus max — the scalar
    subquery becomes a broadcast join in Spark."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type").agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


@register(
    "events_progress",
    survey_ref="A4",
    tags=("streaming",),
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS total,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS completed,
       round(CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 100, 2) AS progress_pct
FROM events GROUP BY user_id ORDER BY user_id LIMIT 100
""",
)
def q_events_progress(spark, sf_dir):
    """Progress aggregate (A4, ``src/core/job_manager.py:185-200``):
    completed/total percentage per key — one grouped pass, conditional
    count, single rounded division."""
    ev = load_table(spark, sf_dir, "events")
    done = F.count(F.when(F.col("event_type") == "purchase", 1))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("total"),
            done.alias("completed"),
            F.round(done.cast("double") / F.count("*").cast("double") * 100, 2).alias("progress_pct"),
        )
        .orderBy("user_id").limit(100)
    )
