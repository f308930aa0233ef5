"""Edge-events oracle parity: timestamp ties and boundary instants.

The stock events corpus has 1000 rows with 1000 DISTINCT timestamps,
so nothing ever exercises the tie semantics every event-time operator
quietly depends on: two events of one user at the same instant
(ordering ties in lag/lead/asof/funnel logic), an event exactly ON a
tumbling-window / retention boundary (inclusive-start vs
exclusive-end), duplicate instants across users, and NULL props.

This suite rebuilds ``events`` with adversarial rows appended
(negative event_ids, fresh negative user_ids so existing funnels are
untouched) and runs every events-centric oracled entry — batch,
streaming replays and stateful CEP — against DuckDB on the same
corpus. A pass means the entry is genuinely totally-ordered /
order-insensitive, not just lucky on unique timestamps.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import TABLES, compare, register_duck_views

T_TIE = datetime.datetime(2024, 1, 15, 7, 30, 0)        # shared instant
T_EDGE = datetime.datetime(2024, 1, 15, 8, 0, 0)        # exactly on the hour
T_MIN = datetime.datetime(2024, 1, 1, 0, 0, 0)          # corpus floor

EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (-1, T_TIE, -50, "view", 1.5, '{"domain": "edge.example", "path": "/a"}'),
    (-2, T_TIE, -50, "click", 2.25, "{}"),       # same user, same instant, other type
    (-3, T_TIE, -50, "click", 0.0, None),        # exact same-type tie + NULL props
    (-4, T_EDGE, -50, "purchase", -3.5, '{"domain": "edge.example"}'),
    (-5, T_EDGE, -51, "view", 0.000001, "{}"),   # cross-user tie on the boundary
    (-6, T_MIN, -51, "error", 100.0, "{}"),      # at the corpus floor
    (-7, T_TIE, None, "view", 2.0, "{}"),        # NULL user_id (raw reality)
    # NULL user completing the full funnel (view→click→purchase): the
    # CEP emit path must never see this group (oracle equi-joins drop
    # NULL keys; an unfiltered NULL-key group TypeErrors at int(key[0])).
    (-8, datetime.datetime(2024, 1, 15, 9, 0, 0), None, "click", 1.0, "{}"),
    (-9, datetime.datetime(2024, 1, 15, 10, 0, 0), None, "purchase", 5.0, "{}"),
]

ENTRIES = [
    "events_tumbling_hourly",
    "events_sessions",
    "events_status_filter",
    "events_retention_filter",
    "events_progress",
    "funnel_conversion",
    "funnel_user_times",
    "abandoned_first_view",
    "asof_join_events",
    "range_join_pairs",
    "timeseries_gapfill",
    "value_outliers_zscore",
    "rolling_avg_range_window",
    "hourly_rollup_finalized",
    "projection_rename_iso",
    "json_key_filter",
    "json_props_stats",
    "variant_props_stats",
    "value_histogram",
    "sketch_distinct_tolerance",
    "sketch_heavy_hitters",
    "sketch_quantile_tolerance",
    "expsmooth_forecast",
    "winsorized_value_stats",
    "stream_interval_join",
    "stream_session_replay",
    "stream_dedup_replay",
    "cep_funnel_stream",
    "cep_abandon_stream",
    "cep_sequence_stream",
]


@pytest.fixture(scope="session")
def edge_events_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from vector_search_service_spark.sources.tables import load_table

    out = tmp_path_factory.mktemp("edge_events")
    for t in TABLES:
        if t != "events":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", out / f"{t}.parquet")
    ev = load_table(spark, SF_SMOKE, "events")  # LTZ under pinned-UTC session
    edge = spark.createDataFrame(
        EDGE_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    merged = ev.unionByName(edge).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    tmp = str(out / "_ev_build")
    merged.coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), out / "events.parquet")
    shutil.rmtree(tmp)
    return str(out)


@pytest.mark.parametrize("name", ENTRIES)
def test_oracle_parity_on_edge_events(spark, duck, edge_events_dir, name):
    from vector_search_service_spark.registry import all_queries

    register_duck_views(duck, edge_events_dir)
    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} must stay oracled for this sweep"
    ok, msg = compare(spec.fn(spark, edge_events_dir), duck, spec.oracle)
    assert ok, f"{name} on edge events: {msg}"
