"""Structured Streaming (same plan as batch, replayed incrementally
with watermarks) and the async jobs subsystem (Q1-Q6)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _collect_sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("helper,cols", [
    ("tumbling", ["window_start_ms", "event_type", "n_events", "sum_value"]),
    ("session", ["user_id", "session_start_ms", "session_end_ms", "n_events"]),
])
def test_stream_equals_batch(spark, tmp_path, helper, cols):
    from vector_search_service_spark.sources.tables import load_table
    from vector_search_service_spark.streaming.windows import (
        session_windows,
        stream_events_from_parquet,
        tumbling_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    stream = stream_events_from_parquet(spark, SF_SMOKE)
    if helper == "tumbling":
        batch_df = tumbling_counts(ev)
        stream_df = tumbling_counts(stream, watermark="1 hour")
    else:
        batch_df = session_windows(ev)
        stream_df = session_windows(stream, watermark="1 hour")

    q = (
        stream_df.writeStream.format("memory")
        .queryName(f"mem_{helper}")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{helper}"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.table(f"mem_{helper}"), cols)
    finally:
        q.stop()
    want = _collect_sorted(batch_df, cols)
    assert got == want


def test_stateful_running_count(spark, tmp_path):
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState (Q2's custom-state upgrade path)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from vector_search_service_spark.streaming.windows import stream_events_from_parquet

    def running(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    stream = stream_events_from_parquet(spark, SF_SMOKE)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            running,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.format("memory").queryName("mem_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: r["n_events"]
            for r in spark.sql(
                "SELECT user_id, max(n_events) AS n_events FROM mem_state GROUP BY user_id"
            ).collect()
        }
    finally:
        q.stop()
    from vector_search_service_spark.sources.tables import load_table

    want = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_streaming_dedup_equals_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark across micro-batches: the same
    file replayed twice (at-least-once delivery) collapses to exactly
    the batch-distinct row set. Watermark exceeds the data's time span
    so nothing is dropped as late — the test isolates dedup state."""
    from vector_search_service_spark.sources.tables import load_table
    from vector_search_service_spark.streaming.windows import dedup_events

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "user_id")
    src = tmp_path / "dup_events"
    ev.coalesce(1).write.mode("overwrite").parquet(str(src / "copy1"))
    ev.coalesce(1).write.mode("append").parquet(str(src / "copy2"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = dedup_events(stream, watermark="2000 hours")
    q = (
        out.writeStream.format("memory").queryName("mem_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.table("mem_dedup"), ["event_id"])
    finally:
        q.stop()
    want = _collect_sorted(dedup_events(ev), ["event_id"])
    assert got == want
    assert len(got) == ev.count()  # the duplicate replay fully collapsed


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream inner join with an event-time bound: views joined
    to the same user's clicks within 48h, both sides streaming —
    result set identical to the batch theta join from the same
    helper."""
    from vector_search_service_spark.sources.tables import load_table
    from vector_search_service_spark.streaming.windows import click_after_view_pairs

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = tmp_path / "events_plain"
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    views_s = stream().filter(F.col("event_type") == "view")
    clicks_s = stream().filter(F.col("event_type") == "click")
    out = click_after_view_pairs(
        views_s, clicks_s, within="48 hours", watermark="2000 hours"
    )
    cols = ["user_id", "view_id", "click_id", "view_ms", "click_ms"]
    q = (
        out.writeStream.format("memory").queryName("mem_ssjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssjoin"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = _collect_sorted(spark.table("mem_ssjoin"), cols)
    finally:
        q.stop()
    want = _collect_sorted(
        click_after_view_pairs(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "click"),
            within="48 hours",
        ),
        cols,
    )
    assert got == want
    assert len(got) > 0


def test_job_lifecycle(spark):
    from vector_search_service_spark.streaming.jobs import JobManager, JobStatus

    jm = JobManager(spark)
    job = jm.create_job(total_documents=3)
    assert job.status == JobStatus.QUEUED and job.progress_percent == 0.0
    # queued job has not started: started_at stays null until the job
    # leaves the queue (reference JobStatus model semantics)
    assert job.started_at is None and job.to_dict()["started_at"] is None

    def body(j):
        for i in range(1, 4):
            spark.range(10).count()
            jm.update_progress(j.job_id, i, succeeded=i)
        return {"ok": True}

    jm.submit(job, body)
    done = jm.wait(job.job_id)
    assert done.status == JobStatus.COMPLETED
    assert done.started_at is not None and done.started_at >= done.created_at
    assert done.progress_percent == 100.0
    assert done.result == {"ok": True}
    # terminal → not cancellable (Q4)
    assert jm.cancel_job(job.job_id) is False

    failing = jm.create_job(2)
    jm.run_sync(failing, lambda j: (_ for _ in ()).throw(RuntimeError("boom")))
    assert failing.status == JobStatus.FAILED and "boom" in failing.error

    # P8/T4 listing + A3 counts
    assert len(jm.list_jobs(status="completed")) == 1
    assert jm.list_jobs(status="nope") == []
    assert jm.counts_by_status() == {"completed": 1, "failed": 1}

    # Q5 GC: nothing old enough yet, then everything
    assert jm.cleanup_old_jobs(max_age_hours=24) == 0
    assert jm.cleanup_old_jobs(max_age_hours=0) == 2
    assert jm.counts_by_status() == {}


def test_job_cancellation(spark):
    from vector_search_service_spark.streaming.jobs import JobManager, JobStatus

    jm = JobManager(spark)
    job = jm.create_job(1)

    def slow_body(j):
        # a genuinely long Spark action in the job's group (Python
        # sleep per partition so it cannot finish before the cancel)
        import time as _t

        spark.range(64).repartition(8).rdd.foreachPartition(
            lambda it: _t.sleep(10)
        )
        return {}

    jm.submit(job, slow_body)
    time.sleep(1.0)
    assert jm.cancel_job(job.job_id) is True
    done = jm.wait(job.job_id, timeout=30)
    assert done.status == JobStatus.CANCELLED
