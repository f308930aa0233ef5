"""Incremental rollup maintenance (streaming/rollup.py): streamed
merge == batch recompute, duplicate-batch idempotence, always-live
pointer semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.sources.tables import load_table
from vector_search_service_spark.streaming.rollup import (
    RollupStore,
    finalize,
    merge_rollups,
    rollup_of,
    start_rollup_maintenance,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_maintained_rollup_equals_batch(spark, tmp_path):
    """events replayed as 4 micro-batches; the maintained store must
    equal one batch rollup of the whole table — the monoid-merge
    correctness proof."""
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    src = tmp_path / "stream_src"
    ev.repartition(4).write.parquet(str(src))  # 4 files -> 4 triggers

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    store = RollupStore(spark, str(tmp_path / "rollup"))
    q = start_rollup_maintenance(
        spark, stream, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = finalize(store.current())
    want = finalize(rollup_of(ev))
    assert _canon(got) == _canon(want)
    # derived avg is consistent with sum/count on every row
    bad = got.filter(
        F.abs(F.col("avg_value") * F.col("n_events") - F.col("sum_value")) > 1e-6
    ).count()
    assert bad == 0


def test_duplicate_batch_is_idempotent(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    store = RollupStore(spark, str(tmp_path / "rollup"))
    store.write_merged(rollup_of(ev), batch_id=0)
    once = _canon(store.current())
    store.write_merged(rollup_of(ev), batch_id=0)  # replay: must be a no-op
    assert _canon(store.current()) == once
    # a NEW batch still merges
    store.write_merged(rollup_of(ev), batch_id=1)
    doubled = {r for r in _canon(store.current())}
    assert len(doubled) == len(once)  # same groups
    n_once = {(r[0], r[1]): r[2] for r in once}
    for r in doubled:
        assert r[2] == 2 * n_once[(r[0], r[1])]  # counts doubled


def test_merge_is_associative_and_commutative(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    a = rollup_of(ev.filter(F.col("event_type") <= "l"))
    b = rollup_of(ev.filter(F.col("event_type") > "l"))
    assert _canon(merge_rollups(a, b)) == _canon(merge_rollups(b, a))
    assert _canon(merge_rollups(a, b)) == _canon(rollup_of(ev))


def test_crash_between_store_write_and_checkpoint_commit(spark, tmp_path):
    """The ugly path of the exactly-once claim: the sink applies a
    batch to the store, then dies BEFORE the streaming checkpoint
    commits that batch. On restart, foreachBatch re-delivers the same
    batch_id; the store's applied-batch watermark must make the replay
    a no-op so the batch is never folded in twice."""
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    src = tmp_path / "stream_src"
    ev.repartition(4).write.parquet(str(src))

    def make_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    store = RollupStore(spark, str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")

    class Boom(RuntimeError):
        pass

    def crashing_sink(batch_df, batch_id):
        store.write_merged(rollup_of(batch_df), batch_id)
        if batch_id == 2:  # die AFTER the store write, BEFORE commit
            raise Boom("injected crash post-write/pre-commit")

    q = (
        make_stream().writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # the injected crash kills the query mid-run
    assert store._read_pointer()[1] == 2  # batch 2 applied but uncommitted

    # restart from the same checkpoint: batch 2 is re-delivered with
    # the same id, skipped by the watermark; batch 3 then applies
    q2 = start_rollup_maintenance(spark, make_stream(), store, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    assert _canon(finalize(store.current())) == _canon(finalize(rollup_of(ev)))


def test_out_of_order_late_batch_merges_correctly(spark, tmp_path):
    """Late data: a second availableNow run delivers a batch whose
    event times predate everything already rolled up. The monoid merge
    is keyed by (window_start, event_type), so the late partials fold
    into existing groups instead of being dropped or double-counted."""
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    cut = ev.agg(F.percentile_approx("ts", 0.3).alias("c")).first()["c"]
    recent, late = ev.filter(F.col("ts") > cut), ev.filter(F.col("ts") <= cut)

    src = tmp_path / "stream_src"
    recent.coalesce(2).write.parquet(str(src))

    def make_stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    store = RollupStore(spark, str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")
    q = start_rollup_maintenance(spark, make_stream(), store, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert _canon(finalize(store.current())) == _canon(finalize(rollup_of(recent)))

    # the late file arrives out of event-time order; same checkpoint
    late.coalesce(1).write.mode("append").parquet(str(src))
    q2 = start_rollup_maintenance(spark, make_stream(), store, checkpoint_dir=ckpt)
    q2.awaitTermination(120)

    assert _canon(finalize(store.current())) == _canon(finalize(rollup_of(ev)))


def test_store_prunes_superseded_versions(spark, tmp_path):
    """Version retention: a long-running maintenance stream must not
    grow one parquet copy per micro-batch — only current + previous
    survive each flip (the in-flight-reader window)."""
    import os

    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value")
    store = RollupStore(spark, str(tmp_path / "rollup"))
    r = rollup_of(ev)
    for b in range(5):
        store.write_merged(r, batch_id=b)
    versions = [
        e for e in os.listdir(str(tmp_path / "rollup"))
        if e.startswith("v") and e[1:].isdigit()
    ]
    assert sorted(versions) == ["v0000000003", "v0000000004"]
    assert store._read_pointer() == ("v0000000004", 4)
