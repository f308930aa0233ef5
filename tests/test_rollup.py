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
