"""Stateful CEP funnel operator (streaming/cep.py): the
applyInPandasWithState incremental match must equal the batch
recompute, under out-of-order file delivery, and must match the
registry's SQL-oracled per-user funnel definition."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.sources.tables import load_table
from vector_search_service_spark.streaming.cep import (
    batch_funnel_user_times,
    streaming_funnel_matches,
)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_matches_equal_batch_recompute(spark, tmp_path):
    """Events replayed as 4 unordered micro-batches + a far-future
    flush sentinel; the emitted matches must equal the batch funnel
    over the real events — the watermark-ordered-fold correctness
    proof."""
    ev = _events(spark)
    src = tmp_path / "stream_src"
    # repartition scatters event-times across files: each micro-batch
    # is genuinely out of event-time order
    ev.repartition(4).write.parquet(str(src))

    max_ts = ev.agg(F.max("ts")).first()[0]
    # watermark delay far beyond the corpus span: nothing is late
    # while the real files play; the sentinel then jumps the watermark
    # past every real event so all pending buffers fold and emit
    delay_days = 3650
    sentinel_ts = max_ts + datetime.timedelta(days=2 * delay_days)
    spark.createDataFrame(
        [(int(-1), sentinel_ts, "view")], "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    matches = streaming_funnel_matches(stream, watermark=f"{delay_days} days")
    q = (
        matches.writeStream.format("memory")
        .queryName("cep_funnel")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("cep_funnel").filter(F.col("user_id") >= 0)
    want = batch_funnel_user_times(ev)
    assert _canon(got) == _canon(want)
    assert got.count() > 0  # the corpus actually contains funnels


def test_batch_funnel_user_times_agrees_with_registry_counts(spark):
    """The per-user parity oracle must be consistent with the
    registry's oracled funnel_conversion aggregate: |completed users|
    == n_purchase_after_click."""
    from vector_search_service_spark.registry import all_queries

    ev = _events(spark)
    n_complete = batch_funnel_user_times(ev).count()
    row = all_queries()["funnel_conversion"].fn(spark, SF_SMOKE).first()
    assert n_complete == row["n_purchase_after_click"]


def test_one_match_per_user_and_ordering_invariants(spark, tmp_path):
    """Structural contract: at most one emitted row per user, and
    t1 < t2 < t3 on every row."""
    ev = _events(spark)
    out = batch_funnel_user_times(ev)
    assert out.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0
    bad = out.filter(
        ~((F.col("t1_ms") < F.col("t2_ms")) & (F.col("t2_ms") < F.col("t3_ms")))
    ).count()
    assert bad == 0


def test_streaming_abandonment_equals_batch_anti_join(spark, tmp_path):
    """Absence CEP: emission is timeout-driven (nothing arrives to
    trigger it), and the emitted set must equal the batch anti-join
    under out-of-order replay."""
    from vector_search_service_spark.streaming.cep import (
        batch_abandoned_first_view,
        streaming_abandonment,
    )

    ev = _events(spark)
    src = tmp_path / "stream_src"
    ev.repartition(4).write.parquet(str(src))

    max_ts = ev.agg(F.max("ts")).first()[0]
    delay_days = 3650
    sentinel_ts = max_ts + datetime.timedelta(days=2 * delay_days)
    spark.createDataFrame(
        [(int(-1), sentinel_ts, "view")],
        "user_id long, ts timestamp, event_type string",
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_abandonment(stream, watermark=f"{delay_days} days")
    q = (
        out.writeStream.format("memory")
        .queryName("cep_abandon")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("cep_abandon").filter(F.col("user_id") >= 0)
    want = batch_abandoned_first_view(ev)
    assert _canon(got) == _canon(want)
    # the corpus must exercise BOTH outcomes or the test proves nothing
    n_viewers = (
        ev.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert 0 < got.count() < n_viewers


def test_generic_four_step_sequence_stream_equals_batch(spark, tmp_path):
    """The N-step generalization: a 4-step signup→view→click→purchase
    chain, streamed out-of-order, must equal the batch min-after join
    chain."""
    from vector_search_service_spark.streaming.cep import (
        batch_sequence_user_times,
        streaming_sequence_matches,
    )

    steps = ("signup", "view", "click", "purchase")
    ev = _events(spark)
    src = tmp_path / "stream_src"
    ev.repartition(4).write.parquet(str(src))
    max_ts = ev.agg(F.max("ts")).first()[0]
    delay_days = 3650
    sentinel_ts = max_ts + datetime.timedelta(days=2 * delay_days)
    spark.createDataFrame(
        [(int(-1), sentinel_ts, "view")],
        "user_id long, ts timestamp, event_type string",
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_sequence_matches(stream, steps, watermark=f"{delay_days} days")
        .writeStream.format("memory").queryName("cep_seq4")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.table("cep_seq4").filter(F.col("user_id") >= 0)
    want = batch_sequence_user_times(ev, steps)
    canon = lambda df: sorted(  # noqa: E731
        (r["user_id"], tuple(r["step_ts_ms"])) for r in df.collect()
    )
    assert canon(got) == canon(want)
    assert got.count() > 0


def test_abandon_decided_state_evicted_at_ttl():
    """Advice r3: DECIDED abandonment state (absence emitted, or
    converted) must be evicted when its TTL timer fires, not re-armed
    forever — otherwise every decided user's state lives for the
    lifetime of an unbounded stream. Driven through FakeGroupState so
    the timer sequence is explicit: pend-ripen wake-up → deadline
    emission (state kept, TTL armed) → TTL wake-up (state removed)."""
    import pandas as pd

    from tests.test_cep_property import FakeGroupState
    from vector_search_service_spark.streaming.cep import _make_abandon_fn

    within, ttl = 100, 1000
    fn = _make_abandon_fn("view", "purchase", within, ttl)

    # --- absence path -----------------------------------------------------
    state = FakeGroupState()
    state._wm = 0
    pdf = pd.DataFrame([(10, "view")], columns=["ts_ms", "event_type"])
    assert list(fn((7,), iter([pdf]), state)) == []
    assert state.exists

    state._wm, state.hasTimedOut = 11, True  # ripen the pending view
    assert list(fn((7,), iter(()), state)) == []
    assert state.exists and state._timeout == 10 + within + 1

    state._wm = 10 + within + 1  # deadline passed: absence emits
    emitted = [r for out in fn((7,), iter(()), state)
               for r in out.itertuples(index=False)]
    assert len(emitted) == 1 and emitted[0].t1_ms == 10
    assert state.exists, "decided state is retained until TTL"
    assert state._timeout == state._wm + ttl

    state._wm = state._timeout  # TTL fires: decided state evicted
    assert list(fn((7,), iter(()), state)) == []
    assert not state.exists, "TTL wake-up must evict decided state"

    # --- converted path ---------------------------------------------------
    state = FakeGroupState()
    state._wm = 0
    pdf = pd.DataFrame([(10, "view"), (50, "purchase")],
                       columns=["ts_ms", "event_type"])
    assert list(fn((7,), iter([pdf]), state)) == []
    state._wm, state.hasTimedOut = 60, True  # ripen both; converts
    assert list(fn((7,), iter(()), state)) == []
    assert state.exists and state._timeout == 60 + ttl
    state._wm = state._timeout
    assert list(fn((7,), iter(()), state)) == []
    assert not state.exists, "converted state must also evict at TTL"


def test_funnel_stream_restart_recovers_state_from_checkpoint(spark, tmp_path):
    """Crash/restart path of the stateful funnel: run 1 ingests half
    the events and stops with every match still buffered in the state
    store (watermark far behind — nothing finalized, nothing emitted);
    run 2 (same checkpoint) delivers the other half + the flush
    sentinel. The union of emissions must equal the batch funnel over
    ALL events — i.e. partially-built per-user state genuinely
    round-trips through the checkpoint across query restarts, not just
    across micro-batches of one run."""
    full = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    ev = full.select("user_id", "ts", "event_type")
    src = tmp_path / "stream_src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half1 = full.filter(F.col("event_id") % 2 == 0).drop("event_id")
    half2 = full.filter(F.col("event_id") % 2 == 1).drop("event_id")
    half1.repartition(2).write.parquet(str(src))

    delay_days = 3650

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            streaming_funnel_matches(stream, watermark=f"{delay_days} days")
            .writeStream.format("parquet")  # memory sink can't recover a checkpoint
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()  # run 1: state built, watermark never advances -> zero emissions
    assert spark.read.parquet(out).count() == 0

    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = max_ts + datetime.timedelta(days=2 * delay_days)
    half2.repartition(2).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(int(-1), sentinel_ts, "view")],
        "user_id long, ts timestamp, event_type string",
    ).coalesce(1).write.mode("append").parquet(str(src))

    run()  # run 2: same checkpoint — only new files play, then flush
    got = spark.read.parquet(out).filter(F.col("user_id") >= 0)
    want = batch_funnel_user_times(ev)
    assert _canon(got) == _canon(want)
    assert got.count() > 0


def test_abandon_ripen_timer_does_not_evict_early():
    """Review-caught r4 regression: a ripen wake-up that merely drains
    a post-decision buffered view must NOT be mistaken for the TTL
    timer — early eviction would let a later view restart tracking and
    emit an abandonment for a user who CONVERTED, inside the TTL
    horizon (diverging from the batch anti-join). TTL recognition must
    key on the persisted shape at entry (decided + nothing pending)."""
    import pandas as pd

    from tests.test_cep_property import FakeGroupState
    from vector_search_service_spark.streaming.cep import _make_abandon_fn

    within, ttl = 100, 1000
    fn = _make_abandon_fn("view", "purchase", within, ttl)
    state = FakeGroupState()

    # batch 1: view@10 + purchase@50 arrive, ripen at wm=60 -> converted
    state._wm = 0
    pdf = pd.DataFrame([(10, "view"), (50, "purchase")],
                       columns=["ts_ms", "event_type"])
    assert list(fn((7,), iter([pdf]), state)) == []
    state._wm, state.hasTimedOut = 60, True
    assert list(fn((7,), iter(()), state)) == []
    assert state.exists and state._timeout == 60 + ttl

    # batch 2: a POST-decision view@500 is buffered into decided state
    state._wm, state.hasTimedOut = 60, False
    pdf2 = pd.DataFrame([(500, "view")], columns=["ts_ms", "event_type"])
    assert list(fn((7,), iter([pdf2]), state)) == []
    assert state.exists and state._timeout == 501  # ripen timer, NOT TTL

    # the ripen timer fires: state had pending at entry -> NOT the TTL
    # timer -> must stay retained (the buggy version evicted here)
    state._wm, state.hasTimedOut = 501, True
    assert list(fn((7,), iter(()), state)) == []
    assert state.exists, "ripen wake-up must not TTL-evict decided state"
    assert state._timeout == 501 + ttl

    # a later view@600 inside the horizon is absorbed, never emitted
    state._wm, state.hasTimedOut = 501, False
    pdf3 = pd.DataFrame([(600, "view")], columns=["ts_ms", "event_type"])
    assert list(fn((7,), iter([pdf3]), state)) == []
    state._wm, state.hasTimedOut = 601, True
    assert list(fn((7,), iter(()), state)) == []
    assert state.exists, "converted user must not re-emit inside TTL"

    # the genuine TTL timer (armed from the decided/no-pend shape)
    # finally evicts
    state._wm, state.hasTimedOut = state._timeout, True
    assert list(fn((7,), iter(()), state)) == []
    assert not state.exists
