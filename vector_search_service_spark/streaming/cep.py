"""CEP-style ordered-sequence (funnel) detection — the custom stateful
streaming operator (`applyInPandasWithState`).

Spark's built-ins cover windows, sessionization (`session_window`),
dedup and stream-stream joins, but **ordered pattern matching across
an unbounded stream** (Flink-CEP territory: "user did A, then B after
A, then C after B") has no built-in: a streaming groupBy can track
min/max per key but cannot express "the first B *after* the first A"
incrementally, and the batch three-stage join
(``queries_events.q_funnel_conversion``) needs the full history. This
is exactly the case the driver brief reserves for
``applyInPandasWithState``.

Semantics (identical to the batch/SQL definition, which is the test's
parity oracle):

- ``t1`` = min event-time of step-1 (``view``);
- ``t2`` = min event-time of step-2 (``click``) strictly after ``t1``;
- ``t3`` = min event-time of step-3 (``purchase``) strictly after
  ``t2``;
- one output row per user, emitted when the watermark proves the
  match is final.

Correctness under out-of-order delivery — the part that makes this a
real CEP operator rather than a fold over arrival order: an event may
arrive in any order within the watermark delay, and folding it
immediately could emit a wrong match (a late, earlier ``view`` lowers
``t1`` and can re-qualify an earlier ``click``). So the state buffers
events still inside the watermark horizon and **folds them into the
stage machine only once the watermark passes them**, in event-time
order. Because every fold consumes only events ≤ the current
watermark and every arrival after that fold is > that watermark (or
dropped as late, the standard contract), the machine sees one
globally ascending event-time sequence — which is why the incremental
result equals the batch recompute.

State per user = 2 stage timestamps + the pending buffer; the buffer
is bounded by (event rate × watermark delay) and stage state is
evicted by an event-time timeout ``state_ttl`` past the last
activity — both knobs bound total state on an unbounded stream.
Scale: state is partitioned by ``user_id`` (the same shuffle family
as every other per-user op here); 1000 executors each hold |users|/1000
machines, each a few hundred bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_OUT_SCHEMA = "user_id long, t1_ms long, t2_ms long, t3_ms long"
# t1/t2: folded stage progress (ms, -1 = unset); done: emitted already;
# pend_*: events buffered until the watermark passes them
FUNNEL_STATE_SCHEMA = (
    "t1 long, t2 long, done boolean, pend_ts array<long>, pend_et array<string>"
)

_UNSET = -1


def _interval_ms(within: str) -> int:
    """Parse the simple interval vocabulary both CEP entry points use
    (timezone-free, identical in batch and streaming)."""
    import re

    m = re.fullmatch(r"(\d+)\s*(hour|hours|minute|minutes|day|days)", within)
    if not m:
        raise ValueError(f"unsupported interval {within!r}")
    unit_ms = {"hour": 3600_000, "minute": 60_000, "day": 86_400_000}[
        m.group(2).rstrip("s")
    ]
    return int(m.group(1)) * unit_ms


def _make_funnel_fn(steps: tuple[str, str, str], state_ttl_ms: int):
    s1, s2, s3 = steps

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            t1, t2, done, pend_ts, pend_et = state.get
            pend = list(zip(pend_ts, pend_et))
        else:
            t1 = t2 = _UNSET
            done = False
            pend = []

        if state.hasTimedOut:
            # two timeout flavors, distinguished by the buffer: with
            # pending events this is a RIPEN wake-up (the watermark
            # passed the oldest buffered event — fall through and
            # fold); with none it is TTL expiry → evict (bounds state
            # for an unbounded stream; documented trade-off: funnel
            # progress of a user idle longer than state_ttl is lost)
            if not pend:
                state.remove()
                return
            pdfs = iter(())

        for pdf in pdfs:
            for ts, et in zip(pdf["ts_ms"].tolist(), pdf["event_type"].tolist()):
                # arrivals strictly below the watermark are late
                # beyond the horizon: dropped (Spark's own convention
                # — the watermark promises no event OLDER than it;
                # ts == wm is still in-contract and folds this call).
                # Ties are harmless to the ascending-fold proof: every
                # stage comparison is strict
                if ts >= wm and et in steps:
                    pend.append((int(ts), et))

        # fold everything the watermark has finalized, in event-time
        # order; strict > comparisons make equal-timestamp ties
        # order-independent
        ripe = sorted(t for t in pend if t[0] <= wm)
        pend = [t for t in pend if t[0] > wm]
        out = None
        for ts, et in ripe:
            if done:
                break
            if et == s1 and t1 == _UNSET:
                t1 = ts
            elif et == s2 and t1 != _UNSET and t2 == _UNSET and ts > t1:
                t2 = ts
            elif et == s3 and t2 != _UNSET and ts > t2:
                done = True
                out = (int(key[0]), t1, t2, ts)

        if t1 == _UNSET and not done and not pend:
            # nothing tracked (e.g. only non-step events in the
            # batch): never materialize state for this user — at scale
            # the store holds funnel-relevant users, not active users
            if state.exists:
                state.remove()
        else:
            state.update((t1, t2, done,
                          [t[0] for t in pend], [t[1] for t in pend]))
            if pend:
                # wake exactly when the oldest buffered event ripens
                state.setTimeoutTimestamp(max(min(t[0] for t in pend) + 1, wm + 1))
            else:
                state.setTimeoutTimestamp(wm + state_ttl_ms)
        if out is not None:
            yield pd.DataFrame(
                [out], columns=["user_id", "t1_ms", "t2_ms", "t3_ms"]
            )

    return fn


def streaming_funnel_matches(events: DataFrame, *,
                             steps: tuple[str, str, str] = FUNNEL_STEPS,
                             ts_col: str = "ts",
                             watermark: str = "1 hour",
                             state_ttl_ms: int = 7 * 24 * 3600 * 1000) -> DataFrame:
    """Streaming ordered-funnel matches: one row per user whose
    completed (steps[0] → steps[1] → steps[2]) sequence the watermark
    has finalized. Apply to a ``readStream`` DataFrame; the same
    result on the full history comes from ``batch_funnel_user_times``
    (the parity proof in tests/test_cep.py)."""
    ev = (
        # NULL-user events match the batch oracle's equi-join semantics
        # (excluded); without the filter a NULL-key group reaching the
        # emit path would TypeError on int(key[0]).
        events.filter(F.col("user_id").isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            "user_id",
            F.unix_millis(F.col(ts_col)).alias("ts_ms"),
            "event_type",
            F.col(ts_col),  # carries the watermark through the projection
        )
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_funnel_fn(steps, state_ttl_ms),
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def batch_funnel_user_times(events: DataFrame, *,
                            steps: tuple[str, str, str] = FUNNEL_STEPS,
                            ts_col: str = "ts") -> DataFrame:
    """Batch recompute of the same contract (the parity oracle): the
    three-stage min-after-min join family from ``funnel_conversion``,
    projected per user. All three shuffles share the user_id key."""
    s1, s2, s3 = steps
    v = (events.filter(F.col("event_type") == s1)
         .groupBy("user_id").agg(F.min(ts_col).alias("_t1")))
    c = (
        events.filter(F.col("event_type") == s2)
        .join(v, "user_id")
        .filter(F.col(ts_col) > F.col("_t1"))
        .groupBy("user_id").agg(F.min(ts_col).alias("_t2"), F.first("_t1").alias("_t1f"))
    )
    p = (
        events.filter(F.col("event_type") == s3)
        .join(c, "user_id")
        .filter(F.col(ts_col) > F.col("_t2"))
        .groupBy("user_id").agg(
            F.min(ts_col).alias("_t3"),
            F.first("_t1f").alias("_t1g"),
            F.first("_t2").alias("_t2g"),
        )
    )
    return p.select(
        "user_id",
        F.unix_millis("_t1g").alias("t1_ms"),
        F.unix_millis("_t2g").alias("t2_ms"),
        F.unix_millis("_t3").alias("t3_ms"),
    )


# ---------------------------------------------------------------------------
# Absence detection: A with no B within T — emission REQUIRES timeouts
# ---------------------------------------------------------------------------

ABANDON_OUT_SCHEMA = "user_id long, t1_ms long, deadline_ms long"
ABANDON_STATE_SCHEMA = (
    "t1 long, converted boolean, emitted boolean, "
    "pend_ts array<long>, pend_et array<string>"
)


def _make_abandon_fn(start_step: str, convert_step: str, within_ms: int,
                     state_ttl_ms: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            t1, converted, emitted, pend_ts, pend_et = state.get
            pend = list(zip(pend_ts, pend_et))
        else:
            t1, converted, emitted, pend = _UNSET, False, False, []
        # TTL-timer recognition must use the PERSISTED shape at entry:
        # the wm+TTL timer is armed only when the state was decided
        # (converted / absence emitted) with NOTHING pending. Testing
        # pend AFTER the ripen fold instead (the first r4 attempt)
        # mis-classified a ripen wake-up that merely drained a
        # post-decision buffered view as the TTL timer and evicted
        # early — letting a later view restart tracking and emit a
        # second abandonment inside the TTL horizon (caught in review,
        # pinned by test_abandon_ripen_timer_does_not_evict_early).
        was_decided = converted or emitted
        had_pend = bool(pend)

        if state.hasTimedOut:
            pdfs = iter(())  # wake-up only: the deadline/ripen check below runs
        for pdf in pdfs:
            for ts, et in zip(pdf["ts_ms"].tolist(), pdf["event_type"].tolist()):
                # drop only strictly-late arrivals (ts < wm); see the
                # funnel fn for the boundary rationale
                if ts >= wm and et in (start_step, convert_step):
                    pend.append((int(ts), et))

        ripe = sorted(t for t in pend if t[0] <= wm)
        pend = [t for t in pend if t[0] > wm]
        for ts, et in ripe:
            if et == start_step and t1 == _UNSET:
                t1 = ts
            elif (et == convert_step and t1 != _UNSET
                  and t1 < ts <= t1 + within_ms):
                converted = True

        out = None
        if (t1 != _UNSET and not converted and not emitted
                and wm > t1 + within_ms):
            # the watermark proves no conversion can still arrive
            # inside the window: the absence is final
            emitted = True
            out = (int(key[0]), t1, t1 + within_ms)

        if state.hasTimedOut and was_decided and not had_pend:
            # TTL eviction for DECIDED state (advice r3): this wake-up
            # is the ``wm + state_ttl_ms`` timer armed when the user was
            # decided (converted, or absence already emitted) with
            # nothing pending — the re-emission guard has now held for
            # the full TTL horizon. Re-arming again (the pre-r4
            # behavior) would retain every decided user forever:
            # unbounded state on an unbounded stream. Mirrors the
            # funnel/sequence operators' pend-empty timeout eviction;
            # after eviction a later view may legitimately restart
            # tracking (the documented retained-until-TTL contract).
            state.remove()
            return
        if not pend and t1 == _UNSET and not emitted and not converted:
            # nothing tracked at all: never materialize state
            if state.exists:
                state.remove()
        else:
            # decided (emitted/converted) state is KEPT until TTL —
            # evicting it immediately would let a later view restart
            # tracking and emit a SECOND abandonment for the user
            # (caught by the property harness); the one-row-per-user
            # contract holds for the TTL horizon, like the funnel's
            # done-state
            state.update((t1, converted, emitted,
                          [t[0] for t in pend], [t[1] for t in pend]))
            if pend:
                nxt = min(t[0] for t in pend) + 1
                if t1 != _UNSET and not converted and not emitted:
                    nxt = min(nxt, t1 + within_ms + 1)
                state.setTimeoutTimestamp(max(nxt, wm + 1))
            elif t1 != _UNSET and not converted and not emitted:
                # the only wake-up that can emit an absence
                state.setTimeoutTimestamp(max(t1 + within_ms + 1, wm + 1))
            else:
                state.setTimeoutTimestamp(wm + state_ttl_ms)
        if out is not None:
            yield pd.DataFrame(
                [out], columns=["user_id", "t1_ms", "deadline_ms"]
            )

    return fn


def streaming_abandonment(events: DataFrame, *,
                          start_step: str = "view",
                          convert_step: str = "purchase",
                          within: str = "24 hours",
                          ts_col: str = "ts",
                          watermark: str = "1 hour",
                          state_ttl_ms: int = 7 * 24 * 3600 * 1000) -> DataFrame:
    """Absence detection — the CEP shape that makes timeouts
    *load-bearing*: emit one row per user whose FIRST ``start_step``
    saw no ``convert_step`` within ``within`` after it. A positive
    match can be emitted when its last event arrives; an absence can
    only be emitted by a watermark-driven timeout (nothing arrives to
    trigger it) — inexpressible with built-in streaming operators.
    Batch parity: ``batch_abandoned_first_view``. NULL identities are
    excluded up front: absence is a statement about a USER never
    converting, and an unattributable event can neither open nor close
    a per-user deadline (also the NOT-IN semantics of the SQL oracle —
    an engine that tracked the NULL group would mark it abandoned
    while the oracle's NOT IN filters it; edge-events-sweep-caught)."""
    within_ms = _interval_ms(within)
    ev = (
        events.filter(F.col("user_id").isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            "user_id",
            F.unix_millis(F.col(ts_col)).alias("ts_ms"),
            "event_type",
            F.col(ts_col),
        )
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_abandon_fn(start_step, convert_step, within_ms, state_ttl_ms),
        ABANDON_OUT_SCHEMA,
        ABANDON_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def batch_abandoned_first_view(events: DataFrame, *,
                               start_step: str = "view",
                               convert_step: str = "purchase",
                               within: str = "24 hours",
                               ts_col: str = "ts") -> DataFrame:
    """Batch recompute of the absence contract: first ``start_step``
    per user anti-joined against converting ``convert_step`` events in
    its window. One user_id shuffle family + an anti join. NULL
    identities excluded, matching the streaming twin (see
    ``streaming_abandonment``)."""
    within_ms = _interval_ms(within)
    events = events.filter(F.col("user_id").isNotNull())
    v = (
        events.filter(F.col("event_type") == start_step)
        .groupBy("user_id")
        .agg(F.unix_millis(F.min(ts_col)).alias("_t1_ms"))
    )
    conv = (
        events.filter(F.col("event_type") == convert_step)
        .select("user_id", F.unix_millis(F.col(ts_col)).alias("_c_ms"))
        .join(v, "user_id")
        .filter(
            (F.col("_c_ms") > F.col("_t1_ms"))
            & (F.col("_c_ms") <= F.col("_t1_ms") + within_ms)
        )
        .select("user_id").distinct()
    )
    return (
        v.join(conv, "user_id", "left_anti")
        .select(
            "user_id",
            F.col("_t1_ms").alias("t1_ms"),
            (F.col("_t1_ms") + within_ms).alias("deadline_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Generic N-step ordered sequences (the funnel generalized)
# ---------------------------------------------------------------------------

SEQ_OUT_SCHEMA = "user_id long, step_ts_ms array<long>"
SEQ_STATE_SCHEMA = (
    "stages array<long>, done boolean, pend_ts array<long>, pend_et array<string>"
)


def _make_sequence_fn(steps: tuple[str, ...], state_ttl_ms: int):
    """Stage machine for an arbitrary-length ordered pattern: stage i
    matches the FIRST steps[i] event strictly after stage i-1 (the
    min-after chain — under the ascending watermark fold, first seen
    == minimum). Duplicate step names express repetition patterns
    ("A then A again")."""
    k = len(steps)
    if k < 2:
        raise ValueError("sequence pattern needs >= 2 steps")
    step_set = frozenset(steps)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            stages, done, pend_ts, pend_et = state.get
            stages = list(stages)
            pend = list(zip(pend_ts, pend_et))
        else:
            stages, done, pend = [], False, []

        if state.hasTimedOut:
            if not pend:
                state.remove()
                return
            pdfs = iter(())

        for pdf in pdfs:
            for ts, et in zip(pdf["ts_ms"].tolist(), pdf["event_type"].tolist()):
                if ts >= wm and et in step_set:
                    pend.append((int(ts), et))

        ripe = sorted(t for t in pend if t[0] <= wm)
        pend = [t for t in pend if t[0] > wm]
        out = None
        for ts, et in ripe:
            if done:
                break
            i = len(stages)
            if i < k and et == steps[i] and (i == 0 or ts > stages[i - 1]):
                stages.append(ts)
                if len(stages) == k:
                    done = True
                    out = (int(key[0]), list(stages))

        if not stages and not done and not pend:
            if state.exists:
                state.remove()
        else:
            state.update((stages, done,
                          [t[0] for t in pend], [t[1] for t in pend]))
            if pend:
                state.setTimeoutTimestamp(max(min(t[0] for t in pend) + 1, wm + 1))
            else:
                state.setTimeoutTimestamp(wm + state_ttl_ms)
        if out is not None:
            yield pd.DataFrame([out], columns=["user_id", "step_ts_ms"])

    return fn


def streaming_sequence_matches(events: DataFrame, steps: tuple[str, ...], *,
                               ts_col: str = "ts",
                               watermark: str = "1 hour",
                               state_ttl_ms: int = 7 * 24 * 3600 * 1000) -> DataFrame:
    """Generic ordered-sequence CEP: one row per user whose full
    ``steps`` chain the watermark finalized, carrying all stage
    times. ``streaming_funnel_matches`` is the 3-step special case
    with named columns."""
    ev = (
        # NULL users excluded to match the batch oracle's equi-joins;
        # a NULL-key group would TypeError at int(key[0]) on emit.
        events.filter(F.col("user_id").isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            "user_id",
            F.unix_millis(F.col(ts_col)).alias("ts_ms"),
            "event_type",
            F.col(ts_col),
        )
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_sequence_fn(tuple(steps), state_ttl_ms),
        SEQ_OUT_SCHEMA,
        SEQ_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def batch_sequence_user_times(events: DataFrame, steps: tuple[str, ...], *,
                              ts_col: str = "ts") -> DataFrame:
    """Batch recompute of the generic min-after chain (the parity
    oracle): stage i = min ts of steps[i] strictly after stage i-1.
    One user_id shuffle family, one stage per join round."""
    if len(steps) < 2:
        raise ValueError("sequence pattern needs >= 2 steps")
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.unix_millis(F.min(ts_col)).alias("t0"))
    )
    for i, s in enumerate(steps[1:], start=1):
        prev_cols = [f"t{j}" for j in range(i)]
        cur = (
            events.filter(F.col("event_type") == s)
            .select("user_id", F.unix_millis(F.col(ts_col)).alias("_c"))
            .join(cur, "user_id")
            .filter(F.col("_c") > F.col(f"t{i - 1}"))
            .groupBy("user_id")
            .agg(
                F.min("_c").alias(f"t{i}"),
                *[F.first(c).alias(c) for c in prev_cols],
            )
        )
    return cur.select(
        "user_id",
        F.array(*[f"t{j}" for j in range(len(steps))]).alias("step_ts_ms"),
    )
