"""Property-based verification of the CEP fold logic (streaming/cep.py).

The single-corpus stream==batch tests in test_cep.py prove one
trajectory; these properties drive the *state function itself* through
thousands of adversarial trajectories — random event sets, random
batch splits, random arrival orders, random watermark lag (including
lags small enough to late-drop events) — against an independent
pure-Python reference of the batch contract. A FakeGroupState mirrors
the engine's semantics (timeout must be > watermark, timed-out
invocation carries no data, late rows are filtered) without paying a
Spark streaming query per example.

Contract checked: emitted rows == batch-definition(DELIVERED events),
where delivered = events not late beyond the watermark at their
arrival batch — exactly the guarantee the operator documents.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_search_service_spark.streaming.cep import (
    _UNSET,
    _make_abandon_fn,
    _make_funnel_fn,
)

STEPS = ("view", "click", "purchase")
TTL = 10**9


class FakeGroupState:
    """Minimal stand-in for pyspark GroupState with engine-faithful
    timeout rules."""

    def __init__(self):
        self._value = None
        self._timeout = None
        self.hasTimedOut = False
        self._wm = 0

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        assert self._value is not None
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self._timeout = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        if ts <= self._wm:  # the engine rejects this
            raise ValueError(f"timeout {ts} <= watermark {self._wm}")
        self._timeout = ts


def _drive(fn, batches, lags):
    """Replay batches through fn with engine-like watermark/timeout
    scheduling; returns (emitted rows, delivered events)."""
    state = FakeGroupState()
    emitted, delivered = [], []
    wm = 0
    max_seen = 0
    for batch, lag in zip(batches, lags):
        state._wm = wm
        # hand the RAW batch to fn — the operator owns the late-drop
        # rule (strictly-late only: `ts >= wm` kept), so the harness
        # must not pre-filter for it; `delivered` is the contract's
        # view of what survived
        delivered.extend((ts, et) for ts, et in batch if ts >= wm)
        if batch:
            state.hasTimedOut = False
            pdf = pd.DataFrame(batch, columns=["ts_ms", "event_type"])
            emitted.extend(
                t for out in fn((7,), iter([pdf]), state) for t in out.itertuples(index=False)
            )
        elif state.exists and state._timeout is not None and wm >= state._timeout:
            state.hasTimedOut = True
            emitted.extend(
                t for out in fn((7,), iter(()), state) for t in out.itertuples(index=False)
            )
        if batch:
            max_seen = max(max_seen, max(ts for ts, _ in batch))
        wm = max(wm, max_seen - lag)
    # availableNow flush: watermark to +inf, run timed-out batches
    # until the state machine quiesces (engine: shouldRunAnotherBatch)
    for _ in range(4):
        state._wm = wm = 10**15
        if not (state.exists and state._timeout is not None):
            break
        state.hasTimedOut = True
        emitted.extend(
            t for out in fn((7,), iter(()), state) for t in out.itertuples(index=False)
        )
    return emitted, delivered


def _ref_funnel(events):
    s1 = [ts for ts, et in events if et == "view"]
    if not s1:
        return None
    t1 = min(s1)
    s2 = [ts for ts, et in events if et == "click" and ts > t1]
    if not s2:
        return None
    t2 = min(s2)
    s3 = [ts for ts, et in events if et == "purchase" and ts > t2]
    if not s3:
        return None
    return (7, t1, t2, min(s3))


def _ref_abandon(events, within):
    s1 = [ts for ts, et in events if et == "view"]
    if not s1:
        return None
    t1 = min(s1)
    conv = [ts for ts, et in events if et == "purchase" and t1 < ts <= t1 + within]
    return None if conv else (7, t1, t1 + within)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=60),
        st.sampled_from(STEPS + ("error",)),
    ),
    max_size=24,
)


def _split(events, sizes):
    batches, i = [], 0
    for s in sizes:
        batches.append(events[i:i + s])
        i += s
    if i < len(events):
        batches.append(events[i:])
    return batches or [[]]


@settings(max_examples=300, deadline=None)
@given(
    events=events_strategy,
    sizes=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=6),
    lag=st.integers(min_value=0, max_value=80),
    seed=st.randoms(),
)
def test_funnel_fold_equals_reference_on_delivered(events, sizes, lag, seed):
    seed.shuffle(events)  # arrival order independent of event time
    fn = _make_funnel_fn(STEPS, TTL)
    emitted, delivered = _drive(fn, _split(events, sizes), [lag] * 99)
    want = _ref_funnel(delivered)
    got = [tuple(t) for t in emitted]
    assert got == ([want] if want else [])


@settings(max_examples=300, deadline=None)
@given(
    events=events_strategy,
    sizes=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=6),
    lag=st.integers(min_value=0, max_value=80),
    within=st.integers(min_value=1, max_value=40),
    seed=st.randoms(),
)
def test_abandon_fold_equals_reference_on_delivered(events, sizes, lag, within, seed):
    seed.shuffle(events)
    fn = _make_abandon_fn("view", "purchase", within, TTL)
    emitted, delivered = _drive(fn, _split(events, sizes), [lag] * 99)
    want = _ref_abandon(delivered, within)
    got = [tuple(t) for t in emitted]
    assert got == ([want] if want else [])


def _ref_sequence(events, steps):
    stages = []
    for ts, et in sorted(events):
        i = len(stages)
        if i < len(steps) and et == steps[i] and (i == 0 or ts > stages[i - 1]):
            stages.append(ts)
    return (7, stages) if len(stages) == len(steps) else None


def _ref_sequence_minafter(events, steps):
    """Independent formulation: stage i = min ts of steps[i] strictly
    after stage i-1 (the batch join chain)."""
    prev = None
    out = []
    for s in steps:
        cands = [ts for ts, et in events if et == s and (prev is None or ts > prev)]
        if not cands:
            return None
        prev = min(cands)
        out.append(prev)
    return (7, out)


@settings(max_examples=200, deadline=None)
@given(
    events=events_strategy,
    steps=st.sampled_from([
        ("view", "purchase"),
        ("signup", "view", "click", "purchase"),
        ("view", "view", "click"),  # repetition pattern
    ]),
    sizes=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=6),
    lag=st.integers(min_value=0, max_value=80),
    seed=st.randoms(),
)
def test_generic_sequence_fold_equals_both_references(events, steps, sizes, lag, seed):
    from vector_search_service_spark.streaming.cep import _make_sequence_fn

    # widen the event-type alphabet to include signup
    events = [
        (ts, et if et != "error" else "signup") for ts, et in events
    ]
    seed.shuffle(events)
    fn = _make_sequence_fn(steps, TTL)
    emitted, delivered = _drive(fn, _split(events, sizes), [lag] * 99)
    want = _ref_sequence(delivered, steps)
    assert want == _ref_sequence_minafter(delivered, steps)  # formulations agree
    got = [(t[0], list(t[1])) for t in emitted]
    assert got == ([(want[0], want[1])] if want else [])
