"""Registry entry — bucketed range join (§2.3 "absent in reference"
inventory: range/interval joins; engine addition).

A naive time-range self-join is a broadcast-nested-loop in Spark (no
equi-key) — O(n²) per user and a non-starter at 100 TB. The
scale-correct shape is *bucketing*: quantize time into window-sized
bins, equi-join on (key, bin) with the left side exploded to its two
candidate bins, then apply the exact range predicate. Each pair is
produced exactly once because the right side's bin is a function of
its own timestamp and the two exploded bins are disjoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

_WIN_MS = 3_600_000  # 1 hour


@register(
    "range_join_pairs",
    survey_ref="§2.3 range join via bucketed equi-join (net-new)",
    tags=("relational", "streaming"),
    oracle=f"""
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_ms(b.ts) > epoch_ms(a.ts)
 AND epoch_ms(b.ts) - epoch_ms(a.ts) <= {_WIN_MS}
GROUP BY type_a, type_b ORDER BY type_a, type_b
""",
)
def q_range_join_pairs(spark, sf_dir):
    """Event pairs from the same user within one hour (strictly
    ordered by ms so the pairing is deterministic), counted by the
    (earlier, later) event-type pair. The equi-join keys are
    (user_id, hour-bin); Δbin ∈ {{0, 1}} when Δt ≤ the bin width, so
    exploding the left row to [bin, bin+1] covers exactly the
    qualifying matches — a shuffle-hash/sort-merge join instead of a
    nested loop, which is what survives 100×."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    left = ev.select(
        F.col("user_id").alias("u_a"),
        F.col("event_type").alias("type_a"),
        F.col("ms").alias("ms_a"),
        F.explode(
            F.array(F.expr(f"ms DIV {_WIN_MS}"), F.expr(f"ms DIV {_WIN_MS} + 1"))
        ).alias("bin"),
    )
    right = ev.select(
        F.col("user_id").alias("u_b"),
        F.col("event_type").alias("type_b"),
        F.col("ms").alias("ms_b"),
        F.expr(f"ms DIV {_WIN_MS}").alias("bin_b"),
    )
    return (
        left.join(
            right,
            (F.col("u_a") == F.col("u_b")) & (F.col("bin") == F.col("bin_b")),
        )
        .filter(
            (F.col("ms_b") > F.col("ms_a"))
            & (F.col("ms_b") - F.col("ms_a") <= _WIN_MS)
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("type_a", "type_b")
    )
