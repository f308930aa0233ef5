"""Registry entries — data profiling (the ANALYZE/statistics tier an
engine needs before planning work on an unknown 100 TB table: per-
column null/distinct/range stats and value histograms).

Both are single-scan: the wide profile computes every column's
aggregates in ONE pass and unpivots driver-side column metadata (no
second scan per column — the classic profiling mistake); the
histogram is a map-side-combined groupBy on a computed bucket key.
Exactness: counts are integers; mins/maxes are exact; the only
division is one final per-row expression ([[spark-duckdb-oracle-parity]]).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "table_profile",
    survey_ref="extension: ANALYZE-style column profiling (single-pass)",
    tags=("profile",),
    oracle="""
"""
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), 6) AS min_v,
       round(CAST(max({c}) AS DOUBLE), 6) AS max_v
FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
)
def q_table_profile(spark, sf_dir):
    """Long-format numeric profile of lineitem's measure columns —
    n_rows / nulls / exact distinct / min / max per column, computed
    in ONE scan (all columns' aggregates in a single Aggregate node,
    reshaped to rows driver-side from the 1-row result's metadata
    positions, not with a per-column pass; the oracle's UNION ALL of
    per-column scans is the readable-but-4-scans equivalent)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min_v"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max_v"),
        ]
    one = li.agg(*aggs)
    stack_args = []
    for c in _PROFILE_COLS:
        stack_args.append(F.lit(c))
        stack_args += [F.col(f"{c}__{s}") for s in
                       ("n_rows", "n_null", "n_distinct", "min_v", "max_v")]
    return (
        one.select(
            F.stack(
                F.lit(len(_PROFILE_COLS)), *stack_args
            ).alias("col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
        )
        .orderBy("col_name")
    )


_HIST_LO, _HIST_STEP, _HIST_BUCKETS = 0.0, 25.0, 8


@register(
    "value_histogram",
    survey_ref="extension: fixed-width value histogram (profiling tier)",
    tags=("profile",),
    oracle=f"""
SELECT CAST(LEAST(GREATEST(floor((value - {_HIST_LO}) / {_HIST_STEP}), 0), {_HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
       round({_HIST_LO} + LEAST(GREATEST(floor((value - {_HIST_LO}) / {_HIST_STEP}), 0), {_HIST_BUCKETS - 1}) * {_HIST_STEP}, 6) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2 ORDER BY bucket
""",
)
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of events.value with edge clamping —
    bucket key computed per row (floor of ONE division: identical
    doubles both engines since both read the same parquet doubles),
    then a map-side-combined groupBy of at most {buckets} groups.
    Per-bucket sums in integer cents, order-independent."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(_HIST_STEP))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(_HIST_BUCKETS - 1)).cast("long")
    return (
        ev.filter(F.col("value").isNotNull())
        .select(
            b.alias("bucket"),
            F.round(F.lit(_HIST_LO) + b * F.lit(_HIST_STEP), 6).alias("bucket_lo"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bucket")
    )
