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

from .functions.embed import EMB_DIM
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


@register(
    "embedding_dim_stats",
    survey_ref="extension: per-dimension embedding profile (drift monitoring)",
    tags=("vector", "profile"),
    oracle=f"""
WITH dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS ord),
x AS (
  SELECT CAST(ord - 1 AS INT) AS dim,
         list_extract(CAST(embedding AS DOUBLE[]), ord) AS v
  FROM embeddings, dims
)
SELECT dim,
       CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
       round(min(v), 6) AS min_r, round(max(v), 6) AS max_r
FROM x GROUP BY dim ORDER BY dim
""",
)
def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension statistics over the whole embedding column — the
    standing drift monitor an embedding pipeline runs after every
    model change (a dimension whose range collapses or mean shifts
    signals a bad re-embed). posexplode streams (dim, value) pairs
    into a 64-group aggregate: map-side combined, state = one row per
    dimension, and the mean's numerator is an exact integer-micro sum
    so the result is partitioning-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>"))
                   .alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.sum(F.round(F.col("v") * 1_000_000).cast("long")).alias("sum_micros"),
            F.round(F.min("v"), 6).alias("min_r"),
            F.round(F.max("v"), 6).alias("max_r"),
        )
        .orderBy("dim")
    )


@register(
    "exact_correlation",
    survey_ref="extension: Pearson correlation from exact integer moments",
    tags=("relational", "profile"),
    oracle="""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
  FROM lineitem
)
SELECT round(
  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
  / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
  6) AS corr_qty_price
FROM m
""",
)
def q_exact_correlation(spark, sf_dir):
    """Pearson r between quantity and price, derived from exact
    integer co-moments (Σxy fits BIGINT; Σy² needs DECIMAL/int128)
    rather than the engines' ``corr`` builtins — Welford-style vs
    textbook accumulation differ in ulps AND in reduction order, so
    the builtin is not bit-reproducible across engines or even across
    partitionings. One map-side-combined aggregate; a single final
    expression does all the float math in a fixed order."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    yd = y.cast("decimal(20,0)")
    m = li.agg(
        F.count("*").alias("n"), F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    return m.select(
        F.round(
            (n * F.col("sxy") - sx * F.col("sy"))
            / (F.sqrt(n * F.col("sxx") - sx * F.col("sx"))
               * F.sqrt(n * F.col("syy").cast("double") - sy * F.col("sy"))),
            6,
        ).alias("corr_qty_price")
    )


@register(
    "winsorized_value_stats",
    survey_ref="extension: exact per-group winsorization (p05/p95 "
               "order-statistic clamp, integer micro-units)",
    tags=("profile", "events"),
    oracle="""
WITH b AS (
  SELECT event_type, event_id, CAST(round(value * 1000000) AS BIGINT) AS m
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY m ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM b
),
p AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         CAST(max(CASE WHEN rn <= (n + 19) // 20 THEN m END) AS BIGINT) AS p05_micro,
         CAST(max(CASE WHEN rn <= (19 * n + 19) // 20 THEN m END) AS BIGINT) AS p95_micro
  FROM r GROUP BY event_type
)
SELECT b.event_type, p.n, p05_micro, p95_micro,
       CAST(sum(least(greatest(m, p05_micro), p95_micro)) AS BIGINT) AS sum_clamped_micro,
       CAST(sum(CASE WHEN m < p05_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CASE WHEN m > p95_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM b JOIN p USING (event_type)
GROUP BY b.event_type, p.n, p05_micro, p95_micro
ORDER BY event_type
""",
)
def q_winsorized_value_stats(spark, sf_dir):
    """Outlier clamping the way a feature/training pipeline actually
    ships it: per event_type, clamp values to the EXACT p05/p95 order
    statistics (k = ceil(0.05n) / ceil(0.95n), k-th smallest) and
    report the clamped sum plus how many rows each tail clipped.
    Engine percentile builtins interpolate differently per engine, so
    the boundaries are computed as order statistics — rank over
    integer micro-units with an event_id tiebreak; the value at rank k
    is tie-order-independent, and every output is an exact integer.

    Scale: the rank window PARTITIONS on event_type (no global sort —
    contrast the ntile anti-pattern); the per-type (p05, p95) table is
    a handful of rows broadcast back into a second scan for the
    clamped aggregate. Two scans total; at 100 TB the first pass can
    swap to the range-partitioned two-phase rank (the range_shards
    construction) per type if one type dominates a partition."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", "event_id",
            F.round(F.col("value") * 1_000_000).cast("long").alias("m"),
        )
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("m").asc(), F.col("event_id").asc())
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "m",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    k05 = F.floor((F.col("n") + 19) / 20)
    k95 = F.floor((19 * F.col("n") + 19) / 20)
    p = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") <= k05, F.col("m"))).cast("long").alias("p05_micro"),
        F.max(F.when(F.col("rn") <= k95, F.col("m"))).cast("long").alias("p95_micro"),
    )
    return (
        # bound: one row per event_type (closed enum; r10 audit)
        ev.join(F.broadcast(p), "event_type")
        .groupBy("event_type", "n", "p05_micro", "p95_micro")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("m"), F.col("p05_micro")),
                        F.col("p95_micro"))
            ).cast("long").alias("sum_clamped_micro"),
            F.sum(F.when(F.col("m") < F.col("p05_micro"), 1).otherwise(0))
            .cast("long").alias("n_low"),
            F.sum(F.when(F.col("m") > F.col("p95_micro"), 1).otherwise(0))
            .cast("long").alias("n_high"),
        )
        .orderBy("event_type")
    )
