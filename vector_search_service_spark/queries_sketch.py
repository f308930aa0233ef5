"""Registry entries — sketch/approximate aggregates with tolerance
oracles (the 100 TB tier of exact ops already in the registry:
``countDistinct`` → HyperLogLog++, ``percentile`` → KLL/GK).

Sketch values are engine-specific, so they can't be hash-matched
against DuckDB directly. Instead the QUERY ships its own acceptance
check: it emits the exact answer (oracle-checkable) next to a boolean
"sketch within declared tolerance of exact" column, and the oracle
emits the exact answer next to literal TRUE. A sketch drifting out of
tolerance flips the boolean and fails the driver's hash compare — the
tolerance contract itself is what's pinned. Sketches are deterministic
for fixed input, so the comparison is stable run-to-run.

Scale note: these single-pass, mergeable, fixed-size-state aggregates
are exactly what replaces the exact ops at 100 TB — countDistinct
rewrites to expand+double-agg (two shuffles, exact-size state), HLL is
one shuffle of constant-size sketches; exact percentile materializes
every group value, KLL keeps a bounded summary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table


@register(
    "sketch_distinct_tolerance",
    survey_ref="extension: HyperLogLog++ distinct-count tier (A-family at 100 TB)",
    tags=("sketch",),
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_within_5pct
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_sketch_distinct_tolerance(spark, sf_dir):
    """Distinct users per event type: exact countDistinct next to
    approx_count_distinct(rsd=2%), asserting the sketch lands within
    5% of truth. One aggregation pass computes both (the HLL buffer
    and the distinct-expand share the shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
          .agg(
              F.countDistinct("user_id").alias("exact_users"),
              F.approx_count_distinct("user_id", 0.02).alias("_hll"),
          )
          .select(
              "event_type", "exact_users",
              (F.abs(F.col("_hll") - F.col("exact_users"))
               <= 0.05 * F.col("exact_users")).alias("hll_within_5pct"),
          )
          .orderBy("event_type")
    )


@register(
    "sketch_heavy_hitters",
    survey_ref="extension: Count-Min heavy hitters (frequency tier at 100 TB)",
    tags=("sketch",),
    oracle="""
SELECT uid, exact_cnt, TRUE AS cms_no_underestimate, TRUE AS cms_within_eps
FROM (
  SELECT CAST(user_id AS VARCHAR) AS uid, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY uid
)
ORDER BY exact_cnt DESC, uid ASC
LIMIT 20
""",
)
def q_sketch_heavy_hitters(spark, sf_dir):
    """Top-20 most frequent users, exact, next to the Count-Min
    sketch's two guarantees as booleans: the estimate never
    underestimates, and overshoots by at most (e/width)*N (the sketch
    is a deterministic function of the data given fixed hash seeds, so
    the booleans are stable).

    The sketch is built as PLAIN DATAFRAME OPS — each row contributes
    ``depth`` (row-hash, bucket) cells via a literal-array explode and
    the table is one groupBy count: depth*width bounded cells no
    matter the corpus size. That is the map-side-combinable,
    fixed-size-state shape that scales where an exact all-keys
    frequency table cannot; estimates for any candidate key set are a
    broadcast join of the (tiny) table + ``least()`` over the depth
    rows — no second corpus scan, no UDF anywhere."""
    depth, width = 5, 4096
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("uid")
    )
    total = ev.count()
    bound = int(2.718281828 / width * total) + 1  # eps = e/width

    def cells(uid_col):
        return F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("h"),
                F.pmod(F.xxhash64(uid_col, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("cell")

    table = (
        ev.select(cells(F.col("uid")))
          .groupBy("cell.h", "cell.bucket")
          .agg(F.count("*").alias("cnt"))
    )
    exact = (
        ev.groupBy("uid").agg(F.count("*").alias("exact_cnt"))
          .orderBy(F.col("exact_cnt").desc(), F.col("uid").asc())
          .limit(20)
    )
    est = (
        exact.select("uid", "exact_cnt", cells(F.col("uid")))
             .select("uid", "exact_cnt", "cell.h", "cell.bucket")
             # bound: depth×width sketch cells — config constants
             .join(F.broadcast(table), ["h", "bucket"])
             .groupBy("uid", "exact_cnt")
             .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            "uid", "exact_cnt",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("cms_no_underestimate"),
            (F.col("cms_est") <= F.col("exact_cnt") + bound).alias("cms_within_eps"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("uid").asc())
    )


@register(
    "sketch_quantile_tolerance",
    survey_ref="extension: approximate-percentile tier (quantile_stats at 100 TB)",
    tags=("sketch",),
    oracle="""
SELECT event_type,
       CAST(quantile_cont(v, 0.5) AS DOUBLE) AS exact_p50,
       CAST(quantile_cont(v, 0.95) AS DOUBLE) AS exact_p95,
       TRUE AS p50_within_tol, TRUE AS p95_within_tol
FROM (SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v FROM events)
GROUP BY event_type ORDER BY event_type
""",
)
def q_sketch_quantile_tolerance(spark, sf_dir):
    """Per-type value percentiles: exact interpolated percentile
    (integer milli-units — cross-engine-identical interpolation) next
    to percentile_approx at accuracy 10000. The sketch's guarantee is
    RANK error (it returns an observed order statistic within ~1/acc
    of the target rank — not an interpolated value), so the acceptance
    check is a rank window: the approx value must lie between the
    exact percentiles at p ± 0.03."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1000).cast("long")

    def pct(p: float):
        return F.percentile("v", F.lit(p))

    agg = (
        ev.select("event_type", v.alias("v"))
          .groupBy("event_type")
          .agg(
              pct(0.5).alias("exact_p50"),
              pct(0.95).alias("exact_p95"),
              F.percentile_approx("v", F.lit(0.5), F.lit(10000)).alias("_a50"),
              F.percentile_approx("v", F.lit(0.95), F.lit(10000)).alias("_a95"),
              pct(0.47).alias("_lo50"), pct(0.53).alias("_hi50"),
              pct(0.92).alias("_lo95"), pct(0.98).alias("_hi95"),
          )
    )
    return (
        agg.select(
            "event_type", "exact_p50", "exact_p95",
            (F.col("_a50").between(F.col("_lo50"), F.col("_hi50"))).alias("p50_within_tol"),
            (F.col("_a95").between(F.col("_lo95"), F.col("_hi95"))).alias("p95_within_tol"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_topk_exact_when_small",
    survey_ref="extension: approx_top_k capacity contract (frequency tier)",
    tags=("sketch",),
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS exact_cnt, TRUE AS in_approx_topk
FROM events GROUP BY event_type
ORDER BY exact_cnt DESC, event_type ASC
""",
)
def q_sketch_topk_exact_when_small(spark, sf_dir):
    """``approx_top_k``'s usable guarantee: with distinct keys ≤ the
    sketch's tracked capacity, the sketch is EXACT (Misra-Gries-style
    summaries only err once capacity evicts counters). The query
    asserts every exact (key, count) appears verbatim in the sketch
    output — the contract that makes the sketch safe as a drop-in for
    groupBy-count on bounded-cardinality keys at 100 TB (one pass,
    constant state, no shuffle of the key universe)."""
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["item"]: r["count"]
        for r in ev.select(
            F.explode(F.expr("approx_top_k(event_type, 100)")).alias("t")
        ).select("t.item", "t.count").collect()
    }
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_cnt"))
    pairs = [(k, int(v)) for k, v in approx.items()]
    approx_df = ev.sparkSession.createDataFrame(pairs, "event_type string, approx_cnt long")
    return (
        # bound: ≤ k rows (the sketch's own top-k output)
        exact.join(F.broadcast(approx_df), "event_type", "left")
        .select(
            "event_type", "exact_cnt",
            (F.col("approx_cnt") == F.col("exact_cnt")).alias("in_approx_topk"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("event_type").asc())
    )
