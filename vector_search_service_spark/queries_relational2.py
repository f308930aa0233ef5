"""Registry entries — relational floor completion: projection/rename
with ISO timestamps (P2), distance threshold (P6), window functions
(§2.9), set operations (§2.6), rollup aggregates, and the as-of join
(§2.3 gap, engine-native addition)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.embed import EMB_DIM
from .functions.vectors import cosine_distance_col, valid_vec_col
from .operators.asof import asof_join_backward
from .queries_reference import guarded_emb_sql
from .registry import register
from .sources.tables import load_table


@register(
    "projection_rename_iso",
    survey_ref="P2,G7",
    tags=("relational",),
    oracle="""
SELECT event_id AS id, event_type AS type,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS created_at_iso
FROM events ORDER BY event_id LIMIT 100
""",
)
def q_projection_rename_iso(spark, sf_dir):
    """Row→dict projection/rename with ISO-8601 timestamps (P2,
    ``src/db/models.py:27-42`` ``to_dict`` shape)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy("event_id").limit(100)
        .select(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("type"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("created_at_iso"),
        )
    )


@register(
    "vector_threshold",
    survey_ref="P6,F4",
    tags=("vector",),
    oracle=f"""
WITH q AS (SELECT (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0) AS qv),
e AS (SELECT vec_id, label, {guarded_emb_sql()} AS v FROM embeddings),
d AS (
  SELECT vec_id, label,
         1.0 - (list_inner_product(v, qv)
           / (sqrt(list_inner_product(v, v))
              * sqrt(list_inner_product(qv, qv)))) AS dist
  FROM e, q
)
SELECT vec_id, label, round(greatest(dist, 0.0), 6) AS distance_r
FROM d WHERE dist <= 0.8 ORDER BY vec_id
""",
)
def q_vector_threshold(spark, sf_dir):
    """θ-predicate on cosine distance (P6,
    ``src/core/vector_store.py:294-298``): all vectors within distance
    0.8 of vector 0 — a filter, not a top-k.

    Both sides clamp ``greatest(dist, 0.0)`` before rounding: cosine
    distance is mathematically ≥ 0, but the self-distance row carries a
    ±ulp-of-zero residual and DuckDB rounds its tiny *negative* residual
    to ``-0.0`` where Spark emits ``+0.0`` — equal under ``==``, distinct
    under the driver's byte-level hash (the one red row of round 3)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        valid_vec_col(F.col("embedding").cast("array<double>"), EMB_DIM),
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    d = cosine_distance_col(F.col("embedding"), F.col("qv"))
    return (
        emb.crossJoin(F.broadcast(qv))
        .withColumn("dist", d)
        .filter(F.col("dist") <= 0.8)
        .select(
            "vec_id", "label",
            F.round(F.greatest(F.col("dist"), F.lit(0.0)), 6).alias("distance_r"),
        )
        .orderBy("vec_id")
    )


@register(
    "window_rank_per_group",
    survey_ref="§2.9 (windows: net-new; T3 deterministic pagination basis)",
    tags=("relational",),
    oracle="""
SELECT * FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn,
         (CAST(round(c_acctbal * 100) AS BIGINT)
          - CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                 OVER (PARTITION BY c_nationkey) AS DOUBLE)
            / count(*) OVER (PARTITION BY c_nationkey)) / 100.0 AS delta_vs_avg
  FROM customer
) WHERE rn <= 3 ORDER BY c_nationkey, rn
""",
)
def q_window_rank_per_group(spark, sf_dir):
    """Top-3 per group + analytic delta vs group mean — ranking and
    aggregate windows in one pass (one shuffle on the partition key)."""
    cust = load_table(spark, sf_dir, "customer")
    wr = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    wa = Window.partitionBy("c_nationkey")
    # exact integer-cent mean: the float avg's accumulation order is
    # engine/partitioning-dependent; integer sums are not
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    delta = (cents - F.sum(cents).over(wa).cast("double") / F.count("*").over(wa)) / 100.0
    return (
        cust.select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.row_number().over(wr).alias("rn"),
            delta.alias("delta_vs_avg"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@register(
    "set_operations",
    survey_ref="§2.6 (set ops: net-new)",
    tags=("relational",),
    oracle="""
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
UNION ALL
SELECT 'f_only', CAST(count(*) AS BIGINT) FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
UNION ALL
SELECT 'o_only', CAST(count(*) AS BIGINT) FROM (SELECT * FROM o EXCEPT SELECT * FROM f)
ORDER BY bucket
""",
)
def q_set_operations(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION over customer key sets."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    spark_df = (
        f.intersect(o).agg(F.count("*").alias("n")).select(F.lit("both").alias("bucket"), "n")
        .unionByName(f.exceptAll(o).agg(F.count("*").alias("n")).select(F.lit("f_only").alias("bucket"), "n"))
        .unionByName(o.exceptAll(f).agg(F.count("*").alias("n")).select(F.lit("o_only").alias("bucket"), "n"))
        .orderBy("bucket")
    )
    return spark_df


@register(
    "rollup_counts",
    survey_ref="§2.4 (grouping sets: net-new)",
    tags=("relational",),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def q_rollup_counts(spark, sf_dir):
    """ROLLUP hierarchy counts (subtotals + grand total in one pass —
    partial aggregation covers all grouping sets in a single shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "asof_join_events",
    survey_ref="§2.3 as-of join (engine-native addition)",
    tags=("relational", "headline"),
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, ts, max(event_id) AS err_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
       e.err_id AS error_event_id,
       CAST(epoch_ms(e.ts) AS BIGINT) AS error_ts_ms
FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
ORDER BY p.event_id
""",
)
def q_asof_join_events(spark, sf_dir):
    """Backward as-of join: each purchase gets the user's most recent
    preceding error (one shuffle + per-key sort via the union-window
    trick, ``operators/asof.py``); oracle is DuckDB's native ASOF
    JOIN — an independent implementation of the semantics."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("err_id"))
        .withColumn("err_ts", F.col("ts"))
    )
    joined = asof_join_backward(
        purchases, errors, on="user_id", ts="ts",
        right_cols=["err_id", "err_ts"], suffix="",
    )
    return (
        joined.select(
            "event_id", "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.col("err_id").alias("error_event_id"),
            F.unix_millis("err_ts").alias("error_ts_ms"),
        )
        .orderBy("event_id")
    )


@register(
    "cube_counts",
    survey_ref="§2.4 (grouping sets: CUBE, net-new)",
    tags=("relational",),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def q_cube_counts(spark, sf_dir):
    """CUBE over both dimensions (all 2^2 grouping sets — adds the
    per-linestatus marginals ROLLUP omits) in one pass: Catalyst's
    Expand feeds a single shuffle, same as ROLLUP."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "asof_forward_events",
    survey_ref="§2.3 as-of join, forward direction (engine-native addition)",
    tags=("relational",),
    oracle="""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, ts, max(event_id) AS sig_id
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       CAST(epoch_ms(p.ts) AS BIGINT) AS ts_ms,
       e.sig_id AS next_signup_id,
       CAST(epoch_ms(e.ts) AS BIGINT) AS next_ts_ms
FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts <= e.ts
ORDER BY p.event_id
""",
)
def q_asof_forward_events(spark, sf_dir):
    """Forward as-of join: each purchase gets the user's NEXT signup
    event at-or-after it (the time-to-next-event alignment). Same
    union-window plan as backward, traversed in descending time;
    oracle is DuckDB's native ASOF with the <= inequality — an
    independent implementation of the direction."""
    from .operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    nxt = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("sig_id"))
        .withColumn("sig_ts", F.col("ts"))
    )
    joined = asof_join_forward(
        purchases, nxt, on="user_id", ts="ts",
        right_cols=["sig_id", "sig_ts"], suffix="",
    )
    return (
        joined.select(
            "event_id", "user_id",
            F.unix_millis("ts").alias("ts_ms"),
            F.col("sig_id").alias("next_signup_id"),
            F.unix_millis("sig_ts").alias("next_ts_ms"),
        )
        .orderBy("event_id")
    )
