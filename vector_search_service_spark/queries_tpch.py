"""Registry entries — multi-join analytical breadth (TPC-H-shaped
plans over the star schema: the join/agg/topk compositions a
warehouse-grade engine must plan well) and the language-dispatched
analyzer."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.analysis import sql_tokens_for_lang_expr, tokens_for_lang_col
from .registry import register
from .sources.tables import load_table

# exact integer-cent revenue (see decimal_exact_revenue)
_REV_SQL = (
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0"
)


def _rev_col():
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return F.sum(cents * (100 - disc)) / 10000.0


@register(
    "join_agg_topk",
    survey_ref="J1,A1,T1 composition (TPC-H Q3 shape)",
    tags=("relational", "headline"),
    oracle=f"""
SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey,
       {_REV_SQL} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
GROUP BY o_orderkey, o_custkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q_join_agg_topk(spark, sf_dir):
    """Filter → 3-way join → grouped exact revenue → top-10. The
    filtered customer side is a 1/5 slice of an SF-scaling table, so
    its join strategy is AQE-owned (broadcast at bench scale, shuffled
    hash at 100 TB); the groupBy shuffles on the key already in hand."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(_rev_col().alias("revenue"))
        .select("o_orderkey", F.col("o_custkey").cast("long").alias("custkey"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "star_join_by_nation",
    survey_ref="J1 multi-dim composition (TPC-H Q5 shape)",
    tags=("relational",),
    oracle=f"""
SELECT n_name, {_REV_SQL} AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name ORDER BY n_name
""",
)
def q_star_join_by_nation(spark, sf_dir):
    """Region-pruned star join rolled up by nation. Only the
    SF-invariant region⋈nation chain (5×25 rows by TPC-H spec) carries
    forced broadcasts; the customer-sized dims side is AQE-owned (it
    scales with SF — broadcast at bench scale, shuffled hash at
    100 TB). The fact table shuffles once, for the final groupBy."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation.join(F.broadcast(region),
                                          nation.n_regionkey == region.r_regionkey)),
                  cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(_rev_col().alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("n_name")
    )


@register(
    "date_range_agg",
    survey_ref="P3 on dates + A1 (TPC-H Q1/Q6 shape)",
    tags=("relational",),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS discounted
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_quantity < 24
""",
)
def q_date_range_agg(spark, sf_dir):
    """Date-range + quantity predicate, exact discount revenue (Q6
    shape) — both predicates push into the parquet scan (min/max
    row-group pruning carries this at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents * disc) / 10000.0).alias("discounted"),
        )
    )


@register(
    "multilang_token_stats",
    survey_ref="F1/F3 language dispatch (SURVEY §7 risk 2)",
    tags=("fts", "textan"),
    oracle=f"""
SELECT lang,
       CAST(sum(len({sql_tokens_for_lang_expr('text', 'lang')})) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
""",
)
def q_multilang_token_stats(spark, sf_dir):
    """Per-row language-dispatched analyzer (per-language stopword
    lists, en fallback): token volume per language."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_for_lang_col(F.col("text"), F.col("lang"))
    return (
        docs.select("lang", F.size(toks).cast("long").alias("_n"))
        .groupBy("lang")
        .agg(F.sum("_n").alias("n_tokens"), F.count("*").alias("n_docs"))
        .orderBy("lang")
    )


@register(
    "tpch_q1_full",
    survey_ref="A1/A4 full pricing-summary shape (TPC-H Q1)",
    tags=("relational",),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*) AS avg_price,
       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1_full(spark, sf_dir):
    """The full pricing-summary report (Q1): one scan, map-side
    partial aggregation, a single 6-group shuffle. Every money/avg
    column is an exact integer sum with the divisions applied once at
    the end, in the same order in both engines — the reproducibility
    discipline that also makes the 1000-executor result independent
    of partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(cents) / 100.0).alias("sum_base_price"),
            (F.sum(cents * (100 - disc)) / 10000.0).alias("sum_disc_price"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(cents) / 100.0 / n).alias("avg_price"),
            (F.sum(disc) / 100.0 / n).alias("avg_disc"),
            n.cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
