"""Registry entries — TPC-H breadth pack 2 (Q2/Q13/Q18/Q14 plan
shapes adapted to the synthetic star schema, which has no partsupp
table): correlated-min join-back, outer-join count distribution,
HAVING-gated semi join, conditional-aggregate ratio. Together with
``queries_tpch`` (Q1) and ``queries_subquery`` (Q21, EXISTS family)
these cover the classic decorrelation/outer-agg shapes a
warehouse-grade planner must handle.

Money math follows the repo rule: integer cents for any cross-row
sum, one final division (cross-engine exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"


@register(
    "correlated_min_joinback",
    survey_ref="extension: TPC-H Q2 shape (correlated scalar-min subquery)",
    tags=("relational",),
    oracle="""
WITH pli AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_suppkey, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO' AND p_size <= 10
),
mins AS (
  SELECT l_partkey, min(l_extendedprice) AS min_price FROM pli GROUP BY l_partkey
)
SELECT p.l_partkey, p.l_orderkey, p.l_linenumber, s_name,
       round(m.min_price, 2) AS min_price_r
FROM pli p
JOIN mins m ON p.l_partkey = m.l_partkey AND p.l_extendedprice = m.min_price
JOIN supplier ON p.l_suppkey = s_suppkey
ORDER BY p.l_partkey, p.l_orderkey, p.l_linenumber
LIMIT 100
""",
)
def q_correlated_min_joinback(spark, sf_dir):
    """Q2's correlated subquery (``price = (SELECT min(...) WHERE
    correlated)``) decorrelated the way Catalyst should run it: filter
    the dimension, partial-agg the per-key min, join the winners back
    on (key, min). Two shuffles on the same key — AQE coalesces. No
    forced hints: part/supplier scale with SF, so their join strategy
    is AQE-owned (broadcast at bench scale; r9 broadcast-audit)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    )
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    pli = li.join(
        part, li.l_partkey == part.p_partkey
    ).select("l_partkey", "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
    mins = pli.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        pli.join(mins, ["l_partkey"])
           .filter(F.col("l_extendedprice") == F.col("min_price"))
           .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
           .select("l_partkey", "l_orderkey", "l_linenumber", "s_name",
                   F.round("min_price", 2).alias("min_price_r"))
           .orderBy("l_partkey", "l_orderkey", "l_linenumber")
           .limit(100)
    )


@register(
    "outer_count_distribution",
    survey_ref="extension: TPC-H Q13 shape (outer join + two-level agg)",
    tags=("relational",),
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderdate >= TIMESTAMP '2000-01-01'
  GROUP BY c_custkey
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
)
def q_outer_count_distribution(spark, sf_dir):
    """Q13: how many customers placed 0, 1, 2… recent orders. The
    join predicate (not a WHERE) keeps orderless customers — a LEFT
    join with the filter pushed into the orders scan, count(col)
    skipping the nulls; then a second (tiny) agg over the per-customer
    counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
                .agg(F.count("*").alias("n_customers"))
                .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


@register(
    "having_semi_topk",
    survey_ref="extension: TPC-H Q18 shape (IN over HAVING aggregate)",
    tags=("relational",),
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
)
SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey, total_qty,
       round(o_totalprice, 2) AS totalprice_r
FROM orders JOIN big ON o_orderkey = l_orderkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 20
""",
)
def q_having_semi_topk(spark, sf_dir):
    """Q18: orders whose line quantities sum over a threshold. The IN
    subquery becomes an aggregate + join: sum per orderkey with
    map-side partial agg, HAVING filter shrinks it to the rare big
    orders — a constant fraction of orders, i.e. SF-scaling, so the
    join-back strategy is AQE-owned (no forced hint; AQE broadcasts the
    measured result when it fits, which it does at bench scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
          .agg(F.sum("l_quantity").alias("qty"))
          .filter(F.col("qty") > 150)
          .select("l_orderkey", F.round(F.col("qty")).cast("long").alias("total_qty"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
              .select("o_orderkey", F.col("o_custkey").cast("long").alias("custkey"),
                      "total_qty", F.round("o_totalprice", 2).alias("totalprice_r"))
              .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
              .limit(20)
    )


@register(
    "promo_revenue_ratio",
    survey_ref="extension: TPC-H Q14 shape (conditional aggregate ratio)",
    tags=("relational",),
    oracle=f"""
SELECT round(
  100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_CENTS} ELSE 0 END)
        / sum({_CENTS}), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q_promo_revenue_ratio(spark, sf_dir):
    """Q14: share of one month's revenue from PROMO parts. One fact
    scan with the date filter pushed down, the part join AQE-owned
    (part scales with SF — no forced hint), both sums integer-cent
    partial aggregates folded in one pass, a single final division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
          .agg(F.round(
              100.0 * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
              / F.sum(cents), 6).alias("promo_pct"))
    )
