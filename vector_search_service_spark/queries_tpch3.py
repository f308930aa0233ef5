"""Registry entries — TPC-H breadth pack 3 (Q7/Q8/Q11/Q17/Q19/Q22
plan shapes adapted to the synthetic star schema): nation-pair volume,
conditional market share, group-threshold-vs-global-scalar, correlated
average decorrelation, disjunctive predicate pushdown, and anti-join
gated by a global aggregate.

Together with pack 1 (Q1/Q3/Q5/Q6), pack 2 (Q2/Q13/Q14/Q18) and the
subquery family (Q21, EXISTS) this covers every distinct TPC-H plan
*shape* expressible over the schema (no partsupp table, no
commit/receipt dates).

Exactness rules (cross-engine determinism):
- money crosses rows only as integer cents (`round(x*100)::BIGINT`);
- threshold comparisons against an average/fraction are integer
  cross-multiplied (``qty * 5 * cnt < sum_qty`` instead of
  ``qty < 0.2 * avg``) so no float boundary can disagree between
  Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table

# exact integer-cent revenue with discount (see queries_tpch._REV_SQL)
_REV_SQL = (
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0"
)


def _rev_col():
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return F.sum(cents * (100 - disc)) / 10000.0


@register(
    "volume_by_nation_pair",
    survey_ref="extension: TPC-H Q7 shape (two-dimension-chain volume)",
    tags=("relational",),
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_REV_SQL} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q_volume_by_nation_pair(spark, sf_dir):
    """Q7: shipping volume between two nations by year. Both
    dimension chains (supplier→nation, customer→nation) are
    pre-filtered to the two nations of interest; their join strategy is
    AQE-owned (no forced hint — a 2/25-nation slice of supplier/customer
    still scales linearly with SF; AQE broadcasts it whenever the
    measured size fits, shuffled-hash otherwise). The pair-direction OR
    is applied after both chains resolve (r9 broadcast-audit)."""
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1]))
            | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_rev_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "market_share_by_year",
    survey_ref="extension: TPC-H Q8 shape (conditional share within group)",
    tags=("relational",),
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(
         CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
GROUP BY o_year
ORDER BY o_year
""",
)
def q_market_share_by_year(spark, sf_dir):
    """Q8: NATION_3 suppliers' share of ECONOMY-part revenue sold to
    EUROPE customers, by order year. Every dimension chain folds to a
    broadcast (part filtered on type, supplier+nation carrying the
    supplier nation name, customer+nation+region filtered to the
    region); the fact scan shuffles once for lineitem⋈orders, and the
    share is a conditional integer-cent sum over the same single
    aggregate pass — no second scan for the denominator."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_rev = cents * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", disc_rev)
                      .otherwise(F.lit(0))).cast("double")
                / F.sum(disc_rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "important_part_value",
    survey_ref="extension: TPC-H Q11 shape (group HAVING vs global scalar)",
    tags=("relational",),
    oracle="""
WITH vals AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
),
total AS (SELECT sum(value_cents) AS total_cents FROM vals)
SELECT l_partkey, round(value_cents / 100.0, 2) AS part_value
FROM vals, total
WHERE value_cents * 1000 > total_cents
ORDER BY value_cents DESC, l_partkey ASC
""",
)
def q_important_part_value(spark, sf_dir):
    """Q11: parts whose shipped value (for one nation's suppliers)
    exceeds 0.1% of that nation's total. The per-part aggregate is
    computed ONCE; the global total derives from re-aggregating the
    (already tiny) per-part result, joined back as a 1-row broadcast
    cross join — the fact table is scanned and shuffled exactly once.
    The HAVING threshold is integer cross-multiplied
    (``value*1000 > total``), never a float fraction."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    value_cents = F.round(F.col("l_quantity") * F.col("l_extendedprice") * 100).cast("long")
    vals = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value_cents).alias("value_cents"))
    )
    total = vals.agg(F.sum("value_cents").alias("total_cents"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("l_partkey", F.round(F.col("value_cents") / 100.0, 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


@register(
    "small_qty_revenue",
    survey_ref="extension: TPC-H Q17 shape (correlated AVG decorrelation)",
    tags=("relational",),
    oracle="""
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS cnt
  FROM brand_li GROUP BY l_partkey
)
SELECT round(sum(CAST(round(b.l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
         AS small_qty_revenue
FROM brand_li b JOIN per_part p ON b.l_partkey = p.l_partkey
WHERE CAST(round(b.l_quantity) AS BIGINT) * 5 * p.cnt < p.sum_qty
""",
)
def q_small_qty_revenue(spark, sf_dir):
    """Q17: revenue from "small" lineitems — quantity under 20% of the
    part's average — for one brand. The correlated scalar
    ``(SELECT 0.2*avg(l_quantity) WHERE same part)`` decorrelates into
    one per-part aggregate joined back on the part key; the threshold
    is the integer cross-multiplication ``qty*5*cnt < sum_qty`` so
    Spark and the oracle agree bit-for-bit. The brand-filtered part
    build side is 1/|brands| of parts — it still scales with SF, so no
    forced hint (AQE broadcasts when it fits); one shuffle family on
    the part key for the agg/join (r9 broadcast-audit)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    brand_li = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", qty.alias("qty_int"),
                F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"))
    )
    per_part = brand_li.groupBy("l_partkey").agg(
        F.sum("qty_int").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        brand_li.join(per_part, "l_partkey")
        .filter(F.col("qty_int") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(F.round(F.sum("price_cents") / 100.0, 2).alias("small_qty_revenue"))
    )


@register(
    "disjunctive_pushdown",
    survey_ref="extension: TPC-H Q19 shape (OR-of-ANDs predicate pushdown)",
    tags=("relational",),
    oracle=f"""
SELECT {_REV_SQL} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q_disjunctive_pushdown(spark, sf_dir):
    """Q19: revenue under an OR of three brand/size/quantity
    conjunctions. The part side of the disjunction
    (brand ∈ {12,23,3} ∧ size ≤ 15) is a derivable conjunct that
    prunes the build side (strategy AQE-owned — a 3-brand slice of part
    still scales with SF); the lineitem side
    (quantity ≤ 30) prunes the fact scan; the full OR applies after
    the join. Catalyst's own CNF extraction does the same on the SQL
    form — this spells it explicitly so both scans stay tight."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3") & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#12") & s.between(1, 5) & (q >= 1) & (q <= 11))
        | ((b == "Brand#23") & s.between(1, 10) & (q >= 10) & (q <= 20))
        | ((b == "Brand#3") & s.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(disj)
        .agg(_rev_col().alias("revenue"))
    )


@register(
    "idle_customer_balance",
    survey_ref="extension: TPC-H Q22 shape (anti join gated by global scalar)",
    tags=("relational",),
    oracle="""
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE c_acctbal > 0.0
),
avg_stats AS (
  SELECT sum(bal_cents) AS sum_cents, CAST(count(*) AS BIGINT) AS cnt FROM pos
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(bal_cents) / 100.0, 2) AS total_bal
FROM pos, avg_stats
WHERE bal_cents * cnt > sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q_idle_customer_balance(spark, sf_dir):
    """Q22: customers with above-average positive balance and no
    RECENT orders (none since 2000-07-01 — the synthetic corpus gives
    every customer at least one order ever, so the literal "no orders"
    predicate was provably empty and its driver grade vacuous,
    r7 verdict What's-wrong #3; the recency variant keeps the exact
    plan shape), grouped by nation. The global average gate is a 1-row
    broadcast cross join compared integer-cross-multiplied
    (``bal*cnt > sum``); the NOT EXISTS is a left-anti join against
    the date-filtered order custkeys. Orders project to the single key
    column before the anti join, so the build side is as small as the
    semantics allow."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    pos = cust.select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    stats = pos.agg(F.sum("bal_cents").alias("sum_cents"), F.count("*").alias("cnt"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-07-01")
        .select("o_custkey")
    )
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_cents") * F.col("cnt") > F.col("sum_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"),
             F.round(F.sum("bal_cents") / 100.0, 2).alias("total_bal"))
        .orderBy("c_nationkey")
    )
