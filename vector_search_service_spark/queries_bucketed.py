"""Registry entry — the bucketed co-located fact-fact join
(``operators/bucketing.py``): write-once bucketing on the join key,
then a join whose exchanges are elided. The WRITE is part of the
query on purpose: it is the one-time cost the strategy amortizes, and
running it through the oracle proves bucketing is value-neutral."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from .operators.bucketing import bucketed_pair
from .queries_tpch import _REV_SQL, _rev_col
from .registry import register
from .sources.tables import load_table


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))


@register(
    "bucketed_join_agg",
    survey_ref="§2.3 co-located join (bucketed scale path, net-new)",
    tags=("relational",),
    oracle=f"""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_items,
       {_REV_SQL} AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_bucketed_join_agg(spark, sf_dir):
    """orders ⋈ lineitem through co-bucketed tables (8 buckets on the
    order key each): the join itself runs exchange-free — both scans
    report ``HashPartitioning(orderkey, 8)`` so sort-merge happens in
    place; the only shuffle left is the 5-group priority rollup of
    already-partial aggregates. ``tests/test_plans.py`` asserts the
    exchange-free shape; this entry proves the rewrite is
    value-neutral vs the plain join the oracle runs."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ot, lt = bucketed_pair(
        spark, orders, li, tag=_tag(sf_dir),
        left_key="o_orderkey", right_key="l_orderkey",
    )
    return (
        lt.join(ot, lt.l_orderkey == ot.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count("*").alias("n_items"),
            _rev_col().alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "zorder_values",
    survey_ref="extension: Z-order clustering key (multi-dim layout tier)",
    tags=("layout",),
    oracle="""
WITH b AS (
  SELECT l_orderkey, l_linenumber,
         CAST(least(greatest(floor((l_partkey - 0.0) / 2000.0 * 16.0), 0), 15) AS BIGINT) AS b0,
         CAST(least(greatest(floor((l_suppkey - 0.0) / 200.0 * 16.0), 0), 15) AS BIGINT) AS b1
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       (((b0 >> 0) & 1) << 0) |
       (((b1 >> 0) & 1) << 1) |
       (((b0 >> 1) & 1) << 2) |
       (((b1 >> 1) & 1) << 3) |
       (((b0 >> 2) & 1) << 4) |
       (((b1 >> 2) & 1) << 5) |
       (((b0 >> 3) & 1) << 6) |
       (((b1 >> 3) & 1) << 7) AS zvalue
FROM b
ORDER BY l_orderkey, l_linenumber
LIMIT 200
""",
)
def q_zorder_values(spark, sf_dir):
    """The Morton interleave itself, oracle-pinned bit-for-bit (the
    clustering write + file-pruning payoff is exercised in
    tests/test_zorder.py — layout effects are not SQL-visible, but the
    KEY the layout sorts by must be exactly reproducible)."""
    from .operators.zorder import binned_col, zvalue_col

    li = load_table(spark, sf_dir, "lineitem")
    z = zvalue_col(
        [
            binned_col(F.col("l_partkey"), 0.0, 2000.0, 4),
            binned_col(F.col("l_suppkey"), 0.0, 200.0, 4),
        ],
        4,
    )
    return (
        li.select("l_orderkey", "l_linenumber", z.alias("zvalue"))
          .orderBy("l_orderkey", "l_linenumber")
          .limit(200)
    )
