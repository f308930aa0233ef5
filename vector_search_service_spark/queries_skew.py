"""Registry entry — skew-safe two-phase salted aggregation. The
oracle is the PLAIN groupBy: salting re-associates the reduction but
must not change a single value (integer sums are order-independent),
so the skew defense is provably invisible in results."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.skew import salted_group_count_sum
from .registry import register
from .sources.tables import load_table


@register(
    "salted_group_agg",
    survey_ref="A1 under skew (salting; 100 TB design note)",
    tags=("relational", "skew"),
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q_salted_group_agg(spark, sf_dir):
    """l_returnflag has 3 values over the whole corpus — exactly the
    hot-key shape that funnels one reducer; the salted two-phase plan
    spreads each key over 16 shards and still hash-matches the plain
    groupBy oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        salted_group_count_sum(li, "l_returnflag", qty, value_alias="sum_qty")
        .orderBy("l_returnflag")
    )
