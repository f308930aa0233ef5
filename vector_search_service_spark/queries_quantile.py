"""Registry entries — quantiles and pivot (§2.4 breadth: absent from
the reference, table-stakes for a warehouse engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table


@register(
    "quantile_stats",
    survey_ref="§2.4 quantiles (net-new)",
    tags=("relational",),
    oracle="""
SELECT c_mktsegment,
       CAST(quantile_cont(cents, 0.5) AS DOUBLE) / 100.0 AS median_bal,
       CAST(quantile_cont(cents, 0.95) AS DOUBLE) / 100.0 AS p95_bal
FROM (SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer)
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
)
def q_quantile_stats(spark, sf_dir):
    """Exact interpolated quantiles per group, computed on integer
    cents (both engines use the classic linear-interpolation
    definition; integer inputs keep the interpolation arithmetic
    identical). At 100 TB swap ``percentile`` for
    ``percentile_approx`` and re-tier the oracle — noted, not hidden."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        cust.select("c_mktsegment", cents.alias("cents"))
        .groupBy("c_mktsegment")
        .agg(
            (F.percentile("cents", F.lit(0.5)) / 100.0).alias("median_bal"),
            (F.percentile("cents", F.lit(0.95)) / 100.0).alias("p95_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "pivot_status_counts",
    survey_ref="§2.4 pivot (net-new)",
    tags=("relational",),
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_pivot_status_counts(spark, sf_dir):
    """Pivot on a known value set (explicit values → single pass, no
    distinct-discovery job — the scale-correct pivot call)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("st_f"),
            F.coalesce("O", F.lit(0)).alias("st_o"),
            F.coalesce("P", F.lit(0)).alias("st_p"),
        )
        .orderBy("o_orderpriority")
    )
