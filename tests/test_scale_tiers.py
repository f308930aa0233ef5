"""Scale-tier swaps: several exact, oracle-checked operators document
an approximate variant as the 100 TB path (`multi_distinct_agg` →
approx_count_distinct, `quantile_stats` → percentile_approx). These
tests pin that the swap is actually available and lands within the
advertised error, so the claim in the docstrings is checked, not
aspirational."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.sources.tables import load_table


def test_approx_count_distinct_within_tolerance(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.15 * row["exact"]


def test_percentile_approx_close_to_exact(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    row = (
        cust.select(cents.alias("cents"))
        .agg(
            F.expr("percentile(cents, 0.5)").alias("exact"),
            F.expr("approx_percentile(cents, 0.5, 10000)").alias("approx"),
        )
        .collect()[0]
    )
    # high-accuracy sketch on integer cents: within 1% of the spread
    spread = cust.agg(
        (F.max(cents) - F.min(cents)).alias("s")
    ).collect()[0]["s"]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * spread


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization + 50-candidate rerank must recover the exact
    brute-force top-10 (recall on the synthetic corpus is a fixed,
    checkable number — here 100%)."""
    from vector_search_service_spark.queries_ann import q_quantized_vector_topk
    from vector_search_service_spark.queries_reference import q_vector_topk

    quant = [r["vec_id"] for r in q_quantized_vector_topk(spark, SF_SMOKE).collect()]
    exact = [r["vec_id"] for r in q_vector_topk(spark, SF_SMOKE).collect()]
    assert quant == exact
