"""Plan assertions: the physical shapes the 100 TB design depends on.
A regression here (filter stops pushing, join stops broadcasting,
top-k becomes a global sort) fails the suite like a wrong answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    has_top_k,
    read_schema_columns,
)
from vector_search_service_spark.sources.tables import load_table


def test_equality_filter_pushes_to_scan(spark):
    df = load_table(spark, SF_SMOKE, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    assert has_pushed_filters(df, "c_mktsegment")


def test_projection_prunes_read_schema(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert cols == {"l_orderkey", "l_quantity"}  # 2 of 11 columns read


def test_fts_topk_is_take_ordered_no_shuffle(spark):
    from vector_search_service_spark.operators.search import fts_search

    docs = load_table(spark, SF_SMOKE, "documents")
    df = fts_search(docs, "hash join merge", limit=10)
    plan = explain_str(df)
    assert has_top_k(df)                       # true top-k, no global sort
    assert "Exchange" not in plan              # zero shuffles end-to-end


def test_semi_join_broadcasts(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_orderstatus") == "F")
    df = cust.join(
        F.broadcast(orders.select(F.col("o_custkey").alias("c_custkey"))),
        "c_custkey", "left_semi",
    )
    assert has_broadcast_join(df)


def test_vector_topk_plan(spark):
    from vector_search_service_spark.operators.search import vector_search
    from vector_search_service_spark.queries_reference import QUERY_VEC

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = vector_search(emb, QUERY_VEC, limit=10)
    plan = explain_str(df)
    assert has_top_k(df)
    assert "Exchange" not in plan
    assert "BatchScan" in plan or "Scan parquet" in plan


def test_partition_pruning_on_catalog_store(spark, tmp_path):
    """documents partitioned by collection_id → a collection filter
    scans only that partition (PartitionFilters, not data filters)."""
    from vector_search_service_spark.catalog import Catalog
    from vector_search_service_spark.ingest import ingest_into

    cat = Catalog(spark, str(tmp_path / "store"))
    cat.create_collection("a")
    cat.create_collection("b")
    raw = spark.createDataFrame([(1, "alpha beta gamma", "s")], "doc_id long, text string, source string")
    ingest_into(cat, "a", raw)
    ingest_into(cat, "b", raw)
    df = cat.documents("a")
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "collection_id" in plan.split("PartitionFilters")[1][:200]
