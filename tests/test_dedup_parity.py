"""The dedup hot path runs as pandas UDFs (measured ~10x over Spark's
interpreted higher-order functions); the pure-expression mirrors in
``functions/hashing.py`` define the oracle SQL. This test pins
UDF == expression so the two can never drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_service_spark.functions.hashing import (
    band_key_from_hashes_col,
    shingle_hashes_col,
    shingles_col,
    simhash16_col,
    token_digests_col,
    words_col,
)
from vector_search_service_spark.operators.dedup import (
    DEFAULT_BANDS,
    band_keys_udf,
    shingle_set_udf,
    simhash16_udf,
)
from vector_search_service_spark.sources.tables import load_table


def test_band_keys_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr_df = (
        docs.withColumn("_sh", F.array_distinct(shingles_col(words_col(F.col("text")))))
            .withColumn("_h", shingle_hashes_col(F.col("_sh")))
            .select(
                "doc_id",
                F.array(*[
                    band_key_from_hashes_col(F.col("_h"), seeds) for seeds in DEFAULT_BANDS
                ]).alias("keys"),
            )
    )
    udf_df = docs.select("doc_id", band_keys_udf()(F.col("text")).alias("keys"))
    expr = {r["doc_id"]: r["keys"] for r in expr_df.collect()}
    udf = {r["doc_id"]: r["keys"] for r in udf_df.collect()}
    assert expr == udf


def test_shingle_set_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs.select(
            "doc_id",
            F.array_distinct(shingles_col(words_col(F.col("text")))).alias("sh"),
        ).collect()
    }
    udf = {
        r["doc_id"]: list(r["sh"])
        for r in docs.select("doc_id", shingle_set_udf()(F.col("text")).alias("sh")).collect()
    }
    assert expr == udf


def test_simhash_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn("_dg", token_digests_col(words_col(F.col("text"))))
        .select("doc_id", simhash16_col(F.col("_dg")).cast("int").alias("s"))
        .collect()
    }
    udf = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", simhash16_udf()(F.col("text")).alias("s")).collect()
    }
    assert expr == udf


def test_connected_components_chain_and_isolated_pair(spark):
    """Chain 1-2-3 collapses to one cluster (transitivity — the whole
    reason the operator exists); 7-9 stays separate; convergence flag
    respects max_rounds."""
    from vector_search_service_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9), (4, 5), (5, 6), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 7, 9: 7}
