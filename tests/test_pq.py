"""Product quantization (operators/pq.py): code-table shape, recall
vs exact brute force, rerank-everything == exact, determinism, and
the ADC approximation actually ordering near-neighbors first."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.operators.pq import encode_pq, pq_topk, train_pq
from vector_search_service_spark.operators.search import vector_search
from vector_search_service_spark.queries_reference import QUERY_VEC
from vector_search_service_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def pq(spark, emb):
    cb = train_pq(emb, m=8, k=32, iters=8)
    return cb, encode_pq(emb, cb).localCheckpoint()


def test_codes_shape_and_range(emb, pq):
    cb, coded = pq
    assert coded.count() == emb.count()
    bad = coded.filter(
        (F.size("codes") != cb.m)
        | F.exists("codes", lambda c: (c < 0) | (c >= cb.k))
    ).count()
    assert bad == 0


def test_recall_at_10(emb, pq):
    cb, coded = pq
    exact = [r["vec_id"] for r in vector_search(emb, QUERY_VEC, limit=10).collect()]
    got = [r["vec_id"] for r in pq_topk(coded, cb, QUERY_VEC, k=10, rerank=100).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.6, f"recall@10 = {recall}"


def test_rerank_all_equals_exact(emb, pq):
    """With rerank = corpus size the ADC stage only reorders the
    candidate set; the exact rerank must reproduce brute force."""
    cb, coded = pq
    n = emb.count()
    exact = [r["vec_id"] for r in vector_search(emb, QUERY_VEC, limit=10).collect()]
    got = [r["vec_id"] for r in pq_topk(coded, cb, QUERY_VEC, k=10, rerank=n).collect()]
    assert got == exact


def test_training_deterministic(emb):
    a = train_pq(emb, m=8, k=16, iters=3)
    b = train_pq(emb, m=8, k=16, iters=3)
    assert a.centroids == b.centroids


def test_adc_orders_near_neighbors_first(emb, pq):
    """The approximate distance must be informative: the true top-10
    should rank in the best ~20% of the corpus by ADC distance."""
    cb, coded = pq
    table = cb.adc_table([float(x) for x in QUERY_VEC])
    lit_table = F.array(*[F.array(*[F.lit(v) for v in row]) for row in table])
    approx = F.aggregate(
        F.transform(F.col("codes"),
                    lambda c, i: F.element_at(F.element_at(lit_table, i + 1), c + 1)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    ranked = [
        r["vec_id"]
        for r in coded.withColumn("_a", approx)
        .orderBy(F.col("_a").asc(), F.col("vec_id").asc())
        .select("vec_id").collect()
    ]
    exact = [r["vec_id"] for r in vector_search(emb, QUERY_VEC, limit=10).collect()]
    n = len(ranked)
    positions = [ranked.index(v) for v in exact]
    assert sum(p < n * 0.2 for p in positions) >= 6, positions


# -- IVF-PQ composition -------------------------------------------------------


def test_ivf_pq_recall_and_full_probe_exact(spark, emb):
    from vector_search_service_spark.operators.pq import build_ivf_pq, ivf_pq_topk

    idx, cb, coded = build_ivf_pq(emb, nlist=8, m=8, k=32, iters=6)
    coded = coded.localCheckpoint()
    exact = [r["vec_id"] for r in vector_search(emb, QUERY_VEC, limit=10).collect()]
    # probing half the lists with a generous rerank: decent recall
    got = [r["vec_id"] for r in
           ivf_pq_topk(idx, cb, coded, QUERY_VEC, nprobe=4, k=10, rerank=100).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.5, f"recall@10 = {recall}"
    # probing ALL lists and reranking everything must equal brute force
    n = emb.count()
    full = [r["vec_id"] for r in
            ivf_pq_topk(idx, cb, coded, QUERY_VEC, nprobe=8, k=10, rerank=n).collect()]
    assert full == exact
    # the coded table preserves list assignment: probe scans a strict subset
    probed = coded.filter(F.col("list_id").isin([0])).count()
    assert 0 < probed < n


def test_pq_query_plan_has_no_python_nodes(spark, emb, pq):
    """The ADC scan + exact rerank must be pure JVM/codegen — the
    codebook folds in as an array literal, never a UDF (the 'Querying'
    contract in operators/pq.py). A PythonUDF/ArrowEval node in this
    plan means the 32x-compressed scan fell off the codegen path."""
    cb, coded = pq
    plan = pq_topk(coded, cb, QUERY_VEC, k=10, rerank=100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan and "ArrowEval" not in plan
