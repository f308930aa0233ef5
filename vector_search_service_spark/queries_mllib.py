"""Registry entries — MLlib paths (rows-only: KMeans clustering and
Porter stemming are not SQL-expressible; correctness is pinned by
recall/vector tests instead — tests/test_ann_ivf.py,
tests/test_stemmer.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from .sources.tables import load_table


@register(
    "ann_ivf_probe",
    survey_ref="IVFFlat analogue via MLlib KMeans (BASELINE.json spark_approach)",
    tags=("vector", "ann", "mllib"),
    oracle=None,
)
def q_ann_ivf_probe(spark, sf_dir):
    """KMeans-IVF probe-then-rerank top-10 (nprobe=4 of 16 lists);
    recall vs exact asserted in tests, full-probe == exact asserted."""
    from .operators.ann_ivf import build_ivf_index
    from .queries_reference import QUERY_VEC

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_ivf_index(emb, nlist=16)
    return idx.probe(QUERY_VEC, nprobe=4, limit=10).select(
        "vec_id", "label", F.col("list_id").cast("int").alias("list_id"),
        F.round("distance", 6).alias("distance_r"),
    )


@register(
    "pq_ann_topk",
    survey_ref="extension: product-quantization ANN (32x-compressed ADC scan + rerank)",
    tags=("vector", "ann"),
    oracle=None,  # Lloyd-trained codebooks are not SQL-expressible
)
def q_pq_ann_topk(spark, sf_dir):
    """PQ top-10: m=8 subspace codebooks (k=32, Lloyd via one
    DataFrame job per iteration), ADC scan over 8-byte codes (pure
    codegen array-literal lookups), exact cosine rerank of the top-100
    candidates. Recall and full-rerank==exact pinned in
    tests/test_pq.py. (The synthetic near-random corpus is PQ's
    worst case — neighbors barely separate from the bulk; on real
    clustered embeddings smaller rerank windows suffice.)"""
    from .operators.pq import encode_pq, pq_topk, train_pq
    from .queries_reference import QUERY_VEC

    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_pq(emb, m=8, k=32, iters=8)
    coded = encode_pq(emb, cb)
    return pq_topk(coded, cb, QUERY_VEC, k=10, rerank=100).select(
        "vec_id", "label", F.round("distance", 6).alias("distance_r")
    )


@register(
    "fts_stemmed_topk",
    survey_ref="F1/F3 with Porter stemming (PostgreSQL english dictionary fidelity)",
    tags=("fts", "mllib"),
    oracle=None,
)
def q_fts_stemmed_topk(spark, sf_dir):
    """Stemmed FTS top-k: both analyzer sides share porter_stem
    (F1==F3 under stemming); canonical stemmer vectors + symmetry
    pinned in tests."""
    from .functions.stemmer import fts_search_stemmed

    docs = load_table(spark, sf_dir, "documents")
    return (
        fts_search_stemmed(docs, "hash join merge", limit=10)
        .select("doc_id", "lang", "source", F.round("rank", 6).alias("rank_r"))
    )


@register(
    "quality_model_scores",
    survey_ref="extension: learned quality classifier (weak-supervision bootstrap)",
    tags=("textan", "mllib"),
    oracle=None,  # L-BFGS logistic fit is not SQL-expressible
)
def q_quality_model_scores(spark, sf_dir):
    """Corpus-wide P(high quality) from a LogisticRegression trained
    on the heuristic score's confident extremes (weak supervision) —
    inference is a map-only JVM pass (plan pinned in tests). Held-out
    accuracy, teacher agreement and refit determinism pinned in
    tests/test_quality_model.py."""
    from .operators.quality_model import (
        feature_frame, fit_quality_model, score_quality, weak_labels,
    )

    docs = load_table(spark, sf_dir, "documents")
    asm, model = fit_quality_model(weak_labels(feature_frame(docs)))
    return (
        score_quality(docs, asm, model)
        .select("doc_id", "lang", F.round("quality_prob", 4).alias("quality_prob_r"))
        .orderBy(F.col("quality_prob_r").desc(), F.col("doc_id").asc())
        .limit(100)
    )


@register(
    "ivf_pq_topk",
    survey_ref="extension: IVF-PQ composition (list pruning x 32x code compression)",
    tags=("vector", "ann", "mllib"),
    oracle=None,  # KMeans + Lloyd codebooks are not SQL-expressible
)
def q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ probe: nprobe=4 of 16 KMeans lists, ADC scan over the
    probed lists' 8-byte codes only, exact cosine rerank of the top
    100. Scan cost vs brute force = (nprobe/nlist) x (m/4d) — two
    multiplicative reductions before exact math. Recall and
    full-probe+full-rerank == exact pinned in tests/test_pq.py."""
    from .operators.pq import build_ivf_pq, ivf_pq_topk
    from .queries_reference import QUERY_VEC

    emb = load_table(spark, sf_dir, "embeddings")
    idx, cb, coded = build_ivf_pq(emb, nlist=16, m=8, k=32, iters=6)
    return ivf_pq_topk(idx, cb, coded, QUERY_VEC, nprobe=4, k=10, rerank=100).select(
        "vec_id", "label", F.round("distance", 6).alias("distance_r")
    )
