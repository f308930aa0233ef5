"""Edge-embeddings oracle parity: degenerate vectors.

A production embedding column accumulates junk the stock corpus never
shows: all-zeros rows (failed encoder calls), underflow-tiny values
(norm rounds to 0.0 in double), and huge magnitudes (norm overflows to
inf). The engines disagree on the RAW arithmetic — Spark's guarded
fold yields NaN for a 0/0 angle while DuckDB's division yields NULL —
but both sort those sentinels after every real distance (NaN greatest
in Spark/DuckDB/PostgreSQL; DuckDB default NULLS LAST) and both fail
`<=` threshold predicates, so every ranked/thresholded RESULT must
still agree exactly. This sweep proves that: degenerate vectors must
never crash a scan, poison a top-k, or leak through a threshold — in
either engine.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import TABLES, compare, register_duck_views

DIM = 64

EDGE_VECS = [
    # (vec_id, embedding, label)
    (-1, [0.0] * DIM, 9),                      # all zeros: undefined angle
    (-2, [1e-300] * DIM, 9),                   # norm underflows to 0.0
    (-3, [1e200] * DIM, 9),                    # norm overflows to inf
    (-4, [0.0] * (DIM - 1) + [1e-300], 9),     # single denormal component
    # NULL cell and wrong-dimension rows (r7, per ADVICE): these are the
    # CRASH rows, not just ordering rows — DuckDB list_inner_product
    # throws on mismatched lengths, Spark ANSI element_at throws past
    # the array end, and Spark's bare `asc` seats a NULL distance at
    # rank 1 where DuckDB's NULLS LAST default buries it. Both engines
    # must nullify invalid vectors at the scan (valid_vec_col /
    # guarded_emb_sql) and order distances asc_nulls_last.
    (-5, None, 9),                             # NULL embedding (failed encode)
    (-6, [0.5] * (DIM - 1), 9),                # wrong dimension (model drift)
]

ENTRIES = [
    "vector_topk",
    "vector_threshold",
    "embedding_near_dup",
    "rerank_cross_topk",
    "vector_topk_per_label",
    "maxsim_topk",
    "jl_ann_topk",
    # r8 (per r7 ADVICE #1): the LSH / quantized tier, guarded by
    # scoreable_vec_col / scoreable_emb_sql (zero-norm rows are crash
    # or DESC-ordering divergence rows for these, not just NULL-order)
    "ann_lsh_topk",
    "ann_bucket_histogram",
    "quantized_vector_topk",
    "semdedup_prune",
    "semdedup_multiprobe",
    "semantic_decontaminate",
]


@pytest.fixture(scope="session")
def edge_emb_dir(spark, tmp_path_factory):
    import shutil

    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("edge_emb")
    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", out / f"{t}.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    edge = spark.createDataFrame(
        EDGE_VECS, "vec_id long, embedding array<float>, label int"
    )
    tmp = str(out / "_emb_build")
    emb.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    ).unionByName(edge).coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), out / "embeddings.parquet")
    shutil.rmtree(tmp)
    return str(out)


@pytest.mark.parametrize("name", ENTRIES)
def test_oracle_parity_on_degenerate_embeddings(spark, duck, edge_emb_dir, name):
    from vector_search_service_spark.registry import all_queries

    register_duck_views(duck, edge_emb_dir)
    spec = all_queries()[name]
    assert spec.oracle is not None
    ok, msg = compare(spec.fn(spark, edge_emb_dir), duck, spec.oracle)
    assert ok, f"{name} on degenerate embeddings: {msg}"
