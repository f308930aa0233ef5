"""Registry entries — ANN (LSH-bucketed probe-then-rerank, the scale
path mirroring the reference's IVFFlat index shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.ann import (
    ann_lsh_topk,
    bucket_of,
    build_lsh_index,
    hyperplanes,
    sql_bucket_code_expr,
)
from .registry import register
from .sources.tables import load_table

_DIM, _NPLANES, _SEED = 64, 4, 7
_PLANES = hyperplanes(_DIM, _NPLANES, _SEED)
_BUCKET_SQL = sql_bucket_code_expr("CAST(embedding AS DOUBLE[])", _PLANES)


def _query_vec() -> list[float]:
    from .queries_reference import QUERY_VEC

    return QUERY_VEC


@register(
    "ann_lsh_topk",
    survey_ref="F4,T2 (IVFFlat-analogue probe, scripts/init-db.sql:32)",
    tags=("vector", "ann"),
    oracle=None,  # set below (needs the query vector literal)
)
def q_ann_lsh_topk(spark, sf_dir):
    """LSH probe-then-rerank top-10: filter to the query's bucket,
    exact cosine inside. Approximate by design — the oracle replays the
    identical deterministic bucketing, so results still hash-match."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = ann_lsh_topk(emb, _query_vec(), n_planes=_NPLANES, limit=10, seed=_SEED)
    return res.select(
        "vec_id", "label",
        F.col("bucket").cast("int").alias("bucket"),
        F.round(F.col("distance"), 6).alias("distance_r"),
    )


def _ann_oracle() -> str:
    from .queries_reference import _QV_SQL

    qb = bucket_of(_query_vec(), _PLANES)
    return f"""
WITH q AS (SELECT {_QV_SQL} AS qv),
e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
)
SELECT vec_id, label, CAST(bucket AS INT) AS bucket,
       round(1.0 - (list_inner_product(v, qv)
         / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv)))), 6) AS distance_r
FROM e, q
WHERE bucket = {qb}
ORDER BY 1.0 - (list_inner_product(v, qv)
         / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv)))) ASC,
         vec_id ASC
LIMIT 10
"""


@register(
    "ann_bucket_histogram",
    survey_ref="extension: LSH index build (bulk)",
    tags=("vector", "ann"),
    oracle=f"""
SELECT CAST({_BUCKET_SQL} AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n
FROM embeddings GROUP BY 1 ORDER BY bucket
""",
)
def q_ann_bucket_histogram(spark, sf_dir):
    """Index-build output summarized: vectors per LSH bucket (the IVF
    'list' sizes — the thing you monitor for balance at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_lsh_index(emb, n_planes=_NPLANES, dim=_DIM, seed=_SEED)
    return (
        idx.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# late-bind the ann_lsh_topk oracle (needs imports resolved above)
from .registry import _REGISTRY  # noqa: E402

_REGISTRY["ann_lsh_topk"].oracle = _ann_oracle()
