"""Registry entry — batch embedding generation (§2.12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.embed import hash_embedding_raw_col, sql_hash_embedding_raw_expr
from .registry import register
from .sources.tables import load_table


@register(
    "embed_documents",
    survey_ref="§2.12 batch embedding generation (BASELINE.json approach)",
    tags=("vector", "embed"),
    oracle=f"""
SELECT doc_id,
       CAST(generate_subscripts(emb_raw, 1) - 1 AS INT) AS idx,
       CAST(unnest(emb_raw) AS INT) AS component
FROM (
  SELECT doc_id, {sql_hash_embedding_raw_expr('text')} AS emb_raw
  FROM documents ORDER BY doc_id LIMIT 200
)
""",
)
def q_embed_documents(spark, sf_dir):
    """Feature-hash embeddings over the corpus (integer raw vectors —
    the normalized float variant is the pandas-UDF 'model' path,
    asserted equal in tests). One narrow projection, no shuffle.

    Output is exploded to scalar (doc_id, idx, component) rows so the
    driver's canonicalizer (which sorts/hashes scalar columns) checks
    every vector component exactly — array columns are unhashable in
    the harness."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.orderBy("doc_id").limit(200)
        .select("doc_id", hash_embedding_raw_col(F.col("text")).alias("emb_raw"))
        .select(
            "doc_id",
            F.posexplode("emb_raw").alias("idx", "component"),
        )
    )
