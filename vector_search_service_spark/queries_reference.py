"""Registry entries for the reference's operator surface (SURVEY.md §2).

Every entry maps a reference operator (S/P/J/A/T/F/G ids from the
survey) onto the driver's synthetic tables, with a DuckDB oracle mirror.
Names are stable driver-facing identifiers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.embed import EMB_DIM
from .functions.analysis import (
    analyze_terms,
    sql_match_expr,
    sql_raw_tokens_expr,
    sql_tf_rank_expr,
)
from .operators.search import fts_search, paginate, vector_search
from .registry import register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# FTS — the reference's primary read path (3.1)
# ---------------------------------------------------------------------------

FTS_QUERY = "hash join merge"
_FTS_TERMS = analyze_terms(FTS_QUERY)
_TOKS = sql_raw_tokens_expr("text")


@register(
    "fts_topk",
    survey_ref="F1,F2,F3,P7,T1,P1",
    tags=("fts", "headline"),
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
)
SELECT doc_id, lang, source,
       {sql_tf_rank_expr('toks', _FTS_TERMS)} AS rank
FROM d
WHERE {sql_match_expr('toks', _FTS_TERMS)}
ORDER BY rank DESC, doc_id ASC
LIMIT 10
""",
)
def q_fts_topk(spark, sf_dir):
    """Ranked FTS top-k: AND-match all lexemes of ``hash join merge``,
    rank/(rank+1) score, ORDER BY rank DESC LIMIT 10.
    Reference: ``src/core/vector_store.py:211-227``."""
    docs = load_table(spark, sf_dir, "documents")
    return fts_search(docs, FTS_QUERY, limit=10).select("doc_id", "lang", "source", "rank")


@register(
    "fts_metadata_filter",
    survey_ref="P5,P7,F2,T1",
    tags=("fts",),
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents WHERE source = 'src1'
)
SELECT doc_id, lang, source,
       {sql_tf_rank_expr('toks', _FTS_TERMS)} AS rank
FROM d
WHERE {sql_match_expr('toks', _FTS_TERMS)}
ORDER BY rank DESC, doc_id ASC
LIMIT 10
""",
)
def q_fts_metadata_filter(spark, sf_dir):
    """FTS + string-coerced metadata equality filter (P5,
    ``src/core/vector_store.py:289-292``) — the declared-but-dropped
    reference parameter, implemented."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        fts_search(docs, FTS_QUERY, limit=10, metadata_filter={"source": "src1"})
        .select("doc_id", "lang", "source", "rank")
    )


@register(
    "fts_match_count_by_lang",
    survey_ref="P7,A1",
    tags=("fts",),
    oracle=f"""
WITH d AS (SELECT lang, {_TOKS} AS toks FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_match
FROM d WHERE {sql_match_expr('toks', _FTS_TERMS)}
GROUP BY lang ORDER BY lang
""",
)
def q_fts_match_count_by_lang(spark, sf_dir):
    """Match-set cardinality per language — exercises the analyzer over
    the full corpus with an integer-exact aggregate."""
    from .functions.analysis import match_all_terms, raw_tokens_col

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(match_all_terms(raw_tokens_col(F.col("text")), _FTS_TERMS))
        .groupBy("lang").agg(F.count("*").alias("n_match"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Vector search (F4, P6, T2)
# ---------------------------------------------------------------------------

# Deterministic EMB_DIM-dim probe vector (pseudo-embedding):
# v[i] = sin(i+1), fixed here as the literal both engines see.
QUERY_VEC = [round(__import__("math").sin(i + 1), 6) for i in range(EMB_DIM)]
_QV_SQL = "[" + ", ".join(f"{x!r}" for x in QUERY_VEC) + "]::DOUBLE[]"


def guarded_emb_sql(col: str = "embedding", dim: int = EMB_DIM) -> str:
    """Oracle-side mirror of ``functions.vectors.valid_vec_col``:
    nullify NULL / wrong-dimension embeddings before any list
    arithmetic. DuckDB's ``list_inner_product`` THROWS on mismatched
    list lengths, so a single short embedding row would crash every
    vector oracle; the CASE guard turns it into a NULL distance that
    DuckDB's NULLS LAST default (and the Spark side's explicit
    ``asc_nulls_last``) sinks below every real distance."""
    return (f"CASE WHEN {col} IS NOT NULL AND len({col}) = {dim} "
            f"THEN CAST({col} AS DOUBLE[]) END")


def scoreable_emb_sql(col: str = "embedding", dim: int = EMB_DIM) -> str:
    """Oracle-side mirror of ``functions.vectors.scoreable_vec_col``:
    additionally nullify zero/underflow-norm vectors (Σx² underflows to
    exactly 0.0 in IEEE double, identically in both engines) and
    norm-overflow vectors (Σx² = +inf) for consumers whose arithmetic
    is undefined on them — LSH bucketing, scalar quantization, DESC
    score ranking."""
    ss = (f"list_inner_product(CAST({col} AS DOUBLE[]), "
          f"CAST({col} AS DOUBLE[]))")
    return (f"CASE WHEN {col} IS NOT NULL AND len({col}) = {dim} "
            f"AND {ss} > 0 AND isfinite({ss}) "
            f"THEN CAST({col} AS DOUBLE[]) END")


@register(
    "vector_topk",
    survey_ref="F4,T2,P1",
    tags=("vector", "headline"),
    oracle=f"""
WITH q AS (SELECT {_QV_SQL} AS qv),
e AS (SELECT vec_id, label, {guarded_emb_sql()} AS v FROM embeddings)
SELECT vec_id, label,
       round(1.0 - (
         list_inner_product(v, qv)
         / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv)))
       ), 6) AS distance_r
FROM e, q
ORDER BY 1.0 - (
         list_inner_product(v, qv)
         / (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv)))
       ) ASC NULLS LAST, vec_id ASC
LIMIT 10
""",
)
def q_vector_topk(spark, sf_dir):
    """Brute-force cosine top-10 (pgvector ``<=>`` equivalent,
    ``src/core/vector_store.py:286-301``). Distance rounded to 6 dp in
    the *output* (not the ordering) to absorb engine ulp differences."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = vector_search(emb, QUERY_VEC, limit=10)
    return res.select(
        "vec_id", "label", F.round(F.col("distance"), 6).alias("distance_r")
    )
