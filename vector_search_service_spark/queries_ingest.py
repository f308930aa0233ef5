"""Registry entries for the ingestion pipeline (SURVEY.md §2.8, §3.2).

The synthetic ``documents.text`` is whitespace-flat keyword soup, so
where an operator's interesting behavior needs richer input (newlines,
markdown headers, html), both engines construct the SAME enriched
content from the table deterministically — the operator under test is
still the engine's, the construction is shared scaffolding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.text import (
    content_type_col,
    preprocess_col,
    sql_content_type_expr,
    sql_preprocess_expr,
    sql_title_expr,
    sql_validation_error_expr,
    title_col,
    validation_error_col,
)
from .operators.chunker import chunk_documents
from .registry import register
from .sources.tables import load_table

# shared scaffolding: deterministic enriched content variants
_SQL_ENRICHED = (
    "CASE doc_id % 4 "
    "WHEN 0 THEN 'def main():' || chr(10) || text "
    "WHEN 1 THEN '# Heading ' || substr(text, 1, 20) || chr(10) || text "
    "WHEN 2 THEN '<div><title> T' || substr(text, 1, 10) || ' </title></div>' || chr(10) || text "
    "ELSE substr(text, 1, 80) || '.' || chr(10) || text END"
)


def _enriched_col():
    t = F.col("text")
    return (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("def main():\n"), t))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("# Heading "), F.substring(t, 1, 20), F.lit("\n"), t))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("<div><title> T"), F.substring(t, 1, 10),
                       F.lit(" </title></div>\n"), t))
        .otherwise(F.concat(F.substring(t, 1, 80), F.lit(".\n"), t))
    )


@register(
    "doc_preprocess",
    survey_ref="G1",
    tags=("ingest",),
    oracle=f"""
SELECT doc_id,
       {sql_preprocess_expr("('  ' || replace(text, ' ', chr(10) || chr(9)) || '  ')")} AS clean
FROM documents ORDER BY doc_id LIMIT 200
""",
)
def q_doc_preprocess(spark, sf_dir):
    """G1 preprocessing (``src/core/document_processor.py:240-253``):
    whitespace-run collapse (destroys newlines — reference order kept)
    then C0 control removal, on whitespace-enriched input."""
    docs = load_table(spark, sf_dir, "documents")
    messy = F.concat(F.lit("  "), F.regexp_replace(F.col("text"), " ", "\n\t"), F.lit("  "))
    return (
        docs.orderBy("doc_id").limit(200)
        .select("doc_id", preprocess_col(messy).alias("clean"))
    )


@register(
    "content_type_detect",
    survey_ref="G4",
    tags=("ingest",),
    oracle=f"""
SELECT {sql_content_type_expr(_SQL_ENRICHED)} AS content_type,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1 ORDER BY content_type
""",
)
def q_content_type_detect(spark, sf_dir):
    """G4 content-type heuristics
    (``src/core/document_processor.py:152-185``) over enriched
    variants; priority order code > markdown > html > text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(content_type_col(_enriched_col()).alias("content_type"))
        .groupBy("content_type").agg(F.count("*").alias("n"))
        .orderBy("content_type")
    )


@register(
    "title_extract",
    survey_ref="G5",
    tags=("ingest",),
    oracle=f"""
SELECT doc_id, {sql_title_expr(_SQL_ENRICHED)} AS title
FROM documents ORDER BY doc_id LIMIT 200
""",
)
def q_title_extract(spark, sf_dir):
    """G5 title extraction
    (``src/core/document_processor.py:187-212``): markdown heading →
    <title> tag → first-line heuristic, NULL otherwise."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.orderBy("doc_id").limit(200)
        .select("doc_id", title_col(_enriched_col()).alias("title"))
    )


@register(
    "validation_flags",
    survey_ref="P10",
    tags=("ingest",),
    oracle=f"""
WITH v AS (
  SELECT CASE WHEN doc_id % 7 = 0 THEN '   ' ELSE text END AS c FROM documents
)
SELECT {sql_validation_error_expr('c')} AS error, CAST(count(*) AS BIGINT) AS n
FROM v GROUP BY 1 ORDER BY error NULLS FIRST
""",
)
def q_validation_flags(spark, sf_dir):
    """P10 validation predicate
    (``src/core/document_processor.py:214-238``) as a side-output
    router: NULL = accepted, else rejection reason."""
    docs = load_table(spark, sf_dir, "documents")
    c = F.when(F.col("doc_id") % 7 == 0, F.lit("   ")).otherwise(F.col("text"))
    return (
        docs.select(validation_error_col(c).alias("error"))
        .groupBy("error").agg(F.count("*").alias("n"))
        .orderBy(F.col("error").asc_nulls_first())
    )


# --- G3: the chunker, oracle-checked against an independent SQL
# implementation of the same loop (recursive CTE). chunk_size=120,
# overlap=30 so the sf docs produce multi-chunk output. ---------------------

_CHUNK_SIZE, _CHUNK_OVERLAP = 120, 30
_BOUNDARY_IN = "(' ', chr(10), chr(9), '.', ',', ';', ':', '!', '?')"


def _sql_chunk_end(s: str) -> str:
    """end for window starting at s: min(s+size, n), snapped back to
    just after the nearest boundary char scanning indices
    [max(0,e0-100)+1 .. e0] (0-based), exactly the reference window."""
    e0 = f"least({s} + {_CHUNK_SIZE}, n)"
    found = (
        f"list_max(list_filter(range(greatest(0, {e0} - 100) + 1, {e0} + 1), "
        f"i -> substr(t, i + 1, 1) IN {_BOUNDARY_IN}))"
    )
    return f"CASE WHEN {e0} < n THEN coalesce({found} + 1, {e0}) ELSE {e0} END"


@register(
    "chunker_windows",
    survey_ref="G3",
    tags=("ingest", "headline"),
    oracle=f"""
WITH RECURSIVE st AS (
  SELECT doc_id, text AS t, length(text) AS n, 0 AS s
  FROM documents WHERE trim(text) <> ''
  UNION ALL
  SELECT doc_id, t, n, e - {_CHUNK_OVERLAP} AS s
  FROM (SELECT doc_id, t, n, s, {_sql_chunk_end('s')} AS e FROM st)
  WHERE e < n AND e - {_CHUNK_OVERLAP} > s
),
w AS (
  SELECT doc_id, s, {_sql_chunk_end('s')} AS e, t, n FROM st
),
pieces AS (
  SELECT doc_id, s AS start_char, e AS end_char,
         trim(substr(t, s + 1, e - s)) AS content, n
  FROM w
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_char) - 1 AS INT) AS chunk_index,
       CAST(start_char AS INT) AS start_char,
       CAST(end_char AS INT) AS end_char,
       CAST(length(content) AS INT) AS chunk_size,
       content,
       (end_char >= n) AS is_last_chunk
FROM pieces WHERE content <> ''
ORDER BY doc_id, chunk_index
""",
)
def q_chunker_windows(spark, sf_dir):
    """G3 chunk-with-overlap (``src/core/document_processor.py:48-136``)
    over the corpus at size=120/overlap=30, verified against an
    independent recursive-CTE implementation of the same observable
    semantics (window math, boundary snap incl. the at-end quirk,
    strip-and-drop, index renumbering)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, text_col="text", id_col="doc_id",
        chunk_size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP,
    )
    return (
        chunks.select(
            "doc_id", "chunk_index", "start_char", "end_char",
            "chunk_size", "content", "is_last_chunk",
        )
        .orderBy("doc_id", "chunk_index")
    )
