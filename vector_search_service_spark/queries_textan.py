"""Registry entries — text-analysis suite (language ID, quality
scoring, token counting, fingerprinting) over ``documents``."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import sql_words_expr, words_col
from .operators.textquality import (
    fingerprint_summary,
    lang_id_col,
    quality_score_col,
    sql_fingerprint_summary_exprs,
    sql_lang_id_expr,
    sql_quality_score_expr,
    sql_token_counts_exprs,
    token_counts,
)
from .registry import register
from .sources.tables import load_table

_WORDS = sql_words_expr("text")


@register(
    "lang_id",
    survey_ref="extension: language ID (FTS_LANGUAGE analyzers motivation, SURVEY §7 risk 2)",
    tags=("textan",),
    oracle=f"""
SELECT {sql_lang_id_expr(_WORDS)} AS predicted_lang, lang,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2 ORDER BY predicted_lang, lang
""",
)
def q_lang_id(spark, sf_dir):
    """Marker-token language ID (n-gram-heuristic family), confusion
    counts against the corpus ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(lang_id_col(words_col(F.col("text"))).alias("predicted_lang"), "lang")
        .groupBy("predicted_lang", "lang").agg(F.count("*").alias("n"))
        .orderBy("predicted_lang", "lang")
    )


@register(
    "quality_score",
    survey_ref="extension: quality scoring",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, round({sql_quality_score_expr('text', _WORDS)}, 6) AS quality_r
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_quality_score(spark, sf_dir):
    """Composite quality score (length / type-token ratio / alnum
    cleanliness) — integer-count ratios, engine-identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score_col(F.col("text"), words_col(F.col("text")))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", F.round(q, 6).alias("quality_r"))
    )


_WS_SQL, _BPE_SQL = sql_token_counts_exprs("text")


@register(
    "token_count",
    survey_ref="A5 (extension: tokenizer-aware counting)",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, {_WS_SQL} AS ws_tokens, {_BPE_SQL} AS bpe_tokens
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    ws, bpe = token_counts(F.col("text"))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
    )


_FP_N, _FP_MIN, _FP_MAX = sql_fingerprint_summary_exprs("text")


@register(
    "doc_fingerprint",
    survey_ref="G2 (extension: content-defined fingerprinting)",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, {_FP_N} AS fp_count, {_FP_MIN} AS fp_min, {_FP_MAX} AS fp_max
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Mod-16 sampled shingle-hash fingerprints (winnowing-lite),
    summarized per document — the alignment-robust near-dup /
    provenance signature."""
    docs = load_table(spark, sf_dir, "documents")
    n, lo, hi = fingerprint_summary(F.col("text"))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", n.alias("fp_count"), lo.alias("fp_min"), hi.alias("fp_max"))
    )
