"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Not present in the reference (whose text analysis stops at content-type
/ title heuristics, ``src/core/document_processor.py:152-212``); these
are the standard corpus-curation passes, all as codegen'd expressions
(zero Python per row) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import shingles_col, sql_shingles_expr, sql_words_expr, words_col

# --- language ID: marker-token voting -------------------------------------
# Deliberately tiny, frozen marker sets (function-word lists). Score =
# number of DISTINCT marker tokens present; prediction = argmax with a
# fixed priority order on ties (en > es > de > fr > zh), 'und' when all
# scores are 0.

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "les", "des", "et", "est", "une"),
    "zh": ("de0", "shi4", "bu4", "le0", "wo3", "ni3"),  # romanized stand-ins
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")


def lang_scores(words: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.array_intersect(
            F.array_distinct(words), F.array(*[F.lit(m) for m in marks])
        ))
        for lang, marks in LANG_MARKERS.items()
    }


def lang_id_col(words: Column) -> Column:
    """Argmax with fixed priority: a language wins only if strictly
    greater than every earlier language's score."""
    s = lang_scores(words)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in _LANG_ORDER:
        is_better = s[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s[lang]).otherwise(best_score)
    return best_lang


def sql_lang_id_expr(words: str) -> str:
    score = {
        lang: (
            f"len(list_intersect(list_distinct({words}), "
            f"[{', '.join(repr(m) for m in marks)}]))"
        )
        for lang, marks in LANG_MARKERS.items()
    }
    expr_lang, expr_score = "'und'", "0"
    for lang in _LANG_ORDER:
        cond = f"{score[lang]} > ({expr_score})"
        expr_lang = f"CASE WHEN {cond} THEN '{lang}' ELSE ({expr_lang}) END"
        expr_score = f"CASE WHEN {cond} THEN {score[lang]} ELSE ({expr_score}) END"
    return expr_lang


# --- quality scoring -------------------------------------------------------
# score = 0.4·min(1, words/100) + 0.3·type_token_ratio
#       + 0.3·(1 − nonalnum_chars/chars); every term is an
# integer-count ratio, so the double arithmetic is identical in both
# engines (one expression, fixed evaluation order).


def quality_score_col(text: Column, words: Column) -> Column:
    n_words = F.size(words).cast("double")
    n_distinct = F.size(F.array_distinct(words)).cast("double")
    n_chars = F.length(text).cast("double")
    n_alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).cast("double")
    length_term = F.least(F.lit(1.0), n_words / F.lit(100.0))
    ttr = F.when(n_words > 0, n_distinct / n_words).otherwise(F.lit(0.0))
    clean = F.when(n_chars > 0, n_alnum / n_chars).otherwise(F.lit(0.0))
    return F.lit(0.4) * length_term + F.lit(0.3) * ttr + F.lit(0.3) * clean


def sql_quality_score_expr(text: str, words: str) -> str:
    n_words = f"CAST(len({words}) AS DOUBLE)"
    n_distinct = f"CAST(len(list_distinct({words})) AS DOUBLE)"
    n_chars = f"CAST(length({text}) AS DOUBLE)"
    n_alnum = f"CAST(length(regexp_replace(lower({text}), '[^a-z0-9]', '', 'g')) AS DOUBLE)"
    return (
        f"(0.4 * least(1.0, {n_words} / 100.0) "
        f"+ 0.3 * (CASE WHEN {n_words} > 0 THEN {n_distinct} / {n_words} ELSE 0.0 END) "
        f"+ 0.3 * (CASE WHEN {n_chars} > 0 THEN {n_alnum} / {n_chars} ELSE 0.0 END))"
    )


# --- token counting --------------------------------------------------------
# whitespace tokens + a BPE-ish segmentation (alnum runs and single
# non-alnum-non-space chars each count as one token).

_BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"


def token_counts(text: Column) -> tuple[Column, Column]:
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.lower(text), F.lit(_BPE_RE), 0))
    return ws.cast("long"), bpe.cast("long")


def sql_token_counts_exprs(text: str) -> tuple[str, str]:
    ws = f"CAST(len(list_filter(regexp_split_to_array({text}, '\\s+'), t -> t <> '')) AS BIGINT)"
    bpe = f"CAST(len(regexp_extract_all(lower({text}), '{_BPE_RE}')) AS BIGINT)"
    return ws, bpe


# --- document fingerprinting ----------------------------------------------
# Mod-p sampled shingle hashes (winnowing-lite): keep shingle md5s
# whose first hex digit is '0' (1/16 sampling) — a content-defined,
# alignment-robust fingerprint set; summarized per doc.


def fingerprint_summary(text: Column) -> tuple[Column, Column, Column]:
    hashes = F.transform(shingles_col(words_col(text)), lambda s: F.md5(s))
    sampled = F.filter(hashes, lambda h: h.startswith("0"))
    return (
        F.size(sampled).cast("long"),
        F.array_min(sampled),
        F.array_max(sampled),
    )


def sql_fingerprint_summary_exprs(text: str) -> tuple[str, str, str]:
    words = sql_words_expr(text)
    sampled = (
        f"list_filter(list_transform({sql_shingles_expr(words)}, s -> md5(s)), "
        "h -> starts_with(h, '0'))"
    )
    return (
        f"CAST(len({sampled}) AS BIGINT)",
        f"list_min({sampled})",
        f"list_max({sampled})",
    )
