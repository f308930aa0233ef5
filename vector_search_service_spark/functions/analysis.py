"""FTS text analysis — the engine's ``to_tsvector`` / ``plainto_tsquery``.

The reference delegates analysis to PostgreSQL: documents get a
``content_tsvector`` column maintained by a DB trigger (referenced at
``src/core/vector_store.py:104-105,144``) and queries go through
``plainto_tsquery('english', :q)`` (``src/core/vector_store.py:222``),
which lowercases, strips punctuation, drops stopwords and AND-combines
the remaining lexemes. The non-negotiable invariant (SURVEY.md §7 risk
2) is that the query-side and document-side analyzers are the *same
function* — this module is that single shared implementation.

Implementation notes:
- Everything here is built-in Catalyst expressions (``lower`` /
  ``split`` / ``filter``): JVM-side, codegen'd, no Python in the per-row
  path. On 100 TB the tokenize+match pipeline stays inside one
  WholeStageCodegen span over the parquet scan.
- Stemming is intentionally OFF in the default analyzer: it cannot be
  mirrored in the DuckDB oracle and the synthetic corpus is unstemmed
  keyword text. A Porter stemmer (pandas-UDF) is available separately in
  ``stemmer.py`` for parity-minded deployments; enabling it keeps the
  F1==F3 invariant because both sides flow through ``analyze_terms`` /
  ``tokens_col``.
- Each Spark expression has a DuckDB-SQL mirror (``sql_*``) so the
  driver's oracle can replay the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A compact, frozen English stopword list (subset of PostgreSQL's english
# stopword file). Frozen because it is part of the on-disk contract: the
# same list is inlined into the oracle SQL, and changing it would change
# stored tsvector-equivalent columns.
STOPWORDS_EN: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Per-language stopword lists (compact, frozen — SURVEY.md §7 risk 2:
# the multilingual `lang` column motivates per-language analyzers; the
# reference is english-only via FTS_LANGUAGE,
# ``src/config/settings.py:21``). Keys follow the corpus lang codes.
STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": (),  # filled below — alias of STOPWORDS_EN
    "es": ("el", "la", "los", "las", "de", "del", "que", "y", "a", "en",
           "un", "una", "es", "no", "por", "con", "para", "su", "se", "lo"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "von", "mit", "auf", "sich", "des", "im", "dem", "es"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "un", "du", "de",
           "en", "que", "qui", "dans", "pour", "pas", "sur", "au", "ce"),
    "zh": (),  # no stopword removal; CJK needs a segmenter upstream
}


def stopwords_for(lang: str) -> tuple[str, ...]:
    if lang == "en":
        return STOPWORDS_EN
    return STOPWORDS_BY_LANG.get(lang, STOPWORDS_EN)


def tokens_for_lang_col(text: Column, lang: Column) -> Column:
    """Per-row language-aware analyzer: stopword list chosen by the
    ``lang`` column (the F3 pipeline, language-dispatched). Unknown
    languages fall back to English."""
    toks = raw_tokens_col(text)

    def _filtered(stops: tuple[str, ...]) -> Column:
        # single-arg lambdas only: arity 2 means (element, index) to
        # Spark's higher-order binder
        if not stops:
            return F.filter(toks, lambda t: t != F.lit(""))
        return F.filter(toks, lambda t: (t != F.lit("")) & ~t.isin(*stops))

    result = _filtered(STOPWORDS_EN)
    for code in sorted(STOPWORDS_BY_LANG):
        result = F.when(lang == code, _filtered(stopwords_for(code))).otherwise(result)
    return result


def sql_tokens_for_lang_expr(text_sql: str, lang_sql: str) -> str:
    raw = f"regexp_split_to_array(lower({text_sql}), '{TOKEN_SPLIT_RE}')"

    def flt(stops: tuple[str, ...]) -> str:
        if not stops:
            return f"list_filter({raw}, t -> t <> '')"
        lst = ", ".join(f"'{s}'" for s in stops)
        return f"list_filter({raw}, t -> t <> '' AND t NOT IN ({lst}))"

    expr = flt(STOPWORDS_EN)
    for code in sorted(STOPWORDS_BY_LANG):
        expr = f"CASE WHEN {lang_sql} = '{code}' THEN {flt(stopwords_for(code))} ELSE {expr} END"
    return expr


def analyze_terms(text: str) -> list[str]:
    """Driver-side analyzer for query strings (F1, ``plainto_tsquery``).

    Byte-identical semantics to :func:`tokens_col` (F3): lowercase,
    split on non-alphanumeric, drop empties and stopwords. Duplicate
    terms are dropped (plainto_tsquery ANDs a *set* of lexemes).
    """
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t and t not in STOPWORDS_EN]
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t, None)
    return list(seen)


def raw_tokens_col(text: Column) -> Column:
    """Lowercased split tokens, no stopword pass — the cheap search-time
    tokenizer. Query-side lexemes (``analyze_terms``) are already
    non-empty non-stopwords, so match/rank over raw tokens is
    *provably identical* to match/rank over stopword-filtered tokens,
    at a fraction of the per-row cost (one split, no set lookups). Use
    this in the search hot path; use :func:`tokens_col` when
    materializing the stored tsvector-equivalent column at ingest."""
    return F.split(F.lower(text), TOKEN_SPLIT_RE)


def tokens_col(text: Column) -> Column:
    """Document-side analyzer (F3, ``to_tsvector`` equivalent):
    ``array<string>`` of normalized lexemes, duplicates preserved (term
    frequency is recoverable; positions are their array indices).
    Stopword removal via ``isin`` compiles to a hash-set InSet, not a
    linear array scan."""
    toks = raw_tokens_col(text)
    return F.filter(toks, lambda t: (t != F.lit("")) & ~t.isin(*STOPWORDS_EN))


def match_all_terms(tokens: Column, terms: list[str]) -> Column:
    """P7 — the ``@@ plainto_tsquery`` predicate: the document must
    contain ALL query lexemes (AND semantics, reference comment at
    ``src/core/vector_store.py:209``). Empty term list matches nothing,
    matching PostgreSQL's empty-tsquery behavior for plainto_tsquery."""
    if not terms:
        return F.lit(False)
    pred = F.lit(True)
    for t in terms:
        pred = pred & F.array_contains(tokens, F.lit(t))
    return pred


def tf_rank_col(tokens: Column, terms: list[str]) -> Column:
    """F2(b) — TF rank with PostgreSQL normalization flag 32.

    ``ts_rank_cd(tsvector, query, 32)`` is a cover-density score mapped
    into (0,1) by ``rank/(rank+1)`` (``src/core/vector_store.py:218``).
    We keep the declared normalization exactly and substitute a
    term-frequency base score (sum of per-term occurrence counts):
    rank-order-equivalent for AND-matched single-field documents, and —
    unlike cover density — expressible in the DuckDB oracle. The
    positional cover-density variant lives in ``ranking.py`` (F2a).

    Integer counting + one final double division keeps the value
    bit-identical across engines (no float accumulation).
    """
    def _count(term: str) -> Column:
        # single-arg lambda: F.filter must see arity 1 (arity 2 means
        # (element, index) to Spark's higher-order function binder)
        return F.size(F.filter(tokens, lambda x: x == F.lit(term)))

    raw = None
    for t in terms:
        c = _count(t)
        raw = c if raw is None else raw + c
    if raw is None:
        raw = F.lit(0)
    rawd = raw.cast("double")
    return rawd / (rawd + F.lit(1.0))


# --- DuckDB oracle mirrors ------------------------------------------------

def _sql_stoplist() -> str:
    return ", ".join(f"'{s}'" for s in STOPWORDS_EN)


def sql_tokens_expr(text_sql: str) -> str:
    """DuckDB expression mirroring :func:`tokens_col`."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_sql}), '{TOKEN_SPLIT_RE}'), "
        f"t -> t <> '' AND t NOT IN ({_sql_stoplist()}))"
    )


def sql_raw_tokens_expr(text_sql: str) -> str:
    """DuckDB expression mirroring :func:`raw_tokens_col`."""
    return f"regexp_split_to_array(lower({text_sql}), '{TOKEN_SPLIT_RE}')"


def sql_match_expr(tokens_sql: str, terms: list[str]) -> str:
    """DuckDB expression mirroring :func:`match_all_terms`."""
    if not terms:
        return "FALSE"
    return " AND ".join(f"list_contains({tokens_sql}, '{t}')" for t in terms)


def sql_tf_rank_expr(tokens_sql: str, terms: list[str]) -> str:
    """DuckDB expression mirroring :func:`tf_rank_col`."""
    if not terms:
        raw = "0"
    else:
        raw = " + ".join(
            f"len(list_filter({tokens_sql}, x -> x = '{t}'))" for t in terms
        )
    return f"(CAST({raw} AS DOUBLE) / (CAST({raw} AS DOUBLE) + 1.0))"


# --- phrase query (PostgreSQL phraseto_tsquery parity) ---------------------
#
# The reference only issues AND queries (plainto_tsquery,
# src/core/vector_store.py:209); phrase search is the public PostgreSQL
# sibling (phraseto_tsquery / the tsquery <-> FOLLOWED-BY operator).
# Adjacency is defined on the VERBATIM token stream — lowercase split,
# empties dropped, stopwords PRESERVED — i.e. the 'simple'-config
# semantics where to_tsvector assigns consecutive positions to every
# token. (The english-config variant keeps stopword GAPS in positions;
# pinning that would make the score depend on the stoplist, which this
# engine deliberately single-sources for the AND path only.)


def phrase_terms(phrase: str) -> list[str]:
    """Driver-side phrase analyzer: the verbatim lowercase token
    SEQUENCE (duplicates and stopwords preserved — adjacency is
    positional, unlike the AND-query term set of
    :func:`analyze_terms`)."""
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t]


def verbatim_tokens_col(text: Column) -> Column:
    """Lowercased non-empty tokens, stopwords preserved — array indices
    are the 'simple'-config tsvector positions the phrase predicate
    matches against."""
    return F.filter(raw_tokens_col(text), lambda t: t != F.lit(""))


def phrase_count_col(words: Column, terms: list[str]) -> Column:
    """Number of positions where ``terms`` occur consecutively in
    ``words`` (the FOLLOWED-BY predicate, counted). Pure higher-order
    functions, no Python. Empty phrase matches nothing (empty-tsquery
    parity).

    Shape matters here: the naive ``filter(sequence(1, n-k+1),
    i -> words[i]=t0 AND …)`` form re-inlines the WHOLE ``words``
    expression tree at every ``element_at`` — Catalyst's
    CollapseProject substitutes the tokenizer into the lambda, so the
    text is re-split O(len·k) times per row (measured 11× slower at
    sf1). Instead we mark term j's hits with ONE reference to
    ``words`` each — ``zip_with`` against the j-shifted slice — so the
    tokenizer evaluates O(k) times per row, independent of document
    length. Trailing positions where the shifted slice is exhausted
    zip as NULL, the AND propagates it, and ``filter`` keeps only
    strict TRUE — which is exactly the "phrase cannot start within
    k-1 of the end" guard (short and empty documents count 0 for
    free)."""
    if not terms:
        return F.lit(0)
    acc = F.transform(words, lambda x: x == F.lit(terms[0]))
    for j, t in enumerate(terms[1:], start=1):
        shifted = F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, x: a & (x == F.lit(t)))
    return F.size(F.filter(acc, lambda b: b))


def sql_verbatim_tokens_expr(text_sql: str) -> str:
    """DuckDB expression mirroring :func:`verbatim_tokens_col`."""
    return f"list_filter({sql_raw_tokens_expr(text_sql)}, t -> t <> '')"


def sql_phrase_count_expr(words_sql: str, terms: list[str]) -> str:
    """DuckDB expression mirroring :func:`phrase_count_col` (1-based
    list indexing on both engines; DuckDB's ``range`` is end-exclusive
    and already empty when the document is shorter than the phrase,
    but the CASE guard is kept for symmetry with the Spark kernel)."""
    if not terms:
        return "0"
    k = len(terms)
    pred = " AND ".join(
        f"{words_sql}[i + {j}] = '{t}'" for j, t in enumerate(terms)
    )
    return (
        f"(CASE WHEN len({words_sql}) >= {k} THEN "
        f"len(list_filter(range(1, len({words_sql}) - {k - 1} + 1), i -> {pred})) "
        f"ELSE 0 END)"
    )
