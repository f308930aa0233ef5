"""Porter stemmer (original 1980 algorithm) — the stemming stage of
PostgreSQL's ``english`` FTS dictionary chain (SURVEY.md §7 risk 2:
"stemming differences change match sets").

Pure-Python implementation of the published algorithm (Porter, "An
algorithm for suffix stripping", Program 14(3), 1980). OFF in the
default analyzer (the DuckDB oracle cannot mirror it and the synthetic
corpus is unstemmed); deployments wanting PostgreSQL-equivalent recall
enable it via ``fts_search_stemmed`` — query side and document side
flow through the SAME function, preserving the F1==F3 invariant.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m in [C](VC){m}[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:  # noqa: PLR0912, PLR0915 — the algorithm is a rule ladder
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _step1b_fixup(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _step1b_fixup(w)

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0)
    for suf, repl in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + repl
            break

    # step 3 (m > 0)
    for suf, repl in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + repl
            break

    # step 4 (m > 1)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not (stem.endswith("s") or stem.endswith("t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _step1b_fixup(w: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
        return w[:-1]
    if _measure(w) == 1 and _cvc(w):
        return w + "e"
    return w


def stem_terms(terms: list[str]) -> list[str]:
    """Driver-side (query) stemming — the F1 side."""
    seen: dict[str, None] = {}
    for t in terms:
        seen.setdefault(porter_stem(t), None)
    return list(seen)


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Document-side (stored lexeme) stemming — the F3 side; the SAME
    ``porter_stem`` as the query side."""
    # elements arrive as numpy arrays — no truthiness, check None
    return tokens.map(
        lambda ts: [] if ts is None else [porter_stem(t) for t in ts]
    )


def fts_search_stemmed(documents, query: str, *, limit: int = 10,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Stemmed FTS: both sides stemmed by ``porter_stem`` (F1 == F3
    under stemming). Match/rank semantics identical to ``fts_search``."""
    from ..functions.analysis import analyze_terms, match_all_terms, raw_tokens_col, tf_rank_col

    terms = stem_terms(analyze_terms(query))
    toks = stem_tokens_udf(raw_tokens_col(F.col(text_col)))
    return (
        documents.filter(match_all_terms(toks, terms))
        .withColumn("rank", tf_rank_col(toks, terms))
        .orderBy(F.col("rank").desc(), F.col(id_col).asc())
        .limit(limit)
    )
