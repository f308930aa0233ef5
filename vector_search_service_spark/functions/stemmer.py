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

# Steps 2-4 rule tables — the ONE copy both engines are generated
# from: porter_stem iterates these, and the DuckDB SQL mirror below
# compiles them into its CASE ladders. First-endswith-match-wins in
# tuple order (Porter's `break`), so order is part of the contract.
_STEP2_RULES = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3_RULES = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


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
    for suf, repl in _STEP2_RULES:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + repl
            break

    # step 3 (m > 0)
    for suf, repl in _STEP3_RULES:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + repl
            break

    # step 4 (m > 1)
    for suf in _STEP4_SUFFIXES:
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


# per-worker-process stem memo: token occurrences are Zipf-distributed
# (the corpus re-uses a small vocabulary millions of times), so caching
# tok -> stem turns the per-OCCURRENCE rule ladder into a per-VOCAB one
# — measured 14.1 -> 1.9 s engine-only at sf1, bit-identical output.
# Size-capped, never evicting (a 100 TB vocabulary is Heaps-law
# unbounded; past the cap new tokens just compute directly).
_STEM_MEMO: dict[str, str] = {}
_STEM_MEMO_CAP = 1 << 20


def _stem_memo(t: str) -> str:
    s = _STEM_MEMO.get(t)
    if s is None:
        s = porter_stem(t)
        if len(_STEM_MEMO) < _STEM_MEMO_CAP:
            _STEM_MEMO[t] = s
    return s


@F.pandas_udf(T.ArrayType(T.StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Document-side (stored lexeme) stemming — the F3 side; the SAME
    ``porter_stem`` as the query side (memoized per vocabulary word)."""
    # elements arrive as numpy arrays — no truthiness, check None
    return tokens.map(
        lambda ts: [] if ts is None else [_stem_memo(t) for t in ts]
    )


# --- DuckDB oracle mirror ---------------------------------------------------
#
# ``porter_stem`` re-derived as *generated DuckDB SQL* so the stemmed
# FTS path gets a real value-level oracle (the sandbox has no network,
# so DuckDB's fts extension / ``stem()`` cannot load — and its Snowball
# variant would not be bit-faithful to the 1980 paper anyway).
#
# The one non-trivial primitive is Porter's consonant/vowel
# classification (y is a consonant at position 0 or after a vowel).
# That rule is left-to-right *causal*, so the classification string of
# any PREFIX of a word is the prefix of the word's classification
# string — which lets every measure()/has_vowel()/cvc() test in the
# rule ladder read substrings of ONE ``list_reduce`` fold per step
# instead of re-deriving context. measure(m) of a stem is then just
# the count of maximal 'v+c+' runs in its classification prefix.
#
# Each algorithm step is one CTE over the vocabulary (steps chain w ->
# w'), mirroring the Python rule ladder above clause for clause —
# including the first-endswith-match-wins `break` (a WHEN arm whose
# measure test fails still consumes the word unchanged). Bit-parity vs
# ``porter_stem`` is pinned in tests/test_stemmer.py over the corpus
# vocabulary, the canonical vectors, and a seeded random-word battery
# (y-chains, digit tokens, bare suffixes).

def _sql_cl(w: str) -> str:
    """Classification string of word expr ``w`` ('v'/'c' per char)."""
    return (
        f"list_reduce(list_prepend('', str_split({w}, '')), "
        "(acc, x) -> acc || (CASE WHEN x IN ('a','e','i','o','u') THEN 'v' "
        "WHEN x = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' "
        "THEN 'c' ELSE 'v' END) ELSE 'c' END))"
    )


def _sql_m(cl: str, n: str) -> str:
    """measure() of the length-``n`` prefix (count of VC groups)."""
    return f"length(regexp_extract_all(left({cl}, {n}), 'v+c+'))"


def _sql_hasv(cl: str, n: str) -> str:
    return f"contains(left({cl}, {n}), 'v')"


def _sql_dbl(w: str, cl: str) -> str:
    """word ends in a double consonant."""
    return (
        f"(length({w}) >= 2 AND right({w}, 1) = substr({w}, length({w}) - 1, 1) "
        f"AND right({cl}, 1) = 'c')"
    )


def _sql_cvc(w: str, cl: str) -> str:
    """word ends cons-vowel-cons, final char not in wxy."""
    return (
        f"(length({w}) >= 3 AND right({cl}, 3) = 'cvc' "
        f"AND right({w}, 1) NOT IN ('w', 'x', 'y'))"
    )


def _sql_rule_case(rules, min_m: int) -> str:
    """Steps 2-4: first-endswith-match-wins suffix ladder."""
    whens = []
    for suf, repl in rules:
        k = len(suf)
        strip = f"left(w, length(w) - {k})"
        cond = f"{_sql_m('cl', f'length(w) - {k}')} > {min_m}"
        if suf == "ion":
            # Porter: -ion only strips after s/t (stem's last char);
            # length guard keeps substr() off position 0 for w='ion'
            cond = (
                f"(length(w) >= 4 AND substr(w, length(w) - 3, 1) IN ('s', 't') "
                f"AND {cond})"
            )
        new = strip if not repl else f"{strip} || '{repl}'"
        whens.append(
            f"WHEN ends_with(w, '{suf}') THEN (CASE WHEN {cond} THEN {new} ELSE w END)"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def sql_porter_stem_ctes(vocab_cte: str) -> str:
    """CTE chain ``p0 .. stems``: maps ``{vocab_cte}(tok)`` to
    ``stems(tok, stem)`` with ``stem = porter_stem(tok)`` bit-exactly.
    Splice into a query as ``WITH <vocab>, {sql_porter_stem_ctes(...)},
    <consumers>``."""
    cl = _sql_cl("w")
    s1a = """CASE WHEN ends_with(w, 'sses') THEN left(w, length(w) - 2)
         WHEN ends_with(w, 'ies') THEN left(w, length(w) - 2)
         WHEN ends_with(w, 'ss') THEN w
         WHEN ends_with(w, 's') THEN left(w, length(w) - 1)
         ELSE w END"""
    pre = f"""CASE WHEN ends_with(w, 'eed') THEN
           (CASE WHEN {_sql_m('cl', 'length(w) - 3')} > 0 THEN left(w, length(w) - 1) ELSE w END)
         WHEN ends_with(w, 'ed') AND {_sql_hasv('cl', 'length(w) - 2')} THEN left(w, length(w) - 2)
         WHEN ends_with(w, 'ing') AND {_sql_hasv('cl', 'length(w) - 3')} THEN left(w, length(w) - 3)
         ELSE w END"""
    fix = f"""(NOT ends_with(w, 'eed')) AND
          ((ends_with(w, 'ed') AND {_sql_hasv('cl', 'length(w) - 2')})
           OR (ends_with(w, 'ing') AND {_sql_hasv('cl', 'length(w) - 3')}))"""
    clp = _sql_cl("pre")
    s1b = f"""CASE WHEN NOT fix THEN pre
         WHEN ends_with(pre, 'at') OR ends_with(pre, 'bl') OR ends_with(pre, 'iz') THEN pre || 'e'
         WHEN {_sql_dbl('pre', 'clp')} AND right(pre, 1) NOT IN ('l', 's', 'z') THEN left(pre, length(pre) - 1)
         WHEN length(regexp_extract_all(clp, 'v+c+')) = 1 AND {_sql_cvc('pre', 'clp')} THEN pre || 'e'
         ELSE pre END"""
    s1c = f"""CASE WHEN ends_with(w, 'y') AND {_sql_hasv('cl', 'length(w) - 1')}
         THEN left(w, length(w) - 1) || 'i' ELSE w END"""
    s2 = _sql_rule_case(_STEP2_RULES, 0)
    s3 = _sql_rule_case(_STEP3_RULES, 0)
    s4 = _sql_rule_case([(s, "") for s in _STEP4_SUFFIXES], 1)
    # cvc of w[:-1]: classification chars len-3..len-1 of cl, last stem
    # char is w[len-1]
    cvc_pref = (
        "(length(w) - 1 >= 3 AND substr(cl, length(w) - 3, 3) = 'cvc' "
        "AND substr(w, length(w) - 1, 1) NOT IN ('w', 'x', 'y'))"
    )
    s5a = f"""CASE WHEN ends_with(w, 'e') AND
           ({_sql_m('cl', 'length(w) - 1')} > 1
            OR ({_sql_m('cl', 'length(w) - 1')} = 1 AND NOT {cvc_pref}))
         THEN left(w, length(w) - 1) ELSE w END"""
    s5b = f"""CASE WHEN length(regexp_extract_all(cl, 'v+c+')) > 1
           AND {_sql_dbl('w', 'cl')} AND ends_with(w, 'l')
         THEN left(w, length(w) - 1) ELSE w END"""
    return f"""
p0 AS (SELECT tok, lower(tok) AS w FROM {vocab_cte}),
p1a AS (SELECT tok, {s1a} AS w FROM p0),
p1b_pre AS (SELECT tok, w, {cl} AS cl FROM p1a),
p1b_mid AS (SELECT tok, {pre} AS pre, ({fix}) AS fix FROM p1b_pre),
p1b_cl AS (SELECT tok, pre, fix, {clp} AS clp FROM p1b_mid),
p1b AS (SELECT tok, {s1b} AS w FROM p1b_cl),
p1c_cl AS (SELECT tok, w, {cl} AS cl FROM p1b),
p1c AS (SELECT tok, {s1c} AS w FROM p1c_cl),
p2_cl AS (SELECT tok, w, {cl} AS cl FROM p1c),
p2 AS (SELECT tok, {s2} AS w FROM p2_cl),
p3_cl AS (SELECT tok, w, {cl} AS cl FROM p2),
p3 AS (SELECT tok, {s3} AS w FROM p3_cl),
p4_cl AS (SELECT tok, w, {cl} AS cl FROM p3),
p4 AS (SELECT tok, {s4} AS w FROM p4_cl),
p5a_cl AS (SELECT tok, w, {cl} AS cl FROM p4),
p5a AS (SELECT tok, {s5a} AS w FROM p5a_cl),
p5b_cl AS (SELECT tok, w, {cl} AS cl FROM p5a),
p5b AS (SELECT tok, {s5b} AS w FROM p5b_cl),
stems AS (SELECT tok, CASE WHEN length(tok) <= 2 THEN lower(tok) ELSE w END AS stem FROM p5b)
""".strip()


def sql_stemmed_fts_oracle(query: str, *, limit: int = 10) -> str:
    """Full DuckDB oracle for :func:`fts_search_stemmed` over the
    ``documents`` view: stems the corpus vocabulary (and the query
    terms) with :func:`sql_porter_stem_ctes`, AND-matches all query
    stems, ranks by raw/(raw+1) over summed stem counts. The query is
    analyzed driver-side (the F1 analyzer is a driver literal in both
    engines) but stemmed IN SQL — the oracle shares no stemming code
    with the Spark path."""
    from .analysis import TOKEN_SPLIT_RE, analyze_terms

    terms = analyze_terms(query)
    if not terms:  # empty tsquery matches nothing
        return "SELECT NULL::BIGINT AS doc_id, NULL::VARCHAR AS lang, NULL::VARCHAR AS source, NULL::DOUBLE AS rank_r WHERE FALSE"
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH rawtok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS tok
  FROM documents
),
qterm AS (SELECT tok FROM (VALUES {qvals}) v(tok)),
vocab AS (
  SELECT DISTINCT tok
  FROM (SELECT tok FROM rawtok UNION ALL SELECT tok FROM qterm)
),
{sql_porter_stem_ctes('vocab')},
qstem AS (SELECT DISTINCT s.stem FROM qterm q JOIN stems s USING (tok)),
counts AS (
  SELECT r.doc_id, s.stem, count(*) AS c
  FROM rawtok r JOIN stems s USING (tok) JOIN qstem q USING (stem)
  GROUP BY r.doc_id, s.stem
),
matched AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS raw
  FROM counts GROUP BY doc_id
  HAVING count(*) = (SELECT count(*) FROM qstem)
)
SELECT d.doc_id, d.lang, d.source,
       round(CAST(m.raw AS DOUBLE) / (CAST(m.raw AS DOUBLE) + 1.0), 6) AS rank_r
FROM matched m JOIN documents d USING (doc_id)
ORDER BY m.raw DESC, d.doc_id ASC
LIMIT {limit}
"""


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
