"""Property-based cross-engine invariants (hypothesis) for the
generated-SQL oracle kernels added in r10: the Porter mirror, the
recursive BPE priority encode, and the recursive cover sweep must
agree with their Python definitions on ARBITRARY inputs, not just the
corpora and seeded batteries the unit tests pin. Small alphabets keep
merges/covers dense (the interesting regime); one DuckDB query per
example keeps the suite fast."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_search_service_spark.functions.bpe import (
    EOW,
    encode_words,
    sql_bpe_encode_ctes,
)
from vector_search_service_spark.functions.ranking import cover_density_score
from vector_search_service_spark.functions.stemmer import (
    porter_stem,
    sql_porter_stem_ctes,
)


@pytest.fixture(scope="module")
def duckcon():
    return duckdb.connect()


words_st = st.text(alphabet="abceyiors0", min_size=1, max_size=14)


@given(st.lists(words_st, min_size=1, max_size=25, unique=True))
@settings(max_examples=40, deadline=None)
def test_porter_sql_matches_python(duckcon, words):
    vals = ", ".join(f"('{w}')" for w in words)
    q = (
        f"WITH vocab AS (SELECT * FROM (VALUES {vals}) v(tok)), "
        f"{sql_porter_stem_ctes('vocab')} SELECT tok, stem FROM stems"
    )
    got = dict(duckcon.sql(q).fetchall())
    assert got == {w: porter_stem(w) for w in words}


# tiny alphabet so random merge tables actually fire, including the
# later-merge-recreates-earlier-pair shapes that gate the batched step
_syms = st.sampled_from(["a", "b", "c", "ab", "ba", "aa", "bb", "abc", EOW])


@given(
    st.lists(st.tuples(_syms, _syms), min_size=1, max_size=8),
    st.lists(st.text(alphabet="abc", min_size=1, max_size=10),
             min_size=1, max_size=12, unique=True),
)
@settings(max_examples=40, deadline=None)
def test_bpe_encode_sql_matches_python(duckcon, merges, words):
    # drop duplicate pairs the way a trained table cannot contain them
    # is NOT assumed — keep them: the SQL takes max(rank) per pair, the
    # Python dict comprehension keeps the last; both must agree
    ranks = {p: i for i, p in enumerate(merges)}
    expected = {w: encode_words([w], ranks) for w in words}
    mvals = ", ".join(
        f"({i}, '{l}', '{r}')" for i, (l, r) in enumerate(merges)
    )
    wvals = ", ".join(f"('{w}')" for w in words)
    q = (
        f"WITH RECURSIVE ranks0 AS (SELECT rank, l, r FROM (VALUES {mvals}) m(rank, l, r)), "
        f"ranks AS (SELECT l, r, max(rank) AS rank FROM ranks0 GROUP BY l, r), "
        f"words0 AS (SELECT word FROM (VALUES {wvals}) w(word)), "
        f"{sql_bpe_encode_ctes('words0')} "
        "SELECT word, sl FROM enc WHERE kind = 'd'"
    )
    got = {w: list(sl) for w, sl in duckcon.sql(q).fetchall()}
    assert got == expected


@given(st.lists(
    st.lists(st.sampled_from(["hash", "join", "merge", "x", "y"]),
             min_size=0, max_size=30),
    min_size=1, max_size=10,
))
@settings(max_examples=40, deadline=None)
def test_cover_sql_matches_python(duckcon, docs):
    from vector_search_service_spark.functions.ranking import sql_cover_rank_oracle

    terms = ["hash", "join", "merge"]
    vals = ", ".join(
        f"({i}, '{' '.join(toks)}', 'en', 's')" for i, toks in enumerate(docs)
    )
    duckcon.sql("DROP VIEW IF EXISTS documents")
    duckcon.sql(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
        "v(doc_id, text, lang, source)"
    )
    try:
        got = {
            r[0]: r[3]
            for r in duckcon.sql(
                sql_cover_rank_oracle("hash join merge", limit=1000)
            ).fetchall()
        }
    finally:
        duckcon.sql("DROP VIEW documents")
    expected = {}
    for i, toks in enumerate(docs):
        if all(t in toks for t in terms):
            s = cover_density_score(toks, terms)
            expected[i] = round(s / (s + 1.0), 6)
    assert got == expected
