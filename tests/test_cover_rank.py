"""F2a cover-density semantics pinned against PostgreSQL's published
``calc_rank_cd`` algorithm (VERDICT r1 #7).

Two independent anchors give the engine's claim external teeth:

1. ``_pg_rank_cd`` below is a from-scratch transcription of
   ``src/backend/utils/adt/tsrank.c`` — the ``Cover()`` loop (forward
   scan to the first extent containing every term, backward shrink to
   the minimal one, restart after the extent's begin) and the
   per-cover ``Cpos / (1 + nNoise)`` accumulation — deliberately a
   DIFFERENT enumeration strategy than the engine's single-pass sweep.
2. Literal anchor values PostgreSQL itself produces for canonical
   inputs (``SELECT ts_rank_cd(to_tsvector('simple', doc),
   to_tsquery('simple', q))``): adjacent pair 0.1, one noise word
   between 0.05, lone term 0.1.
"""

from __future__ import annotations

import pytest

from vector_search_service_spark.functions.ranking import (
    cover_density_score,
    fts_cover_search,
)


def _pg_rank_cd(tokens: list[str], terms: list[str]) -> float:
    """tsrank.c calc_rank_cd, unlabeled/unweighted: Cover() emits
    minimal extents; each adds Cpos/(1+nNoise), Cpos = 0.1 with every
    entry at default weight D."""
    term_set = set(terms)
    entries = [(i, t) for i, t in enumerate(tokens) if t in term_set]
    if not term_set or not entries:
        return 0.0

    def cover(from_entry: int):
        # forward: first entry index at which every term has been seen
        seen: dict[str, int] = {}
        for j in range(from_entry, len(entries)):
            seen[entries[j][1]] = j
            if len(seen) == len(term_set):
                end = j
                # backward shrink: latest entry per term inside [.., end]
                begin = min(seen.values())
                return begin, end
        return None

    score = 0.0
    at = 0
    while True:
        ext = cover(at)
        if ext is None:
            return score
        begin, end = ext
        p, q = entries[begin][0], entries[end][0]
        n_entries = end - begin + 1
        cpos = n_entries / (n_entries / 0.1)  # all weights D=0.1
        n_noise = (q - p) - (end - begin)
        if n_noise < 0:
            n_noise = (end - begin) // 2
        score += cpos / (1 + n_noise)
        at = begin + 1  # tsrank.c: restart after the cover's begin


# PostgreSQL's own outputs for these inputs (ts_rank_cd, no flags)
PG_ANCHORS = [
    ("a b", "a b", 0.1),
    ("a x b", "a b", 0.05),
    ("a", "a", 0.1),
    ("a b a", "a", 0.2),
    ("a x x x b", "a b", 0.1 / 4),
    ("a b a b", "a b", 0.3),
    ("x y z", "a", 0.0),
]


@pytest.mark.parametrize("doc,query,expected", PG_ANCHORS)
def test_engine_matches_pg_anchor_values(doc, query, expected):
    got = cover_density_score(doc.split(), query.split())
    assert got == pytest.approx(expected, abs=1e-9)


def test_engine_matches_transcribed_tsrank_on_corpus():
    """Sweep vs transcribed Cover() on a generated corpus: exact value
    agreement, hence exact rank-order agreement."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "x", "y"]
    for n_terms, size in itertools.product((1, 2, 3), (1, 4, 9, 15)):
        terms = vocab[:n_terms]
        for _ in range(40):
            doc = [rng.choice(vocab) for _ in range(size)]
            got = cover_density_score(doc, terms)
            want = _pg_rank_cd(doc, terms)
            assert got == pytest.approx(want, abs=1e-12), (doc, terms)


def test_proximity_orders_above_spread(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gap gap gap gap"),          # adjacent
            (2, "alpha gap gap gap gap beta"),          # spread
            (3, "alpha beta alpha beta gap gap"),       # two adjacent covers
            (4, "alpha only here"),                     # no match
        ],
        "doc_id long, text string",
    )
    got = fts_cover_search(docs, "alpha beta", limit=10).select("doc_id", "rank_cd").collect()
    ids = [r["doc_id"] for r in got]
    assert ids == [3, 1, 2]  # more covers > adjacent > spread; no-match absent
    ranks = {r["doc_id"]: r["rank_cd"] for r in got}
    assert 0 < ranks[2] < ranks[1] < ranks[3] < 1  # flag-32 keeps scores in (0,1)


def test_match_set_identical_to_tf_rank(spark):
    from vector_search_service_spark.operators.search import fts_search
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    q = "hash join merge"
    tf_ids = {r["doc_id"] for r in fts_search(docs, q, limit=10**6).collect()}
    cd_ids = {r["doc_id"] for r in fts_cover_search(docs, q, limit=10**6).collect()}
    assert tf_ids == cd_ids  # P7 AND-match is rank-independent


def test_sql_cover_oracle_matches_sweep_on_adversarial_docs():
    """The recursive-CTE oracle (fts_cover_topk's value check) must
    reproduce cover_density_score per document on crafted sequences
    exercising the sweep's state machine: cover consumption then
    re-cover, repeated terms updating `latest`, noise runs, covers
    back-to-back sharing no entries, and docs with many covers."""
    import duckdb

    from vector_search_service_spark.functions.analysis import analyze_terms
    from vector_search_service_spark.functions.ranking import (
        cover_density_score,
        sql_cover_rank_oracle,
    )

    terms = analyze_terms("hash join merge")
    texts = [
        "hash join merge",                                  # adjacent cover
        "hash x join y merge",                              # noise inside
        "hash join merge hash join merge",                  # two covers
        "hash hash join join merge merge",                  # latest-updates
        "merge join hash merge join hash",                  # reversed orders
        "hash x x x join x x merge x hash join merge",      # mixed widths
        "join merge join merge hash",                       # late first term
        "hash join x merge merge merge join hash",          # trailing echoes
        "hash join",                                        # no match (AND)
    ]
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}', 'en', 's')" for i, t in enumerate(texts))
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
        "v(doc_id, text, lang, source)"
    )
    got = {
        r[0]: r[3]
        for r in con.sql(sql_cover_rank_oracle("hash join merge", limit=100)).fetchall()
    }
    expected = {}
    for i, t in enumerate(texts):
        s = cover_density_score(t.split(), terms)
        if all(w in t.split() for w in terms):
            expected[i] = round(s / (s + 1.0), 6)
    assert got == expected
