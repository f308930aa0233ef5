"""F2(a) — positional cover-density ranking (``ts_rank_cd`` fidelity
path; SURVEY.md §7 hard part 1).

``ts_rank_cd(tsvector, query, 32)`` scores *covers* — minimal position
windows containing every query lexeme — higher when terms sit close
together, then maps the score into (0,1) with ``rank/(rank+1)``
(normalization flag 32, ``src/core/vector_store.py:210,218``). The
default engine rank (``tf_rank_col``) is the rank-order-equivalent
TF score chosen for oracle checkability; this module adds the
positional variant for deployments that want proximity-aware ordering.

Algorithm (the standard minimal-cover sweep): walk positions of query
terms in document order, maintain the latest position of each term;
whenever all terms are present, the window [min(latest), current] is a
candidate cover — score += 1/width per cover, advancing past the
cover's start. Runs as an Arrow-batched pandas UDF over the stored
lexeme array (row-local, embarrassingly parallel — same scale shape as
the chunker).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# tsrank.c: static const float weights[] = {0.1, 0.2, 0.4, 1.0} —
# unlabeled tsvector positions carry label 'D', weight 0.1
PG_WEIGHT_D = 0.1


def cover_density_score(tokens: list[str], terms: list[str]) -> float:
    """PostgreSQL ``calc_rank_cd`` cover sum for an unlabeled, unweighted
    tsvector (``src/backend/utils/adt/tsrank.c``): each minimal cover
    contributes ``Cpos / (1 + nNoise)`` where, with every entry at the
    default 'D' weight, ``Cpos = n_entries / (n_entries / 0.1) = 0.1``
    and ``nNoise`` is the count of non-query-term positions inside the
    cover (cover width − query-term entries). 0.0 when any term is
    absent. Known PG anchor values: adjacent pair → 0.1, pair separated
    by one noise word → 0.05, lone single-term occurrence → 0.1."""
    import bisect

    terms_set = set(terms)
    if not terms_set:
        return 0.0
    positions = [(i, t) for i, t in enumerate(tokens) if t in terms_set]
    if not positions:
        return 0.0
    pos_only = [p for p, _ in positions]
    latest: dict[str, int] = {}
    score = 0.0
    for idx, (pos, term) in enumerate(positions):
        latest[term] = pos
        if len(latest) == len(terms_set):
            start = min(latest.values())
            width = pos - start + 1
            n_entries = idx - bisect.bisect_left(pos_only, start) + 1
            n_noise = width - n_entries
            score += PG_WEIGHT_D / (1 + n_noise)
            # a minimal cover is consumed: drop its leftmost term so the
            # next cover must re-find it (tsrank.c restarts Cover() at
            # the entry after the cover's begin)
            for t, p in list(latest.items()):
                if p == start:
                    del latest[t]
    return score


def cover_rank_udf(terms: list[str]):
    """rank/(rank+1)-normalized cover-density over a lexeme-array
    column (normalization flag 32 semantics)."""
    @F.pandas_udf(T.DoubleType())
    def rank(tokens: pd.Series) -> pd.Series:
        def score(toks):
            s = cover_density_score(list(toks) if toks is not None else [], terms)
            return s / (s + 1.0)
        return tokens.map(score)
    return rank


# --- DuckDB oracle mirror ---------------------------------------------------
#
# The cover sweep is a sequential fold over each document's query-term
# positions — rows-only through r10 ("the stateful sweep is
# deliberately not expressed in SQL"). Like the BPE oracle, it IS
# expressible as a DuckDB recursive CTE: query terms are literals, so
# the sweep state is one (latest pos, seq) column pair per term plus
# the running score; each recursion step consumes one query-term
# occurrence (all matched docs advance in parallel rows). Float
# accumulation happens in the identical left-to-right order with the
# identical IEEE ops (0.1/(1+noise), +=), so scores are bit-equal.
# n_entries via global seq numbering mirrors the bisect in
# cover_density_score; cover consumption (tsrank.c restarting after
# the cover's begin) is the per-term NULL reset of the state whose
# position equals the cover start (positions are unique, so exactly
# one term resets — mirroring `del latest[t]`).


def sql_cover_rank_oracle(query: str, *, limit: int = 10) -> str:
    """Full DuckDB oracle for :func:`fts_cover_search` over the
    ``documents`` view (columns doc_id, lang, source, rank_cd_r)."""
    from .analysis import TOKEN_SPLIT_RE, analyze_terms

    terms = analyze_terms(query)
    if not terms:
        return ("SELECT NULL::BIGINT AS doc_id, NULL::VARCHAR AS lang, "
                "NULL::VARCHAR AS source, NULL::DOUBLE AS rank_cd_r WHERE FALSE")
    ids = list(range(1, len(terms) + 1))
    term_in = ", ".join(f"'{t}'" for t in terms)
    match = " AND ".join(f"list_contains(toks, '{t}')" for t in terms)
    init_cols = ", ".join(
        f"CAST(NULL AS BIGINT) AS p{i}, CAST(NULL AS BIGINT) AS s{i}" for i in ids
    )
    upd_cols = ", ".join(
        f"CASE WHEN e.term = '{terms[i-1]}' THEN e.pos ELSE c.p{i} END AS p{i}, "
        f"CASE WHEN e.term = '{terms[i-1]}' THEN e.seq ELSE c.s{i} END AS s{i}"
        for i in ids
    )
    full = " AND ".join(f"p{i} IS NOT NULL" for i in ids)
    start = "least(" + ", ".join(f"p{i}" for i in ids) + ")"
    startseq = "CASE " + " ".join(f"WHEN p{i} = strt THEN s{i}" for i in ids) + " END"
    consume_cols = ", ".join(
        f"CASE WHEN isfull AND p{i} = strt THEN NULL ELSE p{i} END AS p{i}, s{i}"
        for i in ids
    )
    # AS MATERIALIZED on the recursion inputs is load-bearing: DuckDB
    # inlines plain CTEs, so `pos` (joined in EVERY recursive step)
    # would re-tokenize the corpus once per iteration — measured 7.1 s
    # -> 0.3 s at sf0.1 (25x), bit-identical output (docs/ROUND11.md).
    return f"""
WITH RECURSIVE dtoks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}') AS toks
  FROM documents
),
m AS MATERIALIZED (SELECT doc_id, toks FROM dtoks WHERE {match}),
pos AS MATERIALIZED (
  SELECT doc_id, i AS pos, toks[i] AS term,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS seq
  FROM (SELECT doc_id, toks, unnest(generate_series(1, length(toks))) AS i FROM m)
  WHERE toks[i] IN ({term_in})
),
docseq AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nseq FROM pos GROUP BY doc_id),
cov AS (
  SELECT doc_id, 0 AS k, nseq, {init_cols}, 0.0::DOUBLE AS score
  FROM docseq
  UNION ALL
  (
    WITH cur AS (SELECT * FROM cov WHERE k < nseq),
    upd AS (
      SELECT c.doc_id, c.k + 1 AS k, c.nseq, {upd_cols},
             c.score AS score0, e.pos AS epos, e.seq AS eseq
      FROM cur c JOIN pos e ON e.doc_id = c.doc_id AND e.seq = c.k + 1
    ),
    cv AS (
      SELECT *, ({full}) AS isfull,
             CASE WHEN {full} THEN {start} END AS strt
      FROM upd
    ),
    cv2 AS (
      SELECT *, CASE WHEN isfull THEN {startseq} END AS strtseq FROM cv
    )
    SELECT doc_id, k, nseq, {consume_cols},
           score0 + CASE WHEN isfull
                    THEN {PG_WEIGHT_D} / (1 + ((epos - strt) - (eseq - strtseq)))
                    ELSE 0.0 END AS score
    FROM cv2
  )
),
final AS (SELECT doc_id, score FROM cov WHERE k = nseq)
SELECT d.doc_id, d.lang, d.source,
       round(f.score / (f.score + 1.0), 6) AS rank_cd_r
FROM final f JOIN documents d USING (doc_id)
ORDER BY f.score / (f.score + 1.0) DESC, d.doc_id ASC
LIMIT {limit}
"""


def fts_cover_search(documents, query: str, *, limit: int = 10,
                     text_col: str = "text", id_col: str = "doc_id"):
    """FTS top-k ranked by positional cover density — same match set
    as ``fts_search`` (AND semantics), proximity-aware ordering."""
    from ..functions.analysis import analyze_terms, match_all_terms, raw_tokens_col
    from pyspark.sql import functions as F  # noqa: PLC0415

    terms = analyze_terms(query)
    toks = raw_tokens_col(F.col(text_col))
    return (
        documents.filter(match_all_terms(toks, terms))
        .withColumn("rank_cd", cover_rank_udf(terms)(toks))
        .orderBy(F.col("rank_cd").desc(), F.col(id_col).asc())
        .limit(limit)
    )
