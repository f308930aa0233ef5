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
