"""Registry entry — F2(a) positional cover-density FTS (rows-only:
the stateful cover sweep is deliberately not expressed in SQL; match
set and score range are pinned by unit tests, and the
rank-order-equivalent F2(b) variant is fully oracle-checked as
``fts_topk``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.ranking import fts_cover_search
from .operators.fts_index import build_inverted_index, fts_search_indexed
from .registry import register
from .sources.tables import load_table


@register(
    "fts_cover_topk",
    survey_ref="F2(a) cover-density rank (ts_rank_cd fidelity path)",
    tags=("fts",),
    oracle=None,
)
def q_fts_cover_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        fts_cover_search(docs, "hash join merge", limit=10)
        .select("doc_id", "lang", "source", F.round("rank_cd", 6).alias("rank_cd_r"))
    )


def _fts_topk_oracle() -> str:
    from .registry import _REGISTRY

    return _REGISTRY["fts_topk"].oracle


@register(
    "fts_indexed_topk",
    survey_ref="P7,F2,T1 via inverted-index access path (SURVEY §4 GIN option 2)",
    tags=("fts", "headline"),
    oracle=None,  # bound below: identical contract to fts_topk
)
def q_fts_indexed_topk(spark, sf_dir):
    """Index-accelerated FTS: build the (lexeme, doc_id) posting table,
    AND-match through it, broadcast matched ids into the corpus scan,
    rank top-k. Same oracle as fts_topk — the access path must be
    invisible in the results."""
    from .queries_reference import FTS_QUERY

    docs = load_table(spark, sf_dir, "documents")
    index = build_inverted_index(docs)
    return (
        fts_search_indexed(docs, index, FTS_QUERY, limit=10)
        .select("doc_id", "lang", "source", "rank")
    )


from .registry import _REGISTRY as _REG  # noqa: E402

_REG["fts_indexed_topk"].oracle = _fts_topk_oracle()
