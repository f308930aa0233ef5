"""Registry entry — F2(a) positional cover-density FTS (rows-only:
the stateful cover sweep is deliberately not expressed in SQL; match
set and score range are pinned by unit tests, and the
rank-order-equivalent F2(b) variant is fully oracle-checked as
``fts_topk``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.ranking import fts_cover_search
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
