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


# -- batched multi-query search: N queries, ONE plan ------------------------

MULTIQUERY_BATCH = (
    "hash join merge",
    "window sort",
    "stream batch spark",
    "table scan part",
)
_MQ_TOPK = 5


def _mq_terms() -> list[tuple[int, list[str]]]:
    from .functions.analysis import analyze_terms

    return [(i, analyze_terms(q)) for i, q in enumerate(MULTIQUERY_BATCH)]


def _mq_oracle() -> str:
    from .functions.analysis import sql_tokens_expr

    q_rows = ", ".join(
        f"({qid}, '{t}', {len(terms)})"
        for qid, terms in _mq_terms() for t in terms
    )
    return f"""
WITH qterms(query_id, term, n_terms) AS (VALUES {q_rows}),
toked AS (
  SELECT doc_id, {sql_tokens_expr('text')} AS tokens FROM documents
), occ AS (
  SELECT doc_id, unnest(tokens) AS tok FROM toked
), matched AS (
  SELECT q.query_id, o.doc_id,
         CAST(count(DISTINCT o.tok) AS BIGINT) AS n_matched,
         CAST(count(*) AS BIGINT) AS raw_tf,
         any_value(q.n_terms) AS n_terms
  FROM occ o JOIN qterms q ON o.tok = q.term
  GROUP BY q.query_id, o.doc_id
)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       round(CAST(raw_tf AS DOUBLE) / (CAST(raw_tf AS DOUBLE) + 1.0), 6) AS rank_r
FROM matched
WHERE n_matched = n_terms
QUALIFY row_number() OVER (
  PARTITION BY query_id
  ORDER BY CAST(raw_tf AS DOUBLE) / (CAST(raw_tf AS DOUBLE) + 1.0) DESC, doc_id
) <= {_MQ_TOPK}
ORDER BY query_id, rank_r DESC, doc_id
"""


@register(
    "fts_multiquery_topk",
    survey_ref="P7,F2,T1 batched: N queries against the corpus in ONE plan "
               "(the batch_search scale shape, service.py docstring promise)",
    tags=("fts", "headline"),
    oracle=_mq_oracle(),
)
def q_fts_multiquery_topk(spark, sf_dir):
    """Batched FTS: every query in the batch rides ONE corpus scan.

    ``service.batch_search`` loops per query — right for a handful of
    interactive calls, wrong for a dataloader issuing thousands. This
    is the batched plan: explode the corpus token stream once, join it
    against a BROADCAST (query_id, term) table, aggregate
    per (doc, query) to get both the AND-match test
    (countDistinct == n_terms) and the TF rank numerator in one
    map-side-combined shuffle of matched occurrences only, then
    per-query top-k via window rank. Corpus text is scanned once and
    never shuffled; cost scales with matches, not queries × corpus.
    With the postings index the explode disappears too (probe the
    index with the union of all terms)."""
    from .functions.analysis import tokens_col

    terms = _mq_terms()
    qdf = spark.createDataFrame(
        [(qid, t, len(ts)) for qid, ts in terms for t in ts],
        "query_id int, term string, n_terms int",
    )
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    matched = (
        occ.join(F.broadcast(qdf), occ["tok"] == qdf["term"])
        .groupBy("query_id", "doc_id")
        .agg(
            F.countDistinct("tok").alias("n_matched"),
            F.count("*").alias("raw_tf"),
            F.first("n_terms").alias("n_terms"),
        )
        .filter(F.col("n_matched") == F.col("n_terms"))
    )
    rank = F.col("raw_tf").cast("double") / (F.col("raw_tf").cast("double") + F.lit(1.0))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(rank.desc(), "doc_id")
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MQ_TOPK)
        .select("query_id", "doc_id", F.round(rank, 6).alias("rank_r"))
        .orderBy("query_id", F.desc("rank_r"), "doc_id")
    )
