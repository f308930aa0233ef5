"""Search operators — the reference's primary read paths.

FTS top-k (reference ``src/core/vector_store.py:176-260``) and vector
top-k (``:262-319``), re-expressed as declarative DataFrame plans:

    scan → [pushed filters] → score column → TakeOrderedAndProject

Catalyst turns ``orderBy(...).limit(k)`` into a true top-k
(per-partition heap + driver merge, no full sort) — the same shape
PostgreSQL's ``ORDER BY rank DESC LIMIT k`` produces, but distributed.

Determinism: the reference's SQL has no tie-break (row order among
equal ranks is engine-arbitrary). We totally order by (score, doc_id)
so results are reproducible and oracle-checkable — a conscious
tightening, noted per SURVEY.md §2.5 T3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.analysis import analyze_terms, match_all_terms, raw_tokens_col, tf_rank_col
from ..functions.vectors import cosine_distance_col


def fts_search(documents: DataFrame, query: str, *, limit: int = 10,
               text_col: str = "text", id_col: str = "doc_id",
               min_score: float | None = None,
               metadata_filter: dict[str, str] | None = None) -> DataFrame:
    """Ranked full-text search (3.1 lifecycle).

    Mirrors the reference query at ``src/core/vector_store.py:211-227``:
    AND-match all query lexemes (P7), rank (F2), ORDER BY rank DESC
    LIMIT k (T1). ``min_score`` / ``metadata_filter`` are accepted by
    the reference API but silently dropped by its SQL
    (``src/core/vector_store.py:181`` — SURVEY.md §3.1 step 4); we
    implement them as declared.

    Plan shape: tokenize+match are codegen'd expressions evaluated
    during the parquet scan; the equality metadata filters push down to
    the scan; the limit plans as TakeOrderedAndProject. No shuffle at
    all — score+topk is a map-side operator plus a driver merge, which
    is exactly what you want at 100 TB (no global sort, no exchange).
    """
    terms = analyze_terms(query)
    # raw tokens: match/rank against analyzed query terms is identical
    # on raw vs stopword-filtered tokens (terms are never stopwords),
    # and one split per row is the whole per-row cost. Codegen CSE
    # evaluates the shared split once per operator.
    toks = raw_tokens_col(F.col(text_col))
    out = documents
    if metadata_filter:
        for k, v in metadata_filter.items():
            # string-coerced equality, ANDed (P5, src/core/vector_store.py:289-292)
            out = out.filter(F.col(k).cast("string") == str(v))
    out = (
        out.filter(match_all_terms(toks, terms))
           .withColumn("rank", tf_rank_col(toks, terms))
    )
    if min_score is not None:
        out = out.filter(F.col("rank") >= F.lit(float(min_score)))
    return out.orderBy(F.col("rank").desc(), F.col(id_col).asc()).limit(limit)


def vector_search(embeddings: DataFrame, query_vec: list[float], *, limit: int = 10,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  distance_threshold: float | None = None) -> DataFrame:
    """Brute-force cosine top-k (T2 + P6 + F4,
    ``src/core/vector_store.py:262-319``).

    Exact scan: one codegen'd fold per row, TakeOrderedAndProject
    top-k, zero shuffle. This is the correctness baseline; the
    LSH-bucketed candidate-pruning variant for billion-vector scale is
    ``operators/ann.py`` (mirrors the reference's IVFFlat probe shape).
    """
    from ..functions.vectors import valid_vec_col

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # NULL / wrong-dim rows score NULL and sort LAST (DuckDB-parity;
    # Spark's bare asc would seat them at rank 1 — see valid_vec_col)
    out = embeddings.withColumn(
        "distance", cosine_distance_col(valid_vec_col(F.col(vec_col), len(query_vec)), q)
    )
    if distance_threshold is not None:
        out = out.filter(F.col("distance") <= F.lit(float(distance_threshold)))
    return out.orderBy(
        F.col("distance").asc_nulls_last(), F.col(id_col).asc()
    ).limit(limit)


def paginate(df: DataFrame, *, order_col: str, offset: int = 0, limit: int = 100) -> DataFrame:
    """T3 — deterministic offset/limit pagination.

    The reference paginates with no ORDER BY (``src/core/vector_store.py:347-348``)
    — engine-arbitrary row order. We totally order on a key column via
    row_number. Window over a single global ordering is a single-task
    sort at the limit boundary; for deep pagination at scale prefer
    keyset pagination (``filter(col > last_key).limit(n)``), also
    provided here.
    """
    w = Window.orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
          .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
          .drop("_rn")
    )


def paginate_keyset(df: DataFrame, *, order_col: str, after: object | None, limit: int = 100) -> DataFrame:
    """Keyset pagination — the scale-correct variant of T3: the
    predicate pushes into the scan, no window, no global sort."""
    out = df if after is None else df.filter(F.col(order_col) > F.lit(after))
    return out.orderBy(F.col(order_col).asc()).limit(limit)
