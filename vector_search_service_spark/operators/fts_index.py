"""Inverted-index access path for FTS (SURVEY.md §4, GIN replacement
option 2).

PostgreSQL answers ``@@`` matches through a GIN index on the tsvector;
Spark has no secondary indexes. The scan+pushdown path
(``operators/search.py``) is fine when the corpus is partition-pruned,
but at 100 TB a query that matches 0.01% of documents shouldn't read
100 TB of text. The app-level access path that replaces GIN:

- **build** (batch, incremental-friendly): explode documents into a
  ``(lexeme, doc_id)`` posting table, written partitioned/bucketed by
  ``lexeme``. One shuffle at build time; the posting table is tiny
  relative to the corpus (ids, not text).
- **query**: filter postings to the query's lexemes (partition
  pruning / pushed IN-filter on the lexeme key → reads only those
  posting lists), count distinct matched lexemes per doc, keep docs
  matching ALL terms (the AND semantics of P7), then join the
  (small) matched-id set back to the corpus — broadcast, no corpus
  shuffle — for ranking/projection.

This is exactly the "semi-join against an inverted-index table" plan
the survey sketches; no Catalyst extension needed, and the result is
identical to the scan path (same oracle as ``fts_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import analyze_terms, raw_tokens_col, tf_rank_col


def build_inverted_index(documents: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Posting table: one (lexeme, id) row per distinct token per doc.
    At scale: ``.write.partitionBy('lexeme')`` (or bucketBy for join
    co-location); incremental maintenance = append postings for new
    docs, anti-join deletes — same mutations as the catalog store."""
    return (
        documents
        .select(F.col(id_col), F.explode(F.array_distinct(raw_tokens_col(F.col(text_col)))).alias("lexeme"))
        .filter(F.col("lexeme") != "")
    )


DEFAULT_LEXEME_BUCKETS = 64


def write_inverted_index(index: DataFrame, path: str, *,
                         n_buckets: int = DEFAULT_LEXEME_BUCKETS) -> None:
    """Persist the posting table in the 100 TB layout: hive-partitioned
    by ``lex_bucket = xxhash64(lexeme) mod n`` (a real corpus has
    millions of distinct lexemes — hash buckets keep the directory
    count fixed while still letting a query prune to |terms| buckets),
    sorted by lexeme within each file so min/max stats prune inside a
    bucket too."""
    (
        index.withColumn("lex_bucket", F.pmod(F.xxhash64("lexeme"), F.lit(n_buckets)))
             .repartition("lex_bucket")
             .sortWithinPartitions("lexeme")
             .write.mode("overwrite").partitionBy("lex_bucket").parquet(path)
    )


def read_posting_lists(spark, path: str, terms: list[str], *,
                       n_buckets: int = DEFAULT_LEXEME_BUCKETS) -> DataFrame:
    """Load ONLY the posting lists for ``terms``: literal IN-filter on
    the partition key (partition pruning reads |buckets(terms)| of
    ``n_buckets`` directories) plus the lexeme filter pushed to the
    remaining files' row groups."""
    if not terms:
        return spark.createDataFrame([], "doc_id long, lexeme string")
    term_rows = spark.createDataFrame([(t,) for t in terms], "lexeme string")
    buckets = sorted({
        r["b"] for r in term_rows.withColumn(
            "b", F.pmod(F.xxhash64("lexeme"), F.lit(n_buckets))
        ).collect()
    })
    return (
        spark.read.parquet(path)
             .filter(F.col("lex_bucket").isin(buckets) & F.col("lexeme").isin(terms))
             .drop("lex_bucket")
    )


def fts_search_indexed(documents: DataFrame, index: DataFrame, query: str, *,
                       limit: int = 10, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Index-accelerated FTS, result-identical to
    ``operators.search.fts_search``.

    Plan: postings filtered to the query lexemes (pushed IN-filter —
    with a lexeme-partitioned index this reads only |terms| posting
    lists) → groupBy(doc_id) count = |terms| (AND) → broadcast the
    matched ids into the corpus scan → rank top-k on just those rows.
    The corpus is touched only for matched ids."""
    terms = analyze_terms(query)
    if not terms:
        return documents.limit(0).select(F.col(id_col)).join(documents, id_col).limit(0)
    matched = (
        index.filter(F.col("lexeme").isin(terms))
        .groupBy(id_col)
        .agg(F.countDistinct("lexeme").alias("_n"))
        .filter(F.col("_n") == len(terms))
        .select(id_col)
    )
    toks = raw_tokens_col(F.col(text_col))
    return (
        documents.join(F.broadcast(matched), id_col, "left_semi")
        .withColumn("rank", tf_rank_col(toks, terms))
        .orderBy(F.col("rank").desc(), F.col(id_col).asc())
        .limit(limit)
    )
