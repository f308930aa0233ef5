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
  matching ALL terms (the AND semantics of P7), then semi-join the
  (usually small) matched-id set back to the corpus — AQE broadcasts
  it at runtime when it fits, no corpus shuffle in the common case —
  for ranking/projection.

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
    lists) → groupBy(doc_id) count = |terms| (AND) → semi-join the
    matched ids into the corpus scan → rank top-k on just those rows.
    The corpus is touched only for matched ids.

    Join sizing is AQE-owned, NOT hinted (r10 broadcast-audit rule,
    applied here by the r10 verdict): |matched| ≤ min document-
    frequency over the query's analyzed terms, which is usually tiny —
    but document frequency of any fixed term grows LINEARLY with the
    corpus, so the bound is data-dependent, not corpus-independent
    (a 1%-DF rarest term at the 100 TB design point is ~10⁸ ids), and
    the query stream on this path is user-controlled. A forced hint
    here would OOM the driver exactly when an adversarial/common-terms
    query arrives; AQE sizes the aggregate output at runtime and
    broadcasts when (and only when) it actually fits, degrading to a
    shuffled semi-join — not a failure — when it doesn't. Mirrors the
    reference's GIN behavior (postgres materializes the intersected
    TID set in work_mem and likewise spills when it doesn't fit)."""
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
        documents.join(matched, id_col, "left_semi")
        .withColumn("rank", tf_rank_col(toks, terms))
        .orderBy(F.col("rank").desc(), F.col(id_col).asc())
        .limit(limit)
    )


class PostingsStore:
    """Catalog-maintained postings table — the auto-maintained-GIN
    parity point (PostgreSQL keeps its GIN index current inside every
    INSERT/DELETE transaction, ``scripts/init-db.sql``; here the same
    write paths maintain a postings table co-mutated with the document
    store).

    Layout: ``root/postings/collection_id=<id>/`` — one (document_id,
    lexeme) row per distinct stored lexeme per chunk, hive-partitioned
    like the document store so maintenance cost always equals the
    touched partition, never the table. Query terms are stopword-free
    by construction (``analyze_terms``), so postings built from the
    stored ``content_lexemes`` (F3 lexemes) match exactly what the
    scan path matches over raw tokens.
    """

    def __init__(self, spark, root: str):
        import os

        self.spark = spark
        self.path = os.path.join(root, "postings")

    def _from_rows(self, docs: DataFrame) -> DataFrame:
        return (
            docs.select(
                "document_id",
                F.explode(F.array_distinct("content_lexemes")).alias("lexeme"),
            )
            .filter(F.col("lexeme") != "")
        )

    def append(self, collection_id: int, docs: DataFrame) -> None:
        """Ingest-side maintenance: append postings for the new chunks
        (same distributed write shape as the document append)."""
        (
            self._from_rows(docs)
            .withColumn("collection_id", F.lit(collection_id).cast("long"))
            .write.mode("append").partitionBy("collection_id").parquet(self.path)
        )

    def rewrite(self, collection_id: int, remaining_docs: DataFrame) -> None:
        """Delete/upsert-side maintenance: rebuild ONE collection's
        postings partition from the surviving chunks (same
        single-partition rewrite envelope as the document mutation)."""
        import os
        import shutil

        part = os.path.join(self.path, f"collection_id={collection_id}")
        if shutil.os.path.exists(part):
            shutil.rmtree(part)
        if remaining_docs is not None:
            (
                self._from_rows(remaining_docs)
                .withColumn("collection_id", F.lit(collection_id).cast("long"))
                .write.mode("append").partitionBy("collection_id").parquet(self.path)
            )

    def compact(self, collection_id: int, *, rows_per_file: int = 4_000_000) -> int:
        """Maintenance compaction — the autovacuum / GIN fastupdate
        pending-list-merge analog. Appends are sized one file per
        mutation batch (catalog.add_documents derives the fan-out from
        the batch row count), so a long mutation history accumulates
        one small file per batch; compacting rebuilds the collection's
        postings partition at ``max(1, n/rows_per_file)`` files.
        Returns the posting row count. The live rows are MATERIALIZED
        (localCheckpoint) before the partition directory is deleted —
        the rewrite never reads the files it is replacing."""
        import os
        import shutil

        idx = self.postings(collection_id)
        if idx is None:
            return 0
        rows = idx.localCheckpoint()
        n = rows.count()
        shutil.rmtree(
            os.path.join(self.path, f"collection_id={collection_id}"),
            ignore_errors=True,
        )
        (
            rows.coalesce(max(1, -(-n // rows_per_file)))
            .withColumn("collection_id", F.lit(collection_id).cast("long"))
            .write.mode("append").partitionBy("collection_id").parquet(self.path)
        )
        return n

    def postings(self, collection_id: int) -> DataFrame | None:
        import os

        if not os.path.exists(os.path.join(self.path, f"collection_id={collection_id}")):
            return None
        return (
            self.spark.read.schema("document_id string, lexeme string, collection_id long")
            .parquet(self.path)
            .filter(F.col("collection_id") == collection_id)
            .drop("collection_id")
        )

    def matched_ids(self, collection_id: int, terms: list[str]) -> DataFrame | None:
        """AND-semantics matched document ids straight from postings
        (countDistinct(lexeme) == |terms|); None when no index exists
        for the collection (caller falls back to the scan path)."""
        idx = self.postings(collection_id)
        if idx is None or not terms:
            return None
        return (
            idx.filter(F.col("lexeme").isin(terms))
               .groupBy("document_id")
               .agg(F.countDistinct("lexeme").alias("_n"))
               .filter(F.col("_n") == len(terms))
               .select("document_id")
        )
