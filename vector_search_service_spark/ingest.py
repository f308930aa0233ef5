"""End-to-end ingestion pipeline (SURVEY.md §3.2).

One declarative lineage per batch — the reference's per-document
sequential loop (validate → id → preprocess → extract → chunk → insert,
``src/api/documents.py:85-224``) becomes a single DataFrame plan over
N documents at once: every stage is a column expression or the chunk
UDTF, and the write is one distributed append. Per-document error
isolation (``src/api/documents.py:465-472``) becomes a status column
routing rows to accepted/rejected side-outputs — no row can kill the
batch, same contract, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog
from .functions.analysis import tokens_col
from .functions.text import (
    content_type_col,
    doc_id_col,
    preprocess_col,
    title_col,
    validation_error_col,
)
from .operators.chunker import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE, chunk_documents


def prepare_documents(raw: DataFrame, *, text_col: str = "text",
                      chunk_size: int = DEFAULT_CHUNK_SIZE,
                      overlap: int = DEFAULT_CHUNK_OVERLAP,
                      metadata_cols: tuple[str, ...] = ()) -> tuple[DataFrame, DataFrame]:
    """Run the full pre-storage pipeline on a DataFrame of raw docs.

    Returns ``(chunks, rejected)``:
    ``chunks`` — one row per chunk with content-addressed ids (G2),
    preprocessed content (G1), extracted metadata (A5/G4/G5), chunk
    metadata (G3) and the stored lexeme column (F3);
    ``rejected`` — rows that failed validation (P10) with the reason.
    """
    err = validation_error_col(F.col(text_col))
    flagged = raw.withColumn("_validation_error", err)
    rejected = flagged.filter(F.col("_validation_error").isNotNull())
    ok = flagged.filter(F.col("_validation_error").isNull()).drop("_validation_error")

    meta = {k: F.col(k) for k in metadata_cols if k in raw.columns}
    staged = (
        ok.withColumn("document_id", doc_id_col(F.col(text_col), meta))
          .withColumn(text_col, preprocess_col(F.col(text_col)))
          .withColumn("content_length", F.length(text_col).cast("long"))
          .withColumn("word_count", F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")).cast("long"))
          .withColumn("line_count", (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"\n", "")) + 1).cast("long"))
          .withColumn("content_type", content_type_col(F.col(text_col)))
          .withColumn("title", title_col(F.col(text_col)))
    )
    chunks = chunk_documents(
        staged, text_col=text_col, id_col="document_id",
        chunk_size=chunk_size, overlap=overlap,
    )
    chunks = chunks.withColumn("content_lexemes", tokens_col(F.col("content")))
    return chunks, rejected.select(*raw.columns, "_validation_error")


def ingest_into(catalog: Catalog, collection_name: str, raw: DataFrame, *,
                text_col: str = "text",
                metadata_cols: tuple[str, ...] = (),
                chunk_size: int = DEFAULT_CHUNK_SIZE,
                overlap: int = DEFAULT_CHUNK_OVERLAP) -> dict:
    """3.2 write path: pipeline + one append; returns the real chunk
    count (the reference's ``chunks_created`` always reports 1 — a bug
    consciously not carried over, SURVEY.md §3.2 step 11)."""
    chunks, rejected = prepare_documents(
        raw, text_col=text_col, chunk_size=chunk_size,
        overlap=overlap, metadata_cols=metadata_cols,
    )
    meta_entries = [
        (F.lit("chunk_index"), F.col("chunk_index").cast("string")),
        (F.lit("start_char"), F.col("start_char").cast("string")),
        (F.lit("end_char"), F.col("end_char").cast("string")),
        (F.lit("chunk_size"), F.col("chunk_size").cast("string")),
        (F.lit("is_first_chunk"), F.col("is_first_chunk").cast("string")),
        (F.lit("is_last_chunk"), F.col("is_last_chunk").cast("string")),
        (F.lit("total_chunks"), F.col("total_chunks").cast("string")),
        (F.lit("content_type"), F.col("content_type")),
        (F.lit("document_id"), F.col("document_id")),
    ]
    doc_meta = F.map_filter(
        F.map_from_arrays(
            F.array(*[k for k, _ in meta_entries]),
            F.array(*[v for _, v in meta_entries]),
        ),
        lambda _k, v: v.isNotNull(),
    )
    rows = chunks.select(
        F.col("chunk_id").alias("document_id"),
        F.col("content"),
        doc_meta.alias("doc_metadata"),
        F.col("content_lexemes"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    n_chunks = catalog.add_documents(collection_name, rows)
    return {
        "chunks_created": n_chunks,
        "documents_rejected": rejected.count(),
    }
