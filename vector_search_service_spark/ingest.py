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

from pyspark.sql import Column, DataFrame
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
                      chunk_size: int | Column = DEFAULT_CHUNK_SIZE,
                      overlap: int | Column = DEFAULT_CHUNK_OVERLAP,
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
    # user-supplied title wins over the extracted one (G6 merge order:
    # extracted stats first, user metadata over them —
    # src/api/documents.py:174-184)
    extracted_title = title_col(preprocess_col(F.col(text_col)))
    title_expr = (
        F.coalesce(F.col("title"), extracted_title)
        if "title" in meta else extracted_title
    )
    staged = (
        ok.withColumn("document_id", doc_id_col(F.col(text_col), meta))
          .withColumn("title", title_expr)
          .withColumn(text_col, preprocess_col(F.col(text_col)))
          .withColumn("content_length", F.length(text_col).cast("long"))
          .withColumn("word_count", F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")).cast("long"))
          .withColumn("line_count", (F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"\n", "")) + 1).cast("long"))
          .withColumn("content_type", content_type_col(F.col(text_col)))
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
                chunk_size: int | Column = DEFAULT_CHUNK_SIZE,
                overlap: int | Column = DEFAULT_CHUNK_OVERLAP,
                idx_col: str | None = None) -> dict:
    """3.2 write path: pipeline + one append; returns the real chunk
    count (the reference's ``chunks_created`` always reports 1 — a bug
    consciously not carried over, SURVEY.md §3.2 step 11).

    With ``idx_col`` (a caller-supplied per-document key column), the
    result also carries ``documents``: one dict per input row with the
    content-addressed ``document_id`` (G2 — computed IN the plan, never
    re-read from storage), ``chunks_created`` and the validation
    ``error`` if any. This is how batch ingest gets per-document
    outcomes from a single distributed write instead of a driver loop.
    ``chunk_size``/``overlap`` accept a Column for per-document
    overrides."""
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
        # extracted stats (src/api/documents.py:174-184) + user
        # metadata — persisted so metadata_filter can see them;
        # map_filter below drops absent (null) values per row
        (F.lit("content_length"), F.col("content_length").cast("string")),
        (F.lit("word_count"), F.col("word_count").cast("string")),
        (F.lit("line_count"), F.col("line_count").cast("string")),
        (F.lit("title"), F.col("title")),
    ] + [
        (F.lit(c), F.col(c).cast("string"))
        for c in metadata_cols if c in raw.columns and c != "title"
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
    out = {"chunks_created": n_chunks}
    if idx_col is None:
        out["documents_rejected"] = rejected.count()
        return out
    rej = {
        r[idx_col]: r["_validation_error"]
        for r in rejected.select(idx_col, "_validation_error").collect()
    }
    acc = {
        r[idx_col]: (r["document_id"], r["n"])
        for r in chunks.groupBy(idx_col, "document_id")
                       .agg(F.count("*").alias("n")).collect()
    }
    docs = []
    for r in raw.select(idx_col).collect():
        i = r[idx_col]
        doc_id, n = acc.get(i, (None, 0))
        err = rej.get(i)
        if err is None and n == 0:
            err = "Document produced no chunks"
        docs.append({
            "idx": i, "document_id": doc_id,
            "chunks_created": n, "error": err,
        })
    out["documents_rejected"] = len(rej)
    out["documents"] = docs
    return out
