"""JSONL corpus source: schema-pinned parse, corrupt-line side
output, and ingest-compatible rows (sources/jsonl.py)."""

from __future__ import annotations

import json


def test_jsonl_parse_and_corrupt_side_output(spark, tmp_path):
    from vector_search_service_spark.sources.jsonl import (
        read_documents_jsonl, split_valid_rejected,
    )

    lines = [
        json.dumps({"id": "a", "text": "alpha beta", "source": "dump1",
                    "lang": "en", "metadata": {"k": "v"}}),
        json.dumps({"id": "b", "text": "gamma", "source": "dump1",
                    "lang": "de", "metadata": {}}),
        '{"id": "c", "text": "truncated...',      # broken line
        "not json at all",                         # broken line
        json.dumps({"id": "d", "text": None, "source": None,
                    "lang": None, "metadata": None}),  # valid, sparse
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")

    df = read_documents_jsonl(spark, str(p))
    valid, rejected = split_valid_rejected(df)

    v = {r["id"]: r for r in valid.collect()}
    assert set(v) == {"a", "b", "d"}
    assert v["a"]["metadata"]["k"] == "v"
    assert "_corrupt_record" not in valid.columns

    rej = [r["raw_line"] for r in rejected.collect()]
    assert len(rej) == 2
    assert "not json at all" in rej              # raw line preserved

    # extra unknown fields are ignored by the pinned schema, not merged
    p2 = tmp_path / "drift.jsonl"
    p2.write_text(json.dumps({"id": "x", "text": "t", "surprise": 1}) + "\n")
    drift = read_documents_jsonl(spark, str(p2))
    assert set(drift.columns) == {"id", "text", "source", "lang",
                                  "metadata", "_corrupt_record"}


def test_jsonl_rows_feed_ingest(spark, tmp_path):
    from vector_search_service_spark.catalog import Catalog
    from vector_search_service_spark.ingest import ingest_into
    from vector_search_service_spark.sources.jsonl import (
        read_documents_jsonl, split_valid_rejected,
    )
    from pyspark.sql import functions as F

    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(
        json.dumps({"id": f"doc{i}", "text": f"document {i} " + "word " * 50,
                    "source": "dump", "lang": "en", "metadata": {}})
        for i in range(3)
    ) + "\n")

    cat = Catalog(spark, str(tmp_path / "store"))
    cat.create_collection("jl")
    valid, _ = split_valid_rejected(read_documents_jsonl(spark, str(p)))
    res = ingest_into(
        cat, "jl",
        valid.select(F.col("text"), F.col("source").alias("title"),
                     F.col("source"), F.lit(None).cast("string").alias("author"),
                     F.lit("text").alias("type")),
        metadata_cols=("title", "source", "author", "type"),
    )
    assert res["chunks_created"] >= 3 and res["documents_rejected"] == 0
    assert cat.collection_stats("jl")["document_count"] >= 3
