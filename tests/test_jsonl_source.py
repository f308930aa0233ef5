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


def test_jsonl_sink_roundtrip_and_manifest(spark, tmp_path):
    """Export → manifest → re-read roundtrip: deterministic shard
    membership, byte-stable lines, counts that match the manifest."""
    import json
    import os

    from pyspark.sql import types as T

    from vector_search_service_spark.sources.jsonl_sink import (
        read_jsonl_shards,
        write_jsonl_shards,
    )
    from vector_search_service_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .selectExpr("CAST(doc_id AS STRING) AS id", "text", "lang", "source")
    )
    out = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, out, n_shards=4, id_col="id")
    n_docs = docs.count()
    assert manifest["total_lines"] == n_docs
    assert sum(manifest["lines_per_shard"].values()) == n_docs
    assert manifest["columns"] == ["id", "lang", "source", "text"]
    assert os.path.exists(os.path.join(out, "MANIFEST.json"))

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    back = read_jsonl_shards(spark, out, schema)
    assert back.count() == n_docs
    orig = {r["id"]: r["text"] for r in docs.collect()}
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == orig

    # deterministic: re-export yields identical manifest
    manifest2 = write_jsonl_shards(docs, str(tmp_path / "export2"), n_shards=4, id_col="id")
    assert manifest2 == manifest
    with open(os.path.join(out, "MANIFEST.json")) as f:
        assert json.load(f)["total_lines"] == n_docs
