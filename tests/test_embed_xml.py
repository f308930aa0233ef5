"""Embedding generation (§2.12) and the XML source (S4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_embed_expression_equals_model_udf(spark):
    """The codegen'd feature-hash expression and the per-executor
    'model' pandas UDF produce the same embeddings (after
    normalization)."""
    from vector_search_service_spark.functions.embed import (
        hash_embed_model_udf,
        hash_embedding_raw_col,
    )
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    both = docs.select(
        "doc_id",
        hash_embedding_raw_col(F.col("text")).alias("raw"),
        hash_embed_model_udf()(F.col("text")).alias("udf"),
    ).collect()
    for r in both:
        raw, udf = r["raw"], r["udf"]
        norm = math.sqrt(sum(x * x for x in raw))
        assert norm > 0
        expect = [x / norm for x in raw]
        assert all(abs(a - b) < 1e-6 for a, b in zip(expect, udf))
        assert abs(sum(x * x for x in udf) - 1.0) < 1e-5  # unit norm


def test_embed_deterministic(spark):
    from vector_search_service_spark.functions.embed import hash_embed_model_udf

    df = spark.createDataFrame([("hello world",), ("hello world",)], "text string")
    vecs = [r[0] for r in df.select(hash_embed_model_udf()(F.col("text"))).collect()]
    assert vecs[0] == vecs[1]


INCIDENT_XML = """<?xml version="1.0"?>
<incidents>
  <incident>
    <number display_value="INC0001">inc-1</number>
    <short_description>X display fails</short_description>
    <description display_value="The X server crashes on start"/>
    <category>software</category>
    <close_notes></close_notes>
  </incident>
  <incident>
    <number>INC0002</number>
    <short_description>VNC unreachable</short_description>
    <category display_value="network">net</category>
    <u_root_cause>firewall</u_root_cause>
  </incident>
</incidents>
"""


def test_xml_source_and_searchable_text(spark, tmp_path):
    from vector_search_service_spark.sources.xml import (
        read_incidents_xml,
        with_searchable_text,
    )

    p = tmp_path / "incidents.xml"
    p.write_text(INCIDENT_XML)
    inc = read_incidents_xml(spark, str(p))
    rows = {r["number"]: r for r in with_searchable_text(inc).collect()}
    assert set(rows) == {"INC0001", "INC0002"}
    r1 = rows["INC0001"]
    # display_value preferred over element text
    assert r1["description"] == "The X server crashes on start"
    assert "Incident Number: INC0001" in r1["searchable_text"]
    assert "Summary: X display fails" in r1["searchable_text"]
    # empty close_notes skipped by the truthiness check
    assert "Resolution:" not in r1["searchable_text"]
    r2 = rows["INC0002"]
    assert r2["category"] == "network"
    assert "Root Cause: firewall" in r2["searchable_text"]
    assert "\n\n" in r2["searchable_text"]


def test_embed_client_fallback_chain(spark):
    """SURVEY §2.12 fallback semantics: remote-if-configured, failure
    → local (silently), dimension follows the active backend; the
    stubbed transport exercises the failure path deterministically."""
    from vector_search_service_spark.functions.embed_client import (
        LOCAL_DIM,
        REMOTE_DIM,
        EmbeddingClient,
    )

    # no remote configured → local from the start
    local_only = EmbeddingClient()
    assert local_only.dimension() == LOCAL_DIM
    assert local_only.health()["backend"] == "local"
    vecs = local_only.encode_batch(["alpha beta", "gamma"])
    assert len(vecs) == 2 and len(vecs[0]) == LOCAL_DIM

    # remote configured but transport stubbed → advertises remote dim,
    # falls back to local on first call
    client = EmbeddingClient("https://example.invalid/embed")
    assert client.dimension() == REMOTE_DIM
    out = client.encode_batch(["alpha beta"])
    assert len(out[0]) == LOCAL_DIM and client.used_fallback
    assert client.health() == {
        "backend": "local",
        "dimension": LOCAL_DIM,
        "remote_configured": True,
        "fell_back": True,
    }

    # healthy injected transport → remote result, no fallback
    def fake_remote(texts, dim):
        return [[0.5] * dim for _ in texts]

    ok = EmbeddingClient("https://example.invalid/embed", transport=fake_remote)
    assert len(ok.encode_batch(["x"])[0]) == REMOTE_DIM and not ok.used_fallback


def test_embed_client_udf_matches_local_model(spark):
    """The per-executor client UDF (fallback path) produces exactly
    the local hash-model vectors."""
    from vector_search_service_spark.functions.embed import hash_embed_model_udf
    from vector_search_service_spark.functions.embed_client import (
        LOCAL_DIM,
        EmbeddingClient,
        embed_with_client_udf,
    )

    df = spark.createDataFrame(
        [(1, "hash join merge"), (2, "broadcast exchange shuffle")], "id long, text string"
    )
    via_client = embed_with_client_udf(
        lambda: EmbeddingClient("https://example.invalid/embed")
    )
    got = {r["id"]: r["v"] for r in df.select("id", via_client("text").alias("v")).collect()}
    want = {
        r["id"]: r["v"]
        for r in df.select("id", hash_embed_model_udf(LOCAL_DIM)("text").alias("v")).collect()
    }
    assert got == want
