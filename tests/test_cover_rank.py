"""F2a cover-density semantics + the proximity property tf-rank lacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_service_spark.functions.ranking import (
    cover_density_score,
    fts_cover_search,
)


def test_cover_density_basics():
    assert cover_density_score([], ["a"]) == 0.0
    assert cover_density_score(["x", "y"], ["a"]) == 0.0
    # single term: each occurrence is a width-1 cover
    assert cover_density_score(["a", "b", "a"], ["a"]) == 2.0
    # adjacent pair: one width-2 cover
    assert cover_density_score(["a", "b"], ["a", "b"]) == 0.5
    # spread pair scores lower than adjacent
    assert cover_density_score(["a", "x", "x", "b"], ["a", "b"]) == 0.25


def test_proximity_orders_above_spread(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gap gap gap gap"),          # adjacent
            (2, "alpha gap gap gap gap beta"),          # spread
            (3, "alpha beta alpha beta gap gap"),       # two adjacent covers
            (4, "alpha only here"),                     # no match
        ],
        "doc_id long, text string",
    )
    got = fts_cover_search(docs, "alpha beta", limit=10).select("doc_id", "rank_cd").collect()
    ids = [r["doc_id"] for r in got]
    assert ids == [3, 1, 2]  # more covers > adjacent > spread; no-match absent
    ranks = {r["doc_id"]: r["rank_cd"] for r in got}
    assert 0 < ranks[2] < ranks[1] < ranks[3] < 1  # flag-32 keeps scores in (0,1)


def test_match_set_identical_to_tf_rank(spark):
    from vector_search_service_spark.operators.search import fts_search
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    q = "hash join merge"
    tf_ids = {r["doc_id"] for r in fts_search(docs, q, limit=10**6).collect()}
    cd_ids = {r["doc_id"] for r in fts_cover_search(docs, q, limit=10**6).collect()}
    assert tf_ids == cd_ids  # P7 AND-match is rank-independent
