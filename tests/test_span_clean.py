"""Edge-data regression for `dedup_span_clean` (review-caught).

The stock corpora have >= 10 tokens per document, so they can never hit
the zero-token path: `F.sequence(1, size(words))` with size = 0 yields
the DESCENDING [1, 0] (Spark's default step is -1 when start > stop)
and `element_at(words, 0)` throws INVALID_INDEX_OF_ZERO — while the
DuckDB oracle's `range(1, len + 1)` is simply empty and hashes ''.
This test runs the PRODUCTION entry and its registered oracle on a
synthetic corpus containing an empty-text doc, a punctuation-only doc
(tokenizes to zero words), a short (< one window) doc, and a genuine
cross-doc duplicated span, and requires exact parity.
"""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.usefixtures("spark")

ROWS = [
    (1, "", "en", "web", 0),
    (2, "alpha beta gamma delta", "en", "web", 22),
    (3, "alpha beta gamma epsilon zeta", "en", "web", 29),
    (4, "??? !!! ...", "en", "web", 11),      # zero tokens after filter
    (5, "one two", "en", "web", 7),           # shorter than one window
    (6, "unique words only here today", "en", "web", 28),
]


def test_span_clean_handles_zero_token_docs(spark, tmp_path):
    from tests.oracle_harness import compare
    from vector_search_service_spark.queries_corpus import q_dedup_span_clean
    from vector_search_service_spark.registry import all_queries

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = all_queries()["dedup_span_clean"].oracle
    ok, msg = compare(q_dedup_span_clean(spark, sf_dir), con, oracle)
    assert ok, msg

    rows = {r.doc_id: r for r in q_dedup_span_clean(spark, sf_dir).collect()}
    assert rows[1].n_tokens == 0 and rows[1].n_removed == 0
    assert rows[4].n_tokens == 0 and rows[4].n_removed == 0
    # sha256("") — the zero-token docs hash the empty string, not crash
    empty_sha = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    assert rows[1].cleaned_sha == empty_sha == rows[4].cleaned_sha
    # docs 2/3 share the 'alpha beta gamma' window: positions 1-3 cut
    assert rows[2].n_removed == 3 and rows[3].n_removed == 3
    # short and unique docs are untouched
    assert rows[5].n_removed == 0 and rows[6].n_removed == 0
