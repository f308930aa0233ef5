"""Non-vacuity guard (r7 verdict What's-wrong #3).

A 0-row hash match proves only that both engines produce empty results
— four entries had returned 0 rows in every driver round since r3
(``tfidf_pair_topk``, ``exists_semi_join``, ``not_exists_anti``,
``idle_customer_balance``; ``decontaminate_overlap`` likewise since
r1), so their green grades were vacuous. Round 8 retuned each query's
constants to the synthetic corpus (see the per-query docstrings for
what changed and why the stock TPC-H constants were provably empty);
this test pins that every one of them now produces rows at the
smallest corpus, so the sf0.01 driver grade and the local parity
mirror both exercise real values. If a testdata regeneration ever
empties one of these again, this fails loudly instead of letting the
grade go quietly vacuous."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

ENTRIES = [
    "tfidf_pair_topk",
    "tfidf_prefix_pair_topk",
    "exists_semi_join",
    "not_exists_anti",
    "idle_customer_balance",
    "decontaminate_overlap",
    "semdedup_prune",  # r8: threshold tuned so the prune set is non-empty
    "semdedup_multiprobe",  # r8: high-B multi-probe tier, same corpus
    "duplicate_span_extract",  # r8: exact-substring cut-list
    "semantic_decontaminate",  # r8: dense eval screen
    "fts_phrase_topk",  # r12: phrase present in corpus vocabulary
    "fts_phrase_indexed_topk",  # r12: same phrase through the postings path
    "containment_dedup",  # r12: planted exact dups score containment 1.0
    "fts_near_topk",  # r12: proximity pairs present (185 docs at sf0.01)
]


@pytest.mark.parametrize("name", ENTRIES)
def test_formerly_vacuous_entry_returns_rows(spark, name):
    from vector_search_service_spark.registry import all_queries

    spec = all_queries()[name]
    rows = spec.fn(spark, SF_SMOKE).count()
    assert rows > 0, (
        f"{name} returned 0 rows at {SF_SMOKE} — its oracle grade is "
        "vacuous again (retune the query constants to the corpus)"
    )
