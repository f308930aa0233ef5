"""Edge-corpus oracle parity (hardens the ADVICE r4 class of bug).

The stock corpora have >=10 healthy tokens per document, so a whole
family of latent divergences can never fire on them: DuckDB's
``array_to_string``/``list_slice`` NULL-propagation on zero-token
docs vs Spark's total ``concat_ws`` (the exact signed-class that
produced the round-4 ADVICE on ``stream_dedup_replay``), empty-array
folds, division guards, tokenizers on punctuation-only text.

This suite rebuilds ``documents`` with adversarial rows PREPENDED
(negative doc_ids so LIMIT-by-id windows must include them):
empty string, whitespace-only, punctuation-only, single token, digits
only, unicode with symbols, and a pathological long word — then runs
the document-centric oracled entries against DuckDB on the SAME
corpus. A pass means Spark and the oracle diverge on NO edge class,
not merely on healthy text.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import TABLES, compare, register_duck_views

EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (-7, "", "en", "edge"),
    (-6, "   ", "en", "edge"),
    (-5, "?!... --- ### ...", "en", "edge"),
    (-4, "word", "de", "edge"),
    (-3, "12345 67890", "fr", "edge"),
    (-2, "héllo wörld ... ### the of and", "en", "edge"),
    (-1, "a" * 5000 + " the to of", "es", "edge"),
]

# document-centric oracled entries: dedup, textan, corpus ranking,
# sampling, fts, ingest-ish — everything whose semantics a hostile
# `documents` table can break
ENTRIES = [
    "exact_dedup_groups",
    "stream_dedup_replay",
    "dedup_span_clean",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "dedup_components",
    "dedup_canonical_pick",
    "fuzzy_blocked_pairs",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "gopher_quality_flags",
    "bm25_topk",
    "duplicate_ngram_spans",
    "unigram_logprob",
    "boilerplate_ngrams",
    "bigram_kn_logprob",
    "sha_doc_id",
    "doc_preprocess",
    "content_type_detect",
    "title_extract",
    "validation_flags",
    "pii_scrub",
    "decontaminate_overlap",
    "fts_topk",
    "fts_match_count_by_lang",
    "fts_snippet",
    "hash_split_train_test",
    "per_stratum_sample",
    "weighted_sample_topk",
    "reservoir_stratum_sample",
    "mixture_token_sample",
    "repetition_signals",
    "curate_corpus",
]


@pytest.fixture(scope="session")
def edge_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    out = tmp_path_factory.mktemp("edge_corpus")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", out / f"{t}.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    edge = spark.createDataFrame(
        [(i, txt, lang, src, len(txt)) for i, txt, lang, src in EDGE_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = str(out / "_docs_build")
    docs.select("doc_id", "text", "lang", "source",
                F.col("n_chars").cast("long").alias("n_chars")) \
        .unionByName(edge).coalesce(1).write.parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), out / "documents.parquet")
    shutil.rmtree(tmp)
    return str(out)


@pytest.mark.parametrize("name", ENTRIES)
def test_oracle_parity_on_edge_corpus(spark, duck, edge_dir, name):
    from vector_search_service_spark.registry import all_queries

    register_duck_views(duck, edge_dir)
    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} must stay oracled for this sweep"
    ok, msg = compare(spec.fn(spark, edge_dir), duck, spec.oracle)
    assert ok, f"{name} on edge corpus: {msg}"
