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
    (-10, None, "en", "edge"),    # NULL text cell (raw-corpus reality)
    (-9, "a null lang doc the of and", None, "edge"),
    (-8, "null source doc", "en", None),
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
    "c4_clean_flags",
    "bm25_topk",
    "duplicate_ngram_spans",
    "duplicate_span_extract",
    "unigram_logprob",
    "unigram_logprob_capped",
    "boilerplate_ngrams",
    "bigram_kn_logprob",
    "trigram_kn_logprob",
    "ccnet_ppl_buckets",
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
    "domain_capped_reservoir",
    "token_entropy",
    "temperature_mixture_alloc",
    "tfidf_pair_topk",
    "tfidf_prefix_pair_topk",  # r8: prefix-filtered tier (same edge classes)
    # r10: the newly-oracled relics — the SQL Porter mirror must agree
    # on the pathological vocab (5000-char word, digits, unicode-split
    # fragments), the recursive BPE training/encode on NULL/empty/
    # punctuation-only docs and long repeated-char words, the cover
    # sweep on docs where terms never co-occur
    "fts_stemmed_topk",
    "fts_cover_topk",
    "bpe_train_merges",
    "bpe_token_stats",
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
        [(i, txt, lang, src, len(txt) if txt is not None else None)
         for i, txt, lang, src in EDGE_DOCS],
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


def test_zero_norm_embedding_nan_sorts_last_not_crash(spark):
    """Spark 4 ANSI mode turns the bare 0/0 cosine divide into a
    job-killing exception, so ONE all-zeros embedding in a billion-row
    corpus would abort every similarity scan. The guarded fold must
    instead yield NaN (pgvector's answer for the undefined angle),
    which sorts after every real distance in Spark, DuckDB and
    PostgreSQL ascending order — degenerate vectors sink to the bottom
    of the top-k instead of poisoning it."""
    import math

    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.vectors import (
        cosine_distance_col,
        l2_normalize_col,
    )
    from vector_search_service_spark.operators.search import vector_search

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    res = vector_search(emb, [1.0, 0.0], limit=3).collect()  # must not raise
    assert [r["vec_id"] for r in res] == [1, 2, 3]  # NaN last
    assert math.isnan(res[2]["distance"])

    # l2_normalize: zero vector stays the zero vector (pgvector), and
    # real vectors normalize to unit norm
    norms = emb.select(
        "vec_id",
        F.aggregate(
            l2_normalize_col(F.col("embedding")),
            F.lit(0.0), lambda a, x: a + x * x,
        ).alias("n2"),
    ).collect()
    got = {r["vec_id"]: r["n2"] for r in norms}
    assert got[3] == 0.0
    assert abs(got[1] - 1.0) < 1e-12 and abs(got[2] - 1.0) < 1e-12

    # distance threshold path: NaN fails every `<=` predicate, so the
    # zero vector is naturally excluded from threshold queries too
    thr = vector_search(emb, [1.0, 0.0], limit=3, distance_threshold=2.0)
    assert [r["vec_id"] for r in thr.collect()] == [1, 2]

    # the distance expression itself is NaN (not NULL, not an error)
    d = emb.filter("vec_id = 3").select(
        cosine_distance_col(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0)))
        .alias("d")
    ).first()["d"]
    assert math.isnan(d)
