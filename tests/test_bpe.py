"""BPE tokenizer (functions/bpe.py): canonical merges on a
hand-checkable corpus, distributed == local encode, detokenization
roundtrip, determinism."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vector_search_service_spark.functions.bpe import (
    EOW,
    bpe_tokens_col,
    encode_words,
    learn_bpe,
    word_freq_table,
)
from vector_search_service_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_canonical_merges_tiny_corpus(spark):
    """The classic BPE worked example: with 'low' dominant, the first
    merges must build 'low</w>' bottom-up ('l'+'o' first: it appears
    in every word; ties break lexicographically)."""
    docs = spark.createDataFrame(
        [("low low low low low lower lower lowest",)], ["text"]
    )
    merges = learn_bpe(spark, docs, n_merges=3)
    assert merges[0] == ("l", "o")  # freq 8, beats any other pair on tie-break
    assert merges[1] == ("lo", "w")  # freq 8
    assert merges[2] == ("low", EOW)  # freq 5 ('low' alone)


def test_word_freq_weighting_matches_corpus_counts(spark):
    """Training on (word, freq) must equal training on the raw corpus:
    pair counts are frequency-weighted. Spot-check the table itself."""
    docs = spark.createDataFrame([("a a a b",), ("b a",)], ["text"])
    rows = {r["word"]: r["freq"] for r in word_freq_table(docs).collect()}
    assert rows == {"a": 4, "b": 2}


def test_distributed_encode_equals_local(spark):
    docs = load_table(spark, SF, "documents").orderBy("doc_id").limit(60)
    merges = learn_bpe(spark, docs, n_merges=25)
    got = {
        r["doc_id"]: list(r["toks"])
        for r in bpe_tokens_col(docs, "text", merges, "toks")
        .select("doc_id", "toks").collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    word_re = re.compile(r"[a-z0-9]+")
    for r in docs.select("doc_id", "text").collect():
        local = encode_words(word_re.findall(r["text"].lower()), ranks)
        assert got[r["doc_id"]] == local, r["doc_id"]


def test_detokenize_roundtrip(spark):
    """Concatenating a word's tokens and stripping the end-of-word
    sentinel must reproduce the normalized words exactly — encoding
    never loses or invents characters."""
    docs = load_table(spark, SF, "documents").limit(40)
    merges = learn_bpe(spark, docs, n_merges=15)
    rows = bpe_tokens_col(docs, "text", merges, "toks").select("text", "toks").collect()
    word_re = re.compile(r"[a-z0-9]+")
    for r in rows:
        joined = "".join(r["toks"]).replace(EOW, " ").split()
        assert joined == word_re.findall(r["text"].lower())


def test_training_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    assert learn_bpe(spark, docs, n_merges=12) == learn_bpe(spark, docs, n_merges=12)
