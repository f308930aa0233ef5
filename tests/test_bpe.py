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


def test_token_count_col_equals_size_of_tokens_col(spark):
    """r12 optimization pin: the count-only encode path
    (bpe_token_count_col — what bpe_token_stats aggregates) must equal
    size(bpe_tokens_col) row for row, including empty/None texts."""
    from vector_search_service_spark.functions.bpe import bpe_token_count_col

    docs = load_table(spark, SF, "documents").limit(80).select("doc_id", "text")
    docs = docs.unionByName(spark.createDataFrame(
        [(10_001, ""), (10_002, None), (10_003, "a a a aa ab ba")],
        "doc_id long, text string",
    ))
    merges = learn_bpe(spark, docs, n_merges=12)
    full = {
        r["doc_id"]: len(r["toks"])
        for r in bpe_tokens_col(docs, "text", merges, "toks").collect()
    }
    counted = {
        r["doc_id"]: r["n"]
        for r in bpe_token_count_col(docs, "text", merges, "n").collect()
    }
    assert counted == full


def test_sql_oracle_mirrors_training_on_adversarial_corpus(spark):
    """The recursive-CTE training oracle must match learn_bpe on a
    corpus crafted for the hard cases: count ties (lexicographic
    tie-break), repeated characters (overlapping pair counts vs
    non-overlapping merge application: 'aaaa' merges to two 'aa'
    symbols), digits, and the cnt>=2 early stop."""
    import duckdb

    from vector_search_service_spark.functions.bpe import (
        learn_bpe,
        sql_bpe_train_oracle,
    )

    texts = [
        "aaaa aaaa baaab",          # overlapping (a,a) counts; fold check
        "low low low lower lowest", # the classic example
        "zz zz yz zy",              # ties broken on (l, r)
        "x1 x1 22x 22x",            # digits are symbols too
        "unique",                   # freq-1 tail (never merged alone)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = learn_bpe(spark, docs, n_merges=12)
    expected = [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]

    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in texts)
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) v(text)")
    got = con.sql(sql_bpe_train_oracle(12)).fetchall()
    assert got == expected


def test_sql_priority_encode_matches_encode_words():
    """The encode CTEs implement the PRIORITY algorithm (lowest rank,
    then leftmost). Pin the production SQL (sql_bpe_encode_ctes, which
    batches a step only when the danger check proves it faithful)
    against encode_words under handwritten rank tables, including one
    where batching WOULD diverge — ranks (ab,a)=0, (a,b)=1 on "abab":
    one-at-a-time yields [aba, b], a blind all-occurrence sweep would
    yield [ab, ab] — so the danger check must force the fallback."""
    import duckdb

    from vector_search_service_spark.functions.bpe import (
        EOW,
        encode_words,
        sql_bpe_encode_ctes,
    )

    cases = [
        # re-created-adjacency + rank-priority interplay
        ([("a", "b"), ("ab", "c"), ("c", "a"), ("b", EOW), ("ca", "b")],
         ["abc", "cab", "abcab", "bb", "a", "cacab", "abab", "xyz"]),
        # danger-triggering table: pair 0 involves pair 1's merged symbol
        ([("ab", "a"), ("a", "b")],
         ["abab", "ababab", "aab", "abba", "abaab"]),
        # repeated-char batching (the 5000-char edge-word shape, small)
        ([("a", "a"), ("aa", "aa")],
         ["a" * 17, "a" * 8, "baab", "aba"]),
    ]
    con = duckdb.connect()
    for merges, words in cases:
        ranks = {p: i for i, p in enumerate(merges)}
        expected = {w: encode_words([w], ranks) for w in words}
        mvals = ", ".join(f"({i}, '{l}', '{r}')" for i, (l, r) in enumerate(merges))
        wvals = ", ".join(f"('{w}')" for w in words)
        q = (
            f"WITH RECURSIVE ranks AS (SELECT rank, l, r FROM (VALUES {mvals}) m(rank, l, r)), "
            f"words0 AS (SELECT word FROM (VALUES {wvals}) w(word)), "
            f"{sql_bpe_encode_ctes('words0')} "
            "SELECT word, sl FROM enc WHERE kind = 'd'"
        )
        got = {w: list(sl) for w, sl in con.sql(q).fetchall()}
        assert got == expected, f"merges={merges}"

def test_min_word_freq_threads_into_both_oracles(spark):
    """ADVICE r10: a caller passing min_word_freq>1 must get the SAME
    filtered training vocab in the oracle as learn_bpe applies — and
    the stats oracle must still ENCODE every corpus word (the engine's
    bpe_tokens_col does not vocab-filter), so rare words are counted
    under the filtered tokenizer rather than dropped."""
    import duckdb

    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.bpe import (
        bpe_tokens_col,
        learn_bpe,
        sql_bpe_stats_oracle,
        sql_bpe_train_oracle,
    )

    texts_langs = [
        ("aaaa aaaa baaab", "en"),
        ("low low low lower lowest", "en"),
        ("zz zz yz zy", "de"),
        ("rareword appears once", "de"),   # freq-1 words: filtered from
        ("unique", None),                  # training, still encoded
    ]
    docs = spark.createDataFrame(texts_langs, ["text", "lang"])
    merges = learn_bpe(spark, docs, n_merges=10, min_word_freq=2)
    # the filter must matter on this corpus: training differs from default
    assert merges != learn_bpe(spark, docs, n_merges=10)

    con = duckdb.connect()
    vals = ", ".join(
        f"('{t}', {'NULL' if g is None else repr(g)})" for t, g in texts_langs
    )
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) v(text, lang)")

    got_train = con.sql(sql_bpe_train_oracle(10, min_word_freq=2)).fetchall()
    assert got_train == [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]

    toks = bpe_tokens_col(docs, "text", merges)
    expected_stats = {
        r["lang"]: (r["n_docs"], r["total_bpe_tokens"], r["avg_tokens_per_doc"])
        for r in toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("bpe_tokens")).alias("total_bpe_tokens"),
            (F.sum(F.size("bpe_tokens")) / F.count("*")).alias("avg_tokens_per_doc"),
        )
        .collect()
    }
    # keyed compare: Spark and DuckDB disagree on NULL sort position
    got_stats = {
        lang: rest
        for lang, *rest in con.sql(sql_bpe_stats_oracle(10, min_word_freq=2)).fetchall()
    }
    assert got_stats == {k: list(v) for k, v in expected_stats.items()}


def test_vocab_funnel_guard_fails_loud_on_pathological_corpus(spark):
    """VERDICT r12 #3: a corpus of unbounded unique tokens (hashes,
    IDs) must fail LOUD before the one-task training funnel
    materializes the vocab, not OOM the task. The guard is checked
    per-batch inside the funnel task, so it costs no extra Spark job
    on the healthy path."""
    import pytest

    # 200 unique words, guard set to 100: must raise, and the message
    # must point at the remedy (min_word_freq).
    docs = spark.createDataFrame(
        [(" ".join(f"id{i:04d}" for i in range(200)),)], ["text"]
    )
    with pytest.raises(Exception, match="max_vocab_rows"):
        learn_bpe(spark, docs, n_merges=3, max_vocab_rows=100)

    # The same corpus trains fine when min_word_freq drops the hapaxes
    # (every word appears once, so freq>=2 empties the vocab: zero
    # merges, no error) — the documented remedy works.
    assert learn_bpe(spark, docs, n_merges=3, max_vocab_rows=100,
                     min_word_freq=2) == []
