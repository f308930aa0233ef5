"""The dedup hot path runs as pandas UDFs (measured ~10x over Spark's
interpreted higher-order functions); the pure-expression mirrors in
``functions/hashing.py`` define the oracle SQL. This test pins
UDF == expression so the two can never drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_service_spark.functions.hashing import (
    band_key_from_hashes_col,
    hashed_shingles_col,
    shingles_col,
    simhash16_col,
    token_digests_col,
    token_hashes_col,
    words_col,
)
from vector_search_service_spark.operators.dedup import (
    DEFAULT_BANDS,
    band_keys_udf,
    hashed_shingle_set_udf,
    shingle_set_udf,
    simhash16_udf,
)
from vector_search_service_spark.sources.tables import load_table


def _expr_hashed_set(text_col):
    """The r4 rolling-hash shingle-set expression pipeline (defines
    the oracle SQL; the UDFs must match it bit-for-bit)."""
    return F.array_sort(F.array_distinct(
        hashed_shingles_col(token_hashes_col(words_col(text_col)))
    ))


def test_band_keys_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr_df = (
        docs.withColumn("_h", _expr_hashed_set(F.col("text")))
            .select(
                "doc_id",
                F.array(*[
                    band_key_from_hashes_col(F.col("_h"), seeds) for seeds in DEFAULT_BANDS
                ]).alias("keys"),
            )
    )
    udf_df = docs.select("doc_id", band_keys_udf()(F.col("text")).alias("keys"))
    expr = {r["doc_id"]: r["keys"] for r in expr_df.collect()}
    udf = {r["doc_id"]: r["keys"] for r in udf_df.collect()}
    assert expr == udf


def test_hashed_shingle_set_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr = {
        r["doc_id"]: list(r["sh"])
        for r in docs.select("doc_id", _expr_hashed_set(F.col("text")).alias("sh")).collect()
    }
    udf = {
        r["doc_id"]: list(r["sh"])
        for r in docs.select(
            "doc_id", hashed_shingle_set_udf()(F.col("text")).alias("sh")
        ).collect()
    }
    assert expr == udf


def test_shingle_set_udf_matches_expression(spark):
    """String-shingle sets still back the n-gram Jaccard verifier
    family (ngram_jaccard_dedup / components / canonical_pick)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr = {
        r["doc_id"]: sorted(r["sh"])
        for r in docs.select(
            "doc_id",
            F.array_distinct(shingles_col(words_col(F.col("text")))).alias("sh"),
        ).collect()
    }
    udf = {
        r["doc_id"]: list(r["sh"])
        for r in docs.select("doc_id", shingle_set_udf()(F.col("text")).alias("sh")).collect()
    }
    assert expr == udf


def test_simhash_udf_matches_expression(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    expr = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn("_dg", token_digests_col(words_col(F.col("text"))))
        .select("doc_id", simhash16_col(F.col("_dg")).cast("int").alias("s"))
        .collect()
    }
    udf = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", simhash16_udf()(F.col("text")).alias("s")).collect()
    }
    assert expr == udf


def test_connected_components_chain_and_isolated_pair(spark):
    """Chain 1-2-3 collapses to one cluster (transitivity — the whole
    reason the operator exists); 7-9 stays separate; convergence flag
    respects max_rounds."""
    from vector_search_service_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (7, 9), (4, 5), (5, 6), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 7, 9: 7}

# -- hot-bucket cap (VERDICT r1 #3) ------------------------------------------


def _skewed_corpus(spark, n_boiler=1000):
    """1k identical boilerplate docs + two genuine near-dup pairs +
    distinct filler. Without a cap the boilerplate bucket alone yields
    n·(n-1)/2 candidate pairs."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "mu nu xi omicron pi rho sigma tau upsilon phi chi")
    near_a = base + " psi"
    near_b = base + " omega"  # one word of 22 differs: Jaccard = 19/21
    rows = [(i, boiler) for i in range(n_boiler)]
    rows += [(10_000, near_a), (10_001, near_b)]
    rows += [
        (20_000 + i, f"unique document number {i} with totally distinct words w{i}a w{i}b w{i}c w{i}d")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    from vector_search_service_spark.operators.dedup import (
        lsh_hot_buckets,
        minhash_band_keys,
        minhash_lsh_pairs,
    )

    docs = _skewed_corpus(spark)
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.8, max_bucket_size=500).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 1000-member boilerplate bucket is sidelined: zero pairs from
    # it; the genuine near-dup pair survives untouched
    assert got == {(10_000, 10_001)}

    # the sidelined buckets are reported as a boilerplate signal
    keyed = minhash_band_keys(docs.select("doc_id", "text")).select(
        "doc_id", "band", "band_key"
    )
    hot = lsh_hot_buckets(keyed, max_bucket_size=500).collect()
    assert len(hot) == 4  # one per band — all 1000 docs identical
    assert all(r["n_members"] == 1000 for r in hot)


def test_lsh_cap_noop_on_non_degenerate_corpus(spark):
    """On a corpus with no hot buckets the cap changes nothing."""
    from vector_search_service_spark.operators.dedup import minhash_lsh_pairs
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, jaccard_threshold=0.8, max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_incremental_minhash_index_equals_batch_recompute(spark, tmp_path):
    """The streaming-era dedup invariant: processing the corpus as
    incremental batches against the persisted band-key index yields
    exactly the pairs a full-corpus recompute finds — each pair
    surfacing in the batch that completes it."""
    from pyspark.sql import functions as F

    from vector_search_service_spark.operators.dedup import minhash_lsh_pairs
    from vector_search_service_spark.operators.dedup_index import MinHashIndexStore
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = MinHashIndexStore(spark, str(tmp_path / "mh_index"))

    incremental = set()
    seen = None
    for lo, hi in ((0, 300), (300, 700), (700, 10**9)):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        seen = batch if seen is None else seen.unionByName(batch)
        out = store.process_batch(batch, seen, jaccard_threshold=0.8)
        incremental |= {
            tuple(sorted((r["id_a"], r["id_b"]))) for r in out.collect()
        }

    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.8).collect()
    }
    assert incremental == full and len(full) > 0


def test_band_keys_parity_on_adversarial_unicode(spark):
    """The corpus parity tests run over ASCII-ish synthetic text; this
    pins UDF == expression on adversarial inputs — multibyte unicode
    (UTF-8 encoding must agree between Python's str.encode and the
    JVM's md5 of the string), empty/whitespace docs, boundary-char
    soup, very short and repetitive texts, and non-uniform band
    widths in the vectorized permutation path."""
    import random

    from vector_search_service_spark.operators.dedup import band_keys_udf

    rng = random.Random(42)
    alphabet = "ab .,!?\n\tüßλ中文🙂éאב"
    texts = [""] + [" \n\t "] + ["a"] + ["中"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 120)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")

    for bands in (DEFAULT_BANDS, ((1, 2, 3), (4,), (5, 6))):
        got = {
            r["doc_id"]: r["k"]
            for r in df.select("doc_id", band_keys_udf(bands)("text").alias("k")).collect()
        }
        want = {
            r["doc_id"]: [r[f"b{i}"] for i in range(len(bands))]
            for r in df.withColumn("_h", _expr_hashed_set(F.col("text"))).select(
                "doc_id",
                *[band_key_from_hashes_col(F.col("_h"), seeds).alias(f"b{i}")
                  for i, seeds in enumerate(bands)],
            ).collect()
        }
        assert got == want
