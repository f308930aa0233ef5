"""Porter stemmer: canonical vectors from the published algorithm +
the F1==F3 symmetry that keeps stemmed search consistent."""

from __future__ import annotations

from vector_search_service_spark.functions.stemmer import porter_stem


CANONICAL = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "caress": "caress",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "hopping": "hop",
    "falling": "fall", "filing": "file", "conflated": "conflat",
    # step 1c
    "happy": "happi", "sky": "sky",
    # steps 2-4
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper",
    "generalization": "gener", "effective": "effect",
    "hopefulness": "hope", "goodness": "good",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_canonical_vectors():
    got = {w: porter_stem(w) for w in CANONICAL}
    assert got == CANONICAL


def test_idempotent_on_short_words():
    for w in ("a", "be", "is", "sky"):
        assert porter_stem(porter_stem(w)) == porter_stem(w)


def test_sql_porter_mirror_bit_parity():
    """The generated-SQL Porter stemmer (the fts_stemmed_topk oracle's
    core) must be bit-identical to porter_stem on: the canonical
    vectors, the full corpus vocabulary at the oracle SF, and a seeded
    random battery biased toward the hard cases (y-chains, vowel runs,
    bare suffixes, digit tokens, 1-2 char passthrough)."""
    import random

    import duckdb

    from tests.conftest import SF_ORACLE
    from vector_search_service_spark.functions.stemmer import sql_porter_stem_ctes

    rng = random.Random(20260816)
    words = set(CANONICAL)
    words.update("a i be is sky ion oed eed ed ing s y yyyy syzygy".split())
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(600):
        words.add("".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))))
    for _ in range(300):
        words.add("".join(rng.choice("aeiouy") for _ in range(rng.randint(1, 9))))
    sufs = ("ed", "ing", "es", "ies", "sses", "eed", "y", "al", "ion",
            "ment", "ness", "ful", "ative", "ational", "iveness",
            "biliti", "ou", "e", "l", "ll")
    for _ in range(300):
        base = "".join(rng.choice("bcdyaeiou") for _ in range(rng.randint(0, 8)))
        words.add(base + rng.choice(sufs))
    for _ in range(100):
        words.add("".join(rng.choice(alpha + "0123456789") for _ in range(rng.randint(1, 8))))

    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in sorted(words))
    q = (
        f"WITH corpus AS (SELECT unnest(regexp_split_to_array(lower(text),"
        f" '[^a-z0-9]+')) AS tok FROM read_parquet('{SF_ORACLE}/documents.parquet')),"
        f" vocab AS (SELECT DISTINCT tok FROM (SELECT tok FROM corpus"
        f" UNION ALL SELECT * FROM (VALUES {vals}) v(tok))),"
        f" {sql_porter_stem_ctes('vocab')} SELECT tok, stem FROM stems"
    )
    rows = con.sql(q).fetchall()
    assert len(rows) > len(words)  # corpus vocab actually included
    bad = [(t, s, porter_stem(t)) for t, s in rows if porter_stem(t) != s]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_stemmed_search_symmetry(spark):
    from vector_search_service_spark.functions.stemmer import fts_search_stemmed

    docs = spark.createDataFrame(
        [
            (1, "the operators are operating on relational tables"),
            (2, "generalization of conditional probabilities"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    # morphological variants in the query match variants in the docs
    hits = {r["doc_id"] for r in fts_search_stemmed(docs, "operate relations").collect()}
    assert hits == {1}
    hits2 = {r["doc_id"] for r in fts_search_stemmed(docs, "generalize condition").collect()}
    assert hits2 == {2}
    # unstemmed search would miss these (sanity: different match sets)
    from vector_search_service_spark.operators.search import fts_search

    assert fts_search(docs, "operate relations").count() == 0
