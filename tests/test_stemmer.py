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
