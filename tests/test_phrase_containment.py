"""Edge pins for the two r12 additions: the phrase kernel
(``fts_phrase_topk`` — PostgreSQL phraseto_tsquery/FOLLOWED-BY parity
on the 'simple'-config verbatim stream) and asymmetric containment
dedup (``containment_dedup``). The registry oracle parity runs in
test_oracle_parity.py; these tests pin the semantics the corpus
cannot exercise (overlapping occurrences, short docs, punctuation
normalization, asymmetry, the empty-doc sentinel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_service_spark.functions.analysis import (
    phrase_count_col,
    phrase_terms,
    sql_phrase_count_expr,
    sql_verbatim_tokens_expr,
    verbatim_tokens_col,
)


def _counts(spark, texts, phrase):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    terms = phrase_terms(phrase)
    w = verbatim_tokens_col(F.col("text"))
    return [
        r["n"]
        for r in df.select(phrase_count_col(w, terms).alias("n")).collect()
    ]


def test_phrase_count_basic_and_edges(spark):
    texts = [
        "a hash join x hash join hash",  # two occurrences
        "hash join",                      # doc == phrase
        "join hash",                      # reversed: no match
        "hash",                           # shorter than phrase
        "",                               # empty doc
        "the hash the join",              # stopwords PRESERVED: gap breaks adjacency
        "Hash, JOIN!",                    # case/punct normalization still matches
    ]
    assert _counts(spark, texts, "hash join") == [2, 1, 0, 0, 0, 0, 1]


def test_phrase_overlapping_occurrences_counted(spark):
    # positions may overlap: 'hash hash hash' contains 'hash hash' twice
    assert _counts(spark, ["hash hash hash"], "hash hash") == [2]


def test_phrase_empty_phrase_matches_nothing(spark):
    # empty-tsquery parity: no terms -> count 0 everywhere
    assert _counts(spark, ["anything at all"], " ... ") == [0]


def test_phrase_sql_mirror_bit_identical(spark, duck):
    """The DuckDB mirror must agree with the Spark kernel on the same
    adversarial strings (the oracle-parity sweep only sees corpus
    text)."""
    texts = [
        "a hash join x hash join hash",
        "hash join",
        "join hash",
        "hash",
        "",
        "hash hash hash join join",
        "  hash   join  ",
        "0hash join9 hash join",
    ]
    phrase = "hash join"
    spark_n = _counts(spark, texts, phrase)
    terms = phrase_terms(phrase)
    duck_n = []
    for t in texts:
        lit = "'" + t.replace("'", "''") + "'"
        row = duck.sql(
            f"SELECT {sql_phrase_count_expr('w', terms)} AS n FROM "
            f"(SELECT {sql_verbatim_tokens_expr(lit)} AS w)"
        ).fetchone()
        duck_n.append(row[0])
    assert spark_n == duck_n


def _containment(spark, docs):
    """Run the containment query body over an in-memory corpus (the
    registry entry binds the documents table; this mirrors its exact
    pipeline via the registry fn against a temp view-free path)."""
    from vector_search_service_spark.functions.hashing import (
        shingles_col,
        words_col,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    d = df.select(
        "doc_id",
        F.array_distinct(shingles_col(words_col(F.col("text")))).alias("sh"),
    )
    sizes = d.select(F.col("doc_id").alias("id_a"), F.size("sh").alias("n_a"))
    ex = d.select("doc_id", F.explode("sh").alias("g"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.g") == F.col("b.g"))
              & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    rows = (
        inter.join(sizes, "id_a")
        .withColumn("c", F.col("n_inter").cast("double")
                    / F.col("n_a").cast("double"))
        .collect()
    )
    return {(r["id_a"], r["id_b"]): r["c"] for r in rows}


def test_containment_is_asymmetric(spark):
    short = "alpha beta gamma delta epsilon"
    long = "zero one two " + short + " three four five six seven eight nine"
    c = _containment(spark, [(1, short), (2, long)])
    # every shingle of the short doc appears in the long doc
    assert c[(1, 2)] == 1.0
    # the reverse direction is well below 1 (the long doc has many
    # shingles the short one lacks) — the inclusion fact a symmetric
    # Jaccard threshold would have hidden entirely
    assert c[(2, 1)] < 0.5


def test_containment_empty_docs_pair_via_sentinel(spark):
    # hashing.py keeps the [''] sentinel shingle for empty docs, so two
    # empty docs contain each other exactly (1.0 both directions) —
    # same contract the Jaccard family pins in test_edge_corpus
    c = _containment(spark, [(1, ""), (2, ""), (3, "totally different words here")])
    assert c[(1, 2)] == 1.0 and c[(2, 1)] == 1.0
    assert (1, 3) not in c and (3, 1) not in c


def test_containment_disjoint_docs_produce_no_pair(spark):
    c = _containment(spark, [(1, "aa bb cc dd ee"), (2, "ff gg hh ii jj")])
    assert c == {}


def _near_counts(spark, texts, ta, tb, slop):
    from vector_search_service_spark.functions.analysis import (
        verbatim_tokens_col,
    )

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    w = verbatim_tokens_col(F.col("text"))
    px = (
        docs.select("doc_id", F.posexplode(w).alias("pos0", "tok"))
        .filter(F.col("tok").isin(ta, tb))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    a = px.filter(F.col("tok") == ta).select("doc_id", F.col("pos").alias("pa"))
    b = px.filter(F.col("tok") == tb).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"))
    rows = (
        a.join(b, (F.col("doc_id") == F.col("doc_b"))
               & (F.abs(F.col("pa") - F.col("pb")) <= slop))
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    got = {r["doc_id"]: r["n"] for r in rows}
    return [got.get(i, 0) for i in range(len(texts))]


def test_near_slop_window_semantics(spark):
    texts = [
        "hash a b c d join",      # distance 5 == slop -> counts
        "hash a b c d e join",    # distance 6 > slop -> no pair
        "join x hash",            # unordered: reversed still counts
        "hash join hash join",    # 2x2 positions, all within 5 -> 4 pairs
        "hash only here",         # missing one term
    ]
    assert _near_counts(spark, texts, "hash", "join", 5) == [1, 0, 1, 4, 0]


def test_near_matches_registry_oracle_shape(duck):
    """The oracle's positional-postings form must agree with a hand
    count on an adversarial doc (positions are 1-based on both
    engines)."""
    row = duck.sql("""
WITH d AS (SELECT 1 AS doc_id,
           list_filter(regexp_split_to_array(lower('join hash x x x x join'), '[^a-z0-9]+'),
                       t -> t <> '') AS w),
px AS (SELECT doc_id, i AS pos, w[i] AS tok
       FROM d, unnest(range(1, len(w) + 1)) AS t(i)
       WHERE w[i] IN ('hash', 'join'))
SELECT count(*) FROM px a JOIN px b ON a.doc_id = b.doc_id
WHERE a.tok = 'hash' AND b.tok = 'join' AND abs(a.pos - b.pos) <= 5
""").fetchone()
    # 'hash'@2: 'join'@1 (d=1) and 'join'@7 (d=5) both qualify
    assert row[0] == 2


def test_positional_postings_probe_matches_near_topk(spark, tmp_path):
    """The at-scale proximity path made real: write the positional
    posting table in the lex_bucket layout, probe ONLY the two query
    terms' buckets (partition pruning asserted), run the slop join
    over probe rows — and the top-k must equal the registry entry's
    scan-path answer exactly."""
    import re

    from vector_search_service_spark.operators.fts_index import (
        build_positional_index,
        read_posting_lists,
        write_inverted_index,
    )
    from vector_search_service_spark.plans import explain_str
    from vector_search_service_spark.registry import all_queries
    from vector_search_service_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    path = str(tmp_path / "pos_postings")
    write_inverted_index(build_positional_index(docs), path)

    probe = read_posting_lists(spark, path, ["hash", "join"])
    plan = explain_str(probe)
    m = re.search(r"PartitionFilters: \[[^\]]*lex_bucket[^\]]*", plan)
    assert m, "positional probe did not partition-prune to term buckets"

    a = probe.filter(F.col("lexeme") == "hash").select("doc_id", F.col("pos").alias("pa"))
    b = probe.filter(F.col("lexeme") == "join").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"))
    pairs = (
        a.join(b, (F.col("doc_id") == F.col("doc_b"))
               & (F.abs(F.col("pa") - F.col("pb")) <= 5))
        .groupBy("doc_id").agg(F.count("*").alias("n_pairs"))
    )
    got = (
        pairs.join(docs.select("doc_id", "lang", "source"), "doc_id")
        .select("doc_id", "lang", "source", "n_pairs")
        .orderBy(F.col("n_pairs").desc(), F.col("doc_id").asc())
        .limit(10).collect()
    )
    want = all_queries()["fts_near_topk"].fn(spark, sf).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_positional_postings_replay_phrase_counts(spark, tmp_path):
    """Phrase adjacency (distance exactly +1, ordered) over the SAME
    stored positions must reproduce the expression kernel's counts —
    i.e. the stored pos column is bit-for-bit the kernel's coordinate
    system (1-based verbatim stream)."""
    from vector_search_service_spark.functions.analysis import (
        phrase_count_col,
        verbatim_tokens_col,
    )
    from vector_search_service_spark.operators.fts_index import (
        build_positional_index,
    )

    texts = ["a hash join x hash join hash", "join hash", "hash join", ""]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    px = build_positional_index(docs)
    a = px.filter(F.col("lexeme") == "hash").select("doc_id", F.col("pos").alias("pa"))
    b = px.filter(F.col("lexeme") == "join").select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"))
    stored = {
        r["doc_id"]: r["n"]
        for r in a.join(b, (F.col("doc_id") == F.col("doc_b"))
                        & (F.col("pb") - F.col("pa") == 1))
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    w = verbatim_tokens_col(F.col("text"))
    kernel = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", phrase_count_col(w, ["hash", "join"]).alias("n")).collect()
    }
    for i in range(len(texts)):
        assert stored.get(i, 0) == kernel[i]
