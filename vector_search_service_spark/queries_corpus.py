"""Registry entries — second-wave corpus operators: BM25 ranking,
duplicated-n-gram measurement, unigram-LM log-probability quality, and
deterministic mixture interleaving.

These extend the FTS tier (F1-F3, ``functions/analysis.py``) and the
LLM-pipeline tier (``queries_textan.py`` / ``queries_curate*.py``)
with the ranking and dup-measurement operators a training-data
pipeline runs corpus-wide:

- **BM25** is the scale-standard lexical ranker (the reference ships
  ``ts_rank_cd``, ``src/core/vector_store.py:218``; BM25 adds the
  document-length prior and corpus IDF that matter once collections
  stop fitting one Postgres node). Corpus stats (N, avgdl, per-term
  df) are one tiny aggregate broadcast into a narrow scoring
  projection — at 100 TB those stats come from the maintained postings
  index (``operators/fts_index.py``) instead of a second scan.
- **Duplicated n-gram spans** measures how much of each document is
  corpus-duplicated text (the signal behind exact-substring dedup,
  Lee et al. 2022): explode shingles, find shingles in ≥2 docs, count
  per-doc duplicated positions. Shuffles are (shingle, doc_id) pairs
  only — never document text.
- **Unigram log-prob** is the classic perplexity-proxy quality score:
  corpus unigram LM, per-doc mean token log-probability. Per-token
  log-probs are quantized to integer micro-nats *before* the per-doc
  sum, so the aggregate is order-independent and engine-exact
  ([[spark-duckdb-oracle-parity]]: never cross-row float sums).
- **Mixture interleave** emits the deterministic round-robin training
  order over sources (position p of every source before position p+1
  of any) — the order a mixture dataloader consumes; hash-keyed so it
  is stable under re-runs and repartitioning, per-source windows so
  the sort is partitioned (no global skew point).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .functions.analysis import sql_tokens_expr, tokens_col
from .functions.hashing import sql_shingles_expr, sql_words_expr, words_col
from .registry import register
from .sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("hash", "join", "merge", "stream")  # FTS_QUERY + one rarer term


def _tf(tokens: Column, term: str) -> Column:
    # factory, not a default-arg lambda: a 2-arg lambda would bind as
    # (element, index) in Spark's higher-order-function binder
    return F.size(F.filter(tokens, lambda x: x == F.lit(term)))


def _bm25_contrib(tf: Column, df: Column, n: Column, dl: Column, avgdl: Column) -> Column:
    idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
    denom = tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / avgdl)
    return idf * (tf * F.lit(BM25_K1 + 1.0)) / denom


def _sql_bm25_contrib(tf: str, df: str, n: str, dl: str, avgdl: str) -> str:
    # mirrors _bm25_contrib term for term, in the same operation order
    idf = f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    denom = f"({tf} + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * {dl} / {avgdl}))"
    return f"{idf} * ({tf} * {BM25_K1 + 1.0}) / {denom}"


_TOKENS_SQL = sql_tokens_expr("text")
_BM25_TF_SQL = [
    f"CAST(len(list_filter(tokens, x -> x = '{t}')) AS DOUBLE)" for t in BM25_TERMS
]
_BM25_SCORE_SQL = " + ".join(
    _sql_bm25_contrib(f"tf_{i}", f"df_{i}", "n", "dl", "avgdl")
    for i in range(len(BM25_TERMS))
)


@register(
    "bm25_topk",
    survey_ref="F2 extension: BM25 ranking (corpus-IDF + length prior over ts_rank's TF)",
    tags=("fts", "corpus", "headline"),
    oracle=f"""
WITH toked AS (
  SELECT doc_id, lang, source, {_TOKENS_SQL} AS tokens FROM documents
), d AS (
  SELECT doc_id, lang, source,
         CAST(len(tokens) AS DOUBLE) AS dl,
         {', '.join(f'{tf} AS tf_{i}' for i, tf in enumerate(_BM25_TF_SQL))}
  FROM toked
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
         {', '.join(f'CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}' for i in range(len(BM25_TERMS)))}
  FROM d
)
SELECT doc_id, lang, source, round({_BM25_SCORE_SQL}, 6) AS bm25_r
FROM d, stats
WHERE {_BM25_SCORE_SQL} > 0
ORDER BY bm25_r DESC, doc_id LIMIT 20
""",
)
def q_bm25_topk(spark, sf_dir):
    """BM25 top-k (OR semantics — any query term scores; the AND
    variant is P7's ``match_all_terms`` filter composed in front).

    Plan: one pass builds (dl, per-term tf) as a narrow projection;
    a map-side-combined aggregate reduces it to ONE stats row
    (N, avgdl, per-term df) that is broadcast back into the scoring
    projection (J3's 1-row-crossJoin shape); TakeOrderedAndProject
    keeps k × partitions rows moving. Score arithmetic is a fixed
    per-row expression tree (integer tf/df/dl → doubles, summed in
    declared term order) — bit-reproducible across engines, no float
    aggregation anywhere."""
    from .sources.tables import parallelize_scan

    docs = load_table(spark, sf_dir, "documents")
    toked = parallelize_scan(docs.select("doc_id", "lang", "source", "text"),
                             spark).select(
        "doc_id", "lang", "source", tokens_col(F.col("text")).alias("tokens")
    )
    d = toked.select(
        "doc_id", "lang", "source",
        F.size("tokens").cast("double").alias("dl"),
        *[_tf(F.col("tokens"), t).cast("double").alias(f"tf_{i}")
          for i, t in enumerate(BM25_TERMS)],
    )
    # r12 optimization: tokenize ONCE. The stats aggregate and the
    # scoring projection both consume `d`; without a lineage cut
    # Catalyst plans two full scan+tokenize subtrees (the regex split
    # is the whole per-row cost). localCheckpoint materializes the
    # NARROW (dl, tf_i) table — tens of bytes/doc, spillable — so the
    # corpus TEXT is read and tokenized exactly once (the r6
    # tfidf/temperature_mixture lineage-cut precedent). Measured at
    # sf0.1 (interleaved 6×): med 1.60 -> 0.99 s, min 1.28 -> 0.90 s;
    # with parallelize_scan spreading the tokenize (single-file local
    # corpus = 1-task scan; no-op at real scale).
    d = d.localCheckpoint()
    stats = d.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum(F.col("dl").cast("long")).cast("double") / F.count("*")).alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).cast("double").alias(f"df_{i}")
          for i in range(len(BM25_TERMS))],
    )
    score = None
    for i in range(len(BM25_TERMS)):
        c = _bm25_contrib(
            F.col(f"tf_{i}"), F.col(f"df_{i}"), F.col("n"),
            F.col("dl"), F.col("avgdl"),
        )
        score = c if score is None else score + c
    return (
        d.crossJoin(F.broadcast(stats))
        .withColumn("bm25", score)
        .filter(F.col("bm25") > 0)
        .select("doc_id", "lang", "source", F.round("bm25", 6).alias("bm25_r"))
        .orderBy(F.desc("bm25_r"), "doc_id")
        .limit(20)
    )


_WORDS_SQL = sql_words_expr("text")
_SHINGLES_SQL = sql_shingles_expr(_WORDS_SQL, 3)


@register(
    "duplicate_ngram_spans",
    survey_ref="LLM-pipeline: exact-substring duplication measurement (dedup tier)",
    tags=("dedup", "corpus", "headline"),
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
), pairs AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), dup AS (
  SELECT s FROM pairs GROUP BY s HAVING count(DISTINCT doc_id) >= 2
), marked AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
  FROM pairs JOIN dup USING (s) GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_total FROM sh
)
SELECT t.doc_id, n_total,
       COALESCE(n_dup, 0) AS n_dup,
       CASE WHEN n_total > 0
            THEN round(CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_total, 6)
            ELSE 0.0 END AS dup_frac
FROM tot t LEFT JOIN marked m ON t.doc_id = m.doc_id
ORDER BY t.doc_id LIMIT 500
""",
)
def q_duplicate_ngram_spans(spark, sf_dir):
    """Per-document duplicated-text fraction: positions whose 3-gram
    shingle occurs in ≥2 distinct documents (the corpus-duplicated
    spans exact-substring dedup would cut, Lee et al. 2022 scaled down
    to shingle granularity).

    Scale shape — one scan, two shuffles, ids only: an Arrow pandas
    UDF tokenizes, shingles and hashes in one batch pass
    (``shingle_hashes64_udf`` — the expression-pipeline transform/
    concat_ws chain is CodegenFallback-interpreted and measured ~2×
    this whole query), so the exploded stream carries (doc_id,
    hash64) — 16 bytes/row, no shingle string ever materializes.
    "Shared with another doc" is min(doc_id) ≠ max(doc_id) over a
    window partitioned by the shingle hash (one shuffle+sort; no
    countDistinct expand, no join back — the window keeps every
    position row, so n_total and n_dup fall out of ONE per-doc
    aggregate, the second, map-side-combined shuffle). The oracle
    groups the raw shingle strings — identical equivalence classes up
    to a 64-bit collision (odds ~1e-7 at this corpus, ~1e-4 per
    billion distinct shingles; an exact deployment would widen to
    md5-128)."""
    from .operators.dedup import shingle_hashes64_udf
    from .sources.tables import parallelize_scan

    docs = load_table(spark, sf_dir, "documents")
    sh = parallelize_scan(docs.select("doc_id", "text"), spark)
    pairs = (
        sh.select("doc_id", shingle_hashes64_udf(3)(F.col("text")).alias("hs"))
        .select("doc_id", F.explode("hs").alias("s64"))
    )
    w = Window.partitionBy("s64")
    marked = pairs.select(
        "doc_id",
        (F.min("doc_id").over(w) != F.max("doc_id").over(w)).alias("is_dup"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id", "n_total", "n_dup",
            F.when(
                F.col("n_total") > 0,
                F.round(F.col("n_dup").cast("double") / F.col("n_total"), 6),
            ).otherwise(F.lit(0.0)).alias("dup_frac"),
        )
        .orderBy("doc_id").limit(500)
    )


_SPAN_MIN = 2  # ≥2 consecutive duplicated 3-gram positions = ≥4 shared tokens


@register(
    "duplicate_span_extract",
    survey_ref="LLM-pipeline: exact-substring dedup cut-list "
               "(Lee et al. 2022 'Deduplicating Training Data Makes "
               "Language Models Better' — the maximal duplicated spans "
               "a dedup pass would actually remove; completes the "
               "measurement of duplicate_ngram_spans)",
    tags=("dedup", "corpus"),
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
), pos AS (
  SELECT doc_id, unnest(shingles) AS s,
         generate_subscripts(shingles, 1) - 1 AS p
  FROM sh
), dup AS (
  SELECT s FROM pos GROUP BY s
  HAVING min(doc_id) <> max(doc_id)
), dpos AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM pos JOIN dup USING (s)
), spans AS (
  SELECT doc_id, min(p) AS start_pos, max(p) AS end_pos,
         CAST(count(*) AS BIGINT) AS n_shingles
  FROM dpos GROUP BY doc_id, grp
)
SELECT doc_id, start_pos, end_pos, n_shingles
FROM spans WHERE n_shingles >= {_SPAN_MIN}
ORDER BY n_shingles DESC, doc_id, start_pos LIMIT 1000
""",
)
def q_duplicate_span_extract(spark, sf_dir):
    """Maximal corpus-duplicated spans per document — the cut-list of
    exact-substring dedup (Lee et al. 2022), at 3-gram shingle
    granularity: a span is a maximal run of consecutive token
    positions whose shingles each occur in ≥2 distinct documents, and
    only runs of ≥ _SPAN_MIN shingles (≥ k+1 shared tokens) survive —
    single-shingle coincidences are noise, runs are copies.

    Where ``duplicate_ngram_spans`` measures HOW MUCH of each doc is
    duplicated and ``dedup_span_clean`` re-emits the cleaned text,
    this yields the (start, end) offsets themselves — the reviewable
    cut-list between measurement and rewrite. Runs are merged with the gaps-and-islands
    trick: within a doc, duplicated positions p in a maximal
    consecutive run share p − row_number() (one window over the
    doc-id partition — no self-join, no collect); the dup test is
    min(doc)≠max(doc) per shingle class, the same no-countDistinct
    shape as the sibling entry.

    Scale shape — one scan, shuffles carry ids only: the Arrow UDF
    emits positional 8-byte shingle hashes (text never shuffles); the
    dup-class test is a semi-join on the hash; the island window
    re-shuffles (doc_id, pos) pairs — 16 B/row. At 100 TB every stage
    is hash- or doc-partitioned with no all-pairs anywhere; the
    oracle replays the identical spans over raw shingle strings
    (collision odds as documented on ``shingle_hashes64_udf``)."""
    from .operators.dedup import shingle_hashes64_udf
    from .sources.tables import parallelize_scan

    docs = load_table(spark, sf_dir, "documents")
    sh = parallelize_scan(docs.select("doc_id", "text"), spark)
    pos = sh.select(
        "doc_id",
        F.posexplode(shingle_hashes64_udf(3)(F.col("text"))).alias("p", "s64"),
    )
    dup = (
        pos.groupBy("s64")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("s64")
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("p").asc())
    dpos = (
        pos.join(dup, "s64", "semi")
        .withColumn("grp", F.col("p") - F.row_number().over(wd))
    )
    return (
        dpos.groupBy("doc_id", "grp")
        .agg(
            F.min("p").cast("long").alias("start_pos"),
            F.max("p").cast("long").alias("end_pos"),
            F.count("*").alias("n_shingles"),
        )
        .filter(F.col("n_shingles") >= _SPAN_MIN)
        .select("doc_id", "start_pos", "end_pos", "n_shingles")
        # Longest spans first (ADVICE r8): the LIMIT saturates already
        # at sf0.001, so an id-ordered slice would grade only the
        # lowest-doc_id prefix forever; n_shingles DESC makes the graded
        # rows the most-duplicated spans at every scale factor. Total
        # order: (doc_id, start_pos) is unique per span.
        .orderBy(F.col("n_shingles").desc(), "doc_id", "start_pos")
        .limit(1000)
    )


@register(
    "unigram_logprob",
    survey_ref="LLM-pipeline: perplexity-proxy quality (corpus unigram LM)",
    tags=("textan", "corpus", "headline"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), pos AS (
  SELECT doc_id, unnest(words) AS tok FROM w
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM pos GROUP BY tok
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
), scored AS (
  SELECT tok,
         CAST(round((ln(CAST(cnt AS DOUBLE)) - ln(CAST(total AS DOUBLE))) * 1000000) AS BIGINT) AS micro
  FROM vocab, tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(micro) AS BIGINT) AS logprob_micro,
       round(CAST(sum(micro) AS DOUBLE) / (count(*) * 1000000.0), 6) + 0.0 AS mean_logprob_r
FROM pos JOIN scored USING (tok)
GROUP BY doc_id ORDER BY doc_id LIMIT 500
""",
)
def q_unigram_logprob(spark, sf_dir):
    """Corpus-unigram-LM quality score: sum over token positions of
    ln P(tok) with P from the corpus itself; low mean log-prob =
    surprising/garbled text, high = boilerplate-typical.

    Exactness: ln P is computed once per *vocabulary entry* and
    quantized to integer micro-nats there; the per-document aggregate
    then sums integers — order-independent, partition-independent,
    engine-exact. The vocab join is AQE-owned (r10 audit): a raw-token
    vocabulary grows ~Heaps' n^0.5 plus web noise (URLs, hashes,
    numerics) — 1e8-1e9 distinct tokens at 100 TB, NOT provably
    broadcastable — so no forced hint; AQE broadcasts the measured
    table when it fits (it does at bench scale) and falls back to a
    shuffled hash join on the token otherwise. A production deployment
    caps the LM vocab (top-K by count + OOV smoothing mass), which
    restores guaranteed-broadcast — the KN bigram/trigram entries'
    scored tables take the same AQE-owned stance. Only shuffles:
    the vocab aggregate and the final per-doc sum, both map-side
    combined."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    pos = w.select("doc_id", F.explode("words").alias("tok"))
    vocab = pos.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.round(
                (F.log(F.col("cnt").cast("double"))
                 - F.log(F.col("total").cast("double"))) * 1000000
            ).cast("long").alias("micro"),
        )
    )
    return (
        pos.join(scored, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("micro").alias("logprob_micro"),
            # + 0.0 normalizes IEEE -0.0 to +0.0 (the byte-hash
            # signed-zero class; a near-zero negative mean rounds to
            # -0.0 in one engine and +0.0 in the other otherwise)
            (F.round(
                F.sum("micro").cast("double")
                / (F.count("*") * F.lit(1000000.0)), 6,
            ) + F.lit(0.0)).alias("mean_logprob_r"),
        )
        .orderBy("doc_id").limit(500)
    )


_UNI_VOCAB_K = 1024  # capped-LM vocabulary size (config constant)


@register(
    "unigram_logprob_capped",
    survey_ref="LLM-pipeline: perplexity-proxy quality, CAPPED-vocab "
               "production tier (top-K LM + lumped OOV mass)",
    # headline since r11 (VERDICT r10 next-round #7): the production
    # LM tier is bench-tracked; the pre-r11 bench set is unchanged
    # (append, don't replace — comparability)
    tags=("textan", "corpus", "headline"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), pos AS (
  SELECT doc_id, unnest(words) AS tok FROM w
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM pos GROUP BY tok
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
), topk AS (
  SELECT tok, cnt FROM vocab ORDER BY cnt DESC, tok LIMIT {_UNI_VOCAB_K}
), inv AS (
  SELECT tok,
         CAST(round((ln(CAST(cnt AS DOUBLE)) - ln(CAST(total AS DOUBLE))) * 1000000) AS BIGINT) AS micro
  FROM topk, tot
), ins AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS in_cnt FROM topk
), oov AS (
  SELECT CASE WHEN total > in_cnt
              THEN CAST(round((ln(CAST(total - in_cnt AS DOUBLE)) - ln(CAST(total AS DOUBLE))) * 1000000) AS BIGINT)
         END AS oov_micro
  FROM tot, ins
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN inv.micro IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(coalesce(inv.micro, oov.oov_micro)) AS BIGINT) AS logprob_micro,
       round(CAST(sum(coalesce(inv.micro, oov.oov_micro)) AS DOUBLE)
             / (count(*) * 1000000.0), 6) + 0.0 AS mean_logprob_r
FROM pos LEFT JOIN inv USING (tok) CROSS JOIN oov
GROUP BY doc_id ORDER BY doc_id LIMIT 500
""",
)
def q_unigram_logprob_capped(spark, sf_dir):
    """The GUARANTEED-BROADCAST production tier of ``unigram_logprob``
    (the deferred fix named in its r10 de-hint): the LM keeps only the
    top-K vocabulary entries by count (K = 1024, a config constant —
    so the broadcast hint is legal under the r10 audit rule) and lumps
    every out-of-vocabulary token into one OOV symbol whose
    probability is the leftover count mass. This is how real pipelines
    bound an LM table against a Heaps-law-unbounded raw vocabulary:
    P(tok) = cnt/total in-vocab, P(OOV) = (total − in_cnt)/total
    lumped, both quantized to integer micro-nats at the vocabulary
    entry (order-independent, engine-exact — the sibling's exactness
    contract). The top-K selection is TakeOrderedAndProject with a
    total order (cnt DESC, tok ASC — byte-identical collation in both
    engines), never a global sort; the K-row scored table and the
    1-row OOV score broadcast into the position stream, so the corpus
    never shuffles for the join — the plan the uncapped sibling cannot
    guarantee. n_oov per doc is the tier's own quality signal (heavy
    OOV = vocabulary-atypical text)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    pos = w.select("doc_id", F.explode("words").alias("tok"))
    # lineage cuts (the reused-tiny-table discipline): vocab feeds two
    # branches (total + top-K) and topk feeds two more (scores + in-
    # vocab mass) — without the cuts every branch re-plans the corpus
    # scan (measured: 4 document scans in the uncut plan)
    vocab = (
        pos.groupBy("tok").agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = vocab.agg(F.sum("cnt").alias("total"))
    topk = (
        vocab.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(_UNI_VOCAB_K)
        .localCheckpoint(eager=False)
    )
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    # bound: ≤ K = 1024 rows (config constant; r10 audit rule)
    inv = (
        topk.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.round((ln(F.col("cnt")) - ln(F.col("total"))) * 1000000)
             .cast("long").alias("micro"),
        )
    )
    ins = topk.agg(F.sum("cnt").alias("in_cnt"))
    # bound: exactly 1 row
    oov = (
        tot.crossJoin(F.broadcast(ins))
        .select(
            F.when(
                F.col("total") > F.col("in_cnt"),
                F.round((ln(F.col("total") - F.col("in_cnt"))
                         - ln(F.col("total"))) * 1000000).cast("long"),
            ).alias("oov_micro")
        )
    )
    m = F.coalesce(F.col("micro"), F.col("oov_micro"))
    return (
        pos.join(F.broadcast(inv), "tok", "left")
        .crossJoin(F.broadcast(oov))
        .select("doc_id", F.col("micro").isNull().alias("_oov"), m.alias("m"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_oov"), 1).otherwise(0))
             .cast("long").alias("n_oov"),
            F.sum("m").alias("logprob_micro"),
            (F.round(
                F.sum("m").cast("double")
                / (F.count("*") * F.lit(1000000.0)), 6,
            ) + F.lit(0.0)).alias("mean_logprob_r"),
        )
        .orderBy("doc_id").limit(500)
    )


@register(
    "mixture_interleave",
    survey_ref="LLM-pipeline: deterministic mixture training order (sampling tier)",
    tags=("pipeline", "corpus"),
    oracle="""
SELECT CAST(pos AS BIGINT) AS pos, source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS pos
  FROM documents)
ORDER BY pos, source, doc_id LIMIT 1000
""",
)
def q_mixture_interleave(spark, sf_dir):
    """Round-robin interleave across sources in a deterministic
    hash-shuffled per-source order: every source's position-p document
    precedes any source's position-p+1 — the balanced order a mixture
    dataloader consumes, reproducible across runs/partitionings.

    The window is partitioned by source (hash-distributed, per-source
    sort — no global sort point); the final ORDER BY is the output
    page only. At 100 TB you'd write `pos` as a column and range-
    partition the export on it instead of sorting the page."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select(
            F.row_number().over(w).cast("long").alias("pos"),
            "source", "doc_id",
        )
        .orderBy("pos", "source", "doc_id").limit(1000)
    )


# ---------------------------------------------------------------------------
# Importance-ratio data selection (DSIR-style, Xie et al. 2023)
# ---------------------------------------------------------------------------

_IR_BUCKETS = 4096
_IR_TARGET = "src1"  # the target domain the raw corpus is reweighted toward
_IR_TOPK = 50


@register(
    "importance_ratio_topk",
    survey_ref="LLM-pipeline: DSIR-style importance-ratio data selection",
    tags=("pipeline", "corpus"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, source, {_WORDS_SQL} AS words FROM documents
), pos AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(unnest(words)), 1, 8))::UBIGINT % {_IR_BUCKETS} AS b
  FROM w
), counts AS (
  SELECT b,
         CAST(sum(CASE WHEN source = '{_IR_TARGET}' THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
         CAST(sum(CASE WHEN source <> '{_IR_TARGET}' THEN 1 ELSE 0 END) AS BIGINT) AS s_cnt
  FROM pos GROUP BY b
), tot AS (
  SELECT CAST(sum(t_cnt) AS BIGINT) AS t_tot, CAST(sum(s_cnt) AS BIGINT) AS s_tot
  FROM counts
), scored AS (
  SELECT b,
         CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE)) - ln(CAST(t_tot + {_IR_BUCKETS} AS DOUBLE))
                     - ln(CAST(s_cnt + 1 AS DOUBLE)) + ln(CAST(s_tot + {_IR_BUCKETS} AS DOUBLE)))
                    * 1000000) AS BIGINT) AS micro
  FROM counts, tot
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(micro) AS BIGINT) AS lr_micro,
       round(CAST(sum(micro) AS DOUBLE) / (count(*) * 1000000.0), 6) AS lr_per_token_r
FROM pos JOIN scored USING (b)
WHERE source <> '{_IR_TARGET}'
GROUP BY doc_id, source
ORDER BY lr_micro DESC, doc_id ASC LIMIT {_IR_TOPK}
""",
)
def q_importance_ratio_topk(spark, sf_dir):
    """Data selection for a target domain by hashed-unigram importance
    ratio (the DSIR recipe): score every raw document by
    Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)] with add-one
    smoothing over a FIXED 4096-bucket feature space, keep the top-K.
    (DSIR samples with Gumbel noise; deterministic top-K here so the
    selection is oracle-checkable — the score is the contract.)

    Exactness discipline (same as ``unigram_logprob``): the log-ratio
    is computed once per *bucket* and quantized to integer micro-nats
    there; per-document aggregation sums integers, and the ranking key
    is the integer sum — order-, partition- and engine-independent.

    Scale: the feature table is ≤4096 rows BY CONSTRUCTION no matter
    the corpus size (that is DSIR's point), so both count tables and
    the scored table broadcast; the corpus makes one pass to count
    (conditional aggregate, one shuffle on bucket over ≤4096 keys) and
    one pass to score (broadcast join + per-doc integer sum, map-side
    combined on doc_id). Nothing global ever sorts; the top-K is
    TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % _IR_BUCKETS
    )
    pos = (
        docs.select("doc_id", "source", F.explode(words_col(F.col("text"))).alias("tok"))
        .select("doc_id", "source", b.alias("b"))
    )
    is_t = (F.col("source") == _IR_TARGET).cast("long")
    counts = pos.groupBy("b").agg(
        F.sum(is_t).alias("t_cnt"),
        F.sum(1 - is_t).alias("s_cnt"),
    )
    tot = counts.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("s_cnt").alias("s_tot")
    )
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    scored = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (ln(F.col("t_cnt") + 1) - ln(F.col("t_tot") + _IR_BUCKETS)
                 - ln(F.col("s_cnt") + 1) + ln(F.col("s_tot") + _IR_BUCKETS))
                * 1_000_000
            ).cast("long").alias("micro"),
        )
    )
    return (
        pos.filter(F.col("source") != _IR_TARGET)
        .join(F.broadcast(scored), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("micro").alias("lr_micro"),
            F.round(
                F.sum("micro").cast("double") / (F.count("*") * F.lit(1_000_000.0)), 6
            ).alias("lr_per_token_r"),
        )
        .orderBy(F.col("lr_micro").desc(), F.col("doc_id").asc())
        .limit(_IR_TOPK)
    )


_KN_CONTEXTS = ("join", "scan", "order")
_KN_D = 0.75
_KN_TOPK = 10


def kn_bigram_stats(pairs):
    """Interpolated-KN LM stat tables from a (w1, w2) bigram stream:
    bigram counts ``bc(w1, w2, c12)``, context totals ``ctx(w1, c1,
    nf)``, continuation fan-in ``cont(w2, nc)`` and the 1-row distinct-
    type count ``nb``. Shared by the two KN entries; the estimator's
    semantics (Σ_w2 P_KN(w2|w1) = 1 over the continuation vocabulary)
    are pinned by tests/test_kn_lm.py, independent of the DuckDB
    oracle (which re-implements the same formula and so cannot catch a
    formula error)."""
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    bc = bc.localCheckpoint(eager=False)  # feeds all three stats + scoring
    ctx = bc.groupBy("w1").agg(F.sum("c12").alias("c1"), F.count("*").alias("nf"))
    cont = bc.groupBy("w2").agg(F.count("*").alias("nc"))
    nb = bc.agg(F.count("*").alias("nb"))
    return bc, ctx, cont, nb


def kn_p_col():
    """P_KN(w2|w1) over joined (c12, c1, nf, nc, nb) columns — ONE
    fixed chain of scalar double ops from exact integer counts, so
    both engines produce bit-identical doubles (the oracle SQL mirrors
    this chain verbatim). ``c12`` may be 0 for an unseen pair (the
    discounted term vanishes; only continuation mass remains)."""
    return (
        F.greatest(F.col("c12").cast("double") - F.lit(_KN_D), F.lit(0.0))
        / F.col("c1").cast("double")
        + (F.lit(_KN_D) * F.col("nf").cast("double") / F.col("c1").cast("double"))
        * (F.col("nc").cast("double") / F.col("nb").cast("double"))
    )


@register(
    "kneser_ney_bigram_topk",
    survey_ref="extension: interpolated Kneser-Ney bigram LM "
               "(absolute discounting + continuation backoff)",
    tags=("corpus", "textan"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM toks WHERE len(w) >= 2
),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY w1, w2),
ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS nf
  FROM bc GROUP BY w1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM bc GROUP BY w2),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bc),
scored AS (
  SELECT bc.w1, bc.w2,
         greatest(CAST(bc.c12 AS DOUBLE) - {_KN_D}, 0.0) / CAST(ctx.c1 AS DOUBLE)
         + ({_KN_D} * CAST(ctx.nf AS DOUBLE) / CAST(ctx.c1 AS DOUBLE))
           * (CAST(cont.nc AS DOUBLE) / CAST(nb.nb AS DOUBLE)) AS p
  FROM bc
  JOIN ctx ON bc.w1 = ctx.w1
  JOIN cont ON bc.w2 = cont.w2
  CROSS JOIN nb
  WHERE bc.w1 IN {_KN_CONTEXTS!r}
),
ranked AS (
  SELECT w1, w2, p,
         row_number() OVER (PARTITION BY w1 ORDER BY p DESC, w2 ASC) AS rn
  FROM scored
)
SELECT w1, w2, round(p, 6) AS p_kn_r
FROM ranked WHERE rn <= {_KN_TOPK}
ORDER BY w1, p DESC, w2
""",
)
def q_kneser_ney_bigram_topk(spark, sf_dir):
    """Interpolated Kneser-Ney bigram continuations: the standard
    LM-smoothing the n-gram tier of a data pipeline wants (novel-
    continuation mass for rare contexts — Chen & Goodman 1999), over
    the corpus token stream. For each fixed context word, the top-10
    next tokens by

        P_KN(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1)·Pcont(w2),
        Pcont(w2)   = N1+(·w2) / |distinct bigram types|, D = 0.75.

    Cross-engine float discipline: every input is an exact integer
    count; P_KN is one fixed chain of scalar double ops evaluated in
    the same order by both engines (same shape as ``bm25_topk``),
    rounded only in the output.

    Scale: ONE map-side-combined shuffle builds the bigram table (the
    corpus is never re-shuffled); context/continuation stats aggregate
    the shrinking bigram table on its own keys; the |contexts|-sized
    candidate slice joins continuation stats and the 1-row type count
    by broadcast; per-context top-k is WindowGroupLimit-pruned."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(words_col(F.col("text")).alias("w")).filter(F.size("w") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc, ctx, cont, nb = kn_bigram_stats(pairs)
    cand = bc.filter(F.col("w1").isin(*_KN_CONTEXTS))
    w = Window.partitionBy("w1").orderBy(F.col("p").desc(), F.col("w2").asc())
    return (
        cand.join(F.broadcast(ctx.filter(F.col("w1").isin(*_KN_CONTEXTS))), "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nb))
        .withColumn("p", kn_p_col())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KN_TOPK)
        # order on the RAW p (the window's own sort key), not the
        # rounded output — two continuations can round to the same 6dp
        # value while raw p still orders them (review-caught; rounding
        # belongs in the output, never the ordering — vector_topk rule)
        .orderBy("w1", F.col("p").desc(), "w2")
        .select("w1", "w2", F.round("p", 6).alias("p_kn_r"))
    )


@register(
    "bigram_kn_logprob",
    survey_ref="extension: per-document perplexity under the interpolated "
               "Kneser-Ney bigram LM (CCNet-style quality filter)",
    tags=("corpus", "textan"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM toks WHERE len(w) >= 2
),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY w1, w2),
ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS nf
  FROM bc GROUP BY w1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM bc GROUP BY w2),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bc),
scored AS (
  SELECT bc.w1, bc.w2,
         CAST(round(ln(
           greatest(CAST(bc.c12 AS DOUBLE) - {_KN_D}, 0.0) / CAST(ctx.c1 AS DOUBLE)
           + ({_KN_D} * CAST(ctx.nf AS DOUBLE) / CAST(ctx.c1 AS DOUBLE))
             * (CAST(cont.nc AS DOUBLE) / CAST(nb.nb AS DOUBLE))
         ) * 1000000) AS BIGINT) AS micro
  FROM bc
  JOIN ctx ON bc.w1 = ctx.w1
  JOIN cont ON bc.w2 = cont.w2
  CROSS JOIN nb
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(micro) AS BIGINT) AS kn_micro,
       round(CAST(sum(micro) AS DOUBLE) / (count(*) * 1000000.0), 6) + 0.0 AS mean_kn_r
FROM pairs JOIN scored USING (w1, w2)
GROUP BY doc_id ORDER BY doc_id LIMIT 500
""",
)
def q_bigram_kn_logprob(spark, sf_dir):
    """Per-document mean bigram log-probability under the corpus's own
    interpolated Kneser-Ney LM — the CCNet-style perplexity filter
    (Wenzek et al. 2020): low mean log-prob = surprising/garbled text,
    high = boilerplate-typical. This is ``unigram_logprob``'s
    production-grade sibling: the bigram LM with KN smoothing is what
    perplexity-based quality filtering actually runs.

    Exactness (same discipline as ``unigram_logprob`` /
    ``importance_ratio_topk``): ln P_KN is computed ONCE per *bigram
    type* — every input to the P_KN chain is an exact integer count,
    so both engines evaluate the identical scalar double chain — and
    quantized to integer micro-nats there; the per-document aggregate
    sums integers, so it is order-, partition- and engine-independent.
    In-doc bigrams always exist in the corpus bigram table (it was
    built from the same stream), so the scoring join is total and no
    unseen-event backoff path is needed here.

    Scale: ONE map-side-combined shuffle builds the bigram-type table
    (the corpus position stream is streamed through it, never
    checkpointed); the LM stats aggregate the shrinking type table on
    its own keys; scoring is a shuffle join of (doc_id, w1, w2)
    positions against the (w1, w2, micro) type table — both sides
    partition on the bigram key, nothing corpus-sized ever sorts. The
    type table for a 100 TB corpus exceeds broadcast range, which is
    why the join is left to shuffle (contrast the ≤4096-row DSIR
    feature table, which broadcasts by construction)."""
    return (
        _kn_doc_stats(spark, sf_dir)
        .select(
            "doc_id", "n_bigrams", "kn_micro",
            # + 0.0: signed-zero normalization (see mean_logprob_r)
            (F.round(
                F.col("kn_micro").cast("double")
                / (F.col("n_bigrams") * F.lit(1_000_000.0)), 6
            ) + F.lit(0.0)).alias("mean_kn_r"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


def _kn_doc_stats(spark, sf_dir):
    """Per-document (n_bigrams, kn_micro) under the corpus KN bigram
    LM — the shared scoring pipeline behind ``bigram_kn_logprob`` and
    ``ccnet_ppl_buckets`` (identical operator sequence, so the two
    entries are provably consistent)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .filter(F.size("w") >= 2)
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bc, ctx, cont, nb = kn_bigram_stats(pairs)
    scored = (
        bc.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2",
            F.round(F.log(kn_p_col()) * 1_000_000).cast("long").alias("micro"),
        )
    )
    return (
        pairs.join(scored, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("micro").alias("kn_micro"),
        )
    )


@register(
    "dedup_span_clean",
    survey_ref="LLM-pipeline: exact-substring duplicate REMOVAL (the "
               "transform behind the duplicate_ngram_spans measurement; "
               "Lee et al. 2022 / C4-style span cleaning)",
    tags=("dedup", "corpus"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
),
sh AS (
  SELECT doc_id, unnest(range(1, len(words) - 1)) AS j, words
  FROM w WHERE len(words) >= 3
),
sh2 AS (
  SELECT doc_id, j, array_to_string(list_slice(words, j, j + 2), ' ') AS s
  FROM sh
),
dup AS (SELECT s FROM sh2 GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT sh2.doc_id, sh2.j + t.d AS p
  FROM sh2 JOIN dup USING (s), unnest([0, 1, 2]) AS t(d)
),
covl AS (SELECT doc_id, list(p) AS ps FROM cov GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(words) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(ps), 0) AS BIGINT) AS n_removed,
       -- array_to_string([]) is NULL in DuckDB (Spark concat_ws gives
       -- ''): coalesce so a fully-cut document hashes the empty string
       sha256(COALESCE(array_to_string(
         list_transform(
           list_filter(range(1, len(words) + 1),
                       p -> NOT list_contains(COALESCE(ps, []), p)),
           p -> words[p]), ' '), '')) AS cleaned_sha
FROM w LEFT JOIN covl ON w.doc_id = covl.doc_id
ORDER BY w.doc_id LIMIT 500
""",
)
def q_dedup_span_clean(spark, sf_dir):
    """Exact-substring duplicate REMOVAL — the transform
    ``duplicate_ngram_spans`` only measures: every token position
    covered by a 3-gram that occurs in ≥2 distinct documents is
    dropped, and the cleaned document is re-emitted (as its sha256, so
    the rewrite itself is what the driver hashes). Docs shorter than
    one window (< 3 tokens) are never cut.

    Scale shape: the corpus text NEVER shuffles. The exploded stream is
    (doc_id, position, hash64) — 16 B/row — positional duplicates come
    from the same min≠max window as the measurement entry, covered
    positions collapse to ONE small int-array per affected document
    (bounded by doc length), and that array joins back to the documents
    table where the rewrite is a map-side array expression
    (filter/transform over the words column — codegen, no UDF). The
    oracle groups raw shingle strings; hash identity is Spark-side only
    (same 64-bit collision-odds caveat as ``duplicate_ngram_spans``,
    and the deliberate-collision parity caveat documented there)."""
    from .operators.dedup import shingle_hashes64_udf
    from .sources.tables import parallelize_scan

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", words_col(F.col("text")).alias("words"))
    sh = parallelize_scan(docs.select("doc_id", "text"), spark).filter(
        F.size(words_col(F.col("text"))) >= 3
    )
    pairs = sh.select(
        "doc_id", F.posexplode(shingle_hashes64_udf(3)(F.col("text")))
    ).select("doc_id", (F.col("pos") + 1).alias("j"), F.col("col").alias("s64"))
    w = Window.partitionBy("s64")
    cov = (
        pairs.withColumn(
            "is_dup", F.min("doc_id").over(w) != F.max("doc_id").over(w)
        )
        .filter("is_dup")
        .select(
            "doc_id",
            F.explode(
                F.array(F.col("j"), F.col("j") + 1, F.col("j") + 2)
            ).alias("p"),
        )
        # no .distinct() here: the collect_set below IS the per-doc
        # dedup — a pre-distinct would shuffle the coverage stream twice
    )
    covl = cov.groupBy("doc_id").agg(F.collect_set("p").alias("ps"))
    # a zero-token doc must yield []: F.sequence(1, 0) is the
    # DESCENDING [1, 0] and element_at(words, 0) throws, where the
    # oracle's range(1, 1) is empty (review-caught; pinned by
    # tests/test_span_clean.py on a synthetic empty-text doc)
    kept = F.when(F.size("words") > 0, F.transform(
        F.filter(
            F.sequence(F.lit(1), F.size("words")),
            lambda p: ~F.exists("ps", lambda q: q == p),
        ),
        lambda p: F.element_at("words", p),
    )).otherwise(F.array().cast("array<string>"))
    return (
        base.join(covl, "doc_id", "left")
        .withColumn("ps", F.coalesce("ps", F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.size("words").cast("long").alias("n_tokens"),
            F.size("ps").cast("long").alias("n_removed"),
            F.sha2(F.concat_ws(" ", kept), 256).alias("cleaned_sha"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


@register(
    "ccnet_ppl_buckets",
    survey_ref="extension: CCNet perplexity bucketing (head/middle/tail "
               "terciles under the corpus KN bigram LM)",
    tags=("corpus", "textan"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
  FROM toks WHERE len(w) >= 2
),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY w1, w2),
ctx AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS nf
  FROM bc GROUP BY w1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM bc GROUP BY w2),
nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bc),
scored AS (
  SELECT bc.w1, bc.w2,
         CAST(round(ln(
           greatest(CAST(bc.c12 AS DOUBLE) - {_KN_D}, 0.0) / CAST(ctx.c1 AS DOUBLE)
           + ({_KN_D} * CAST(ctx.nf AS DOUBLE) / CAST(ctx.c1 AS DOUBLE))
             * (CAST(cont.nc AS DOUBLE) / CAST(nb.nb AS DOUBLE))
         ) * 1000000) AS BIGINT) AS micro
  FROM bc
  JOIN ctx ON bc.w1 = ctx.w1
  JOIN cont ON bc.w2 = cont.w2
  CROSS JOIN nb
),
docstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS nb2, CAST(sum(micro) AS BIGINT) AS km
  FROM pairs JOIN scored USING (w1, w2) GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, nb2, km,
         row_number() OVER (ORDER BY CAST(km AS DOUBLE) / nb2 DESC, doc_id ASC) AS r,
         count(*) OVER () AS n
  FROM docstats
)
SELECT CASE WHEN r * 3 <= n THEN 'head'
            WHEN r * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(km) AS BIGINT) AS sum_kn_micro,
       CAST(sum(nb2) AS BIGINT) AS sum_bigrams
FROM ranked GROUP BY 1 ORDER BY bucket
""",
)
def q_ccnet_ppl_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split (Wenzek et al. 2020): rank every
    document by mean log-probability under the corpus's own KN bigram
    LM (``_kn_doc_stats`` — the identical pipeline behind
    ``bigram_kn_logprob``), then cut exact terciles — 'head' is the
    most LM-typical third, the slice CCNet keeps for pretraining. The
    per-doc mean is one division of exact integers (correctly-rounded
    identical double in both engines); ties break on doc_id, so the
    tercile assignment — and therefore the per-bucket integer rollup —
    is deterministic.

    Scale: the ranked input is the per-doc stats table (3 numbers per
    doc — the corpus text stays in the scoring stage); the exact
    tercile rank at 100 TB uses the two-phase range-partition rank
    (``repartitionByRange`` + per-partition offsets, exactly the
    ``range_shards`` construction) instead of this single global
    window; CCNet itself only needs the two boundary VALUES, which
    that pass yields for free."""
    stats = _kn_doc_stats(spark, sf_dir)
    w = Window.orderBy(
        (F.col("kn_micro").cast("double") / F.col("n_bigrams")).desc(),
        F.col("doc_id").asc(),
    )
    ranked = stats.select(
        "doc_id", "n_bigrams", "kn_micro",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    bucket = (
        F.when(F.col("r") * 3 <= F.col("n"), "head")
        .when(F.col("r") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
    )
    return (
        ranked.select(bucket.alias("bucket"), "kn_micro", "n_bigrams")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kn_micro").alias("sum_kn_micro"),
            F.sum("n_bigrams").alias("sum_bigrams"),
        )
        .orderBy("bucket")
    )


def kn_trigram_stats(tri):
    """3-level interpolated-KN stat tables from a (w1, w2, w3) trigram
    stream: trigram type counts ``tc``, top context totals ``ctx12``,
    the KN continuation bigram universe ``mb(w2, w3, nmid)`` with its
    context totals ``mctx``, unigram fan-in ``lo`` and the 1-row
    continuation-type total ``nbt``. Normalization Σ P = 1 per (w1,w2)
    context is pinned by tests/test_kn_lm.py through THIS builder."""
    tc = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c123"))
    tc = tc.localCheckpoint(eager=False)  # feeds four stats + scoring
    ctx12 = tc.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12t"), F.count("*").alias("nf12"))
    mb = tc.groupBy("w2", "w3").agg(F.count("*").alias("nmid"))
    mb = mb.localCheckpoint(eager=False)  # feeds two stats + scoring
    mctx = mb.groupBy("w2").agg(
        F.sum("nmid").alias("mtot"), F.count("*").alias("mnf"))
    lo = mb.groupBy("w3").agg(F.count("*").alias("nlo"))
    nbt = mb.agg(F.count("*").alias("nbt"))
    return tc, ctx12, mb, mctx, lo, nbt


def kn3_p_col():
    """P_KN3(w3|w1,w2) over joined (c123, c12t, nf12, nmid, mtot, mnf,
    nlo, nbt) columns — one fixed scalar chain from exact integer type
    counts (mirrored verbatim by the oracle SQL). ``c123`` / ``nmid``
    may be 0 for unseen events (only backoff mass remains)."""
    d = F.lit(_KN_D)
    p_cont_uni = F.col("nlo").cast("double") / F.col("nbt").cast("double")
    p_mid = (
        F.greatest(F.col("nmid").cast("double") - d, F.lit(0.0))
        / F.col("mtot").cast("double")
        + (d * F.col("mnf").cast("double") / F.col("mtot").cast("double"))
        * p_cont_uni
    )
    return (
        F.greatest(F.col("c123").cast("double") - d, F.lit(0.0))
        / F.col("c12t").cast("double")
        + (d * F.col("nf12").cast("double") / F.col("c12t").cast("double"))
        * p_mid
    )


@register(
    "trigram_kn_logprob",
    survey_ref="extension: per-document perplexity under the fully "
               "interpolated 3-level Kneser-Ney trigram LM",
    tags=("corpus", "textan"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w) - 1), i -> w[i + 1])) AS w2,
         unnest(list_transform(range(1, len(w) - 1), i -> w[i + 2])) AS w3
  FROM toks WHERE len(w) >= 3
),
tc AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123 FROM tri GROUP BY w1, w2, w3),
ctx12 AS (
  SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12t, CAST(count(*) AS BIGINT) AS nf12
  FROM tc GROUP BY w1, w2
),
mb AS (SELECT w2, w3, CAST(count(*) AS BIGINT) AS nmid FROM tc GROUP BY w2, w3),
mctx AS (
  SELECT w2, CAST(sum(nmid) AS BIGINT) AS mtot, CAST(count(*) AS BIGINT) AS mnf
  FROM mb GROUP BY w2
),
lo AS (SELECT w3, CAST(count(*) AS BIGINT) AS nlo FROM mb GROUP BY w3),
nbt AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM mb),
scored AS (
  SELECT tc.w1, tc.w2, tc.w3,
         CAST(round(ln(
           greatest(CAST(tc.c123 AS DOUBLE) - {_KN_D}, 0.0) / CAST(ctx12.c12t AS DOUBLE)
           + ({_KN_D} * CAST(ctx12.nf12 AS DOUBLE) / CAST(ctx12.c12t AS DOUBLE)) * (
               greatest(CAST(mb.nmid AS DOUBLE) - {_KN_D}, 0.0) / CAST(mctx.mtot AS DOUBLE)
               + ({_KN_D} * CAST(mctx.mnf AS DOUBLE) / CAST(mctx.mtot AS DOUBLE))
                 * (CAST(lo.nlo AS DOUBLE) / CAST(nbt.nbt AS DOUBLE))
           )
         ) * 1000000) AS BIGINT) AS micro
  FROM tc
  JOIN ctx12 ON tc.w1 = ctx12.w1 AND tc.w2 = ctx12.w2
  JOIN mb ON tc.w2 = mb.w2 AND tc.w3 = mb.w3
  JOIN mctx ON tc.w2 = mctx.w2
  JOIN lo ON tc.w3 = lo.w3
  CROSS JOIN nbt
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(micro) AS BIGINT) AS kn3_micro,
       round(CAST(sum(micro) AS DOUBLE) / (count(*) * 1000000.0), 6) + 0.0 AS mean_kn3_r
FROM tri JOIN scored USING (w1, w2, w3)
GROUP BY doc_id ORDER BY doc_id LIMIT 500
""",
)
def q_trigram_kn_logprob(spark, sf_dir):
    """Per-document mean trigram log-probability under the FULL
    3-level interpolated Kneser-Ney LM — the recursion depth
    production LMs actually smooth with (Chen & Goodman 1999):
    discounted trigram ML interpolated with the KN *continuation*
    bigram (type counts N1+(·w2w3)/N1+(·w2·), not raw bigram counts),
    itself interpolated with the continuation unigram
    N1+(·w3)/N1+(··). Extends ``bigram_kn_logprob`` one level up with
    the same exactness discipline: every estimator input is an exact
    integer TYPE count, ln P is computed once per trigram type as one
    fixed scalar chain, quantized to integer micro-nats there, and the
    per-document aggregate sums integers — order-, partition- and
    engine-independent. In-doc trigrams always exist in the type table
    (built from the same stream), so the scoring join is total.

    Scale: three shrinking type tables (trigram, (w2,w3) continuation,
    unigram fan-in), each built by a map-side-combined groupBy on its
    own keys; scoring joins the position stream against the trigram
    types on the trigram key — the same shuffle family the type table
    was built on, nothing corpus-sized ever sorts. The KN property
    tests (tests/test_kn_lm.py) pin normalization Σ P = 1 per context
    at both levels, which the mirrored oracle cannot catch."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", words_col(F.col("text")).alias("w"))
        .filter(F.size("w") >= 3)
    )
    tri = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 2),
                lambda i: F.struct(
                    F.element_at("w", i).alias("w1"),
                    F.element_at("w", i + 1).alias("w2"),
                    F.element_at("w", i + 2).alias("w3"),
                ),
            )
        ).alias("t"),
    ).select("doc_id", "t.w1", "t.w2", "t.w3")
    tc, ctx12, mb, mctx, lo, nbt = kn_trigram_stats(tri)
    scored = (
        tc.join(ctx12, ["w1", "w2"])
        .join(mb, ["w2", "w3"])
        .join(mctx, "w2")
        .join(lo, "w3")
        .crossJoin(F.broadcast(nbt))
        .select(
            "w1", "w2", "w3",
            F.round(F.log(kn3_p_col()) * 1_000_000).cast("long").alias("micro"),
        )
    )
    return (
        tri.join(scored, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.sum("micro").alias("kn3_micro"),
            # + 0.0: signed-zero normalization (see mean_logprob_r)
            (F.round(
                F.sum("micro").cast("double") / (F.count("*") * F.lit(1_000_000.0)), 6
            ) + F.lit(0.0)).alias("mean_kn3_r"),
        )
        .orderBy("doc_id")
        .limit(500)
    )
