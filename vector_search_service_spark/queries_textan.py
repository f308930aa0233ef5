"""Registry entries — text-analysis suite (language ID, quality
scoring, token counting, fingerprinting) over ``documents``."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import sql_words_expr, words_col
from .operators.textquality import (
    fingerprint_summary,
    lang_id_col,
    quality_score_col,
    sql_fingerprint_summary_exprs,
    sql_lang_id_expr,
    sql_quality_score_expr,
    sql_token_counts_exprs,
    token_counts,
)
from .registry import register
from .sources.tables import load_table

_WORDS = sql_words_expr("text")


@register(
    "lang_id",
    survey_ref="extension: language ID (FTS_LANGUAGE analyzers motivation, SURVEY §7 risk 2)",
    tags=("textan",),
    oracle=f"""
SELECT {sql_lang_id_expr(_WORDS)} AS predicted_lang, lang,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2 ORDER BY predicted_lang, lang
""",
)
def q_lang_id(spark, sf_dir):
    """Marker-token language ID (n-gram-heuristic family), confusion
    counts against the corpus ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(lang_id_col(words_col(F.col("text"))).alias("predicted_lang"), "lang")
        .groupBy("predicted_lang", "lang").agg(F.count("*").alias("n"))
        .orderBy("predicted_lang", "lang")
    )


@register(
    "quality_score",
    survey_ref="extension: quality scoring",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, round({sql_quality_score_expr('text', _WORDS)}, 6) AS quality_r
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_quality_score(spark, sf_dir):
    """Composite quality score (length / type-token ratio / alnum
    cleanliness) — integer-count ratios, engine-identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score_col(F.col("text"), words_col(F.col("text")))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", F.round(q, 6).alias("quality_r"))
    )


_WS_SQL, _BPE_SQL = sql_token_counts_exprs("text")


@register(
    "token_count",
    survey_ref="A5 (extension: tokenizer-aware counting)",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, {_WS_SQL} AS ws_tokens, {_BPE_SQL} AS bpe_tokens
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    ws, bpe = token_counts(F.col("text"))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
    )


_FP_N, _FP_MIN, _FP_MAX = sql_fingerprint_summary_exprs("text")


@register(
    "doc_fingerprint",
    survey_ref="G2 (extension: content-defined fingerprinting)",
    tags=("textan",),
    oracle=f"""
SELECT doc_id, {_FP_N} AS fp_count, {_FP_MIN} AS fp_min, {_FP_MAX} AS fp_max
FROM documents ORDER BY doc_id LIMIT 500
""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Mod-16 sampled shingle-hash fingerprints (winnowing-lite),
    summarized per document — the alignment-robust near-dup /
    provenance signature."""
    docs = load_table(spark, sf_dir, "documents")
    n, lo, hi = fingerprint_summary(F.col("text"))
    return (
        docs.orderBy("doc_id").limit(500)
        .select("doc_id", n.alias("fp_count"), lo.alias("fp_min"), hi.alias("fp_max"))
    )


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_oracle() -> str:
    stop_sum = " + ".join(
        f"CASE WHEN list_contains(w, '{s}') THEN 1 ELSE 0 END"
        for s in _GOPHER_STOPS
    )
    return f"""
WITH d AS (
  SELECT {_WORDS} AS w, text FROM documents
),
m AS (
  SELECT CAST(len(w) AS BIGINT) AS cnt,
         CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS totlen,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         CAST({stop_sum} AS BIGINT) AS n_stop,
         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
         CAST(length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g')) AS BIGINT) AS diff3
  FROM d
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cnt BETWEEN 50 AND 100000 THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_count,
       CAST(sum(CASE WHEN 3 * cnt <= totlen AND totlen <= 10 * cnt THEN 0 ELSE 1 END) AS BIGINT) AS fail_mean_word_len,
       CAST(sum(CASE WHEN 30 * n_hash + 10 * diff3 > 3 * cnt THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
       CAST(sum(CASE WHEN 5 * n_alpha < 4 * cnt THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_words,
       CAST(sum(CASE WHEN n_stop < 2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
       CAST(sum(CASE WHEN cnt BETWEEN 50 AND 100000
                      AND 3 * cnt <= totlen AND totlen <= 10 * cnt
                      AND NOT (30 * n_hash + 10 * diff3 > 3 * cnt)
                      AND NOT (5 * n_alpha < 4 * cnt)
                      AND n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM m
"""


@register(
    "gopher_quality_flags",
    survey_ref="extension: Gopher quality-rule filter (Rae et al. 2021 "
               "rule set, integer-exact)",
    tags=("textan", "corpus"),
    oracle=None,  # set below
)
def q_gopher_quality_flags(spark, sf_dir):
    """The published Gopher pretraining quality rules as a corpus
    filter report: word count in [50, 1e5], mean word length in
    [3, 10], symbol-to-word ratio (#/'...') <= 0.1, >=80% of words
    containing an alphabetic character, and >=2 required stopwords
    present. Every ratio test is INTEGER cross-multiplication
    (``10*symbols > words`` instead of a float divide), so the per-doc
    booleans — and therefore the corpus counts — are bit-identical in
    both engines with no rounding discipline needed at all.

    Scale: one narrow map stage (all five rules are expressions over
    one tokenization, no UDF) into a single map-side-combined global
    aggregate — the filter itself would be the WHERE clause of a
    curation write, adding zero shuffles to the pipeline (compare
    ``curate_corpus``, which composes this shape with dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    cnt = F.size(w).cast("long")
    totlen = F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x)).cast("long")
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("long")
    n_stop = sum(
        F.array_contains(w, s).cast("int") for s in _GOPHER_STOPS
    ).cast("long")
    n_hash = (F.length("text")
              - F.length(F.regexp_replace("text", "#", ""))).cast("long")
    diff3 = (F.length("text")
             - F.length(F.regexp_replace("text", r"\.\.\.", ""))).cast("long")
    m = docs.select(
        cnt.alias("cnt"), totlen.alias("totlen"), n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"), n_hash.alias("n_hash"), diff3.alias("diff3"),
    )
    ok_wc = F.col("cnt").between(50, 100_000)
    ok_mwl = (3 * F.col("cnt") <= F.col("totlen")) & (F.col("totlen") <= 10 * F.col("cnt"))
    bad_sym = 30 * F.col("n_hash") + 10 * F.col("diff3") > 3 * F.col("cnt")
    bad_alpha = 5 * F.col("n_alpha") < 4 * F.col("cnt")
    ok_stop = F.col("n_stop") >= 2
    # CASE-shape flags, NOT boolean casts: a NULL-text doc makes every
    # rule condition NULL, and Spark's sum() would silently SKIP the
    # NULL cast while the oracle's CASE hits its ELSE — the doc must
    # FAIL the rules in both engines (caught by the NULL-row docs in
    # tests/test_edge_corpus.py).
    as_fail = lambda ok: F.sum(F.when(ok, 0).otherwise(1))  # noqa: E731
    as_hit = lambda bad: F.sum(F.when(bad, 1).otherwise(0))  # noqa: E731
    return m.agg(
        F.count("*").alias("n_docs"),
        as_fail(ok_wc).alias("fail_word_count"),
        as_fail(ok_mwl).alias("fail_mean_word_len"),
        as_hit(bad_sym).alias("fail_symbol_ratio"),
        as_hit(bad_alpha).alias("fail_alpha_words"),
        as_fail(ok_stop).alias("fail_stopwords"),
        as_hit(ok_wc & ok_mwl & ~bad_sym & ~bad_alpha & ok_stop)
        .alias("n_pass_all"),
    )


from .registry import _REGISTRY as _RT  # noqa: E402

_RT["gopher_quality_flags"].oracle = _gopher_oracle()


_C4_BADWORDS = ("spam", "clickbait", "xxx")  # stand-in blocklist (the real
# "List of Dirty, Naughty..." file ships with C4; the mechanism is identical)


def _c4_oracle() -> str:
    bad = " OR ".join(
        f"list_contains(w, '{t}')" for t in _C4_BADWORDS
    )
    return f"""
WITH d AS (
  SELECT {_WORDS} AS w, COALESCE(text, '') AS t FROM documents
),
m AS (
  SELECT CASE WHEN regexp_matches(t, '[.!?"]\\s*$') THEN 1 ELSE 0 END AS ok_punct,
         CASE WHEN len(w) >= 5 THEN 1 ELSE 0 END AS ok_words,
         CASE WHEN contains(lower(t), 'lorem ipsum') THEN 1 ELSE 0 END AS hit_lorem,
         CASE WHEN contains(t, '{{') THEN 1 ELSE 0 END AS hit_brace,
         CASE WHEN {bad} THEN 1 ELSE 0 END AS hit_badword
  FROM d
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(1 - ok_punct) AS BIGINT) AS fail_terminal_punct,
       CAST(sum(1 - ok_words) AS BIGINT) AS fail_min_words,
       CAST(sum(hit_lorem) AS BIGINT) AS fail_lorem,
       CAST(sum(hit_brace) AS BIGINT) AS fail_brace,
       CAST(sum(hit_badword) AS BIGINT) AS fail_badwords,
       CAST(sum(CASE WHEN ok_punct = 1 AND ok_words = 1 AND hit_lorem = 0
                      AND hit_brace = 0 AND hit_badword = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM m
"""


@register(
    "c4_clean_flags",
    survey_ref="extension: C4 cleaning rules (Raffel et al. 2020) as a "
               "corpus filter report",
    tags=("textan", "corpus"),
    oracle=None,  # set below
)
def q_c4_clean_flags(spark, sf_dir):
    """The C4 corpus-cleaning rules as a filter report, completing the
    canonical published-filter trio beside ``gopher_quality_flags``
    and ``ccnet_ppl_buckets``: terminal-punctuation requirement,
    minimum word count, 'lorem ipsum' placeholder text, curly-brace
    (code) pages, and blocklist terms (stand-in 3-word list; the real
    C4 blocklist drops into the same ``list_contains`` OR-chain). All
    flags are CASE-shaped integers on both sides — a NULL text cell
    (coalesced to '') fails the keep-rules and trips no NULL-boolean
    skew (the gopher lesson applied from the start).

    Scale: one narrow map stage over one tokenization into a single
    map-side-combined aggregate — the filter is the WHERE clause of a
    curation write, zero extra shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    w = words_col(t)
    ok_punct = F.when(t.rlike('[.!?"]\\s*$'), 1).otherwise(0)
    ok_words = F.when(F.size(w) >= 5, 1).otherwise(0)
    hit_lorem = F.when(F.lower(t).contains("lorem ipsum"), 1).otherwise(0)
    hit_brace = F.when(t.contains("{"), 1).otherwise(0)
    bad = F.lit(False)
    for term in _C4_BADWORDS:
        bad = bad | F.array_contains(w, term)
    hit_bad = F.when(bad, 1).otherwise(0)
    m = docs.select(
        ok_punct.alias("ok_punct"), ok_words.alias("ok_words"),
        hit_lorem.alias("hit_lorem"), hit_brace.alias("hit_brace"),
        hit_bad.alias("hit_badword"),
    )
    return m.agg(
        F.count("*").alias("n_docs"),
        F.sum(1 - F.col("ok_punct")).cast("long").alias("fail_terminal_punct"),
        F.sum(1 - F.col("ok_words")).cast("long").alias("fail_min_words"),
        F.sum("hit_lorem").cast("long").alias("fail_lorem"),
        F.sum("hit_brace").cast("long").alias("fail_brace"),
        F.sum("hit_badword").cast("long").alias("fail_badwords"),
        F.sum(
            F.when(
                (F.col("ok_punct") == 1) & (F.col("ok_words") == 1)
                & (F.col("hit_lorem") == 0) & (F.col("hit_brace") == 0)
                & (F.col("hit_badword") == 0), 1
            ).otherwise(0)
        ).cast("long").alias("n_pass_all"),
    )


_RT["c4_clean_flags"].oracle = _c4_oracle()


@register(
    "token_entropy",
    survey_ref="extension: per-doc token entropy (gibberish/boilerplate "
               "signal, Gopher/RefinedWeb filter family)",
    tags=("textan", "corpus"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS words FROM documents
), pos AS (
  SELECT doc_id, unnest(words) AS tok FROM w
), tf AS (
  SELECT doc_id, md5(tok) AS h, CAST(count(*) AS BIGINT) AS n
  FROM pos GROUP BY doc_id, md5(tok)
), terms AS (
  SELECT doc_id, n,
         n * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS t_micro
  FROM tf
), d AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(t_micro) AS BIGINT) AS s_micro
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(greatest(
         n_tokens * CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           - s_micro, 0) AS BIGINT) AS entropy_micro,
       round(CAST(greatest(
         n_tokens * CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           - s_micro, 0) AS DOUBLE) / (n_tokens * 1000000.0), 6) + 0.0 AS entropy_r
FROM d ORDER BY doc_id LIMIT 500
""",
)
def q_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution —
    near-zero for one-token-repeated spam, ~ln(n_tokens) for fully
    diverse text; the cheap gibberish/boilerplate axis the published
    filters (Gopher repetition rules, RefinedWeb) approximate with
    ratio heuristics.

    Exactness: H·N = N·ln N − Σ n_t·ln n_t. Each ln is quantized to
    integer micro-nats at its SOURCE value (the unigram_logprob
    pattern), so both the per-term sum and the final combination are
    pure integer arithmetic — order-independent, engine-exact; the
    ≤N-micro rounding residual is clamped at 0 (entropy is
    non-negative) identically in both engines before the one final
    division.

    Scale: term frequencies group on (doc_id, md5(tok)) — md5 is the
    portable-hash discipline AND keeps raw token text out of the
    shuffle (16 B key/position, map-side combined); the per-doc rollup
    then moves 3 integers per (doc, distinct-token). No broadcast, no
    vocab table — unlike unigram_logprob this is a purely row-group-
    local statistic, so it composes into the same scan as the other
    per-doc quality columns."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("tok"))
    tf = (
        pos.groupBy("doc_id", F.md5("tok").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    t_micro = (
        F.col("n")
        * F.round(F.log(F.col("n").cast("double")) * 1000000).cast("long")
    )
    d = (
        tf.select("doc_id", "n", t_micro.alias("t_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum("t_micro").cast("long").alias("s_micro"),
        )
    )
    h_micro = F.greatest(
        F.col("n_tokens")
        * F.round(F.log(F.col("n_tokens").cast("double")) * 1000000).cast("long")
        - F.col("s_micro"),
        F.lit(0).cast("long"),
    )
    return (
        d.select(
            "doc_id", "n_tokens", "n_distinct",
            h_micro.alias("entropy_micro"),
            (F.round(
                h_micro.cast("double")
                / (F.col("n_tokens") * F.lit(1000000.0)), 6,
            ) + F.lit(0.0)).alias("entropy_r"),
        )
        .orderBy("doc_id").limit(500)
    )
