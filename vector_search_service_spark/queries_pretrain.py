"""Registry entries — pretraining-corpus assembly operators (LLM-data-
pipeline extensions beyond the reference, like ``queries_dedup`` /
``queries_curate``): Gopher-style repetition signals, per-domain caps,
and concat-and-chunk sequence packing.

Scale shapes:

- **repetition signals**: row-local pandas UDF (Arrow-batched) — ZERO
  shuffle, embarrassingly parallel; the explode→groupBy alternative
  shuffles corpus×tokens rows for the same answer. Expression mirrors
  define the DuckDB oracle (same md5-free portable tokenization as
  ``functions/hashing.py``).
- **domain cap**: one shuffle on the domain key (window row_number),
  integer ordering key so rank ties are impossible cross-engine.
- **sequence packing**: the exact op a training pipeline runs before
  writing tokenized shards — concatenate documents in a deterministic
  order, chunk into fixed-length sequences, emit per-(doc, sequence)
  spans. One shuffle (window per shard key), then pure codegen
  arithmetic + explode; no UDF anywhere.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.hashing import sql_words_expr
from .registry import register
from .sources.tables import load_table

_WORDS = sql_words_expr("text")
_SPLIT = re.compile("[^a-z0-9]+")

SEQ_LEN = 128
DOMAIN_CAP = 50


# -- Gopher-style repetition signals ----------------------------------------

_REP_STRUCT = T.StructType([
    T.StructField("n_tokens", T.LongType()),
    T.StructField("n_distinct", T.LongType()),
    T.StructField("top_tok", T.LongType()),
    T.StructField("n_bigrams", T.LongType()),
    T.StructField("nd_bigrams", T.LongType()),
])


@F.pandas_udf(_REP_STRUCT)
def _repetition_stats(texts: pd.Series) -> pd.DataFrame:
    def one(text: str):
        w = [t for t in _SPLIT.split((text or "").lower()) if t]
        if not w:
            return (0, 0, 0, 0, 0)
        counts: dict[str, int] = {}
        for t in w:
            counts[t] = counts.get(t, 0) + 1
        nb = max(len(w) - 1, 1)
        bigrams = {" ".join(w[i:i + 2]) for i in range(nb)}
        return (len(w), len(counts), max(counts.values()), nb, len(bigrams))

    rows = texts.map(one)
    return pd.DataFrame(
        rows.tolist(), index=texts.index,
        columns=["n_tokens", "n_distinct", "top_tok", "n_bigrams", "nd_bigrams"],
    )


# the n_tokens > 0 filter over the struct otherwise re-plans a second
# ArrowEvalPython of the same call below it (guide §4.4; r12 sweep) —
# pure values, the marker only stops the optimizer duplicating the call
_repetition_stats = _repetition_stats.asNondeterministic()


@register(
    "repetition_signals",
    survey_ref="extension: Gopher/RefinedWeb repetition quality signals",
    tags=("textan", "curate"),
    oracle=f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS ws FROM documents WHERE doc_id < 1000
),
t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
s AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_tok
  FROM tc GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         CAST(greatest(len(ws) - 1, 1) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(list_transform(
             range(1, greatest(len(ws) - 1, 1) + 1),
             i -> array_to_string(list_slice(ws, i, i + 1), ' ')))) AS BIGINT)
           AS nd_bigrams
  FROM w WHERE len(ws) > 0
)
SELECT s.doc_id, n_tokens, n_distinct, top_tok, n_bigrams, nd_bigrams,
       round(CAST(top_tok AS DOUBLE) / n_tokens, 6) AS top_frac_r,
       round(1.0 - CAST(nd_bigrams AS DOUBLE) / n_bigrams, 6) AS dup_bigram_frac_r
FROM s JOIN bg USING (doc_id)
ORDER BY doc_id
""",
)
def q_repetition_signals(spark, sf_dir):
    """Per-document repetition signals (most-frequent-token fraction,
    duplicate-bigram fraction) — the Gopher quality-filter family.
    Row-local Arrow compute, no shuffle; the oracle recomputes from
    scratch with unnest+groupBy."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    s = docs.select("doc_id", _repetition_stats(F.col("text")).alias("r")) \
            .select("doc_id", "r.*") \
            .filter(F.col("n_tokens") > 0)
    return (
        s.withColumn("top_frac_r",
                     F.round(F.col("top_tok").cast("double") / F.col("n_tokens"), 6))
         .withColumn("dup_bigram_frac_r",
                     F.round(F.lit(1.0) - F.col("nd_bigrams").cast("double") / F.col("n_bigrams"), 6))
         .orderBy("doc_id")
    )


# -- per-domain cap ----------------------------------------------------------

@register(
    "domain_top_k",
    survey_ref="extension: per-domain corpus cap (T1 shape per group)",
    tags=("curate",),
    oracle=f"""
SELECT source, CAST(row_number() OVER w AS BIGINT) AS rn, doc_id, n_chars
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC)
QUALIFY rn <= {DOMAIN_CAP}
ORDER BY source, rn
""",
)
def q_domain_top_k(spark, sf_dir):
    """Cap every domain at its {cap} longest documents — the
    over-represented-domain guard in corpus assembly. One shuffle on
    the domain key; integer ordering key (n_chars, doc_id) makes the
    rank deterministic cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= DOMAIN_CAP)
            .select("source", "rn", "doc_id", "n_chars")
            .orderBy("source", "rn")
    )


# -- concat-and-chunk sequence packing ---------------------------------------

@register(
    "sequence_pack_spans",
    survey_ref="extension: training-sequence packing (concat + fixed-length chunk)",
    tags=("curate", "headline"),
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, CAST(len({_WORDS}) AS BIGINT) AS n_tok
  FROM documents WHERE len({_WORDS}) > 0
),
c AS (
  SELECT *, CAST(coalesce(sum(n_tok) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS cum_before
  FROM d
),
e AS (
  SELECT lang, doc_id, cum_before, n_tok,
         unnest(generate_series(cum_before // {SEQ_LEN},
                                (cum_before + n_tok - 1) // {SEQ_LEN})) AS seq_id
  FROM c
)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(seq_id * {SEQ_LEN}, cum_before) - cum_before AS BIGINT) AS tok_start,
       CAST(least((seq_id + 1) * {SEQ_LEN}, cum_before + n_tok) - cum_before AS BIGINT) AS tok_end
FROM e
ORDER BY lang, seq_id, doc_id
""",
)
def q_sequence_pack_spans(spark, sf_dir):
    """Pack documents into fixed-{seq}-token training sequences by
    deterministic concat-then-chunk (docs in doc_id order per language
    shard; documents split across sequence boundaries, as pretraining
    packing does): emit one row per (document, sequence) span with
    doc-local token offsets. Window cumsum + sequence explode — pure
    codegen, one shuffle on the shard key; at 100 TB the shard key is
    whatever balances writers (lang × hash bucket) and each shard
    packs independently."""
    from .functions.hashing import words_col

    L = SEQ_LEN
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select("doc_id", "lang",
                    F.size(words_col(F.col("text"))).cast("long").alias("n_tok"))
            .filter(F.col("n_tok") > 0)
    )
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    )
    first = F.floor(F.col("cum_before") / L).cast("long")
    last = F.floor((F.col("cum_before") + F.col("n_tok") - 1) / L).cast("long")
    return (
        c.select(
            "lang", "doc_id", "cum_before", "n_tok",
            F.explode(F.sequence(first, last)).alias("seq_id"),
        )
        .select(
            "lang", F.col("seq_id").cast("long").alias("seq_id"), "doc_id",
            (F.greatest(F.col("seq_id") * L, F.col("cum_before"))
             - F.col("cum_before")).cast("long").alias("tok_start"),
            (F.least((F.col("seq_id") + 1) * L, F.col("cum_before") + F.col("n_tok"))
             - F.col("cum_before")).cast("long").alias("tok_end"),
        )
        .orderBy("lang", "seq_id", "doc_id")
    )
