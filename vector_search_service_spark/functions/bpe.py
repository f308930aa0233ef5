"""Byte-pair-encoding tokenizer, trained AND applied with Spark.

Training-data pipelines need token counts under the *actual* training
tokenizer, not a whitespace proxy (`operators/textquality.token_count`
is the cheap tier). This module provides the real thing, scaled the
way BPE training actually scales:

- **Train on the word-frequency table, not the corpus.** The corpus
  (100 TB) collapses to `groupBy(word).count()` once — vocabulary size
  is millions at worst, and every merge iteration thereafter touches
  only the vocab table. Pair counts are weighted by word frequency, so
  the result is identical to counting over the raw corpus.
- **One Spark job per merge** (like MLlib's iterative fitters): count
  adjacent symbol pairs (explode + sum agg), pick the global argmax
  (deterministic lexicographic tie-break), rewrite symbol arrays with
  a left-to-right non-overlapping fold (`F.aggregate` — JVM-side, no
  UDF in the loop). Lineage is truncated with `localCheckpoint` every
  few iterations so plan depth stays bounded.
- **Encode with an Arrow-batched pandas UDF** carrying the (tiny)
  learned merge ranks in its closure — the standard priority-merge
  encode, vectorized per batch, embarrassingly parallel over the
  corpus.

No counterpart in the reference (its pipeline never tokenizes;
`src/core/document_processor.py` stops at word counts) — this is part
of the driver-mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# End-of-word sentinel; appended as its own symbol so merges can learn
# word-final units ("ing</w>") without crossing word boundaries.
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): THE scale reduction. Lowercased
    alphanumeric words; one shuffle over the corpus, after which
    training never reads the corpus again."""
    words = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    return (
        docs.select(F.explode(words).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbols_col():
    # "cat" -> ["c", "a", "t", "</w>"]
    return F.concat(
        F.split(F.col("word"), ""),  # Spark: split by empty pattern = chars
        F.array(F.lit(EOW)),
    ).alias("syms")


def _merge_fold(left: str, right: str):
    """Rewrite a symbol array applying ONE merge left-to-right,
    non-overlapping, as a JVM-side fold: push each symbol; when the
    top of the accumulator is `left` and the incoming symbol is
    `right`, replace the top with the merged token."""
    merged = left + right
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 40,
    min_word_freq: int = 1,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges. Deterministic: ties on pair count
    break lexicographically on (left, right). Returns the ordered
    merge list (rank = position)."""
    vocab = (
        word_freq_table(docs, text_col)
        .filter(F.col("freq") >= min_word_freq)
        .select(_symbols_col(), "freq")
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < 2:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((left, right))
        vocab = vocab.select(_merge_fold(left, right).alias("syms"), "freq")
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()  # truncate the fold lineage
    return merges


def encode_words(words: Iterable[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference-priority BPE encode of pre-split words (lowest-rank
    merge first — the canonical algorithm, also used row-batch-wise by
    the distributed UDF, so the two paths share one implementation)."""
    out: list[str] = []
    for w in words:
        syms = list(w) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i < 0:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out.extend(syms)
    return out


def bpe_tokens_col(df: DataFrame, text_col: str, merges: list[tuple[str, str]],
                   out_col: str = "bpe_tokens") -> DataFrame:
    """Arrow-batched encode: tokens per document under the learned
    merges. The merge table rides the UDF closure (a few KB — at a
    real 50k-merge vocab, ~1 MB, still closure-shippable; use
    ``SparkContext.broadcast`` beyond that)."""
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(r"[a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: encode_words(word_re.findall((t or "").lower()), ranks)
        )

    return df.withColumn(out_col, _encode(F.col(text_col)))
