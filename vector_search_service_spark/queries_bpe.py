"""Registry entries — trained BPE tokenization (functions/bpe.py).

Fully oracled since r10: the "iterative argmax training is not
SQL-expressible" assumption held only for single-pass SQL — DuckDB's
recursive CTEs permit aggregation in the recursive term, so both the
training loop and the priority-merge encode are re-derived as pure SQL
(``functions/bpe.py::sql_bpe_*``) and value-checked cross-engine.
``tests/test_bpe.py`` still pins canonical merges, distributed==local
encode equality, the detokenization roundtrip, and determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.bpe import (
    bpe_token_count_col,
    learn_bpe,
    sql_bpe_stats_oracle,
    sql_bpe_train_oracle,
)
from .registry import register
from .sources.tables import load_table

_N_MERGES = 30


@register(
    "bpe_train_merges",
    survey_ref="extension: trained BPE merges (token-accounting tier)",
    tags=("bpe", "textan"),
    oracle=sql_bpe_train_oracle(_N_MERGES),
)
def q_bpe_train_merges(spark, sf_dir):
    """The learned merge table itself: rank-ordered (left, right)
    pairs from the documents corpus. Training cost is one corpus
    shuffle (word freq) + n_merges vocab-only jobs. Oracle: the same
    greedy loop as a DuckDB recursive CTE (argmax + bracketed-replace
    per iteration), bit-identical by construction and by test."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, docs, n_merges=_N_MERGES)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string",
    )


@register(
    "bpe_token_stats",
    survey_ref="extension: BPE token counts per language (mixture budgeting input)",
    # headline since r11 (VERDICT r10 next-round #7): train+encode is
    # the BPE tier's end-to-end path, now bench-tracked alongside the
    # pre-r11 set (append, don't replace)
    tags=("bpe", "textan", "headline"),
    oracle=sql_bpe_stats_oracle(_N_MERGES),
)
def q_bpe_token_stats(spark, sf_dir):
    """Tokens-under-the-training-tokenizer per language — the number
    mixture budgeting actually needs (whitespace counts under-price
    morphologically rich text). Train once, broadcast the merges in
    the encode UDF's closure, one Arrow pass over the corpus. Oracle:
    train + priority-encode as two recursive CTEs, word-occurrence
    join-back for the per-language totals."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(spark, docs, n_merges=_N_MERGES)
    # count-only encode (r12 optimization): the aggregate needs sizes,
    # not token arrays — bpe_token_count_col skips materializing and
    # Arrow-shipping ~dl strings per document (exact by per-word
    # independence; parity pinned in tests/test_bpe.py)
    toks = bpe_token_count_col(docs, "text", merges)
    return (
        toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            (F.sum("n_bpe_tokens") / F.count("*")).alias("avg_tokens_per_doc"),
        )
        .orderBy("lang")
    )
