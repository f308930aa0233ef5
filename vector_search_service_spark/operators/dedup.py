"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (its dedup story is limited to content-addressed
ids, ``src/core/document_processor.py:31-46`` — G2); these are the
standard corpus-dedup algorithms re-expressed as Spark plans. Scale
shapes:

- **exact**: hash → groupBy. One shuffle on a high-cardinality
  uniformly-distributed key (sha256) — the best-case shuffle; AQE
  coalesces post-shuffle partitions.
- **MinHash LSH**: shingle → minhash signature → band keys → explode →
  self-join per band bucket → Jaccard verify. The join is on band
  keys, whose fan-out is bounded by bucket size, not corpus size: at
  100 TB you never compare all pairs, only within-bucket pairs. Hot
  buckets (boilerplate text) are the classic skew source — AQE skew
  -join splitting handles moderate skew; degenerate buckets should be
  capped upstream (drop buckets with > N members as "boilerplate").
- **SimHash**: per-doc fingerprint then pair filter on Hamming
  distance; bucketing by fingerprint prefix bounds the join the same
  way.
- **n-gram Jaccard / embedding cosine**: exact pairwise verifiers —
  used on candidate pairs from a bucketing stage, never on the full
  cross product at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_key_col,
    jaccard_col,
    shingles_col,
    simhash16_col,
    words_col,
)


def exact_dedup(df: DataFrame, *, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: keep the smallest id per sha256
    group (deterministic keep-first), report group size. Window over
    the hash = one shuffle; identical result to groupBy+min-join with
    one less exchange."""
    w = Window.partitionBy("content_sha")
    return (
        df.withColumn("content_sha", F.sha2(F.col(text_col), 256))
          .withColumn("n_copies", F.count("*").over(w).cast("long"))
          .withColumn("keeper_id", F.min(id_col).over(w))
          .withColumn("is_duplicate", F.col(id_col) != F.col("keeper_id"))
    )


DEFAULT_BANDS: tuple[tuple[int, ...], ...] = ((1, 2), (3, 4), (5, 6), (7, 8))


def minhash_band_keys(df: DataFrame, *, text_col: str = "text",
                      bands: tuple[tuple[int, ...], ...] = DEFAULT_BANDS) -> DataFrame:
    """Per-document LSH band keys: (id, band_index, band_key)."""
    words = words_col(F.col(text_col))
    entries = F.array(*[
        F.struct(F.lit(i).alias("band"), band_key_col(words, seeds).alias("key"))
        for i, seeds in enumerate(bands)
    ])
    return (
        df.withColumn("_bk", F.explode(entries))
          .select(*df.columns, F.col("_bk.band").alias("band"), F.col("_bk.key").alias("band_key"))
    )


def minhash_lsh_pairs(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      bands: tuple[tuple[int, ...], ...] = DEFAULT_BANDS,
                      jaccard_threshold: float = 0.8) -> DataFrame:
    """Candidate pairs that collide in ≥1 band, verified by token-set
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard) with
    id_a < id_b, distinct."""
    keyed = minhash_band_keys(
        df.select(id_col, text_col), text_col=text_col, bands=bands
    ).select(id_col, "band", "band_key", text_col)
    a = keyed.select(
        F.col(id_col).alias("id_a"), "band", "band_key",
        F.col(text_col).alias("text_a"),
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), "band", "band_key",
        F.col(text_col).alias("text_b"),
    )
    pairs = (
        a.join(b, ["band", "band_key"])           # shuffle on band_key only
         .filter(F.col("id_a") < F.col("id_b"))
         .select("id_a", "id_b", "text_a", "text_b")
         .distinct()                               # collapse multi-band collisions
    )
    # verify on the same signal MinHash estimates: shingle-set Jaccard
    jac = jaccard_col(
        F.array_distinct(shingles_col(words_col(F.col("text_a")))),
        F.array_distinct(shingles_col(words_col(F.col("text_b")))),
    )
    return (
        pairs.withColumn("jaccard", jac)
             .filter(F.col("jaccard") >= F.lit(jaccard_threshold))
             .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprints(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash16", simhash16_col(words_col(F.col(text_col))).cast("int"))


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact k-gram-shingle Jaccard over all pairs — the verifier
    stage; feed it candidate pairs (LSH buckets) at scale, not a cross
    join."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles_col(words_col(F.col(text_col)), k)).alias("sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
         .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
         .filter(F.col("jaccard") >= F.lit(threshold))
         .select("id_a", "id_b", "jaccard")
    )
