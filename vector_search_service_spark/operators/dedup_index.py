"""Incremental MinHash-LSH index — near-dup detection for ARRIVING
data against the full historical corpus, without recomputing the
corpus (the streaming/incremental tier of ``operators/dedup.py``; the
in-query ``localCheckpoint`` comment there — "what you'd persist as
the index table in a real deployment" — made real).

Store layout: ``path/band=<b>/`` parquet of ``(doc_id, band_key)``,
hive-partitioned by band. A batch probe computes the batch's band
keys (tiny), broadcasts them into the store scan — the store is read
partition-pruned per band and filtered by the batch's keys via a
broadcast semi-join shape, so probe cost scales with the batch and
the hit set, never the corpus. Append is one partitioned write of the
batch's keys.

Verification stays exact: the index yields CANDIDATE id pairs; the
caller verifies with shingle Jaccard against the corpus store (both
texts are in the document store — the index never duplicates text).
The invariant pinned by tests: processing batches b1..bn
incrementally and unioning each step's verified pairs equals
``minhash_lsh_pairs`` over the full concatenated corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import jaccard_col
from .dedup import (
    DEFAULT_BANDS,
    DEFAULT_MAX_BUCKET,
    minhash_band_keys,
    hashed_shingle_set_udf,
)


class MinHashIndexStore:
    def __init__(self, spark, path: str, *,
                 bands: tuple[tuple[int, ...], ...] = DEFAULT_BANDS):
        self.spark = spark
        self.path = path
        self.bands = bands

    def _keys(self, batch: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
        return minhash_band_keys(
            batch.select(id_col, text_col), text_col=text_col, bands=self.bands
        ).select(id_col, "band", "band_key")

    def _stored(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.schema("doc_id long, band_key string, band int") \
            .parquet(self.path)

    def append(self, batch: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id") -> None:
        (
            self._keys(batch, text_col=text_col, id_col=id_col)
            .withColumnRenamed(id_col, "doc_id")
            .write.mode("append").partitionBy("band").parquet(self.path)
        )

    def candidate_pairs(self, batch: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
        """(id_old, id_new) candidates: batch keys vs store (broadcast
        batch side — the batch is always the small side) PLUS
        within-batch collisions; distinct. ``id_old < id_new`` is NOT
        guaranteed — ids are arrival-ordered pairs (old, new); for
        within-batch pairs, (smaller, larger)."""
        keys = self._keys(batch, text_col=text_col, id_col=id_col) \
            .localCheckpoint(eager=False)
        new = keys.select(
            F.col(id_col).alias("id_new"), "band", "band_key"
        )
        pairs = None
        stored = self._stored()
        if stored is not None:
            vs_store = (
                stored.join(F.broadcast(new), ["band", "band_key"])
                      .filter(F.col("doc_id") != F.col("id_new"))
                      .select(F.col("doc_id").alias("id_a"),
                              F.col("id_new").alias("id_b"))
            )
            pairs = vs_store
        a = keys.alias("a")
        b = keys.alias("b")
        within = (
            a.join(b, ["band", "band_key"])
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
        )
        pairs = within if pairs is None else pairs.unionByName(within)
        return pairs.distinct()

    def verify_pairs(self, pairs: DataFrame, corpus: DataFrame, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     jaccard_threshold: float = 0.8) -> DataFrame:
        """Exact hashed-shingle-Jaccard verification against the
        corpus store (r4 rolling-hash representation; candidates only
        behind broadcast semi-joins — same verify-after-filter shape
        as ``minhash_lsh_pairs``).

        The ``F.broadcast`` hints on ``pairs``/``ids`` ARE legitimate
        here — unlike inside ``minhash_lsh_pairs`` (where the r9 audit
        removed them): this is the *incremental* path, so candidates
        come from ONE ingest batch against the store. The reference
        caps ingest batches at ``max_batch_documents = 50``
        (``src/config/settings.py:53``), so pairs ≤ 50 × (store
        collisions per band key, itself capped by the hot-bucket
        discipline) — a few KB however big the store grows. Same
        bounded-by-the-API argument as ``anti_join_delete``
        (``queries_pipeline.py``). An UNBOUNDED candidate set (full
        corpus self-dedup) must use ``minhash_lsh_pairs``, which is
        AQE-owned."""
        pairs = pairs.localCheckpoint(eager=False)

        # r13 (guide §2.4, the minhash_lsh_pairs precedent): both pair
        # sides resolve against the SAME corpus store, so one broadcast
        # semi-join over the UNION of candidate ids shingles every
        # candidate once — the store is scanned once per verify instead
        # of once per side, and a doc on both sides is shingled once.
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .union(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        shingled = (
            corpus.join(F.broadcast(ids), id_col, "left_semi")
                  .select(F.col(id_col),
                          hashed_shingle_set_udf()(F.col(text_col)).alias("sh"))
                  .localCheckpoint(eager=False)
        )
        return (
            F.broadcast(pairs)
            .join(shingled.select(F.col(id_col).alias("id_a"),
                                  F.col("sh").alias("sh_a")), "id_a")
            .join(shingled.select(F.col(id_col).alias("id_b"),
                                  F.col("sh").alias("sh_b")), "id_b")
            .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= F.lit(jaccard_threshold))
            .select("id_a", "id_b", "jaccard")
        )

    def process_batch(self, batch: DataFrame, corpus: DataFrame, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      jaccard_threshold: float = 0.8) -> DataFrame:
        """One incremental step: verified near-dup pairs touching this
        batch (vs history + within batch), then index the batch.
        ``corpus`` must already contain the batch's documents (ingest
        order: store documents → detect → index keys)."""
        cand = self.candidate_pairs(batch, text_col=text_col, id_col=id_col)
        verified = self.verify_pairs(
            cand, corpus, text_col=text_col, id_col=id_col,
            jaccard_threshold=jaccard_threshold,
        )
        rows = verified.collect()
        self.append(batch, text_col=text_col, id_col=id_col)
        return self.spark.createDataFrame(
            rows, "id_a long, id_b long, jaccard double"
        ) if rows else self.spark.createDataFrame([], "id_a long, id_b long, jaccard double")


__all__ = ["MinHashIndexStore", "DEFAULT_MAX_BUCKET"]
