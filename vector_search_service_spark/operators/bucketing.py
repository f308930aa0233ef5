"""Bucketed (co-located) joins — pre-shuffling data ONCE at write time
so every later join/aggregation on the bucket key runs with ZERO
exchanges.

Not in the reference (its single-Postgres design has no shuffle to
eliminate; the closest analogue is its B-tree on document_id,
``src/db/models.py``). At 100 TB this is the single biggest lever for
a repeated fact-fact join: a sort-merge join of two unbucketed fact
tables shuffles BOTH sides (the dominant cost of the query), while the
same join over tables bucketed on the join key with equal bucket
counts reads co-located buckets and merges them in place:

- write once: ``df.write.bucketBy(N, key).sortBy(key)`` — the one-time
  shuffle happens at ingest, amortized over every downstream query;
- join/agg forever after: Spark's scan reports ``HashPartitioning(key,
  N)``, so Exchange nodes are elided for joins on ``key`` between
  equal-bucket tables and for ``groupBy(key)`` aggregations;
- bucket pruning: an equality predicate on the bucket key scans 1/N of
  the files (``SelectedBucketsCount`` in the scan node) — the hash
  analogue of partition pruning, usable on high-cardinality keys where
  directory partitioning would create millions of tiny dirs.

Sizing rule: pick N so one bucket of the LARGER table fits an executor
core's working memory (at 100 TB lineitem and ~128 MB targets that is
O(100k) buckets; N must match across tables you join, so fix it
per-subject-area). Skewed bucket keys defeat this — bucket on the
uniform surrogate (orderkey), never on a skewed natural key.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "bucketed")


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def write_bucketed(df: DataFrame, spark: SparkSession, *, name: str,
                   bucket_col: str, num_buckets: int,
                   path: str | None = None) -> DataFrame:
    """Write ``df`` as a bucketed+sorted parquet table and return a
    reader for it. ``bucketBy`` requires ``saveAsTable`` (the bucket
    spec lives in the catalog); an explicit ``path`` keeps the files
    under the repo cache instead of the session warehouse."""
    path = path or os.path.join(_CACHE_ROOT, _safe(name))
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(_safe(name))
    )
    return spark.table(_safe(name))


def bucketed_pair(spark: SparkSession, left: DataFrame, right: DataFrame, *,
                  tag: str, left_key: str, right_key: str,
                  num_buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """Materialize a co-bucketed pair (same bucket count, each bucketed
    on its join key) — the write-side half of a shuffle-free join."""
    lt = write_bucketed(left, spark, name=f"vss_bk_{tag}_l",
                        bucket_col=left_key, num_buckets=num_buckets)
    rt = write_bucketed(right, spark, name=f"vss_bk_{tag}_r",
                        bucket_col=right_key, num_buckets=num_buckets)
    return lt, rt
