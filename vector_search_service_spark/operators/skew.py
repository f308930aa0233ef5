"""Skew-aware aggregation — the salting pattern (100 TB design note).

AQE's skew-join splitting handles joins, but a groupBy on a key where
one value owns half the corpus (the "default collection" problem, or a
boilerplate LSH bucket) still funnels one reducer. Classic fix: salt
the key into S shards, pre-aggregate per (key, salt) — the heavy key's
work spreads over S tasks — then aggregate the S partials per key.

Works for any algebraic aggregate (sum/count/min/max, and avg via
sum+count). Result is IDENTICAL to the unsalted groupBy (integer sums
are order-independent), so it carries a normal oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count_sum(df: DataFrame, key: str, value: Column, *,
                           salt_buckets: int = 16,
                           value_alias: str = "sum_value") -> DataFrame:
    """groupBy(key).agg(count, sum(value)) with two-phase salting.
    ``value`` must be integer-typed (exactness under re-association)."""
    salted = df.withColumn(
        "_salt", (F.crc32(F.col(key).cast("string")) + F.spark_partition_id()) % salt_buckets
    )
    partial = (
        salted.groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_s"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_n").alias("n_rows"), F.sum("_s").alias(value_alias))
    )
