"""Build the ~sf1 corpus (10x sf0.1) for measured scale-up runs.

VERDICT r6/r7 next-round #2: correctness at sf0.01/0.1 is saturated;
the open question is measured behavior one decade up. The driver owns
/root/testdata (read-only to us), so the scaled corpus lives inside
the repo at ``.localdata/sf1`` (gitignored) with the same layout —
``{table}.parquet`` per table (directories of part-files here: the
distributed-writer layout both ``load_table`` and the DuckDB harness
already support).

Scaling rule: 10 replicas of sf0.1 with every key column shifted by
``replica * stride`` (stride = max(key)+1 per base table), so
referential integrity is preserved replica-locally — o_custkey joins
to the same replica's customers, l_orderkey to the same replica's
orders — and all key-hash distributions (splits, shards, eval-mod
selections) stay uniform. Dimension tables (region, nation) are
copied unscaled, exactly like TPC-H's fixed dims. Payload columns are
replicated verbatim: that makes `documents` a 10-way exact-duplicate
corpus, which is a deliberate STRESS case for the dedup family (every
LSH band bucket grows 10x -> pair joins 100x without the hot-bucket
cap; the cap is the knob being measured) — real crawl corpora are
duplicate-heavy in exactly this way.

Timestamps are written as TIMESTAMP_NTZ (isAdjustedToUTC=false), the
same physical convention as the driver corpus, so DuckDB reads naive
timestamps and Spark's ``_ntz_to_ltz`` coerces under the pinned UTC
session — value-identity on both sides.

Usage:  python scripts/make_sf1.py [out_dir] [replicas] [src_dir] [rel]

With ``src_dir`` the replication composes (sf0.1 --10x--> sf1
--10x--> sf10). The optional trailing ``rel`` scales ONLY the
relational facts+dims (customer/supplier/part/orders/lineitem/events)
and copies documents/embeddings from the source unscaled: beyond one
decade, payload replication makes the text/vector corpus ~99%
exact-duplicate — degenerate for dedup semantics — while the
relational engine questions (shuffle, join, agg growth) are exactly
what a third decade should measure.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".localdata", "sf1")

# per-table key columns to shift, grouped by the base table whose
# max-key defines the stride (FK columns shift by the PK's stride)
KEYS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
STRIDE_COL = {  # which column defines each stride name
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}
FILES = {  # part-files per table (lineitem dominates)
    "customer": 4, "supplier": 1, "part": 4, "orders": 8,
    "lineitem": 32, "events": 8, "documents": 4, "embeddings": 2,
}


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    rel_only = len(sys.argv) > 4 and sys.argv[4] == "rel"

    from pyspark.sql import functions as F

    from vector_search_service_spark.session import get_spark
    from vector_search_service_spark.sources.tables import load_table

    spark = get_spark("make_sf1")
    os.makedirs(out, exist_ok=True)

    strides = {}
    for name, (table, col) in STRIDE_COL.items():
        mx = load_table(spark, src, table).agg(F.max(col)).collect()[0][0]
        strides[name] = int(mx) + 1

    def write(df, table, n_files):
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        for c, t in df.dtypes:
            if t == "timestamp":
                df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
        df.repartition(n_files).write.parquet(dst)
        print(f"  {table}: {n_files} files -> {dst}")

    for dim in ("region", "nation"):
        write(load_table(spark, src, dim), dim, 1)

    r = F.explode(F.array(*[F.lit(i) for i in range(replicas)])).alias("_r")
    for table, keycols in KEYS.items():
        if rel_only and table in ("documents", "embeddings"):
            write(load_table(spark, src, table), table, FILES[table])
            continue
        base = load_table(spark, src, table)
        df = base.select("*", r)
        for col, stride_name in keycols.items():
            df = df.withColumn(
                col, F.col(col) + F.col("_r").cast("long") * strides[stride_name]
            )
        write(df.drop("_r"), table, FILES[table])

    print("strides:", strides)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
