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

Usage:  python scripts/make_sf1.py [out_dir] [replicas] [src_dir] [rel|mut]

With ``src_dir`` the replication composes (sf0.1 --10x--> sf1
--10x--> sf10). The optional trailing mode:

- ``rel`` scales ONLY the relational facts+dims and copies
  documents/embeddings from the source unscaled: beyond one decade,
  verbatim payload replication makes the text/vector corpus ~99%
  exact-duplicate — degenerate for dedup semantics.
- ``mut`` (VERDICT r8 next-round #4) replicates documents/embeddings
  WITH mutation-synthesized near-duplicates instead of verbatim
  copies, so a third decade has realistic duplicate entropy: replica
  0 is the original; replicas 1-3 mutate tokens at 3/6/10% (near-dups
  an LSH/TF-IDF/SemDeDup tier should catch); replicas 4-9 mutate at
  25-55% (effectively distinct at dedup thresholds). Embedding
  replicas get Gaussian perturbations at matching scales (eps
  0.02-0.10 near, 0.5-2.0 far). All mutations are seeded by
  (base_key, replica) — deterministic under any partitioning.
  ``n_chars`` is recomputed from the mutated text.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

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


# token-mutation rate per replica (1-indexed; replica 0 is verbatim):
# 1-3 near-dup tier, 4-9 effectively-distinct tier
_DOC_RATES = [0.03, 0.06, 0.10, 0.25, 0.31, 0.37, 0.43, 0.49, 0.55]
# per-dim Gaussian eps, calibrated to the stock corpus (|v| ≈ 0.93, so
# cos ≈ |v|/sqrt(|v|²+64·eps²)): replicas 1-3 → cos ≈ .99/.92/.76
# (semantic near-dups, above the _SEMDEDUP_TH=0.3 tier), 4-9 →
# cos ≈ .23 … .06 (below every dedup threshold — effectively distinct).
# Measured on the smoke build: eps .02 → cos .9873, eps .05 → .9190.
_EMB_EPS = [0.02, 0.05, 0.10, 0.5, 0.8, 1.1, 1.4, 1.7, 2.0]


def _mut_text_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def mut_text(text: pd.Series, base: pd.Series, rep: pd.Series) -> pd.Series:
        out = []
        for t, b, r in zip(text, base, rep):
            r = int(r)
            if r == 0 or t is None:
                out.append(t)
                continue
            rate = _DOC_RATES[(r - 1) % len(_DOC_RATES)]
            rng = np.random.RandomState((int(b) * 1000003 + r) % (2**31 - 1))
            toks = t.split()
            res, i = [], 0
            while i < len(toks):
                if rng.random_sample() < rate:
                    op = rng.random_sample()
                    if op < 0.4:                      # delete token
                        i += 1
                        continue
                    if op < 0.7:                      # duplicate token
                        res.append(toks[i])
                        res.append(toks[i])
                    elif i + 1 < len(toks):           # swap with next
                        res.append(toks[i + 1])
                        res.append(toks[i])
                        i += 2
                        continue
                    else:
                        res.append(toks[i])
                else:
                    res.append(toks[i])
                i += 1
            out.append(" ".join(res))
        return pd.Series(out, dtype=object)

    return mut_text


def _mut_emb_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("array<float>")
    def mut_emb(emb: pd.Series, base: pd.Series, rep: pd.Series) -> pd.Series:
        out = []
        for v, b, r in zip(emb, base, rep):
            r = int(r)
            if r == 0 or v is None:
                out.append(v)
                continue
            eps = _EMB_EPS[(r - 1) % len(_EMB_EPS)]
            rng = np.random.RandomState((int(b) * 7654321 + r) % (2**31 - 1))
            a = np.asarray(v, dtype=np.float64)
            out.append((a + eps * rng.standard_normal(a.shape)).astype(np.float32))
        return pd.Series(out, dtype=object)

    return mut_emb


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    mode = sys.argv[4] if len(sys.argv) > 4 else ""
    rel_only = mode == "rel"
    mutate = mode == "mut"

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
        if mutate and table == "documents":
            df = df.withColumn("_base", F.col("doc_id"))
        if mutate and table == "embeddings":
            df = df.withColumn("_base", F.col("vec_id"))
        for col, stride_name in keycols.items():
            df = df.withColumn(
                col, F.col(col) + F.col("_r").cast("long") * strides[stride_name]
            )
        if mutate and table == "documents":
            df = (
                df.withColumn(
                    "text",
                    _mut_text_udf()(F.col("text"), F.col("_base"), F.col("_r")),
                )
                .withColumn("n_chars", F.length("text").cast("int"))
                .drop("_base")
            )
        if mutate and table == "embeddings":
            df = df.withColumn(
                "embedding",
                _mut_emb_udf()(F.col("embedding"), F.col("_base"), F.col("_r")),
            ).drop("_base")
        write(df.drop("_r"), table, FILES[table])

    print("strides:", strides)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
