"""Re-write an sf corpus as multi-file parquet table directories.

The driver's testdata ships one parquet file per table, so every scan
is a single split and nothing exercises multi-split parallelism, split
packing, or AQE coalescing over a real file layout. This script writes
each table as a DIRECTORY of N part files (round-robin repartition —
the layout a distributed writer produces), which both engines read
transparently: ``spark.read.parquet(dir)`` and DuckDB
``read_parquet('dir/*.parquet')`` (``tests/oracle_harness.py`` globs
directory layouts automatically).

File counts are proportional to table size so the big facts get many
splits and the dims stay single-file — the shape of a real warehouse.
At 100 TB the same tables would be 128 MB–1 GB files; the *structural*
properties this layout lets us pin (scan tasks > 1, per-file
parallelism, AQE shuffle coalescing, layout-independent results) are
scale-free, and tests/test_multisplit.py asserts them.

Usage: python scripts/make_partitioned_corpus.py [src_sf_dir] [out_root]
Writes to ``{out_root}/{basename(src_sf_dir)}`` (default
``/tmp/spark_graft_part/sf0.1``), skipping if already present.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# files per table: facts get many splits, dims stay small
FILES = {
    "lineitem": 32,
    "documents": 32,
    "orders": 16,
    "events": 16,
    "embeddings": 8,
    "customer": 8,
    "part": 4,
    "supplier": 2,
    "nation": 1,
    "region": 1,
}


def build(spark, src_sf_dir: str, out_dir: str, *, force: bool = False) -> str:
    """Write the partitioned corpus; idempotent unless ``force``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from vector_search_service_spark.sources.tables import load_table

    done_marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_marker) and not force:
        return out_dir
    for name, n in FILES.items():
        df = load_table(spark, src_sf_dir, name)
        # load_table normalizes timestamps to LTZ (session-pinned UTC).
        # Write them back as NTZ so the on-disk corpus keeps the source
        # semantics (naive wall-clock, isAdjustedToUTC=false) — DuckDB
        # then sees plain TIMESTAMP exactly as it does for the
        # single-file corpus, and load_table's NTZ→LTZ coercion
        # round-trips the values identically on read.
        for f_ in df.schema.fields:
            if isinstance(f_.dataType, TimestampType):
                df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp_ntz"))
        (
            df.repartition(n)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{name}.parquet"))
        )
    with open(done_marker, "w") as fh:
        fh.write("ok\n")
    return out_dir


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_part"
    out_dir = os.path.join(out_root, os.path.basename(src.rstrip("/")))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out_dir, force="--force" in sys.argv)
    for name in FILES:
        d = os.path.join(out_dir, f"{name}.parquet")
        n = len([p for p in os.listdir(d) if p.endswith(".parquet")])
        print(f"{name}: {n} part files")
    print(out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
