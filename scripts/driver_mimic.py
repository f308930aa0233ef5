"""Drive the repo exactly as the spark-graft driver does: a bare
SparkSession (driver defaults, none of our session.py tuning), import
``__spark_entry__``, smoke entry(), then run every queries() entry at
sf0.01 against its oracle_sql() in DuckDB.

Usage: python scripts/driver_mimic.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tests.oracle_harness import compare, register_duck_views


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # the driver's own session: plain defaults per the driver prompt.
    # MIMIC_MASTER/MIMIC_SHUFFLE let the four-axis matrix re-run the
    # identical harness at constrained parallelism (local[2], 2).
    builder = (
        SparkSession.builder.master(os.environ.get("MIMIC_MASTER", "local[32]"))
        .config("spark.sql.shuffle.partitions",
                os.environ.get("MIMIC_SHUFFLE", "32"))
    )
    # MIMIC_DRIVER_MEM: for scale runs ONLY (sf1+). The bare default
    # (1g, shared by 32 executor threads = 32 MB/task) is no real
    # cluster's shape; the sf0.01 grading runs stay bare to match the
    # driver exactly.
    if os.environ.get("MIMIC_DRIVER_MEM"):
        builder = builder.config("spark.driver.memory",
                                 os.environ["MIMIC_DRIVER_MEM"])
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.time()
    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.2f}s; first={rows[0] if rows else None}")

    con = duckdb.connect()
    register_duck_views(con, sf_dir)
    q, o = e.queries(), e.oracle_sql()
    # MIMIC_ONLY: comma-separated entry names — grade just these (for
    # re-running a late-landing entry across the matrix axes without
    # repeating the full 168-entry run on every axis).
    if os.environ.get("MIMIC_ONLY"):
        only = set(os.environ["MIMIC_ONLY"].split(","))
        # Fail fast on names not in the registry (ADVICE r8): a typo'd
        # or stale name must not shrink the run and exit green having
        # graded nothing.
        unknown = only - q.keys()
        if unknown:
            print(f"MIMIC_ONLY names not in registry: {sorted(unknown)}",
                  file=sys.stderr)
            return 2
        q = {n: f for n, f in q.items() if n in only}
    n_pass = n_fail = 0
    for name, fn in q.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in o:
                ok, msg = compare(df, con, o[name])
            else:
                ok, msg = df.count() >= 0, "rows-only"
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {str(ex)[:200]}"
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += not ok
        print(f"  [{status}] {name} ({time.time() - t0:.2f}s)" + ("" if ok else f" — {msg}"))
    print(f"{n_pass} pass / {n_fail} fail of {len(q)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
