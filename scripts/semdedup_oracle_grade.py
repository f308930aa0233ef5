"""Oracle-grade the DERIVED-knob SemDeDup configs at scale (VERDICT r9
next-round #4): the registered entries pin (B=4 / B=7, th=0.3) — the
grade-scale semantics pins — but §13 measured that at 200 k vectors the
0.3 threshold saturates and the pinned Bs make the bucket-local pair
stage quadratic (pair budget ≈ n²/2^B·(B+1) — ~1.25e9 pairs either
way, hours of interpreted fold work; documented, not run). The config
a 100 TB deployment actually runs is the DERIVED one —
B = derive_n_planes(n), th = max(pin, derive_semdedup_threshold) — so
this script grades exactly that, bit-strict, against the same
parametric DuckDB replay the registered oracles use.

Usage: python scripts/semdedup_oracle_grade.py [sf_dir] [plain|probe|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("MIMIC_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.oracle_harness import compare, register_duck_views
    from vector_search_service_spark.functions.embed import EMB_DIM
    from vector_search_service_spark.operators.ann import (
        derive_n_planes,
        derive_semdedup_threshold,
    )
    from vector_search_service_spark.queries_dedup import (
        _SEMDEDUP_TH,
        _semdedup_multiprobe_oracle,
        _semdedup_multiprobe_plan,
        _semdedup_oracle,
        _semdedup_plan,
    )
    from vector_search_service_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    b = derive_n_planes(n)
    th = max(_SEMDEDUP_TH, derive_semdedup_threshold(n, EMB_DIM))
    # the sweep's hand-validated threshold at n=200k was 0.6; the
    # derivation lands at the same decade (see SCALE.md §13 item 1)
    print(f"n={n}  derived B={b}  derived th={th:.3f}")

    con = duckdb.connect()
    register_duck_views(con, sf_dir)

    jobs = []
    if which in ("plain", "both"):
        jobs.append(("plain", _semdedup_plan, _semdedup_oracle))
    if which in ("probe", "both"):
        jobs.append(("probe", _semdedup_multiprobe_plan,
                     _semdedup_multiprobe_oracle))
    rc = 0
    for label, plan, oracle in jobs:
        t0 = time.time()
        # bucket_cap=None: grade the pure derived-knob semantics (the
        # cap is output-invariant on healthy buckets; the oracle
        # replays uncapped)
        df = plan(spark, sf_dir, b, threshold=th, bucket_cap=None)
        ok, msg = compare(df, con, oracle(b, th))
        wall = time.time() - t0
        print(f"  [{'PASS' if ok else 'FAIL'}] semdedup_{label} "
              f"B={b} th={th:.3f} ({wall:.1f}s)"
              + ("" if ok else f" — {msg}"))
        rc |= not ok
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
