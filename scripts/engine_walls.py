"""Engine-side wall clock for registry entries across sf dirs — the
decade-table harness for docs/SCALE.md (the driver_mimic PASS times
include the DuckDB oracle replay, which DOMINATES at sf10; this times
only the Spark plan, warm min-of-2, fresh lineage per run).

Usage: python scripts/engine_walls.py sf_dir entry [entry ...]
``ENGINE_CORES`` (default 32) sets master local[N] and the shuffle
partition count — the r13 core-scaling table (VERDICT r12 #7) runs the
same harness at 8 and 32.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    cores = os.environ.get("ENGINE_CORES", "32")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.driver.memory", os.environ.get("MIMIC_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_search_service_spark.registry import all_queries

    q = all_queries()
    for name in names:
        walls = []
        rows = 0
        for _ in range(2):
            t0 = time.time()
            rows = q[name].fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
        print(f"{name}: {min(walls):.1f}s (runs: "
              f"{', '.join(f'{w:.1f}' for w in walls)}; rows={rows}) @ {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
