"""SemDeDup B/probe sweep on a mutated (natural-duplicate) corpus
(VERDICT r8 #4: re-measure the knobs where bucket statistics, not
verbatim replicas, dominate).

The ``mut``-mode corpus plants its duplicate structure by construction
(scripts/make_sf1.py): replica r of base vector b has id
``b + r*stride``; replicas 1-3 are Gaussian-perturbed near-duplicates
(cos ≈ .99/.92/.76 — above the 0.3 SemDeDup threshold), 4-9 are far
(cos < 0.3). So PLANTED RECALL is exact and free: every replica-1..3
id has a lower-id neighbor (its base) above threshold, hence belongs
in the drop set of a perfect dedup. No brute-force ground truth needed
— the metric is |drops ∩ planted| / |planted|.

Usage: python scripts/semdedup_sweep.py [sf_dir] [stride] [B ...]
  default: .localdata/sf10 20000 8 10 12 (plus derive_n_planes default)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf10"
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    bs = [int(x) for x in sys.argv[3:]] or [8, 10, 12]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("MIMIC_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_search_service_spark.operators.ann import derive_n_planes
    from vector_search_service_spark.queries_dedup import (
        _semdedup_multiprobe_plan,
        _semdedup_plan,
    )
    from vector_search_service_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    planted = (
        load_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") >= stride) & (F.col("vec_id") < 4 * stride))
        .count()
    )
    b_auto = derive_n_planes(n)
    print(f"corpus: {n} vectors; planted near-dups (replicas 1-3): "
          f"{planted}; derive_n_planes -> B={b_auto}")
    if b_auto not in bs:
        bs.append(b_auto)

    # The registered 0.3 pin saturates at this n: random 64-dim cosines
    # are ~N(0, 1/8), so P(cos >= 0.3) ~ 0.8% and every vector has
    # ~0.008*n random "neighbors" (measured: 89% of a 200k corpus drops
    # at th=0.3 regardless of structure). 0.6 keeps every planted
    # near-dup (cos .99/.92/.76) and admits ~8e-7 random pairs.
    th = 0.6
    print(f"threshold: {th} (registered pin 0.3 saturates at n={n})")
    print(f"{'config':22} {'wall':>7} {'drops':>8} {'planted_recall':>15}")
    for b in sorted(bs):
        for label, plan in (("plain", _semdedup_plan),
                            ("probe", _semdedup_multiprobe_plan)):
            t0 = time.time()
            # bucket_cap=None: sweep the pure (B, probe) knob semantics —
            # the r10 default cap ("auto") is output-invariant on healthy
            # buckets but this keeps the §13 history exactly reproducible
            drops = plan(spark, sf_dir, b, threshold=th,
                         bucket_cap=None).select("vec_id")
            hit = drops.filter(
                (F.col("vec_id") >= stride) & (F.col("vec_id") < 4 * stride)
            ).count()
            total = drops.count()
            wall = time.time() - t0
            print(f"B={b:2d} {label:17} {wall:6.1f}s {total:8d} "
                  f"{hit / planted:15.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
