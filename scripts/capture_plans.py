"""Capture .explain("formatted") for registry entries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [entry ...]

With no entries, captures every bench-headline query (the static
bench.py list plus headline-tagged registry entries). Writes
plans/<tag>/<entry>_<suffix>.txt. The captured query itself does not
execute, but plan-BUILD-time jobs do run (ADVICE r12 #2): bpe_*
entries train (learn_bpe collects merges) and bm25_topk's eager
localCheckpoint materializes its tokenized table while the DataFrame
is being constructed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from vector_search_service_spark.plans.inspect import explain_str
    from vector_search_service_spark.registry import all_queries
    from vector_search_service_spark.session import get_spark

    spark = get_spark("capture-plans")
    specs = all_queries()
    if not names:
        names = [n for n in HEADLINE if n in specs]
        names += [n for n, s in specs.items()
                  if "headline" in s.tags and n not in names]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n\n{plan}")
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
