"""Registry-wide duplicated-Python-UDF plan sweep (r12 optimization).

The optimizer can push a filter that references a UDF-computed column
below its Generate/Exchange and RE-EVALUATE the UDF in the pushed copy
(optimization guide §4.4) — two ArrowEvalPython nodes over the same
input attribute, every row paying the Python boundary twice. This
sweep explains every registry entry and flags plans where the same
`udf(attr#N)` argument appears in more than one Python-eval node.
Two-node plans over DIFFERENT attributes (e.g. the two sides of a
verify join) are legitimate and not flagged.

r12 findings (all fixed with .asNondeterministic() on the UDF, the
documented §4.4 remedy): chunker_windows, duplicate_ngram_spans,
simhash_dedup, repetition_signals. Expected output today: zero flags.

Usage: python scripts/sweep_udf_duplication.py [sf_dir]
Exit: 0 clean, 1 flags found.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from vector_search_service_spark.plans.inspect import explain_str
    from vector_search_service_spark.registry import all_queries
    from vector_search_service_spark.session import get_spark

    spark = get_spark("udf-dup-sweep")
    flagged = []
    for name, spec in all_queries().items():
        try:
            plan = explain_str(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: EXPLAIN ERROR {type(e).__name__}: {e}")
            continue
        args = re.findall(r"Arguments: \[(\w+\(\w+#\d+\))#\d+\]", plan)
        dups = sorted({a for a in args if args.count(a) > 1})
        if dups:
            flagged.append((name, dups))
            print(f"FLAG {name}: {dups}")
    print(f"swept {len(all_queries())} entries; {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
