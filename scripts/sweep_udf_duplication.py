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

r13 (ADVICE r12 #1): the original extraction only matched eval nodes
whose Arguments list was exactly one single-argument UDF, so
multi-argument UDFs (chunks_udf_per_row takes 3 columns) and nodes
evaluating several UDFs could duplicate without a flag. Extraction now
walks every (Arrow|Batch)EvalPython node's full Arguments list with
bracket/paren-aware splitting and compares normalized ``udf(args)``
call strings (result ids stripped) ACROSS nodes.

A flag means "this udf call is evaluated by >1 node", NOT "apply
asNondeterministic": when the UDF column has MULTIPLE references per
node (fts_stemmed_topk: 3 in the match filter + 6 in the rank
projection), the marker blocks the CSE that was collapsing them —
measured 2 eval-refs -> 9 and 0.59 -> 0.85 s at sf0.1 (r13 A/B,
OPTIMIZATION_r13.md). Adjudicate each flag: single-reference consumers
(the r12 chunker/shingle family) want the marker; multi-reference
consumers with a memoized UDF are often already optimal. Known
adjudicated-KEEP flags are listed in KNOWN_OK below and do not fail
the sweep.

Usage: python scripts/sweep_udf_duplication.py [sf_dir]
Exit: 0 clean, 1 unadjudicated flags found.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _split_call_list(args_line: str) -> list[str]:
    """The udf-call strings of one eval node's ``Arguments: [...]``
    line: the FIRST top-level bracketed list, split at depth-0 commas,
    each entry's trailing result id (``#N``) stripped. Paren/bracket
    aware, so ``udf(a#1, lower(b#2))#7, udf2(c#3)#8`` yields two
    normalized calls."""
    body = args_line.split("Arguments: [", 1)[1]
    calls: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in body:
        if ch == "]" and depth == 0:
            break
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            calls.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        calls.append("".join(cur))
    return [re.sub(r"#\d+$", "", c.strip()) for c in calls if c.strip()]


def eval_node_calls(plan: str) -> list[list[str]]:
    """Per Python-eval node (ArrowEvalPython / BatchEvalPython), the
    normalized udf-call strings of its Arguments list."""
    lines = plan.splitlines()
    nodes: list[list[str]] = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) (Arrow|Batch)EvalPython", line):
            for j in range(i + 1, min(i + 8, len(lines))):
                if lines[j].startswith("Arguments: ["):
                    nodes.append(_split_call_list(lines[j]))
                    break
    return nodes


def duplicated_calls(plan: str) -> list[str]:
    """Normalized udf-call strings evaluated by MORE than one
    Python-eval node of the plan (the §4.4 pathology)."""
    nodes = eval_node_calls(plan)
    seen: dict[str, int] = {}
    for calls in nodes:
        for c in set(calls):  # per-node dedup: across-node only
            seen[c] = seen.get(c, 0) + 1
    return sorted(c for c, n in seen.items() if n > 1)


#: (entry, udf-name-prefix) pairs adjudicated KEEP-AS-IS — reported but
#: not sweep-failing. Each needs a ledger entry with the measurement.
KNOWN_OK: frozenset[tuple[str, str]] = frozenset({
    # r13: filter+rank both consume the stemmed-tokens column; CSE
    # keeps each node at ONE eval and the per-task stem memo makes the
    # second node cheap. asNondeterministic measured 0.59 -> 0.85 s
    # (blocks CSE: 9 eval-refs), a filter barrier 0.59 -> 0.67 s —
    # both rejected (OPTIMIZATION_r13.md).
    ("fts_stemmed_topk", "stem_tokens_udf"),
})


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
        dups = duplicated_calls(plan)
        known = [d for d in dups if any(
            name == n and d.startswith(p) for n, p in KNOWN_OK)]
        new = [d for d in dups if d not in known]
        for d in known:
            print(f"KNOWN-OK {name}: {d}")
        if new:
            flagged.append((name, new))
            print(f"FLAG {name}: {new}")
    print(f"swept {len(all_queries())} entries; {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
