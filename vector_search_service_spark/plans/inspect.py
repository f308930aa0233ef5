"""Physical-plan inspection helpers.

The engine's performance contract is enforced as *plan assertions*, not
hope: tests check that filters reach the parquet scan (PushedFilters),
projections prune the read schema, dimension joins broadcast, and
ORDER BY+LIMIT plans as TakeOrderedAndProject. A plan regression fails
the suite the same way a wrong answer does — at 100 TB the plan IS the
correctness."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True when the scan node reports non-empty PushedFilters
    (optionally containing every given column name)."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    if not pushed.strip():
        return False
    return all(n in pushed for n in needles)


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = explain_str(df)
    cols: set[str] = set()
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_top_k(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def executed_plan_str(df: DataFrame) -> str:
    """The FINAL adaptive plan, after running the query. Needed to pin
    AQE-owned join strategies (r9 broadcast-audit): an unhinted join on
    an aggregate-output build side plans SortMergeJoin statically and
    only converts to broadcast at runtime when the measured size fits —
    `explain_str` sees the static plan, this sees what actually ran."""
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()
