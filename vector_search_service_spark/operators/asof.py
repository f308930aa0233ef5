"""As-of (point-in-time) join — absent from both the reference and
Spark's built-ins (SURVEY.md §2.3 "Absent in reference"); a staple for
event/state alignment in training-data pipelines.

Semantics: for every left row, attach the latest right row with the
same key and ``right.ts <= left.ts`` (backward as-of).

Spark shape — the union-sort trick, chosen for scale:

    tag left(1)/right(0) rows → union → window per key ordered by
    (ts, side): ``last(right_value, ignorenulls)`` carries the most
    recent right row forward onto each left row.

Cost is ONE shuffle on the key + a per-partition sort — the same cost
as a plain join, no range-explosion, no per-row probing; skewed keys
are handled by AQE like any other shuffle. (The naive alternative —
range join + groupBy max — shuffles twice and explodes candidate
pairs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, *, on: str,
                       ts: str, right_cols: list[str],
                       suffix: str = "_asof") -> DataFrame:
    """Backward as-of join. ``left`` keeps all its rows/columns;
    ``right_cols`` arrive as ``<col><suffix>`` (NULL when no right row
    precedes). Right rows at the exact same ``ts`` DO match (<=)."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in (on, ts):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols]).unionByName(
        r.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols])
    )
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        out.filter(F.col("_side") == 1)
        .drop("_side", *[f"_r_{c}" for c in right_cols])
    )


def asof_join_forward(left: DataFrame, right: DataFrame, *, on: str,
                      ts: str, right_cols: list[str],
                      suffix: str = "_asof") -> DataFrame:
    """Forward as-of join: earliest right row with ``right.ts >=
    left.ts`` per key (NULL when none follows). Same union-window
    shape traversed in descending time — identical one-shuffle cost;
    simultaneous right rows DO match (>=)."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in (on, ts):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols]).unionByName(
        r.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols])
    )
    # descending time; right (side 0) before left at equal ts so a
    # simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        out.filter(F.col("_side") == 1)
        .drop("_side", *[f"_r_{c}" for c in right_cols])
    )
