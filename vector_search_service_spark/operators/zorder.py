"""Z-order (Morton-curve) clustering for multi-dimensional file
pruning — the layout tier for scans that filter on SEVERAL columns at
once.

A single `sortBy(a)` layout prunes scans filtering on `a` and nothing
else; range-partitioning by the Z-value of (a, b, …) clusters rows so
every file covers a small HYPER-RECTANGLE of the key space, making
parquet min/max stats selective for predicates on ANY subset of the
dimensions. This is Delta/Iceberg's `OPTIMIZE ZORDER BY` mechanic,
reimplemented on plain parquet:

- bin each dimension to `bits` integer ranks over a fixed (min, max)
  range (ranges are part of the layout contract — compute them once
  from table stats);
- interleave the bits into one long (pure codegen bitwise expression —
  no UDF);
- `repartitionByRange(z)` + `sortWithinPartitions(z)` + write. The
  range exchange samples z (one pass), each output file lands a
  contiguous z-interval, and parquet footers carry tight per-file
  min/max for every constituent dimension.

At 100 TB the write is one shuffle — amortized over every multi-dim
scan after, same economics as `bucketing.py`. Skewed dimensions bin
badly on raw ranges; feed quantile-binned ranks instead (same
interleave)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZCOL = "_zvalue"


def binned_col(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank of `col` in [lo, hi] on a 2^bits grid, clamped."""
    span = float(hi) - float(lo)
    scaled = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(span)
                     * F.lit(float(2 ** bits)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(2 ** bits - 1)).cast("long")


def zvalue_col(binned: list[Column], bits: int) -> Column:
    """Interleave `bits` bits of each binned coordinate into one long
    (dimension 0 owns the least-significant lane of each bit group)."""
    n = len(binned)
    terms = [
        F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * n + i)
        for bit in range(bits)
        for i, b in enumerate(binned)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def write_zordered(df: DataFrame, path: str, dims: list[tuple[str, float, float]],
                   *, bits: int = 10, num_files: int = 16) -> None:
    """Cluster `df` by the Z-value of `dims` [(col, lo, hi), ...] into
    `num_files` range-partitioned parquet files."""
    z = zvalue_col([binned_col(F.col(c), lo, hi, bits) for c, lo, hi in dims], bits)
    (
        df.withColumn(ZCOL, z)
        .repartitionByRange(num_files, F.col(ZCOL))
        .sortWithinPartitions(ZCOL)
        .drop(ZCOL)
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping_box(path: str, predicates: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(overlapping, total) parquet files whose per-file min/max stats
    intersect the query box — exactly the pruning decision a stats-
    aware reader makes. Used by tests to measure layout quality."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlaps = True
        for col, (lo, hi) in predicates.items():
            cmin, cmax = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if cmin is None or cmax < lo or cmin > hi:
                overlaps = False
                break
        hit += overlaps
    return hit, len(files)
