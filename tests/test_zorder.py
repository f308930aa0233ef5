"""Z-order clustering (operators/zorder.py): content preservation,
interleave bit math, and the actual pruning payoff — fewer files
overlap a multi-dimensional query box than under a 1-D sorted layout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.operators.zorder import (
    binned_col,
    files_overlapping_box,
    write_zordered,
    zvalue_col,
)
from vector_search_service_spark.sources.tables import load_table

DIMS = [("l_partkey", 0.0, 200.0), ("l_suppkey", 0.0, 10.0)]


def test_zvalue_interleave_known_values(spark):
    df = spark.range(1).select(
        zvalue_col([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3).alias("z")
    )
    # bits (lsb->msb): dim0=1,0,1  dim1=1,1,0 -> interleaved lanes
    # bit0: d0=1 ->1<<0, d1=1 ->1<<1 ; bit1: d0=0, d1=1 ->1<<3 ; bit2: d0=1 ->1<<4
    assert df.first()["z"] == (1 << 0) | (1 << 1) | (1 << 3) | (1 << 4)


def test_zordered_write_preserves_rows(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "z")
    write_zordered(li, path, DIMS, bits=8, num_files=16)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    a = li.select(F.bit_xor(F.xxhash64(*li.columns)).alias("h")).first()["h"]
    b = back.select(F.bit_xor(F.xxhash64(*li.columns)).alias("h")).first()["h"]
    assert a == b  # same rows up to order (xor of row hashes; no overflow)


def test_zorder_prunes_multidim_boxes(spark, tmp_path):
    """The z-order contract vs a 1-D sorted layout: on a box over the
    SECOND dimension the 1-D layout reads everything while z-order
    prunes; on a 2-dim box z-order still prunes to a small fraction
    (it may trade a file or two of first-dim locality — that is the
    deal being made)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, DIMS, bits=10, num_files=16)
    # baseline: 1-D range layout on the FIRST dimension only
    (
        li.repartitionByRange(16, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(lpath)
    )
    second_dim = {"l_suppkey": (0.0, 2.9)}
    z_hit, z_total = files_overlapping_box(zpath, second_dim)
    l_hit, l_total = files_overlapping_box(lpath, second_dim)
    assert z_total == l_total == 16
    assert l_hit == 16  # 1-D layout cannot prune the second dimension
    assert z_hit < l_hit and z_hit <= z_total // 2, f"{z_hit}/{z_total}"

    both_dims = {"l_partkey": (50.0, 90.0), "l_suppkey": (2.0, 5.0)}
    z2, _ = files_overlapping_box(zpath, both_dims)
    l2, _ = files_overlapping_box(lpath, both_dims)
    assert z2 <= z_total // 2  # real pruning on the 2-dim box
    assert z2 <= l2 + 2  # within a hair of the 1-D layout on ITS best box


def test_zorder_scan_equals_full_filter(spark, tmp_path):
    """Pruned reads stay CORRECT: filtering the z-ordered table equals
    filtering the original — layout is invisible to semantics."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "z")
    write_zordered(li, path, DIMS, bits=10, num_files=16)
    pred = (F.col("l_partkey").between(50, 90)) & (F.col("l_suppkey").between(2, 5))
    a = li.filter(pred).count()
    b = spark.read.parquet(path).filter(pred).count()
    assert a == b and a > 0
