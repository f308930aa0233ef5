"""The local oracle mirror must be at least as strict as the driver's
byte-level value hash (VERDICT r3 "What's wrong" #2): Python ``==``
treats ``-0.0 == 0.0`` as True, the driver's hash does not.  These
tests pin the harness's float canonicalization to IEEE-754 bit
patterns so the signed-zero class can never silently pass again."""

from __future__ import annotations

import math

from tests.oracle_harness import _norm_cell, _norm_rows


def test_signed_zero_distinguished():
    assert 0.0 == -0.0  # the trap the old harness fell into
    assert _norm_cell(0.0) != _norm_cell(-0.0)


def test_equal_floats_still_equal():
    assert _norm_cell(1.5) == _norm_cell(1.5)
    assert _norm_cell(0.1 + 0.2) != _norm_cell(0.3)  # ulp-strict


def test_nan_canonical():
    # all NaN payloads collapse to one token (DuckDB and Spark may
    # emit different payload bits; semantically one NaN)
    assert _norm_cell(float("nan")) == _norm_cell(math.nan)


def test_nested_lists_normalized():
    assert _norm_cell([0.0, 1.0]) != _norm_cell([-0.0, 1.0])
    assert _norm_cell((2.0, 3.0)) == _norm_cell([2.0, 3.0])


def test_norm_rows_detects_signed_zero_mismatch():
    a = _norm_rows(["x"], [(0.0,)])
    b = _norm_rows(["x"], [(-0.0,)])
    assert a != b
