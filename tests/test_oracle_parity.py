"""Every registry entry with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, register_duck_views


def _specs():
    from vector_search_service_spark.registry import all_queries

    return list(all_queries().values())


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    register_duck_views(duck, SF_ORACLE)
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker path)
        return
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{spec.name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "lang", "source", "rank"]


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_no_complex_output_columns(spark, spec):
    """Driver invariant: every oracle-checked query must emit only
    scalar columns — the driver's canonicalizer sorts a pandas frame
    and dies on unhashable array/map/struct cells (the round-1
    embed_documents failure). Rows-only entries are exempt (the
    driver never hashes them) but we keep them scalar too where easy."""
    if spec.oracle is None:
        return
    from pyspark.sql import types as T

    df = spec.fn(spark, SF_ORACLE)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{spec.name}: complex-typed output columns {bad}"
