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


def test_load_table_pins_utc_session(spark):
    """Timestamp parity is defined against UTC wall-clock (the DuckDB
    oracle's naive-timestamp reading); a driver session inheriting a
    non-UTC host TZ must be pinned back by the table loader or every
    event-time query shifts (r3 TZ=America/New_York mimic catch)."""
    from vector_search_service_spark.sources.tables import load_table

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        from pyspark.sql import functions as F

        # epoch-ms of the min event must be TZ-invariant now
        a = df.agg(F.min(F.unix_millis("ts"))).first()[0]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        b = load_table(spark, "/root/testdata/sf0.001", "events").agg(
            F.min(F.unix_millis("ts"))
        ).first()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
