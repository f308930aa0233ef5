"""Edge-relational oracle parity: NULL keys, orphan FKs, NULL dates.

TPC-H generators never emit NULLs, so the classic relational traps are
all latent on the stock corpus: ``NOT IN`` collapses to empty the
moment the subquery produces one NULL (while a null-unsafe anti-join
keeps returning rows), outer-join aggregates must count NULL-extended
rows consistently, NULL grouping keys must land in one group in both
engines, and date functions must NULL-propagate identically.

This suite rebuilds ``customer`` / ``orders`` / ``lineitem`` with
adversarial rows appended — a NULL-custkey orphan order, a NULL
nation/segment customer, a NULL-orderkey lineitem, NULL
dates/returnflags/priorities, zero quantities — and runs every
relational/TPC-H oracled entry against DuckDB on the same corpus.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import TABLES, compare, register_duck_views

D = datetime.datetime

EDGE_CUSTOMER = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (-101, "edge-null-nation", None, 123.45, "BUILDING"),
    (-102, "edge-null-segment", 0, -50.25, None),
    (-103, "edge-neg-key", 1, 0.0, "AUTOMOBILE"),
]
EDGE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (-201, None, "O", 100.50, D(2024, 3, 1), "1-URGENT"),   # orphan: NULL custkey
    (-202, -103, "F", 0.0, None, "5-LOW"),                  # NULL orderdate
    (-203, -103, "P", 999.99, D(1995, 6, 15), None),        # NULL priority
]
EDGE_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (-203, 1, 1, 1, 0.0, 100.0, 0.0, 0.0, None, "O", D(1995, 6, 20)),
    (None, 2, 2, 1, 5.0, 50.0, 0.05, 0.01, "N", "O", D(1995, 7, 1)),
    (-201, -999, -999, 1, 1.0, 10.0, 0.0, 0.0, "A", "F", None),  # orphan FKs, NULL shipdate
]

SCHEMAS = {
    "customer": ("c_custkey long, c_name string, c_nationkey int, "
                 "c_acctbal double, c_mktsegment string", EDGE_CUSTOMER),
    "orders": ("o_orderkey long, o_custkey long, o_orderstatus string, "
               "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
               EDGE_ORDERS),
    "lineitem": ("l_orderkey long, l_partkey long, l_suppkey long, "
                 "l_linenumber int, l_quantity double, l_extendedprice double, "
                 "l_discount double, l_tax double, l_returnflag string, "
                 "l_linestatus string, l_shipdate timestamp", EDGE_LINEITEM),
}

# every oracled entry whose query reads the TPC-H tables
ENTRIES = [
    "date_range_agg", "join_agg_topk", "star_join_by_nation", "tpch_q1_full",
    "set_operations", "window_rank_per_group", "salted_group_agg",
    "table_profile", "count_per_group", "decimal_exact_revenue",
    "exact_correlation", "pivot_status_counts", "rollup_counts",
    "exists_semi_join", "not_exists_anti", "scalar_subquery_avg",
    "having_join_topk", "multi_distinct_agg", "window_lead_lag_cumsum",
    "sole_fault_supplier", "correlated_min_joinback", "promo_revenue_ratio",
    "volume_by_nation_pair", "market_share_by_year", "important_part_value",
    "small_qty_revenue", "disjunctive_pushdown", "idle_customer_balance",
    "profit_by_nation_year", "returned_item_revenue",
    "linestatus_priority_counts", "top_revenue_supplier",
    "supplier_diversity_by_part", "dominant_part_suppliers",
    "topk_by_value", "quantile_stats",
]


@pytest.fixture(scope="session")
def edge_rel_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    out = tmp_path_factory.mktemp("edge_rel")
    for t in TABLES:
        if t not in SCHEMAS:
            os.symlink(f"{SF_SMOKE}/{t}.parquet", out / f"{t}.parquet")
    for t, (ddl, rows) in SCHEMAS.items():
        base = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        edge = spark.createDataFrame(rows, ddl)
        merged = base.unionByName(edge)
        for f_ in merged.schema.fields:  # keep DuckDB seeing naive timestamps
            if isinstance(f_.dataType, TimestampType):
                merged = merged.withColumn(
                    f_.name, F.col(f_.name).cast("timestamp_ntz"))
        tmp = str(out / f"_{t}_build")
        merged.coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), out / f"{t}.parquet")
        shutil.rmtree(tmp)
    return str(out)


@pytest.mark.parametrize("name", ENTRIES)
def test_oracle_parity_on_edge_relational(spark, duck, edge_rel_dir, name):
    from vector_search_service_spark.registry import all_queries

    register_duck_views(duck, edge_rel_dir)
    spec = all_queries()[name]
    assert spec.oracle is not None
    ok, msg = compare(spec.fn(spark, edge_rel_dir), duck, spec.oracle)
    assert ok, f"{name} on edge relational corpus: {msg}"
