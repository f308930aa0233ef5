"""Local stand-in for the driver's DuckDB-oracle compare.

Mimics the documented check: row-count + schema + order-insensitive
value comparison between the Spark result of ``queries()[name]`` and
the DuckDB result of ``oracle_sql()[name]`` on the same parquet
tables. We compare actual values (exact for ints/strings/bools, exact
for floats too — our queries are engineered so float values are
bit-reproducible; any intentional rounding happens inside the query)
so a pass here strongly predicts a driver hash-match.
"""

from __future__ import annotations

import math
import struct
from typing import Any

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_duck_views(con, sf_dir: str) -> None:
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # multi-file table dir (distributed-writer layout)
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Canonicalize by IEEE-754 bit pattern so the mirror is at least
        # as strict as the driver's byte-level value hash: Python's
        # ``-0.0 == 0.0`` is True, but their bytes differ — exactly the
        # class of mismatch that produced round 3's one red driver row
        # (``vector_threshold``, VERDICT r3 "What's wrong" #1/#2).
        return struct.pack(">d", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    duck = con.execute(sql)
    d_cols = [d[0] for d in duck.description]
    d_rows = [tuple(r) for r in duck.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, f"value mismatch at sorted-row {i}:\n  spark={a}\n  duck ={b}"
    return True, "ok"
