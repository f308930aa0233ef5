"""Vector similarity expressions (F4 — pgvector ``<=>`` equivalent).

The reference computes ``cosine_distance(embedding, :q)`` inside
PostgreSQL via pgvector (``src/core/vector_store.py:286,297``). Here
the distance is a built-in Catalyst expression over
``array<float>`` — ``aggregate``/``zip_with`` fold entirely JVM-side,
inside whole-stage codegen, so brute-force scoring scans parquet at
full vectorized-reader speed with zero Python in the loop.

Scale path (100 TB / billions of vectors): pre-normalize embeddings at
ingest (``l2_normalize_col``) so distance = 1 - dot (one fused
multiply-add fold), and prune candidates with LSH bucketing
(``operators/ann.py``) before the exact fold — probe-then-rerank, the
same shape as the reference's IVFFlat index (``scripts/init-db.sql:32``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(u: Column, v: Column) -> Column:
    """Σ u_i * v_i as a codegen'd fold (no UDF)."""
    return F.aggregate(
        F.zip_with(u, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(u: Column) -> Column:
    return F.sqrt(F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity_col(u: Column, v: Column) -> Column:
    """Zero-norm guard: Spark 4's ANSI mode makes the bare ``0/0``
    divide THROW, so one all-zeros embedding would kill the entire
    scan job (caught by the edge-corpus hardening pass). pgvector
    returns NaN for the undefined angle (``cosine_distance(0, q)``),
    and NaN sorts AFTER every real distance in ascending order in
    Spark, DuckDB and PostgreSQL alike — so degenerate vectors
    harmlessly sink to the bottom of every top-k. Mirror that."""
    denom = norm_col(u) * norm_col(v)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot_col(u, v) / denom
    )


def cosine_distance_col(u: Column, v: Column) -> Column:
    """pgvector ``<=>``: 1 - cos(u, v). NaN for zero-norm inputs (see
    cosine_similarity_col) — ``1.0 - NaN`` stays NaN."""
    return F.lit(1.0) - cosine_similarity_col(u, v)


def l2_normalize_col(u: Column) -> Column:
    """Ingest-time normalization so query-time distance is 1 - dot.
    A zero vector normalizes to itself (pgvector ``l2_normalize``),
    never a divide-by-zero error."""
    n = norm_col(u)
    return F.transform(
        u, lambda x: F.when(n == 0.0, x * F.lit(0.0)).otherwise(x / n)
    )


def valid_vec_col(u: Column, dim: int) -> Column:
    """Nullify NULL / wrong-dimension embeddings at the scan.

    A production embedding column accumulates rows a fixed-dim query
    can't score: NULL cells (failed encoder calls) and wrong-length
    arrays (model/version drift). Spark's ``zip_with`` pads the short
    side with NULL (distance → NULL), but DuckDB's
    ``list_inner_product`` THROWS on mismatched lengths and Spark's
    ANSI ``element_at`` THROWS past the end — so both engines must
    agree to nullify invalid vectors BEFORE any arithmetic. Distance
    over the nullified column is NULL, which every ranked consumer
    orders ``asc_nulls_last`` (matching DuckDB's NULLS LAST default)
    and every threshold predicate already excludes."""
    return F.when(u.isNotNull() & (F.size(u) == dim), u)


def scoreable_vec_col(u: Column, dim: int) -> Column:
    """``valid_vec_col`` plus a positive-squared-norm gate — the guard
    for consumers whose arithmetic is undefined (or engine-divergent)
    on zero/underflow vectors, not merely on NULL/wrong-dim ones:
    LSH bucketing (sign of ⟨0, h⟩ carries no information), scalar
    quantization (scale = 127/max|x| divides by zero), and any DESC
    ranking where a NaN score would sort FIRST in Spark. Σx² underflows
    to exactly 0.0 identically in both engines (IEEE double), so the
    ``> 0`` predicate is cross-engine deterministic; the SQL mirror is
    ``queries_reference.scoreable_emb_sql``. Norm-OVERFLOW vectors
    (Σx² = +inf, e.g. a float32 column that captured ±inf) are also
    excluded: their quantization scale is 127/inf = 0 (an ANSI-mode
    DIVIDE_BY_ZERO crash, caught by the edge sweep) and their LSH dot
    products are NaN — sign information is gone either way."""
    v = valid_vec_col(u, dim)
    sumsq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.when((sumsq > 0.0) & (sumsq < F.lit(float("inf"))), v)


def euclidean_distance_col(u: Column, v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(u, v, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def dispatch_distance(fn_name: str, u: Column, v: Column) -> Column:
    """F5 — per-collection ``distance_function`` dispatch
    (``src/core/vector_store.py:263-319`` declares the field; only
    cosine is implemented there — we implement all three)."""
    fns = {
        "cosine": cosine_distance_col,
        "dot": lambda a, b: -dot_col(a, b),
        "euclidean": euclidean_distance_col,
    }
    if fn_name not in fns:
        raise ValueError(f"unknown distance function {fn_name!r}")
    return fns[fn_name](u, v)
