"""Approximate nearest neighbor over embedding columns.

The reference's ANN index is pgvector IVFFlat
(``scripts/init-db.sql:32``): probe a coarse partition, exact-rerank
inside it. The Spark-native equivalent here is random-hyperplane LSH:

    bucket(v) = sign bits of ⟨v, h_1..h_B⟩   (B-bit code)

- **index build** (batch, scale path): one pass computes every
  vector's bucket code — a narrow projection, perfectly parallel; at
  100 TB you write the table partitioned/bucketed by the code so a
  probe prunes to one partition (the IVF "list").
- **query**: compute the query's code driver-side, filter to the
  bucket (partition pruning at scale — no scan), exact cosine rerank,
  top-k. Multi-probe = OR over Hamming-adjacent codes for recall.

Hyperplanes are deterministic literals (seeded, generated once) so the
whole pipeline — bucketing included — is reproducible and
oracle-checkable; a production variant would persist the planes as
index metadata exactly the same way.

Brute-force exact search lives in ``operators/search.py`` —
correctness baseline and final rerank.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_distance_col, dot_col


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: entries from
    a sine-scramble PRNG (fixed literals given (dim, n_planes, seed) —
    sign-LSH only needs direction, not normality)."""
    out = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            x = math.sin((seed + 1) * 1000 + p * dim + i + 0.5) * 43758.5453
            row.append(round(x - math.floor(x) - 0.5, 6))
        out.append(row)
    return out


def derive_n_planes(n_vectors: int, *, target_bucket_rows: int = 256,
                    min_planes: int = 2, max_planes: int = 24) -> int:
    """Corpus-size-derived sign-LSH plane count: B ≈ log2(n / target),
    so expected bucket size ≈ ``target_bucket_rows`` — the knob a
    100 TB user should NOT hand-pick per corpus.

    Rationale (docs/SCALE.md §12, measured at sf1 / 20 k dup-stress
    vectors): the bucket-local pair stage is QUADRATIC in bucket size
    (2.98 s at 2 k rows → 49.2 s at 20 k at fixed B=4), so wall time is
    governed by rows-per-bucket, not corpus size — holding bucket size
    constant as n grows keeps the pair stage near-linear. Exact
    duplicates survive any B (identical vectors → identical sign
    pattern); near-dup recall lost to extra planes is bought back with
    Hamming-1 multi-probe at (B+1)/2^B pair budget
    (``semdedup_multiprobe``). The default target of 256 rows/bucket
    reproduces the measured recall-favored tier: n=20 000 → B=7, the
    config the §12 sweep showed beats exhaustive B=4 at EQUAL pair
    budget (19 259 vs 19 151 drops, 3× faster); a latency-leaning
    deployment passes target≈40 for the measured efficiency point
    (n=20 000 → B=9). Clamped to [min_planes, max_planes]: below 2
    planes bucketing is vacuous, above 24 the int bucket code and the
    probe fan-out stop paying.
    """
    if n_vectors <= 0:
        return min_planes
    b = math.ceil(math.log2(max(n_vectors / target_bucket_rows, 1.0)))
    return max(min_planes, min(max_planes, b))


def derive_semdedup_threshold(n_vectors: int, dim: int, *,
                              expected_random_hits: float = 0.1,
                              floor: float = 0.1,
                              cap: float = 0.95) -> float:
    """The RANDOM-PAIR FLOOR for a semantic-dedup cosine threshold —
    the second corpus-derived knob (docs/SCALE.md §13 measured the
    failure: a fixed 0.3 pin at n=200 k drops 89% of the corpus on
    random neighbors alone).

    Null model: cosines of independent isotropic dim-d vectors are
    ~N(0, 1/dim), so a vector's expected count of random "neighbors"
    at threshold t is n · P(Z ≥ t·√dim). Solving for
    expected_random_hits per vector: t = z(hits/n) / √dim (stdlib
    NormalDist, no scipy). Sanity vs measurement: n=200 000, dim=64 →
    0.611, matching the 0.6 the §13 sweep validated by hand.

    This is a FLOOR, not the semantic choice: the effective threshold
    is max(derived floor, the corpus's semantic near-dup level) —
    SemDeDup on real clustered 1 024-dim embeddings typically wants
    ≥0.9 semantically, far above the floor (~0.15 at that dim). What
    the floor guarantees is that the drop set measures STRUCTURE, not
    corpus size. Real corpora are anisotropic; the isotropic null is
    the right model for the false-positive rate precisely because
    unrelated-pair cosines concentrate like the null, while related
    pairs do not (the premise of cosine dedup).
    """
    from statistics import NormalDist

    if n_vectors <= 0 or dim <= 0:
        return floor
    p = min(max(expected_random_hits / n_vectors, 1e-300), 0.5)
    # upper-tail quantile via the symmetric lower tail: 1.0 - p rounds
    # to exactly 1.0 for p < ~1e-16 and inv_cdf(1.0) raises
    t = -NormalDist().inv_cdf(p) / math.sqrt(dim)
    return max(floor, min(cap, t))


def derive_bucket_cap(*, target_bucket_rows: int = 256,
                      factor: int = 16) -> int:
    """Production default for the semantic-tier hot-bucket cap:
    ``factor ×`` the rows-per-bucket target ``derive_n_planes`` aims
    for (16 × 256 = 4096). Rationale: ``derive_n_planes`` bounds the
    AVERAGE bucket at ~``target_bucket_rows``, so a bucket 16× over
    target is pathological by construction — a viral duplicate
    cluster (identical vectors → identical sign pattern at ANY B) or
    severe embedding anisotropy — and exactly the case where the
    bucket-local pair stage goes quadratic (commit 85a319f measured
    2.6× on a 20 k-copy viral corpus, output bit-identical). A cap
    this far above target never binds on healthy buckets, so the
    protection is on by default (``bucket_cap="auto"`` in the
    SemDeDup plan helpers) the way ``threshold="auto"`` derives the
    random-pair floor; registered oracle entries opt out with an
    explicit ``bucket_cap=None`` to keep the uncapped pinned
    semantics."""
    return factor * target_bucket_rows


def bucket_code_col(vec: Column, planes: list[list[float]]) -> Column:
    """B-bit LSH bucket id: Σ 2^i · [⟨v, h_i⟩ > 0] — a codegen'd fold
    per plane, no UDF."""
    code = F.lit(0)
    for i, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        code = code + F.when(dot_col(vec, h) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return code


def bucket_code_kernel_udf(planes: list[list[float]]):
    """``bucket_code_col`` as an Arrow kernel — bit-identical (the r10
    scan-stage kernel pattern: one array per ROW crosses Arrow, so the
    transfer is small and the fold work vectorizes). Each plane's dot
    is replayed as the exact left fold ``acc = acc + v_j*h_j``
    vectorized ACROSS rows — the per-row IEEE op sequence of
    ``dot_col``, preserving the SIGN at the 0-boundary where a
    pairwise-summed matmul could flip a bucket bit in the last ulp.
    NULL semantics replicated: a NULL row or any NULL element makes
    every plane's dot NULL, and ``F.when(NULL > 0, bit).otherwise(0)``
    emits bucket 0 — the kernel maps missing values to NaN, whose
    ``> 0`` is also False on every plane."""
    import numpy as np

    H = np.array(planes, dtype=np.float64)   # (B, dim)
    n_planes, dim = H.shape

    @F.pandas_udf("long")
    def kern(vec: pd.Series) -> pd.Series:
        n = len(vec)
        V = np.full((n, dim), np.nan, dtype=np.float64)
        for r, cell in enumerate(vec):
            if cell is not None:
                a = np.asarray(cell, dtype=np.float64)
                if a.shape[0] == dim:
                    V[r] = a
        code = np.zeros(n, dtype=np.int64)
        for i in range(n_planes):
            acc = np.zeros(n, dtype=np.float64)
            h = H[i]
            for j in range(dim):                 # left fold, vectorized
                acc = acc + V[:, j] * h[j]       # across rows
            code |= np.where(acc > 0, np.int64(1) << i, 0)
        return pd.Series(code)

    return kern


def sql_bucket_code_expr(vec_sql: str, planes: list[list[float]]) -> str:
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_inner_product({vec_sql}, {lit}) > 0 THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def bucket_of(vec: list[float], planes: list[list[float]]) -> int:
    code = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(vec, plane)) > 0:
            code |= 1 << i
    return code


def ann_lsh_topk(embeddings: DataFrame, query_vec: list[float], *,
                 n_planes: int = 4, limit: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 7, kernel: bool = True) -> DataFrame:
    """Probe-then-rerank: filter to the query's LSH bucket, exact
    cosine inside it, top-k. The bucket filter is a plain equality
    predicate — with the index table laid out partitioned by
    ``bucket``, Catalyst prunes to one partition (the IVF probe)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qb = bucket_of([float(x) for x in query_vec], planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucket = (bucket_code_kernel_udf(planes)(F.col(vec_col)) if kernel
              else bucket_code_col(F.col(vec_col), planes))
    return (
        embeddings
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") == F.lit(qb))
        .withColumn("distance", cosine_distance_col(F.col(vec_col), q))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(limit)
    )


def jl_signs(dim: int, k: int, seed: int = 11) -> list[list[int]]:
    """Sparse Johnson-Lindenstrauss sign matrix (Achlioptas 2003,
    "Database-friendly random projections"): entries in {+1, 0, -1}
    with probabilities {1/6, 2/3, 1/6}, deterministic via the same
    sine-scramble PRNG as ``hyperplanes`` so both engines replay the
    identical literals. The sqrt(3/k) scale factor is dropped — it is
    a positive constant, so candidate RANKING by projected distance is
    unchanged, and keeping entries in {-1,0,+1} makes the projection a
    pure signed integer sum over micro-unit coordinates: bit-identical
    across engines regardless of fold order (the fold-order-exactness
    argument for the oracle).

    This is the middle ANN tier: cheaper per-row than PQ code lookup
    (k signed adds per output dim), better-separated than 4-bit
    sign-LSH buckets; reference analogue is the IVFFlat coarse stage
    (``scripts/init-db.sql:32``)."""
    out = []
    for j in range(k):
        row = []
        for i in range(dim):
            x = math.sin((seed + 1) * 2000 + j * dim + i + 0.25) * 43758.5453
            u = x - math.floor(x)
            row.append(1 if u < 1.0 / 6.0 else (-1 if u > 5.0 / 6.0 else 0))
        out.append(row)
    return out


def build_lsh_index(embeddings: DataFrame, *, n_planes: int = 4,
                    vec_col: str = "embedding", dim: int = 64,
                    seed: int = 7, kernel: bool = True) -> DataFrame:
    """Batch index build: annotate every vector with its bucket code.
    At scale: ``.write.partitionBy('bucket')`` (or bucketBy for join
    co-location) — the one-pass MLlib-style bulk index build the
    BASELINE.json approach calls for."""
    planes = hyperplanes(dim, n_planes, seed)
    bucket = (bucket_code_kernel_udf(planes)(F.col(vec_col)) if kernel
              else bucket_code_col(F.col(vec_col), planes))
    return embeddings.withColumn("bucket", bucket)
