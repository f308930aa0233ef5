"""Product quantization (PQ) for vector search — the compression tier
between int8 scalar quantization (`queries_ann.quantized_vector_topk`,
4x) and IVF (`ann_ivf.py`, list pruning): codes are m bytes per vector
(m subspaces × 1 byte) versus 4·D float bytes — 32x for D=64, m=8 —
so the approximate scan reads 3% of the bytes of a brute-force scan.

Everything is DataFrame-native and deterministic:

- **Training** runs Lloyd iterations for ALL m subspace codebooks in a
  single job per iteration: vectors explode into (subspace, sub_vec)
  rows once, assignment is a broadcast join against the (m·k)-row
  centroid table + `min_by`, the update is one groupBy mean. Init is
  seeded-hash order (first k sub-vectors per subspace by
  `xxhash64(vec_id)`), so training is reproducible run-to-run.
- **Encoding** is the same broadcast-join argmin, grouped back into an
  ordered `array<int>` of codes.
- **Querying** (asymmetric distance computation): the query's m×k
  table of exact sub-distances is computed driver-side from the tiny
  codebook and folded into the scan as a nested array literal —
  approx distance = `aggregate(transform(codes, lookup), sum)`, pure
  codegen, no UDF; top-C candidates then exact-rerank (cosine) to
  top-k.

At 100 TB: the codes table is what you scan (32x smaller, narrow
projection); codebooks (m·k·(D/m) floats ≈ KBs) broadcast; only the
C candidate rows ever touch full vectors. No counterpart in the
reference (pgvector's ivfflat stores full vectors per list;
`scripts/init-db.sql:32`) — PQ is the standard next tier.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_distance_col


def _l2_normalized(vec):
    """Cosine-metric PQ: codebooks live on the unit sphere, where
    squared L2 is monotone in cosine (d2 = 2 - 2cos). Zero vectors
    pass through unchanged."""
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(vec, lambda x: x / norm)).otherwise(vec)


def _sub_rows(df: DataFrame, vec_col: str, id_col: str, m: int, sub_dim: int) -> DataFrame:
    """(id, vec) -> m rows of (id, sub, sub_vec)."""
    subs = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim).alias("sub_vec"),
            )
            for s in range(m)
        ])
    ).alias("x")
    return df.select(F.col(id_col).alias("_id"), subs).select("_id", "x.sub", "x.sub_vec")


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_kernel_udf(centroids: list[list[list[float]]], k: int,
                       sub_dim: int):
    """Sub-vector -> nearest-centroid code as an Arrow kernel (the r10
    scan-stage kernel pattern: one sub_dim-float array per row crosses
    Arrow). Replaces the n·m·k broadcast-join fan-out + min_by
    aggregation (whose shuffle key carries the sub_vec itself) with a
    map-only projection. Code-identical to the JVM path: the squared-L2
    fold replays ``_sq_dist``'s left order per dimension (vectorized
    across rows and centroids), and numpy ``argmin`` returns the FIRST
    minimum — the same smallest-code tie-break as
    ``min_by(code, struct(_d, code))``. (The oracled consumers are
    exact full-probe/rerank modes that don't depend on code values at
    all — the identity is belt and braces, and keeps kernel=False
    measurements comparable.)"""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)       # (m, k, sub_dim)

    @F.pandas_udf("int")
    def kern(sub: pd.Series, sub_vec: pd.Series) -> pd.Series:
        n = len(sub)
        if n == 0:
            return pd.Series([], dtype="int32")
        V = np.empty((n, sub_dim), dtype=np.float64)
        for r in range(n):
            V[r] = sub_vec.iloc[r]
        Cs = C[sub.to_numpy()]                      # (n, k, sub_dim)
        acc = np.zeros((n, k), dtype=np.float64)
        for j in range(sub_dim):                    # left fold, vectorized
            d = V[:, None, j] - Cs[:, :, j]         # across rows × centroids
            acc = acc + d * d
        return pd.Series(np.argmin(acc, axis=1).astype("int32"))

    return kern


class PqCodebook:
    """m per-subspace codebooks: centroids[sub][code] = list[float]."""

    def __init__(self, centroids: list[list[list[float]]], m: int, k: int, sub_dim: int):
        self.centroids, self.m, self.k, self.sub_dim = centroids, m, k, sub_dim

    def adc_table(self, query: list[float]) -> list[list[float]]:
        """Exact squared L2 from each query sub-vector to every
        centroid — the only query-time float math, O(m·k·sub_dim) on
        the driver."""
        t = []
        for s in range(self.m):
            q = query[s * self.sub_dim : (s + 1) * self.sub_dim]
            t.append([
                sum((a - b) ** 2 for a, b in zip(q, c)) for c in self.centroids[s]
            ])
        return t


def train_pq(embeddings: DataFrame, *, m: int = 8, k: int = 16,
             vec_col: str = "embedding", id_col: str = "vec_id",
             iters: int = 8, seed: int = 7, kernel: bool = True) -> PqCodebook:
    from ..sources.tables import parallelize_scan

    # Lloyd iterations run over `sub` at the input's parallelism —
    # widen few-file test scans (no-op at real split counts). Note
    # float centroid averages are partition-order-sensitive, so codes
    # may shift microscopically; every oracled consumer is exact
    # (full probe / exact rerank) and the approximate tiers are
    # recall-pinned, not value-pinned.
    embeddings = parallelize_scan(embeddings, embeddings.sparkSession)
    dim = len(embeddings.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub_dim = dim // m
    sub = _sub_rows(
        embeddings.select(
            id_col,
            _l2_normalized(F.col(vec_col).cast("array<double>")).alias(vec_col),
        ),
        vec_col, id_col, m, sub_dim,
    ).localCheckpoint()  # reused every iteration; truncate lineage

    # deterministic seeded init: first k sub-vectors per subspace in
    # xxhash order (a seeded shuffle without a random() call)
    from pyspark.sql.window import Window

    w = Window.partitionBy("sub").orderBy(F.xxhash64(F.col("_id"), F.lit(seed)).asc(),
                                          F.col("_id").asc())
    cents = (
        sub.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("sub", (F.col("_rn") - 1).alias("code"), F.col("sub_vec").alias("cent"))
        .collect()
    )
    if len(cents) < m * k:
        # fewer than k vectors: None centroids would flow into
        # createDataFrame as nulls and make the min_by assignment
        # undefined — fail with the actual budget instead
        raise ValueError(
            f"train_pq needs >= k={k} vectors per subspace, "
            f"got {len(cents) // m}"
        )
    centroids: list[list[list[float]]] = [[None] * k for _ in range(m)]
    for r in cents:
        centroids[r["sub"]][r["code"]] = list(r["cent"])

    spark = embeddings.sparkSession
    for _ in range(iters):
        if kernel:
            # map-only assignment (r10 Arrow kernel): no k-way join
            # fan-out, no (id, sub, sub_vec)-keyed shuffle — the only
            # shuffle left per iteration is the (sub, code) means agg
            assigned = sub.withColumn(
                "code",
                _assign_kernel_udf(centroids, k, sub_dim)(
                    F.col("sub"), F.col("sub_vec")),
            )
        else:
            cent_df = spark.createDataFrame(
                [(s, c, centroids[s][c]) for s in range(m) for c in range(k)],
                "sub int, code int, cent array<double>",
            )
            assigned = (
                # bound: k×m centroid rows — config constants (r10 audit)
                sub.join(F.broadcast(cent_df), "sub")
                .withColumn("_d", _sq_dist(F.col("sub_vec"), F.col("cent")))
                .groupBy("_id", "sub", "sub_vec")
                .agg(F.min_by("code", F.struct(F.col("_d"), F.col("code"))).alias("code"))
            )
        means = (
            assigned.groupBy("sub", "code")
            .agg(*[
                F.avg(F.element_at("sub_vec", i + 1)).alias(f"c{i}")
                for i in range(sub_dim)
            ])
            .collect()
        )
        for r in means:  # empty clusters keep their previous centroid
            centroids[r["sub"]][r["code"]] = [r[f"c{i}"] for i in range(sub_dim)]
    return PqCodebook(centroids, m, k, sub_dim)


def encode_pq(embeddings: DataFrame, codebook: PqCodebook, *,
              vec_col: str = "embedding", id_col: str = "vec_id",
              kernel: bool = True) -> DataFrame:
    """-> (id_col, codes array<int>, vec_col) — in production the codes
    table is written WITHOUT vec_col (that is the 32x point) and the
    rerank joins the full-vector table on the candidate ids only."""
    spark = embeddings.sparkSession
    sub = _sub_rows(
        embeddings.select(
            id_col,
            _l2_normalized(F.col(vec_col).cast("array<double>")).alias(vec_col),
        ),
        vec_col, id_col, codebook.m, codebook.sub_dim,
    )
    if kernel:
        # map-only assignment (r10 Arrow kernel; see _assign_kernel_udf)
        per_sub = sub.withColumn(
            "code",
            _assign_kernel_udf(codebook.centroids, codebook.k,
                               codebook.sub_dim)(F.col("sub"), F.col("sub_vec")),
        ).select("_id", "sub", "code")
    else:
        cent_df = spark.createDataFrame(
            [(s, c, codebook.centroids[s][c])
             for s in range(codebook.m) for c in range(codebook.k)],
            "sub int, code int, cent array<double>",
        )
        per_sub = (
            # bound: k×m centroid rows — config constants (r10 audit)
            sub.join(F.broadcast(cent_df), "sub")
            .withColumn("_d", _sq_dist(F.col("sub_vec"), F.col("cent")))
            .groupBy("_id", "sub")
            .agg(F.min_by("code", F.struct(F.col("_d"), F.col("code"))).alias("code"))
        )
    codes = (
        per_sub
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("_sc"))
        .select("_id", F.transform("_sc", lambda x: x["code"]).alias("codes"))
    )
    return embeddings.join(
        codes, embeddings[id_col] == codes["_id"]
    ).drop("_id")


def pq_topk(coded: DataFrame, codebook: PqCodebook, query: list[float], *,
            k: int = 10, rerank: int | None = 50,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ADC scan -> top-`rerank` candidates -> exact cosine top-k.
    ``rerank=None`` = full-probe exactness mode: no candidate cut, so
    the output provably equals the exact top-k WITHOUT an extra
    count-the-corpus job to size the cut (the ADC column is still
    computed, exercising the code path; it just cannot drop rows)."""
    qf = [float(x) for x in query]
    qn = math.sqrt(sum(x * x for x in qf)) or 1.0
    table = codebook.adc_table([x / qn for x in qf])
    lit_table = F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in table
    ])
    approx = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(lit_table, i + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qcol = F.array(*[F.lit(float(x)) for x in query])
    cand = coded.withColumn("_approx", approx)
    if rerank is not None:
        cand = cand.orderBy(F.col("_approx").asc(), F.col(id_col).asc()).limit(rerank)
    return (
        cand.withColumn("distance", cosine_distance_col(F.col(vec_col), qcol))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_approx", "codes")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse list pruning × code compression (the classic composition)
# ---------------------------------------------------------------------------


def build_ivf_pq(embeddings: DataFrame, *, nlist: int = 16, m: int = 8,
                 k: int = 32, iters: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 seed: int = 7):
    """IVF-PQ index: MLlib KMeans coarse quantizer assigns each vector
    to one of ``nlist`` lists (the IVF tier — at scale the codes table
    is written PARTITIONED by list_id, so a probe is partition-pruned
    I/O); PQ codes compress what a probe then scans (the 32x tier).
    Returns (ivf_index, pq_codebook, coded) where ``coded`` carries
    (id, list_id, codes, vec).

    Classic IVF-PQ trains PQ on RESIDUALS (vector − its centroid) for
    tighter cells; on cosine/unit-sphere data plain PQ already
    clusters well and keeping the codebook list-independent means ONE
    broadcastable ADC table per query instead of nprobe of them —
    the deliberate trade here (documented divergence from the
    Faiss-style residual formulation)."""
    from .ann_ivf import build_ivf_index

    idx = build_ivf_index(embeddings, nlist=nlist, vec_col=vec_col,
                          id_col=id_col, seed=seed)
    cb = train_pq(embeddings, m=m, k=k, iters=iters,
                  vec_col=vec_col, id_col=id_col, seed=seed)
    coded = encode_pq(idx.assigned, cb, vec_col=vec_col, id_col=id_col)
    return idx, cb, coded


def ivf_pq_topk(idx, cb: PqCodebook, coded: DataFrame, query: list[float], *,
                nprobe: int = 4, k: int = 10, rerank: int | None = 50,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Probe the ``nprobe`` nearest lists, ADC-scan only their codes,
    exact-rerank the union's top-``rerank``. Scan cost vs brute force:
    (nprobe/nlist) x (m bytes / 4d bytes) — two multiplicative
    reductions before any exact math."""
    import math as _math

    q = [float(x) for x in query]

    def dist(c: list[float]) -> float:
        return _math.sqrt(sum((a - b) ** 2 for a, b in zip(c, q)))

    order = sorted(range(len(idx.centroids)), key=lambda i: dist(idx.centroids[i]))
    lists = order[:nprobe]
    return pq_topk(
        coded.filter(F.col("list_id").isin(lists)), cb, query,
        k=k, rerank=rerank, vec_col=vec_col, id_col=id_col,
    ).drop("list_id")
