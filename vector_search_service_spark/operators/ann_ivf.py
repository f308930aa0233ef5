"""MLlib-based ANN: IVF via KMeans coarse quantization, and
BucketedRandomProjectionLSH similarity joins (the BASELINE.json
approach: "MLlib for batch embedding generation + bulk index build").

IVF mirrors pgvector's IVFFlat (``scripts/init-db.sql:32``) exactly in
shape:

- **build**: KMeans over (a sample of) the corpus learns ``nlist``
  centroids; one pass assigns every vector to its nearest centroid
  (the IVF "list"). At scale the assignment is a narrow projection and
  the table is written partitioned by ``list_id``.
- **probe**: compute the query's ``nprobe`` nearest centroids
  driver-side (centroids are tiny), scan only those lists (partition
  pruning), exact cosine rerank, top-k.

Approximate results have no SQL oracle; correctness is pinned by
recall tests against the exact brute-force baseline
(``tests/test_ann_ivf.py``) — the honest evaluation for ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_distance_col


def _to_mllib_vec(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))


class IvfIndex:
    """KMeans coarse quantizer + assigned lists."""

    def __init__(self, model, assigned: DataFrame, vec_col: str, id_col: str):
        self.model = model
        self.assigned = assigned  # source columns + list_id
        self.vec_col = vec_col
        self.id_col = id_col

    @property
    def centroids(self) -> list[list[float]]:
        return [c.tolist() for c in self.model.clusterCenters()]

    def probe(self, query_vec: list[float], *, nprobe: int = 2, limit: int = 10) -> DataFrame:
        """Scan the ``nprobe`` nearest lists, exact-rerank, top-k."""
        import math

        q = [float(x) for x in query_vec]

        def dist(c: list[float]) -> float:
            return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, q)))

        order = sorted(range(len(self.centroids)), key=lambda i: dist(self.centroids[i]))
        lists = order[:nprobe]
        qcol = F.array(*[F.lit(x) for x in q])
        return (
            self.assigned.filter(F.col("list_id").isin(lists))
            .withColumn("distance", cosine_distance_col(F.col(self.vec_col), qcol))
            .orderBy(F.col("distance").asc(), F.col(self.id_col).asc())
            .limit(limit)
        )


def build_ivf_index(embeddings: DataFrame, *, nlist: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 7) -> IvfIndex:
    from pyspark.ml.clustering import KMeans

    from ..sources.tables import parallelize_scan

    # KMeans Lloyd iterations inherit the input's partitioning; the
    # few-file test corpus would run every iteration 2-way parallel
    # (measured: dominates ivf_pq_topk's 44.6 s at sf1). No-op at
    # real split counts; full-probe exactness is centroid-independent
    # so values cannot shift (tests/test_pq.py pins both).
    embeddings = parallelize_scan(embeddings, embeddings.sparkSession)
    feats = _to_mllib_vec(embeddings, vec_col)
    model = KMeans(k=nlist, seed=seed, featuresCol="_features",
                   predictionCol="list_id").fit(feats)
    assigned = model.transform(feats).drop("_features")
    return IvfIndex(model, assigned, vec_col, id_col)


def lsh_similarity_join(embeddings: DataFrame, *, threshold: float,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        bucket_length: float = 2.0, num_tables: int = 3,
                        seed: int = 7) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approximate self-join:
    candidate pairs within Euclidean ``threshold`` (on L2-normalized
    vectors, Euclidean distance is monotone in cosine:
    d² = 2·(1 − cos)). Returns (id_a, id_b, eucl_dist), id_a < id_b."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer

    feats = _to_mllib_vec(embeddings.select(id_col, vec_col), vec_col)
    feats = Normalizer(inputCol="_features", outputCol="_norm", p=2.0).transform(feats)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_norm", outputCol="_hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="eucl_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("eucl_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
