"""Per-executor model-artifact loading (functions/model_artifact.py):
a REAL serialized weights file shipped via SparkContext.addFile,
deserialized per executor, cached across batches and queries —
the production embedding pattern (ref src/core/embedding_client.py:103-124)
with the model swapped for a dependency-free projection artifact."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vector_search_service_spark.functions.model_artifact import (
    ProjectionModel,
    distribute_model,
    embed_with_model,
    load_cached,
)
from vector_search_service_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model") / "proj_model.npz")
    ProjectionModel.init_random(dim=16, vocab_dim=256, seed=7).save(path)
    return path


def test_artifact_roundtrip_deterministic(artifact):
    a = ProjectionModel.load(artifact)
    b = ProjectionModel.load(artifact)
    texts = ["hash join merge", "", "stream stream spark"]
    assert np.array_equal(a.encode_batch(texts), b.encode_batch(texts))
    # unit-normalized (or zero for empty text)
    norms = np.linalg.norm(a.encode_batch(texts), axis=1)
    assert norms[1] == 0.0
    assert np.allclose(norms[[0, 2]], 1.0, atol=1e-5)


def test_format_version_gate(tmp_path, artifact):
    bad = tmp_path / "bad.npz"
    m = ProjectionModel.load(artifact)
    with open(bad, "wb") as f:
        np.savez(f, weights=m.weights, format_version=np.int64(99))
    with pytest.raises(ValueError, match="format"):
        ProjectionModel.load(str(bad))


def test_distributed_embed_matches_local_model(spark, artifact):
    """The UDF over the addFile-shipped artifact must equal driver-side
    encode_batch exactly — same artifact, same math, Arrow transport."""
    name = distribute_model(spark, artifact)
    docs = load_table(spark, SF, "documents").orderBy("doc_id").limit(50)
    rows = embed_with_model(docs, "text", name).select("doc_id", "text", "embedding").collect()
    model = ProjectionModel.load(artifact)
    local = model.encode_batch([r["text"] for r in rows])
    dist = np.array([r["embedding"] for r in rows], dtype=np.float32)
    assert np.array_equal(dist, local)


def test_loaded_once_per_worker_not_per_batch(spark, tmp_path):
    """Deserialization count ≤ python workers even though the job runs
    32 partitions twice (cache keyed on (path, mtime) survives across
    queries in reused workers). Fresh artifact path → guaranteed cache
    misses on first contact; the count() must aggregate over the
    embedding column or Catalyst prunes the UDF entirely."""
    path = str(tmp_path / "fresh_model.npz")
    ProjectionModel.init_random(dim=16, vocab_dim=256, seed=99).save(path)
    name = distribute_model(spark, path)
    acc = spark.sparkContext.accumulator(0)
    docs = load_table(spark, SF, "documents").repartition(32)
    n_workers = int(spark.sparkContext.defaultParallelism)

    def run():
        return (
            embed_with_model(docs, "text", name, loads_acc=acc)
            .agg(F.sum(F.size("embedding"))).collect()
        )

    run()
    first = acc.value
    run()
    n_rows = docs.count()
    # Worker-churn tolerance: under a long suite the JVM may reap idle
    # python workers or retry tasks, so allow 2x headroom over the
    # steady-state bound (== n_workers). The invariant that matters is
    # loads scale with WORKERS, never with rows/batches.
    assert 1 <= first <= 2 * n_workers
    assert acc.value <= 4 * n_workers
    assert acc.value < n_rows


def test_mtime_invalidation_reloads(tmp_path):
    """An updated artifact (new mtime, new weights) is picked up by the
    cache without process restart — driver-side check of the same code
    path the executors run."""
    path = str(tmp_path / "m.npz")
    ProjectionModel.init_random(dim=8, vocab_dim=64, seed=1).save(path)
    m1 = load_cached(path)
    import os
    import time as _t

    ProjectionModel.init_random(dim=8, vocab_dim=64, seed=2).save(path)
    os.utime(path, (os.path.getmtime(path) + 2, os.path.getmtime(path) + 2))
    _t.sleep(0.01)
    m2 = load_cached(path)
    assert not np.array_equal(m1.weights, m2.weights)
