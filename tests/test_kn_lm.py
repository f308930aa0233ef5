"""Semantic pin for the interpolated Kneser-Ney bigram LM.

The registry parity check runs the SAME formula in Spark and DuckDB,
so it can never catch a formula error — only a transcription error.
This test pins the estimator's defining property instead: for every
context w1, P_KN(·|w1) is a probability distribution over the
continuation vocabulary,

    Σ_{w2 ∈ V_cont} P_KN(w2|w1) = 1,

where V_cont = every word that appears as the second element of some
bigram, and unseen pairs (c12 = 0) contribute only continuation mass.
Algebra: Σ max(c12−D,0)/c1 = (c1 − D·nf)/c1 (every seen c12 ≥ 1 > D),
and Σ_V_cont nc/nb = 1 by construction — so the total is exactly 1.
A wrong discount, a wrong fan-in, or a wrong backoff weight all break
the sum. Runs through the PRODUCTION stat builder and probability
chain (`kn_bigram_stats` / `kn_p_col`), not a test re-derivation.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vector_search_service_spark.queries_corpus import (
    _KN_D,
    kn_bigram_stats,
    kn_p_col,
)

pytestmark = pytest.mark.usefixtures("spark")


def _norm_sums(spark, bigrams: list[tuple[str, str]]):
    pairs = spark.createDataFrame(bigrams, "w1 string, w2 string")
    bc, ctx, cont, nb = kn_bigram_stats(pairs)
    # full (context × continuation-vocab) event space; unseen c12 -> 0
    grid = (
        ctx.select("w1", "c1", "nf")
        .crossJoin(cont.select("w2", "nc"))
        .join(bc, ["w1", "w2"], "left")
        .withColumn("c12", F.coalesce("c12", F.lit(0)))
        .crossJoin(F.broadcast(nb))
    )
    return (
        grid.withColumn("p", kn_p_col())
        .groupBy("w1")
        .agg(F.sum("p").alias("total"), F.min("p").alias("pmin"))
        .collect()
    )


def test_kn_normalizes_on_fixed_corpus(spark):
    bigrams = [
        ("a", "b"), ("a", "b"), ("a", "c"),
        ("b", "c"), ("b", "b"),
        ("c", "a"), ("c", "a"), ("c", "a"), ("c", "d"),
        ("d", "d"),
    ]
    rows = _norm_sums(spark, bigrams)
    assert len(rows) == 4
    for r in rows:
        assert abs(r.total - 1.0) < 1e-9, f"context {r.w1}: Σp = {r.total}"
        assert r.pmin > 0  # continuation mass keeps every event possible


def test_kn_normalizes_on_random_corpora(spark):
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    for _ in range(3):
        n = rng.randrange(20, 80)
        bigrams = [
            (rng.choice(vocab), rng.choice(vocab)) for _ in range(n)
        ]
        for r in _norm_sums(spark, bigrams):
            assert abs(r.total - 1.0) < 1e-9, f"context {r.w1}: Σp = {r.total}"


def test_discount_actually_discounts(spark):
    """The discounted term must use max(c12 − D, 0), not c12/c1: with a
    single-continuation context the seen bigram keeps strictly less
    than its MLE mass (the rest is redistributed as backoff)."""
    bigrams = [("x", "y"), ("x", "y"), ("y", "x")]
    pairs = spark.createDataFrame(bigrams, "w1 string, w2 string")
    bc, ctx, cont, nb = kn_bigram_stats(pairs)
    p_xy = (
        bc.filter((F.col("w1") == "x") & (F.col("w2") == "y"))
        .join(ctx, "w1").join(cont, "w2").crossJoin(F.broadcast(nb))
        .withColumn("p", kn_p_col())
        .collect()[0]
    )
    mle = 1.0  # c12/c1 = 2/2
    assert p_xy.p < mle
    # exact value: (2-D)/2 + (D·1/2)·(1/2) with nc(y)=1, nb=2
    want = (2 - _KN_D) / 2 + (_KN_D / 2) * (1 / 2)
    assert abs(p_xy.p - want) < 1e-12
