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


def _norm_sums_trigram(spark, trigrams: list[tuple[str, str, str]]):
    from vector_search_service_spark.queries_corpus import (
        kn3_p_col,
        kn_trigram_stats,
    )

    tri = spark.createDataFrame(trigrams, "w1 string, w2 string, w3 string")
    tc, ctx12, mb, mctx, lo, nbt = kn_trigram_stats(tri)
    # full (context × continuation-vocab) event space; unseen c123 and
    # unseen (w2, w3) continuation pairs contribute backoff mass only
    grid = (
        ctx12.select("w1", "w2", "c12t", "nf12")
        .crossJoin(lo.select("w3", "nlo"))
        .join(tc, ["w1", "w2", "w3"], "left")
        .withColumn("c123", F.coalesce("c123", F.lit(0)))
        .join(mb, ["w2", "w3"], "left")
        .withColumn("nmid", F.coalesce("nmid", F.lit(0)))
        .join(mctx, "w2")
        .crossJoin(F.broadcast(nbt))
    )
    return (
        grid.withColumn("p", kn3_p_col())
        .groupBy("w1", "w2")
        .agg(F.sum("p").alias("total"), F.min("p").alias("pmin"))
        .collect()
    )


def test_kn3_normalizes_on_fixed_corpus(spark):
    """3-level KN: for every observed context (w1, w2), Σ over the
    continuation vocabulary of P_KN3(w3|w1,w2) = 1. A wrong discount,
    fan-in, continuation-type count, or backoff weight at ANY of the
    three levels breaks the sum — which the mirrored DuckDB oracle
    can never catch (it runs the same formula)."""
    trigrams = [
        ("a", "b", "c"), ("a", "b", "c"), ("a", "b", "d"),
        ("b", "c", "a"), ("b", "c", "c"),
        ("c", "a", "b"), ("c", "a", "b"), ("c", "a", "d"), ("c", "d", "a"),
        ("d", "d", "b"),
    ]
    rows = _norm_sums_trigram(spark, trigrams)
    assert len(rows) == 5
    for r in rows:
        assert abs(r.total - 1.0) < 1e-9, f"context ({r.w1},{r.w2}): Σp = {r.total}"
        assert r.pmin > 0


def test_kn3_normalizes_on_random_corpora(spark):
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(8)]
    for _ in range(2):
        n = rng.randrange(30, 90)
        trigrams = [
            (rng.choice(vocab), rng.choice(vocab), rng.choice(vocab))
            for _ in range(n)
        ]
        for r in _norm_sums_trigram(spark, trigrams):
            assert abs(r.total - 1.0) < 1e-9, (
                f"context ({r.w1},{r.w2}): Σp = {r.total}")
