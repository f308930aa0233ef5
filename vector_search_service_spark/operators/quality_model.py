"""Model-based quality classification — the learned tier above the
closed-form heuristic (`textquality.quality_score_col`).

Production corpus pipelines (C4, Gopher, FineWeb lineage) pair cheap
heuristic gates with a TRAINED quality classifier (fastText /
logistic regression over shallow features) scored across the whole
corpus. This module reproduces that shape with MLlib, end to end in
Spark:

- **features**: the same cheap, codegen-side signals the heuristic
  tier already computes (length terms, type-token ratio, alnum
  cleanliness, stopword hit rate, mean word length) assembled into a
  dense vector — one narrow projection over the corpus, no UDF;
- **weak labels**: the heuristic score's top/bottom quantile bands
  (train on confident extremes, score everything — standard
  weak-supervision bootstrap when no human labels exist);
- **train**: MLlib LogisticRegression (deterministic for fixed data:
  L-BFGS from a fixed init, no sampling);
- **inference**: `model.transform` — a JVM-side vectorized pass;
  at 100 TB this is a map-only stage (no shuffle), and the fitted
  coefficients (a handful of doubles) broadcast for free.

The reference has no learned ranking/filtering anywhere; this is part
of the LLM-pipeline extension surface. Correctness contract (no SQL
oracle for L-BFGS): held-out accuracy must beat the majority class,
scores must be deterministic across refits, and the model must agree
with the heuristic on the extremes it was taught from
(tests/test_quality_model.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import words_col
from .textquality import quality_score_col

FEATURES = ("n_words", "ttr", "clean_ratio", "stopword_rate", "mean_word_len")

_STOPWORDS = ("the", "and", "of", "is", "with", "for", "a", "to", "in", "on")


def feature_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shallow quality features, all codegen expressions."""
    text = F.col(text_col)
    words = words_col(text)
    n_words = F.size(words).cast("double")
    n_distinct = F.size(F.array_distinct(words)).cast("double")
    n_chars = F.length(text).cast("double")
    n_alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", "")).cast("double")
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*_STOPWORDS))
    ).cast("double")
    total_word_chars = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    )
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    return docs.withColumns({
        "n_words": n_words,
        "ttr": safe(n_distinct, n_words),
        "clean_ratio": safe(n_alnum, n_chars),
        "stopword_rate": safe(stop_hits, n_words),
        "mean_word_len": safe(total_word_chars, n_words),
        "heuristic_score": quality_score_col(text, words),
    })


def weak_labels(feat: DataFrame, *, low_q: float = 0.3, high_q: float = 0.7) -> DataFrame:
    """Label the confident extremes of the heuristic score; the middle
    band is left unlabeled (scored at inference, never trained on)."""
    lo, hi = feat.approxQuantile("heuristic_score", [low_q, high_q], 0.001)
    # lo == hi (a large score atom) is still trainable when rows exist
    # strictly above hi — the single-class degenerate case is caught
    # where it actually bites, in fit_quality_model's class check
    return feat.withColumn(
        "label",
        F.when(F.col("heuristic_score") <= lo, F.lit(0.0))
         .when(F.col("heuristic_score") >= hi, F.lit(1.0)),
    )


def fit_quality_model(labeled: DataFrame):
    """LogisticRegression over the assembled features (training rows =
    labeled extremes only)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(inputCols=list(FEATURES), outputCol="features")
    train = asm.transform(labeled.filter(F.col("label").isNotNull()))
    n_by_class = {r["label"]: r["n"] for r in
                  train.groupBy("label").agg(F.count("*").alias("n")).collect()}
    if not (n_by_class.get(0.0) and n_by_class.get(1.0)):
        # a skewed/constant heuristic-score distribution can leave one
        # extreme empty; LogisticRegression.fit would fail or return a
        # constant model — fail with the actual class budget instead
        raise ValueError(
            f"weak labels produced a single-class training set "
            f"(counts: {n_by_class}); widen the quantile band"
        )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        maxIter=50, regParam=0.01, standardization=True,
    )
    model = lr.fit(train)
    # Drop the training summary: it pins the live SparkSession inside
    # the model, and serializing the model into transform() task
    # closures then drags the session along — which FAILS outright
    # once anything in the session has used df.observe (SparkSession.
    # observationManager is not serializable). The summary is training
    # diagnostics, not model state; inference never needs it.
    try:
        empty = train.sparkSession._jvm.scala.Option.empty()
        model._java_obj.setSummary(empty)
    except Exception:
        pass  # private-API shape changed: keep the summary, accept the risk
    return asm, model


def score_quality(docs: DataFrame, asm, model, text_col: str = "text") -> DataFrame:
    """Corpus-wide inference: P(high quality) per document."""
    from pyspark.ml.functions import vector_to_array

    feat = asm.transform(feature_frame(docs, text_col))
    return (
        model.transform(feat)
        .withColumn("quality_prob", vector_to_array("probability")[1])
        .drop("features", "rawPrediction", "probability", "prediction")
    )
