"""vector_search_service_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the ``rdwj/vector-search-service`` reference (a
FastAPI + PostgreSQL document-search service) as an idiomatic Spark
DataFrame/SQL library, extended with the operators a large-scale
LLM-training-data pipeline needs (dedup, ANN, text analysis,
multimodal plumbing).

Design principles (see README):
- Declare logical plans with the DataFrame/SQL API; let Catalyst and
  Tungsten choose physical strategies (pushdown, pruning, broadcast,
  whole-stage codegen).
- Built-in ``pyspark.sql.functions`` in every hot path; Arrow-batched
  pandas UDFs only where built-ins cannot express the semantics
  (chunking, stemming, cover-density ranking).
- Partition/broadcast/AQE-aware: every operator is written for a
  1000-executor cluster reading ~100 TB even though tests run on
  ``local[*]``.
"""

__version__ = "0.1.0"
