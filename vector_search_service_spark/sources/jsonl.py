"""JSONL document source — how large text corpora actually arrive
(one JSON object per line: Dolma, RedPajama, C4 dumps, API exports).

Not in the reference (its ingestion is HTTP-body JSON +
ServiceNow XML, ``src/api/documents.py`` / ``scripts/
ingest_servicenow.py``); this rounds out the source family for the
training-data mandate. Design points, all Spark-native:

- explicit schema, NEVER inferred: schema inference reads the data
  twice and silently unions drifting shapes — at 100 TB each read is
  the cost, and drift must be an ERROR, not a merge;
- PERMISSIVE parse with a ``_corrupt_record`` side channel: a corpus
  dump always contains some broken lines; they must neither kill the
  job (FAILFAST) nor vanish (DROPMALFORMED) — they go to a rejected
  side-output like the ingest validators (P10);
- JSONL is splittable line-by-line, so 100 TB of .jsonl(.gz with
  many files) parallelizes by file/split count with no driver work;
- nested payload fields stay queryable (dot paths / ``get_json_object``
  are pushdown-friendly), flattened only at the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# the common corpus-dump shape: id + text + provenance + free metadata
DOCUMENT_JSONL_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("_corrupt_record", T.StringType(), True),
])


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: T.StructType = DOCUMENT_JSONL_SCHEMA) -> DataFrame:
    """One row per line; broken lines land with every data field null
    and the raw line in ``_corrupt_record``."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_valid_rejected(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route parsed vs corrupt rows (same side-output contract as the
    ingest validators): valid rows lose the corrupt column; rejected
    rows carry the raw line for quarantine/replay.

    The rejected side keeps the (null) parsed columns alongside
    ``raw_line``: Spark refuses a query whose referenced columns are
    ONLY the internal corrupt-record column
    ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — the
    alternative is caching the parse, a non-starter at corpus scale),
    and a quarantine record wants the partial parse anyway."""
    corrupt = df["_corrupt_record"].isNotNull()
    valid = df.filter(~corrupt).drop("_corrupt_record")
    rejected = df.filter(corrupt).withColumnRenamed(
        "_corrupt_record", "raw_line"
    )
    return valid, rejected
