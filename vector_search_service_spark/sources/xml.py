"""XML source — ServiceNow-incident-shaped ETL (S4,
``scripts/ingest_servicenow.py:26-87`` in the reference).

The reference parses incident XML files with ElementTree one file at a
time, preferring each field's ``display_value`` attribute over its
text, then synthesizes a labelled ``searchable_text`` blob (G9). Here
the same semantics run distributed: Spark 4's built-in XML data source
(``spark.read.format("xml")``, rowTag) does the parsing executor-side;
field extraction and the null-skipping labelled concat are codegen'd
expressions. At 100 TB of XML drops this scales with file count — no
driver-side parsing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (field, label) pairs in the reference's searchable_text order
# (scripts/ingest_servicenow.py:59-80)
SEARCHABLE_FIELDS: tuple[tuple[str, str], ...] = (
    ("number", "Incident Number"),
    ("short_description", "Summary"),
    ("description", "Description"),
    ("category", "Category"),
    ("subcategory", "Subcategory"),
    ("close_notes", "Resolution"),
    ("resolution_notes", "Resolution Notes"),
    ("work_notes", "Work Notes"),
    ("u_root_cause", "Root Cause"),
)


def read_incidents_xml(spark: SparkSession, path: str, *, row_tag: str = "incident") -> DataFrame:
    """Parse incident XML into one row per incident. Each field may be
    an attributed element (``<x display_value="...">raw</x>`` — Spark
    maps it to a struct with ``_display_value``/``_VALUE``) or plain
    text; ``display_value`` wins when present, like the reference."""
    raw = spark.read.format("xml").option("rowTag", row_tag).load(path)

    def field(name: str):
        if name not in raw.columns:
            return F.lit(None).cast("string")
        dt = dict(raw.dtypes)[name]
        if dt.startswith("struct"):
            inner = raw.schema[name].dataType.fieldNames()
            dv = F.col(f"{name}._display_value") if "_display_value" in inner else F.lit(None)
            tx = F.col(f"{name}._VALUE") if "_VALUE" in inner else F.lit(None)
            return F.coalesce(dv.cast("string"), tx.cast("string"))
        return F.col(name).cast("string")

    cols = [field(name).alias(name) for name, _ in SEARCHABLE_FIELDS]
    return raw.select(*cols)


def with_searchable_text(incidents: DataFrame) -> DataFrame:
    """G9 — labelled, "\\n\\n"-joined, null-skipping concat; empty
    strings are skipped too (the reference checks truthiness)."""
    parts = [
        F.when(
            F.col(name).isNotNull() & (F.trim(F.col(name)) != ""),
            F.concat(F.lit(f"{label}: "), F.col(name)),
        )
        for name, label in SEARCHABLE_FIELDS
    ]
    return incidents.withColumn("searchable_text", F.concat_ws("\n\n", *parts))
