"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the ServiceNow incident reader as a first-class format.

`sources/xml.py` maps the reference's ElementTree parser
(``scripts/ingest_servicenow.py:26-87``) onto Spark's built-in XML
source plus codegen expressions. This module is the OTHER idiomatic
integration point: the reference's parser itself, registered as a
Spark data source —

    spark.dataSource.register(ServiceNowDataSource)
    spark.read.format("servicenow").load("/drops/*.xml")

The API contract does the distribution: ``partitions()`` returns one
`InputPartition` per XML file, Spark schedules them across executors,
and each task runs ``read()`` (ElementTree + the display_value
preference + the G9 searchable_text synthesis) for its file only. At
100 TB of XML drops this scales with file count exactly like the
built-in source, while keeping the reference's parsing semantics in
one obvious place. A parity test pins DataSource output ==
xml.py's expression pipeline on the same files
(tests/test_pyds.py)."""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .xml import SEARCHABLE_FIELDS

FIELD_NAMES: tuple[str, ...] = tuple(name for name, _ in SEARCHABLE_FIELDS)

SCHEMA_DDL = (
    ", ".join(f"{n} string" for n in FIELD_NAMES)
    + ", searchable_text string, src_file string"
)


def parse_incident(elem) -> dict[str, str | None]:
    """One ``<incident>`` element → field dict, preferring each
    field's ``display_value`` attribute over its text (the
    reference's rule, ``scripts/ingest_servicenow.py:35-49``)."""
    out: dict[str, str | None] = {}
    for name, _label in SEARCHABLE_FIELDS:
        node = elem.find(name)
        if node is None:
            out[name] = None
        else:
            dv = node.get("display_value")
            out[name] = dv if dv is not None else node.text
    return out


def searchable_text_of(rec: dict[str, str | None]) -> str:
    """G9 synthesis — labelled, "\\n\\n"-joined, skipping absent/blank
    fields; byte-identical to ``xml.with_searchable_text``."""
    parts = []
    for name, label in SEARCHABLE_FIELDS:
        val = rec.get(name)
        if val is not None and val.strip() != "":
            parts.append(f"{label}: {val}")
    return "\n\n".join(parts)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ServiceNowReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("servicenow source requires a path")
        self.path = path
        self.row_tag = options.get("rowTag", "incident")

    def partitions(self):  # one task per file — Spark does the scheduling
        if os.path.isdir(self.path):
            files = sorted(
                _glob.glob(os.path.join(self.path, "**", "*.xml"), recursive=True)
            )
        else:
            files = sorted(_glob.glob(self.path)) or [self.path]
        if not files:
            raise FileNotFoundError(f"no XML files under {self.path!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # executor-side: parse ONE file (ElementTree is fine per-task;
        # the parallelism is across files, like the built-in source)
        import xml.etree.ElementTree as ET

        root = ET.parse(partition.path).getroot()
        elems = [root] if root.tag == self.row_tag else root.iter(self.row_tag)
        for elem in elems:
            rec = parse_incident(elem)
            yield tuple(rec[n] for n in FIELD_NAMES) + (
                searchable_text_of(rec),
                partition.path,
            )


def _list_xml(path: str, row_tag: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "**", "*.xml"), recursive=True))
    return sorted(_glob.glob(path)) or ([path] if os.path.exists(path) else [])


class ServiceNowStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: an XML drop directory consumed
    incrementally — each micro-batch reads the files not yet in the
    checkpointed offset. The offset is the processed-file list
    (adequate for drop-directory scale; a production variant would
    carry a (mtime, name) high-watermark like Spark's file source so
    the offset stays O(1)). Exactly-once across restarts comes from
    Structured Streaming replaying the same offset range."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("servicenow source requires a path")
        self.path = path
        self.row_tag = options.get("rowTag", "incident")

    def initialOffset(self) -> dict:
        return {"files": []}

    def read(self, start: dict):
        seen = set(start.get("files", []))
        new = [f for f in _list_xml(self.path, self.row_tag) if f not in seen]

        import xml.etree.ElementTree as ET

        # a LIST, not a generator: the simple-reader API prefetches on
        # the driver and pickles the batch into the plan (fine for
        # drop-directory batch sizes; the partition-based
        # DataSourceStreamReader is the executor-side alternative)
        rows = []
        for f in new:
            root = ET.parse(f).getroot()
            elems = [root] if root.tag == self.row_tag else root.iter(self.row_tag)
            for elem in elems:
                rec = parse_incident(elem)
                rows.append(
                    tuple(rec[n] for n in FIELD_NAMES)
                    + (searchable_text_of(rec), f)
                )
        return iter(rows), {"files": sorted(seen | set(new))}

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class ServiceNowDataSource(DataSource):
    """``spark.read.format("servicenow")`` (batch) and
    ``spark.readStream.format("servicenow")`` (drop-directory stream)
    — register once per session with
    ``spark.dataSource.register(ServiceNowDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "servicenow"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> ServiceNowReader:
        return ServiceNowReader(self.options)

    def simpleStreamReader(self, schema) -> ServiceNowStreamReader:
        return ServiceNowStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ServiceNowDataSource)
