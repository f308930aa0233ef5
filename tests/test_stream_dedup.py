"""Streaming exact dedup: cross-micro-batch state suppression.

`stream_dedup_replay` (queries_dedup.py) claims its dedup is done by
the state store ACROSS micro-batches, not by a batch shuffle within
one. The registry parity mirror only checks the emitted key set; this
test pins the mechanics with a corpus built so every duplicate pair is
GUARANTEED to arrive in different micro-batches (one file per group
member, maxFilesPerTrigger=1) — if cross-batch state were broken, the
memory sink would show the duplicate keys twice.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def test_duplicates_across_micro_batches_are_suppressed(spark, tmp_path):
    src = str(tmp_path / "src")
    # three micro-batch files; keys A and B appear in every file, C/D/E
    # are singletons — 9 rows, 5 distinct keys
    batches = [
        ["alpha one", "bravo two", "charlie three"],
        ["alpha one", "bravo two", "delta four"],
        ["alpha one", "bravo two", "echo five"],
    ]
    for texts in batches:
        spark.createDataFrame(
            [(t,) for t in texts], "text string"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = stream.select(
        F.sha2(F.col("text"), 256).alias("content_sha")
    ).dropDuplicates(["content_sha"])
    table = f"stream_dedup_test_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow replay did not finish"

    got = [r.content_sha for r in spark.table(table).collect()]
    # 5 distinct keys emitted exactly once each — the 4 extra copies of
    # A/B arrived in LATER micro-batches and were suppressed by state
    assert len(got) == 5 == len(set(got))

    want = {
        r.content_sha
        for r in spark.createDataFrame(
            [(t,) for b in batches for t in b], "text string"
        ).select(F.sha2("text", 256).alias("content_sha")).distinct().collect()
    }
    assert set(got) == want


def test_registry_entry_matches_batch_distinct(spark):
    from vector_search_service_spark.queries_dedup import (
        _WORDS,  # noqa: F401  (module import proves oracle expr exists)
        q_stream_dedup_replay,
    )
    from vector_search_service_spark.functions.hashing import words_col
    from vector_search_service_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = [r.content_sha for r in q_stream_dedup_replay(spark, sf).collect()]
    docs = load_table(spark, sf, "documents")
    want = sorted(
        r.content_sha
        for r in docs.select(
            F.sha2(
                F.concat_ws(" ", F.slice(words_col(F.col("text")), 1, 2)), 256
            ).alias("content_sha")
        ).distinct().collect()
    )
    assert got == want
    # the corpus genuinely exercises suppression: fewer keys than rows
    assert len(got) < docs.count()
