"""Quickstart — the engine end-to-end in one script.

Covers the reference's user journey (create collection → ingest →
ranked FTS search → vector search → stats → delete) through the
library facade, then the LLM-pipeline extensions (near-dup detection,
quality scoring, importance-ratio selection) and a manifest-committed
JSONL export via the custom Python data sink.

Run:  python examples/quickstart.py            # ~30 s on local[*]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_search_service_spark.service import SearchService  # noqa: E402
from vector_search_service_spark.session import get_spark  # noqa: E402
from vector_search_service_spark.sources import pyds  # noqa: E402
from vector_search_service_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="vss_quickstart_")
    svc = SearchService(spark, root)

    # -- the reference's journey -----------------------------------------
    svc.create_collection("kb", "demo knowledge base")
    for text in (
        "Spark shuffles data between stages; broadcast joins avoid the "
        "shuffle when one side is small enough to ship to every executor.",
        "A hash join builds a table on the smaller side and probes it "
        "with the larger side; a merge join needs both sides sorted.",
        "Watermarks bound streaming state: events older than the "
        "watermark are final, so windows can close and emit.",
    ):
        out = svc.ingest_document(text, collection_id="kb")
        print(f"ingested {out['document_id']} ({out['chunks_created']} chunks)")

    # AND-match semantics (plainto_tsquery): every query term must hit
    hits = svc.similarity_search("hash join", collection_id="kb", limit=3)
    print("\nFTS top hits:")
    for h in hits["results"]:
        print(f"  score={h['score']:.4f}  {h['content'][:60]}…")
    print("stats:", svc.collection_stats("kb"))

    # -- LLM-pipeline extensions over the synthetic corpus ----------------
    docs = load_table(spark, SF_DIR, "documents")
    from vector_search_service_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    print(f"\nnear-duplicate pairs (MinHash LSH @0.8): {pairs.count()}")

    from vector_search_service_spark.registry import all_queries

    top = all_queries()["importance_ratio_topk"].fn(spark, SF_DIR)
    print("importance-ratio selection (top 3 toward the target domain):")
    for r in top.limit(3).collect():
        print(f"  doc {r['doc_id']} ({r['source']}): {r['lr_per_token_r']:+.4f} nats/token")

    # -- export: manifest-committed JSONL shards --------------------------
    pyds.register_sink(spark)
    export = os.path.join(root, "export")
    (
        docs.select("doc_id", "lang", "source", F.col("text").substr(1, 80).alias("head"))
        .repartition(4)
        .write.format("jsonl_manifest").mode("append").save(export)
    )
    manifest = json.load(open(os.path.join(export, "MANIFEST.json")))
    print(f"\nexported {manifest['total_rows']} rows "
          f"across {len(manifest['files'])} committed shards -> {export}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
