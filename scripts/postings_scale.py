"""Maintained-postings (auto-GIN parity) decade measurement for
docs/SCALE.md — VERDICT r10 next-round #5.

PostgreSQL keeps its GIN index current inside every INSERT/DELETE
transaction; here the catalog co-mutates a PostingsStore on the same
write paths. This measures that maintenance envelope at sf1:

  1. BUILD: full ingest of the sf1 documents corpus into a catalog
     with maintain_fts_index=True (and, for the overhead split, the
     same ingest without the index).
  2. MUTATE: N append batches of <=50 docs (the reference's
     max_batch_documents API cap — the real mutation grain).
  3. PROBE: the indexed search path (PostingsStore.matched_ids ->
     semi-join, the service similarity path) before and after the
     mutation history, so posting-file growth is visible in the
     probe wall.

Usage: python scripts/postings_scale.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
BATCH = 50  # reference max_batch_documents
QUERY = "hash join merge"


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("MIMIC_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_search_service_spark.catalog import Catalog
    from vector_search_service_spark.functions.analysis import analyze_terms
    from vector_search_service_spark.ingest import ingest_into
    from vector_search_service_spark.operators.search import fts_search

    raw = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_raw = raw.count()
    terms = analyze_terms(QUERY)

    def build(maintain: bool) -> tuple[Catalog, str, float, int]:
        root = tempfile.mkdtemp(prefix=f"postings_scale_{maintain}_")
        cat = Catalog(spark, root, maintain_fts_index=maintain)
        cat.create_collection("corpus", embedding_dimension=8)
        t0 = time.time()
        out = ingest_into(cat, "corpus", raw.select(F.col("text")))
        wall = time.time() - t0
        return cat, root, wall, out["chunks_created"]

    def probe(cat: Catalog) -> tuple[float, int, float, int]:
        """(matched_ids wall, matched count, indexed top-k wall, k)."""
        coll = cat.get_collection("corpus")
        walls_m, walls_q, n, k = [], [], 0, 0
        for _ in range(2):
            t0 = time.time()
            matched = cat.postings.matched_ids(coll["id"], terms)
            n = matched.count()
            walls_m.append(time.time() - t0)
            t0 = time.time()
            docs = cat.documents("corpus").join(matched, "document_id", "left_semi")
            k = len(fts_search(docs, QUERY, limit=10, text_col="content",
                               id_col="document_id").collect())
            walls_q.append(time.time() - t0)
        return min(walls_m), n, min(walls_q), k

    # -- 0. warmup (JVM/codegen/first-read costs must not bias the
    # plain-vs-maintained build split) -------------------------------------
    _, rootw, _, _ = build(maintain=True)
    shutil.rmtree(rootw, ignore_errors=True)

    # -- 1. build ------------------------------------------------------------
    cat0, root0, wall_plain, chunks_plain = build(maintain=False)
    cat, root, wall_idx, chunks_idx = build(maintain=True)
    assert chunks_plain == chunks_idx
    print(f"build sf1 ({n_raw} docs -> {chunks_idx} chunks): "
          f"plain {wall_plain:.1f}s, maintained-index {wall_idx:.1f}s "
          f"(overhead {wall_idx - wall_plain:+.1f}s = "
          f"{(wall_idx / wall_plain - 1) * 100:+.0f}%)")

    m0, n0, q0, k0 = probe(cat)
    print(f"probe pre-mutation: matched_ids {m0:.2f}s ({n0} ids), "
          f"indexed top-k {q0:.2f}s ({k0} rows)")

    # -- 2. mutation batches ---------------------------------------------
    batch_src = raw.orderBy("doc_id").limit(BATCH).select("text").collect()
    walls = []
    for i in range(N_BATCHES):
        b = spark.createDataFrame(
            [(f"{r['text']} mutation batch {i}",) for r in batch_src], ["text"]
        )
        t0 = time.time()
        ingest_into(cat, "corpus", b)
        walls.append(time.time() - t0)
    walls_s = sorted(walls)
    print(f"{N_BATCHES} append batches of {BATCH}: "
          f"mean {sum(walls) / len(walls):.2f}s, p50 {walls_s[len(walls) // 2]:.2f}s, "
          f"max {walls_s[-1]:.2f}s, first {walls[0]:.2f}s, last {walls[-1]:.2f}s")

    # posting-store file census (the growth the probe has to read) —
    # LIVE snapshot only (superseded versions are retained one cycle
    # for reader grace and are not part of any probe's scan)
    def live_files() -> int:
        d = cat.postings.live_dir(cat.get_collection("corpus")["id"])
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    nfiles = live_files()
    m1, n1, q1, k1 = probe(cat)
    print(f"probe post-mutation ({nfiles} posting files): "
          f"matched_ids {m1:.2f}s ({n1} ids), indexed top-k {q1:.2f}s ({k1} rows)")

    # -- 3. compaction (the autovacuum analog) ----------------------------
    t0 = time.time()
    n_post = cat.compact_index("corpus")
    wall_c = time.time() - t0
    nfiles_c = live_files()
    m2, n2, q2, k2 = probe(cat)
    assert (n2, k2) == (n1, k1), "compaction changed results"
    print(f"compact: {wall_c:.2f}s ({n_post} posting rows, "
          f"{nfiles} -> {nfiles_c} files); probe post-compact: "
          f"matched_ids {m2:.2f}s, indexed top-k {q2:.2f}s")

    shutil.rmtree(root0, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
