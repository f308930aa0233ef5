"""Inverted-index access path for FTS (SURVEY.md §4, GIN replacement
option 2).

PostgreSQL answers ``@@`` matches through a GIN index on the tsvector;
Spark has no secondary indexes. The scan+pushdown path
(``operators/search.py``) is fine when the corpus is partition-pruned,
but at 100 TB a query that matches 0.01% of documents shouldn't read
100 TB of text. The app-level access path that replaces GIN:

- **build** (batch, incremental-friendly): explode documents into a
  ``(lexeme, doc_id)`` posting table, written partitioned/bucketed by
  ``lexeme``. One shuffle at build time; the posting table is tiny
  relative to the corpus (ids, not text).
- **query**: filter postings to the query's lexemes (partition
  pruning / pushed IN-filter on the lexeme key → reads only those
  posting lists), count distinct matched lexemes per doc, keep docs
  matching ALL terms (the AND semantics of P7), then semi-join the
  (usually small) matched-id set back to the corpus — AQE broadcasts
  it at runtime when it fits, no corpus shuffle in the common case —
  for ranking/projection.

This is exactly the "semi-join against an inverted-index table" plan
the survey sketches; no Catalyst extension needed, and the result is
identical to the scan path (same oracle as ``fts_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import analyze_terms, raw_tokens_col, tf_rank_col


def build_inverted_index(documents: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Posting table: one (lexeme, id) row per distinct token per doc.
    At scale: ``.write.partitionBy('lexeme')`` (or bucketBy for join
    co-location); incremental maintenance = append postings for new
    docs, anti-join deletes — same mutations as the catalog store."""
    return (
        documents
        .select(F.col(id_col), F.explode(F.array_distinct(raw_tokens_col(F.col(text_col)))).alias("lexeme"))
        .filter(F.col("lexeme") != "")
    )


def build_positional_index(documents: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Positional posting table: one ``(id, pos, lexeme)`` row per
    token OCCURRENCE — the Lucene-style upgrade of
    :func:`build_inverted_index` (which keeps one row per DISTINCT
    token) that phrase and proximity queries probe directly: prune to
    the query terms' buckets, join positions on ``id`` with the
    adjacency/slop predicate, and the corpus text is never touched
    except for ranking the final candidates. Positions are 1-based
    over the verbatim stream (``analysis.verbatim_tokens_col`` —
    lowercase, empties dropped, stopwords preserved), matching the
    ``fts_phrase_topk`` / ``fts_near_topk`` kernels exactly.

    Size: rows = corpus token count, ~3-6× the distinct-token table
    (Zipf); same write layout (``write_inverted_index`` — the extra
    ``pos`` column rides the lex_bucket partitioning unchanged), so a
    probe still reads |terms| buckets. PostgreSQL ships positions
    inside its tsvector but its GIN index drops them (hence phrase
    RECHECK, the ``fts_phrase_indexed_topk`` path); storing them is
    the standard positional-postings trade: ~4 extra bytes/posting
    buys proximity queries that never rescan documents."""
    from ..functions.analysis import verbatim_tokens_col

    return (
        documents
        .select(F.col(id_col),
                F.posexplode(verbatim_tokens_col(F.col(text_col)))
                 .alias("pos0", "lexeme"))
        .filter(F.col("lexeme") != "")
        .select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "lexeme")
    )


DEFAULT_LEXEME_BUCKETS = 64

#: Manifest written next to every bucketed index (ADVICE r12 #4). The
#: underscore prefix makes Spark's parquet reader skip it (the
#: _SUCCESS convention). It records the bucket count the WRITER used
#: and a hash sentinel computed by the WRITER's Spark xxhash64, so a
#: reader whose driver-side hash (functions/hashing.xxhash64_py) ever
#: diverges — a different Spark hash semantics, a caller passing the
#: wrong n_buckets — fails LOUD at read time instead of silently
#: pruning to the wrong buckets and returning empty postings.
INDEX_MANIFEST = "_index_manifest.json"
_SENTINEL_LEXEME = "xxh64-manifest-sentinel"


def write_inverted_index(index: DataFrame, path: str, *,
                         n_buckets: int = DEFAULT_LEXEME_BUCKETS) -> None:
    """Persist the posting table in the 100 TB layout: hive-partitioned
    by ``lex_bucket = xxhash64(lexeme) mod n`` (a real corpus has
    millions of distinct lexemes — hash buckets keep the directory
    count fixed while still letting a query prune to |terms| buckets),
    sorted by lexeme within each file so min/max stats prune inside a
    bucket too. Writes :data:`INDEX_MANIFEST` alongside (local paths —
    a manifest table/commit log is the object-store upgrade)."""
    import json
    import os

    (
        index.withColumn("lex_bucket", F.pmod(F.xxhash64("lexeme"), F.lit(n_buckets)))
             .repartition("lex_bucket")
             .sortWithinPartitions("lexeme")
             .write.mode("overwrite").partitionBy("lex_bucket").parquet(path)
    )
    sentinel = index.sparkSession.range(1).select(
        F.xxhash64(F.lit(_SENTINEL_LEXEME)).alias("h")).head()["h"]
    with open(os.path.join(path, INDEX_MANIFEST), "w") as f:
        json.dump({"n_buckets": int(n_buckets), "hash": "xxhash64",
                   "seed": 42, "sentinel_lexeme": _SENTINEL_LEXEME,
                   "sentinel_hash": int(sentinel)}, f)


def read_posting_lists(spark, path: str, terms: list[str], *,
                       n_buckets: int | None = None) -> DataFrame:
    """Load ONLY the posting lists for ``terms``: literal IN-filter on
    the partition key (partition pruning reads |buckets(terms)| of
    ``n_buckets`` directories) plus the lexeme filter pushed to the
    remaining files' row groups.

    The term → bucket mapping is computed driver-side with the
    pure-Python XXH64 twin of ``F.xxhash64`` (bit-equality pinned in
    tests/test_plans.py) — the r11 shape launched a
    createDataFrame+collect Spark job per probe just to hash a handful
    of query terms (r12 optimization: one fewer job on every indexed
    query).

    Bucket-count and hash validation (ADVICE r12 #4): when the index
    carries :data:`INDEX_MANIFEST`, the writer's recorded ``n_buckets``
    is authoritative (a caller value that disagrees raises), and the
    reader's Python hash is checked against the writer's Spark-computed
    sentinel — silent wrong-bucket pruning is impossible on a
    manifested index. Pre-manifest indexes fall back to the caller /
    default pairing (the r12 trust model)."""
    import json
    import os

    if not terms:
        return spark.createDataFrame([], "doc_id long, lexeme string")
    from ..functions.hashing import xxhash64_py

    manifest_path = os.path.join(path, INDEX_MANIFEST)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if n_buckets is not None and n_buckets != manifest["n_buckets"]:
            raise ValueError(
                f"posting index at {path} was written with "
                f"n_buckets={manifest['n_buckets']}, caller passed "
                f"{n_buckets} — pruning with the wrong modulus would "
                f"silently return empty posting lists")
        n_buckets = manifest["n_buckets"]
        got = xxhash64_py(manifest["sentinel_lexeme"].encode())
        if got != manifest["sentinel_hash"]:
            raise ValueError(
                f"driver-side xxhash64_py diverges from the hash that "
                f"wrote the index at {path} (sentinel {got} != "
                f"{manifest['sentinel_hash']}) — refusing to prune "
                f"buckets with a mismatched hash")
    elif n_buckets is None:
        n_buckets = DEFAULT_LEXEME_BUCKETS
    buckets = sorted({xxhash64_py(t.encode()) % n_buckets for t in terms})
    return (
        spark.read.parquet(path)
             .filter(F.col("lex_bucket").isin(buckets) & F.col("lexeme").isin(terms))
             .drop("lex_bucket")
    )


def fts_search_indexed(documents: DataFrame, index: DataFrame, query: str, *,
                       limit: int = 10, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Index-accelerated FTS, result-identical to
    ``operators.search.fts_search``.

    Plan: postings filtered to the query lexemes (pushed IN-filter —
    with a lexeme-partitioned index this reads only |terms| posting
    lists) → groupBy(doc_id) count = |terms| (AND) → semi-join the
    matched ids into the corpus scan → rank top-k on just those rows.
    The corpus is touched only for matched ids.

    Join sizing is AQE-owned, NOT hinted (r10 broadcast-audit rule,
    applied here by the r10 verdict): |matched| ≤ min document-
    frequency over the query's analyzed terms, which is usually tiny —
    but document frequency of any fixed term grows LINEARLY with the
    corpus, so the bound is data-dependent, not corpus-independent
    (a 1%-DF rarest term at the 100 TB design point is ~10⁸ ids), and
    the query stream on this path is user-controlled. A forced hint
    here would OOM the driver exactly when an adversarial/common-terms
    query arrives; AQE sizes the aggregate output at runtime and
    broadcasts when (and only when) it actually fits, degrading to a
    shuffled semi-join — not a failure — when it doesn't. Mirrors the
    reference's GIN behavior (postgres materializes the intersected
    TID set in work_mem and likewise spills when it doesn't fit)."""
    terms = analyze_terms(query)
    if not terms:
        return documents.limit(0).select(F.col(id_col)).join(documents, id_col).limit(0)
    matched = (
        index.filter(F.col("lexeme").isin(terms))
        .groupBy(id_col)
        .agg(F.countDistinct("lexeme").alias("_n"))
        .filter(F.col("_n") == len(terms))
        .select(id_col)
    )
    toks = raw_tokens_col(F.col(text_col))
    return (
        documents.join(matched, id_col, "left_semi")
        .withColumn("rank", tf_rank_col(toks, terms))
        .orderBy(F.col("rank").desc(), F.col(id_col).asc())
        .limit(limit)
    )


class PostingsStore:
    """Catalog-maintained postings table — the auto-maintained-GIN
    parity point (PostgreSQL keeps its GIN index current inside every
    INSERT/DELETE transaction, ``scripts/init-db.sql``; here the same
    write paths maintain a postings table co-mutated with the document
    store).

    Layout (r12, crash-atomic): ``root/postings/<cid>/v{n}/`` parquet
    snapshots plus a one-line pointer file ``root/postings/<cid>/
    current`` — the exact versioned-pointer discipline the catalog
    uses for the collections table (``catalog._rewrite_collections``).
    Rows are one (document_id, lexeme) pair per distinct stored lexeme
    per chunk; per-collection directories keep maintenance cost equal
    to the touched collection, never the table. Query terms are
    stopword-free by construction (``analyze_terms``), so postings
    built from the stored ``content_lexemes`` (F3 lexemes) match
    exactly what the scan path matches over raw tokens.

    Crash/concurrency contract (r11 verdict What's-wrong #1):

    - ``rewrite``/``compact`` write the replacement snapshot to
      ``v{n+1}`` and then flip the pointer with ``os.replace`` — a
      crash at ANY instant leaves the pointer on a complete snapshot
      (old before the flip, new after); there is never a moment where
      a partial partition is the resolvable index.
    - Lock-free readers (``service.search`` → ``matched_ids`` take no
      mutex by design) resolve the pointer once at DataFrame
      construction and read an immutable snapshot directory; the
      superseded version survives one further mutation cycle (the
      catalog's ``keep`` grace) so an in-flight probe that resolved
      the pointer just before a flip still completes.
    - ``append`` adds files to the LIVE snapshot (no version bump — a
      full-copy version per ingest batch would make every append
      O(index)). Spark's commit protocol publishes the batch's files
      at job commit (task outputs stage under ``_temporary``), so the
      non-atomic window is the file moves only, and a torn append can
      at worst surface a subset of the NEW batch's postings — exactly
      the document store's own append semantics, and safe for search:
      matched ids are semi-joined back to the live documents table, so
      postings may lag documents but never dangle.
    - Writers are serialized by the catalog mutex (single-writer
      contract); Delta/Iceberg commit logs are the real-cluster
      upgrade for multi-writer.
    """

    #: coalesce target for rewrite/compact snapshots (two short string
    #: columns; ~4M rows keeps files in the tens-of-MB range).
    ROWS_PER_FILE = 4_000_000
    #: append fan-out: one posting file per ~20k docs — ROWS_PER_FILE
    #: over an estimated ~200 distinct lexemes per chunk (reference
    #: chunks are ~1-2 KB of text), so index-write parallelism scales
    #: with POSTING rows (~100-500× the doc rows the document append
    #: is sized by — ADVICE r11 #3), while an API-capped 50-doc batch
    #: still appends exactly one file (the r11 small-file fix).
    DOCS_PER_POSTING_FILE = 20_000
    #: auto-compaction trigger: when the live snapshot accumulates
    #: this many sub-``SMALL_FILE_BYTES`` files, ``maybe_compact``
    #: rebuilds it (the autovacuum cadence the reference inherits from
    #: PostgreSQL). Size-gated, not count-gated, so a large compacted
    #: snapshot (many FULL files) never re-triggers every batch.
    AUTO_COMPACT_SMALL_FILES = 64
    SMALL_FILE_BYTES = 8 * 1024 * 1024

    def __init__(self, spark, root: str):
        import os

        self.spark = spark
        self.path = os.path.join(root, "postings")

    # -- versioned-pointer plumbing (mirrors catalog._rewrite_collections)

    def _coll_dir(self, collection_id: int) -> str:
        import os

        return os.path.join(self.path, str(int(collection_id)))

    def _pointer(self, collection_id: int) -> str:
        import os

        return os.path.join(self._coll_dir(collection_id), "current")

    def _current_version(self, collection_id: int) -> str | None:
        try:
            with open(self._pointer(collection_id)) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def live_dir(self, collection_id: int) -> str | None:
        """Directory of the currently-live snapshot (None = no index)."""
        import os

        cur = self._current_version(collection_id)
        if cur is None:
            return None
        return os.path.join(self._coll_dir(collection_id), cur)

    def _flip(self, collection_id: int, version: str) -> None:
        """Atomic pointer flip: write ``current.tmp``, ``os.replace``.
        A crash before the replace leaves the old snapshot live; the
        replace itself is atomic on POSIX."""
        import os

        ptr = self._pointer(collection_id)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, ptr)

    def _prune(self, collection_id: int, keep: set[str]) -> None:
        """Remove superseded snapshot dirs EXCEPT ``keep`` (the new
        version and the just-superseded one — reader grace, exactly
        the collections-table ``keep`` discipline)."""
        import os
        import shutil

        d = self._coll_dir(collection_id)
        for entry in os.listdir(d):
            full = os.path.join(d, entry)
            if entry in keep or not os.path.isdir(full):
                continue
            shutil.rmtree(full, ignore_errors=True)

    @staticmethod
    def _next_version(cur: str | None) -> str:
        return f"v{(int(cur[1:]) if cur else 0) + 1}"

    def _write_snapshot(self, collection_id: int, rows: DataFrame) -> None:
        """Write ``rows`` as snapshot v{n+1}, flip, prune with grace.
        The old snapshot's files are never touched before the flip —
        a crash mid-write leaves the previous version live (the
        ``collections.current`` guarantee, catalog.py)."""
        import os

        cur = self._current_version(collection_id)
        nxt = self._next_version(cur)
        rows.write.mode("overwrite").parquet(
            os.path.join(self._coll_dir(collection_id), nxt))
        self._flip(collection_id, nxt)
        self._prune(collection_id, {nxt} | ({cur} if cur else set()))

    def _from_rows(self, docs: DataFrame) -> DataFrame:
        return (
            docs.select(
                "document_id",
                F.explode(F.array_distinct("content_lexemes")).alias("lexeme"),
            )
            .filter(F.col("lexeme") != "")
        )

    def append(self, collection_id: int, docs: DataFrame, *,
               n_docs: int | None = None) -> None:
        """Ingest-side maintenance: append postings for the new chunks
        into the live snapshot. ``docs`` should be the PRE-coalesce
        materialized batch (the caller's write fan-out is sized by
        document count; posting rows are ~100-500× that, so this path
        derives its own fan-out from ``n_docs`` — ADVICE r11 #3)."""
        rows = self._from_rows(docs)
        if n_docs is not None:
            k = max(1, min(docs.rdd.getNumPartitions(),
                           -(-n_docs // self.DOCS_PER_POSTING_FILE)))
            rows = rows.coalesce(k)
        live = self.live_dir(collection_id)
        if live is None:
            # first batch: the index becomes visible only once its
            # snapshot is fully committed (write v1, THEN flip)
            self._write_snapshot(collection_id, rows)
        else:
            rows.write.mode("append").parquet(live)

    def rewrite(self, collection_id: int, remaining_docs: DataFrame) -> None:
        """Delete/upsert-side maintenance: rebuild ONE collection's
        postings snapshot from the surviving chunks. ``None`` drops
        the index (collection deleted): the pointer is removed FIRST —
        readers then see a complete absence, never a partial tree."""
        import contextlib
        import os
        import shutil

        if remaining_docs is None:
            with contextlib.suppress(FileNotFoundError):
                os.remove(self._pointer(collection_id))
            shutil.rmtree(self._coll_dir(collection_id), ignore_errors=True)
            return
        self._write_snapshot(collection_id, self._from_rows(remaining_docs))

    def compact(self, collection_id: int, *,
                rows_per_file: int | None = None) -> int:
        """FULL maintenance compaction (defrag) — rewrites the whole
        snapshot at ``max(1, n/rows_per_file)`` files. Returns the
        posting row count. Reads the live snapshot's immutable files
        and writes v{n+1} — the live version is never deleted before
        the pointer flip, so a crash at any instant leaves a complete
        index. Cost is O(collection postings): right for an explicit
        ``compact_index`` maintenance call, wrong as the per-append
        cadence at scale — ``compact_incremental`` below is the
        pending-list merge the auto trigger uses."""
        rows_per_file = rows_per_file or self.ROWS_PER_FILE
        idx = self.postings(collection_id)
        if idx is None:
            return 0
        n = idx.count()
        self._write_snapshot(
            collection_id, idx.coalesce(max(1, -(-n // rows_per_file))))
        return n

    def compact_incremental(self, collection_id: int, *,
                            small_bytes: int | None = None) -> int:
        """Incremental compaction — the true autovacuum / GIN
        fastupdate PENDING-LIST merge: only the small (per-batch)
        files are read and merged; every already-full file is
        HARDLINKED into the new snapshot (parquet files here are
        immutable — appends add files, never modify them — and prune
        only unlinks names, so links are safe). Cost is therefore
        O(pending small-file rows) + O(#full files) metadata, NOT
        O(collection): at 100 TB a billion-row collection's postings
        are never rewritten just because 64 fifty-doc API batches
        landed. Re-merged output that is still under the size
        threshold gets merged again on a later trigger — the classic
        LSM geometric amortization, O(log) rewrites per posting row.
        Returns the number of merged (small-file) rows; 0 = nothing
        to do. Same crash contract as every snapshot write: v{n+1} is
        complete before the pointer flips."""
        import os
        import shutil

        live = self.live_dir(collection_id)
        if live is None:
            return 0
        small = small_bytes or self.SMALL_FILE_BYTES
        parts = [f for f in os.listdir(live) if f.endswith(".parquet")]
        smalls = [f for f in parts
                  if os.path.getsize(os.path.join(live, f)) < small]
        if len(smalls) <= 1:
            return 0
        bigs = [f for f in parts if f not in set(smalls)]
        merged = (
            self.spark.read.schema("document_id string, lexeme string")
            .parquet(*[os.path.join(live, f) for f in smalls])
        )
        n = merged.count()
        cur = self._current_version(collection_id)
        nxt = self._next_version(cur)
        nxt_dir = os.path.join(self._coll_dir(collection_id), nxt)
        # 1. Spark writes the merged pending rows as v{n+1} (overwrite
        #    clears any torn leftover from a crashed earlier attempt)
        merged.coalesce(max(1, -(-n // self.ROWS_PER_FILE))).write.mode(
            "overwrite").parquet(nxt_dir)
        # 2. link the untouched full files in (copy if cross-device);
        #    Spark part-file names embed a per-job UUID, no collisions
        for f in bigs:
            src, dst = os.path.join(live, f), os.path.join(nxt_dir, f)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
        # 3. atomic flip + grace prune — identical to every other path
        self._flip(collection_id, nxt)
        self._prune(collection_id, {nxt} | ({cur} if cur else set()))
        return n

    def small_file_count(self, collection_id: int,
                         *, small_bytes: int | None = None) -> int:
        """Sub-threshold parquet files in the live snapshot — the
        auto-compaction pressure gauge (one per small append batch)."""
        import os

        live = self.live_dir(collection_id)
        if live is None:
            return 0
        small = small_bytes or self.SMALL_FILE_BYTES
        return sum(
            1 for f in os.listdir(live)
            if f.endswith(".parquet")
            and os.path.getsize(os.path.join(live, f)) < small
        )

    def maybe_compact(self, collection_id: int, *,
                      max_small_files: int | None = None) -> int:
        """Auto-compaction cadence (r11 verdict next-round #4): called
        by ``catalog.add_documents`` after every postings append, so a
        1000-batch mutation history keeps a bounded file count without
        operator intervention. Merges when the live snapshot holds
        ≥ ``max_small_files`` small files; returns the merged row
        count (0 = no compaction). Small-file-gated so a large, fully
        compacted snapshot (whose ceil(n/ROWS_PER_FILE) legitimately
        exceeds the threshold in FULL files) never re-compacts on
        every batch — and INCREMENTAL (pending-list merge, full files
        hardlinked), so the trigger's cost is O(pending rows), never
        O(collection)."""
        threshold = max_small_files or self.AUTO_COMPACT_SMALL_FILES
        if self.small_file_count(collection_id) >= threshold:
            return self.compact_incremental(collection_id)
        return 0

    def postings(self, collection_id: int) -> DataFrame | None:
        """Live snapshot as a DataFrame. The pointer is resolved HERE,
        once — the returned frame binds to an immutable snapshot dir
        that outlives one further mutation (prune grace), so lock-free
        readers never observe a partial index."""
        live = self.live_dir(collection_id)
        if live is None:
            return None
        return (
            self.spark.read.schema("document_id string, lexeme string")
            .parquet(live)
        )

    def matched_ids(self, collection_id: int, terms: list[str]) -> DataFrame | None:
        """AND-semantics matched document ids straight from postings
        (countDistinct(lexeme) == |terms|); None when no index exists
        for the collection (caller falls back to the scan path)."""
        idx = self.postings(collection_id)
        if idx is None or not terms:
            return None
        return (
            idx.filter(F.col("lexeme").isin(terms))
               .groupBy("document_id")
               .agg(F.countDistinct("lexeme").alias("_n"))
               .filter(F.col("_n") == len(terms))
               .select("document_id")
        )
