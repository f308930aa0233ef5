"""Property-based chunker invariants (hypothesis) — the G3 loop must
hold its contract for arbitrary content/size/overlap, not just the
fixture cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_search_service_spark.operators.chunker import (
    chunk_text,
    snap_to_boundary,
)


def _tail_emits_nothing(text: str, start: int, end: int, size: int,
                        overlap: int) -> bool:
    """Continue the reference loop from the state right after emitting
    the window [start, end): True iff no later window would emit a
    non-empty piece before the loop terminates (whitespace windows
    drop silently; the no-advance guard — which compares against the
    CURRENT window's start, so it can bail immediately after an
    emitted chunk or several dropped windows later — ends it)."""
    n = len(text)
    for _ in range(1000):
        if end >= n:
            return True
        nxt = end - overlap
        if nxt <= start:
            return True  # no-advance guard
        start = nxt
        end = min(start + size, n)
        if end < n:
            end = snap_to_boundary(text, end)
        if text[start:end].strip():
            return False  # a chunk WOULD have been emitted
    return True

text_st = st.text(
    alphabet=st.sampled_from(list("ab .,\n\tx")), min_size=0, max_size=3000
)


@settings(max_examples=200, deadline=None)
@given(text=text_st, size=st.integers(5, 400), overlap=st.integers(0, 400))
def test_chunk_invariants(text, size, overlap):
    chunks = chunk_text(text, size, overlap)
    eff_overlap = min(overlap, size // 2)

    if not text.strip():
        assert chunks == []
        return

    for i, c in enumerate(chunks):
        # indices dense and ordered
        assert c["chunk_index"] == i
        # offsets within bounds and consistent with stored content
        assert 0 <= c["start_char"] < c["end_char"] <= len(text) + 1
        assert c["content"] == text[c["start_char"]:c["end_char"]].strip()
        assert c["content"] != ""
        assert c["chunk_size"] == len(c["content"])
        # window never exceeds chunk_size plus the boundary-at-end quirk
        assert c["end_char"] - c["start_char"] <= size + 1
        assert c["is_first_chunk"] == (i == 0)

    if chunks:
        # the last *emitted* chunk carries the flag unless (a) the
        # 1000-window safety cap fired, or (b) every window after it
        # legitimately emits nothing before the loop terminates —
        # whitespace-only windows are dropped without consuming an
        # index, and the no-advance guard (boundary snapping pulling
        # ``end`` back to ``start``) can bail on a window SEVERAL
        # hops after the last emitted chunk (falsified by hypothesis
        # on 'a.aaaaaa'/size=5: window 2 snaps back onto its own
        # start, silently dropping a non-whitespace tail — faithful
        # reference loop semantics, src/core/document_processor.py:
        # 118-121; unreachable through ingest, where G1 preprocessing
        # normalizes such inputs)
        last = chunks[-1]
        assert (
            last["is_last_chunk"]
            or len(chunks) == 1000
            or _tail_emits_nothing(
                text, last["start_char"], last["end_char"], size, eff_overlap
            )
        )

    # successive EMITTED chunks advance; the overlap is exactly
    # eff_overlap unless whitespace-only windows were dropped in
    # between (their snapped ends move the cursor forward without
    # consuming an index — hypothesis falsified the strict equality
    # on 'aaaaa. aaaaa'/size=5), in which case the gap only grows
    for a, b in zip(chunks, chunks[1:]):
        assert b["start_char"] >= a["end_char"] - eff_overlap
        assert b["start_char"] > a["start_char"]
        if b["start_char"] != a["end_char"] - eff_overlap:
            # the skipped span must be whitespace-only windows
            assert text[a["end_char"] - eff_overlap:b["start_char"]].strip() == ""


def test_dispatch_distance_all_metrics(spark):
    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.vectors import dispatch_distance

    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0])], "u array<double>, v array<double>")
    row = df.select(
        dispatch_distance("cosine", F.col("u"), F.col("v")).alias("cos"),
        dispatch_distance("dot", F.col("u"), F.col("v")).alias("dot"),
        dispatch_distance("euclidean", F.col("u"), F.col("v")).alias("euc"),
    ).collect()[0]
    assert row["cos"] == 1.0          # orthogonal → distance 1
    assert row["dot"] == 0.0          # -dot
    assert abs(row["euc"] - 2 ** 0.5) < 1e-12
    import pytest

    with pytest.raises(ValueError):
        dispatch_distance("manhattan", F.col("u"), F.col("v"))


# -- sequence-packing invariants ---------------------------------------------


def test_sequence_pack_partitions_every_document(spark):
    """Packing invariants on the real corpus: each document's spans
    tile [0, n_tok) exactly (no gap, no overlap); every sequence
    except a shard's last holds exactly SEQ_LEN tokens; sequence ids
    are dense per shard."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.hashing import words_col
    from vector_search_service_spark.queries_pretrain import (
        SEQ_LEN,
        q_sequence_pack_spans,
    )
    from vector_search_service_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    spans = q_sequence_pack_spans(spark, sf).collect()
    n_tok = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.size(words_col(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0).collect()
    }

    per_doc = defaultdict(list)
    per_seq = defaultdict(int)
    for r in spans:
        per_doc[r["doc_id"]].append((r["tok_start"], r["tok_end"]))
        per_seq[(r["lang"], r["seq_id"])] += r["tok_end"] - r["tok_start"]

    assert set(per_doc) == set(n_tok)        # every non-empty doc packed
    for doc_id, segs in per_doc.items():
        segs.sort()
        assert segs[0][0] == 0
        assert segs[-1][1] == n_tok[doc_id]
        for (_, e1), (s2, _) in zip(segs, segs[1:]):
            assert e1 == s2                   # contiguous, no overlap

    last_seq = {}
    for (lang, seq_id) in per_seq:
        last_seq[lang] = max(last_seq.get(lang, -1), seq_id)
    for (lang, seq_id), tokens in per_seq.items():
        if seq_id != last_seq[lang]:
            assert tokens == SEQ_LEN          # full sequences everywhere
        else:
            assert 0 < tokens <= SEQ_LEN      # ragged tail only at the end
    for lang, top in last_seq.items():
        have = {s for (l, s) in per_seq if l == lang}
        assert have == set(range(top + 1))    # dense ids per shard
