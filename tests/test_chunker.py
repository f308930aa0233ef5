"""G3 chunker edge cases (FIXTURES.md 'Derived fixtures'): the offsets
are stored metadata, so the loop's observable behavior is pinned here."""

from __future__ import annotations

from vector_search_service_spark.operators.chunker import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    chunk_text,
    snap_to_boundary,
)


def test_empty_and_whitespace():
    assert chunk_text("") == []
    assert chunk_text("   \n\t  ") == []


def test_short_content_single_chunk():
    out = chunk_text("hello world", 1000, 200)
    assert len(out) == 1
    c = out[0]
    assert c["content"] == "hello world"
    assert (c["start_char"], c["end_char"]) == (0, 11)
    assert c["is_first_chunk"] and c["is_last_chunk"]
    assert c["chunk_index"] == 0 and c["chunk_size"] == 11


def test_overlap_windows_and_boundary_snap():
    text = ("word " * 500).strip()  # 2499 chars, boundary everywhere
    out = chunk_text(text, 1000, 200)
    assert len(out) >= 3
    for i, c in enumerate(out):
        assert c["chunk_index"] == i
        assert c["content"] == text[c["start_char"]:c["end_char"]].strip()
        assert c["chunk_size"] == len(c["content"])
        if c["end_char"] < len(text):
            # snapped: char just before end is a boundary char
            assert text[c["end_char"] - 1] in " \n\t.,;:!?"
    # successive windows overlap by exactly `overlap` (clamped)
    for a, b in zip(out, out[1:]):
        assert b["start_char"] == a["end_char"] - 200
    assert out[0]["is_first_chunk"] and not out[0]["is_last_chunk"]
    assert out[-1]["is_last_chunk"]


def test_boundary_char_at_end_extends_by_one():
    # the reference scan starts AT the end index: a boundary char
    # exactly there yields end+1
    text = "a" * 1000 + " " + "b" * 500
    out = chunk_text(text, 1000, 200)
    assert out[0]["end_char"] == 1001


def test_no_boundary_within_100_keeps_hard_cut():
    text = "x" * 3000
    out = chunk_text(text, 1000, 200)
    assert out[0]["end_char"] == 1000
    assert out[1]["start_char"] == 800


def test_overlap_clamped_to_half():
    text = "y" * 100
    out = chunk_text(text, 10, 50)  # overlap clamped to 5
    assert out[1]["start_char"] == out[0]["end_char"] - 5


def test_iteration_safety_cap():
    text = "z" * 20000
    out = chunk_text(text, 10, 5)
    assert len(out) == 1000  # capped, not 4000


def test_strip_drops_empty_window_without_consuming_index():
    # window fully inside whitespace → stripped empty → dropped, index
    # not incremented
    text = "a" * 995 + " " * 300 + "b" * 400
    out = chunk_text(text, 1000, 200)
    idxs = [c["chunk_index"] for c in out]
    assert idxs == list(range(len(out)))
    assert all(c["content"] for c in out)


def test_snap_scan_window_is_100():
    # scan covers indices pos..pos-99 (reference range(pos, pos-100, -1))
    text = "a" * 900 + " " + "a" * 200  # boundary at index 900: reachable
    assert snap_to_boundary(text, 999) == 901
    text2 = "a" * 899 + " " + "a" * 201  # boundary at 899: one past the window
    assert snap_to_boundary(text2, 999) == 999


def test_udtf_chunker_matches_pandas_path(spark):
    """The native UDTF (LATERAL table function) and the pandas-UDF +
    explode path must emit identical chunk rows — one core
    (chunk_text), two execution surfaces."""
    from vector_search_service_spark.operators.chunker import (
        chunk_documents,
        chunk_documents_sql,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma. " * 40),
            (2, "short"),
            (3, ""),
            (4, "x" * 2500),
        ],
        "doc_id long, text string",
    )
    cols = ["doc_id", "chunk_index", "content", "start_char", "end_char"]
    got = sorted(
        tuple(r) for r in chunk_documents_sql(spark, df).select(*cols).collect()
    )
    want = sorted(
        tuple(r) for r in chunk_documents(df).select(*cols).collect()
    )
    assert got == want and len(got) > 4
