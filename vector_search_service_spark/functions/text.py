"""Ingestion-pipeline scalar text functions (SURVEY.md §2.8).

All hot-path functions are built-in Catalyst expressions — at 100 TB
these run inside whole-stage codegen over the scan, no Python. Each
has a DuckDB mirror for the oracle. Semantics follow the reference's
``src/core/document_processor.py`` (cited per function); observable
divergences are documented inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- G1: content preprocessing (src/core/document_processor.py:240-253) ---
#
# Reference order of operations: (1) collapse every whitespace run to a
# single space (this destroys newlines, so the subsequent per-line strip
# is a no-op); (2) drop control chars < 0x20 except \n\t — which, after
# (1), means dropping all remaining C0 controls (the \n\t are already
# spaces). Observable in stored content, so the order is preserved.


def preprocess_col(content: Column) -> Column:
    collapsed = F.trim(F.regexp_replace(content, r"\s+", " "))
    return F.regexp_replace(collapsed, r"[\x00-\x1f]", "")


def sql_preprocess_expr(c: str) -> str:
    return (
        f"regexp_replace(trim(regexp_replace({c}, '\\s+', ' ', 'g')), "
        f"'[\\x00-\\x1f]', '', 'g')"
    )


# --- G2: deterministic document id (src/core/document_processor.py:31-46) ---
#
# sha256(content + "_title:.." + "_source:.." + "_author:.." + "_type:..")
# truncated to 16 hex chars; only those four metadata keys, in that
# order, each appended only when present. Content-addressing makes
# re-ingest idempotent and is the exact-dedup hook.

_ID_KEYS = ("title", "source", "author", "type")


def doc_id_col(content: Column, metadata: dict[str, Column | None] | None = None) -> Column:
    parts: list[Column] = [content]
    meta = metadata or {}
    for k in _ID_KEYS:
        v = meta.get(k)
        if v is not None:
            parts.append(F.when(v.isNotNull(), F.concat(F.lit(f"_{k}:"), v.cast("string"))).otherwise(F.lit("")))
    return F.substring(F.sha2(F.concat(*parts), 256), 1, 16)


# --- G4: content-type heuristics (src/core/document_processor.py:152-185) ---
#
# Substring-indicator classification, checked in priority order
# code > markdown > html > text. Indicator lists are part of observable
# behavior and frozen here. code/markdown are case-sensitive `in`
# checks; html matches on lowercased content.

CODE_INDICATORS = (
    "def ", "class ", "import ", "from ", "function",
    "#!/", "<?", "/*", "//", "<!--", "SELECT", "FROM",
)
MARKDOWN_INDICATORS = ("# ", "## ", "### ", "**", "*", "`", "```", "[", "](")
HTML_INDICATORS = ("<html", "<div", "<p>", "<h1", "<h2", "<script", "<style")


def _any_contains(c: Column, indicators: tuple[str, ...]) -> Column:
    pred = F.lit(False)
    for ind in indicators:
        pred = pred | c.contains(F.lit(ind))
    return pred


def content_type_col(content: Column) -> Column:
    return (
        F.when(_any_contains(content, CODE_INDICATORS), F.lit("code"))
        .when(_any_contains(content, MARKDOWN_INDICATORS), F.lit("markdown"))
        .when(_any_contains(F.lower(content), HTML_INDICATORS), F.lit("html"))
        .otherwise(F.lit("text"))
    )


def _sql_any_contains(c: str, indicators: tuple[str, ...]) -> str:
    return " OR ".join(
        "contains({}, '{}')".format(c, ind.replace("'", "''")) for ind in indicators
    )


def sql_content_type_expr(c: str) -> str:
    return (
        "CASE "
        f"WHEN {_sql_any_contains(c, CODE_INDICATORS)} THEN 'code' "
        f"WHEN {_sql_any_contains(c, MARKDOWN_INDICATORS)} THEN 'markdown' "
        f"WHEN {_sql_any_contains(f'lower({c})', HTML_INDICATORS)} THEN 'html' "
        "ELSE 'text' END"
    )


# --- G5: title extraction (src/core/document_processor.py:187-212) ---
#
# First of: markdown '# '/'## ' heading in the first 5 lines → content
# of a <title> tag → the first line when it is non-empty, < 100 chars,
# and does not end with '.'. NULL otherwise.


def title_col(content: Column) -> Column:
    lines = F.split(content, r"\n")
    first5 = F.slice(lines, 1, 5)
    md = F.filter(
        first5,
        lambda ln: F.trim(ln).startswith("# ") | F.trim(ln).startswith("## "),
    )
    md_title = F.when(
        F.size(md) > 0,
        F.trim(F.regexp_replace(F.trim(F.element_at(md, 1)), r"^#{1,2} ", "")),
    )
    html_title = F.regexp_extract(content, r"(?i)<title>(.*?)</title>", 1)
    html_title = F.when(html_title != "", F.trim(html_title))
    first_line = F.trim(F.element_at(lines, 1))
    fl_title = F.when(
        (first_line != "") & (F.length(first_line) < 100) & ~first_line.endswith("."),
        first_line,
    )
    return F.coalesce(md_title, html_title, fl_title)


def sql_title_expr(c: str) -> str:
    first5 = f"list_slice(string_split({c}, chr(10)), 1, 5)"
    md = (
        f"list_filter({first5}, ln -> starts_with(trim(ln), '# ') "
        "OR starts_with(trim(ln), '## '))"
    )
    md_title = (
        f"CASE WHEN len({md}) > 0 THEN "
        f"trim(regexp_replace(trim({md}[1]), '^#{{1,2}} ', '')) END"
    )
    html_raw = f"regexp_extract({c}, '(?i)<title>(.*?)</title>', 1)"
    html_title = f"CASE WHEN {html_raw} <> '' THEN trim({html_raw}) END"
    fl = f"trim(string_split({c}, chr(10))[1])"
    fl_title = (
        f"CASE WHEN {fl} <> '' AND length({fl}) < 100 "
        f"AND NOT ends_with({fl}, '.') THEN {fl} END"
    )
    return f"coalesce({md_title}, {html_title}, {fl_title})"


# --- P10: validation (src/core/document_processor.py:214-238) ---

RESERVED_METADATA_KEYS = ("chunk_index", "start_char", "end_char", "chunk_size")
MAX_DOCUMENT_BYTES = 5 * 1_000_000  # max_document_size_mb default 5


def validation_error_col(content: Column) -> Column:
    """NULL when valid, else the rejection reason — rows route to a
    rejected side-output instead of raising, the distributed analogue
    of the reference's per-document 400s."""
    return (
        F.when(content.isNull() | (F.trim(content) == ""), F.lit("Document content cannot be empty"))
        .when(F.length(content) > MAX_DOCUMENT_BYTES, F.lit("Document content too large (max 5MB)"))
        .otherwise(F.lit(None).cast("string"))
    )


def sql_validation_error_expr(c: str) -> str:
    return (
        f"CASE WHEN {c} IS NULL OR trim({c}) = '' THEN 'Document content cannot be empty' "
        f"WHEN length({c}) > {MAX_DOCUMENT_BYTES} THEN 'Document content too large (max 5MB)' "
        "ELSE NULL END"
    )
