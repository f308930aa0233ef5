"""Hashing / fingerprinting expressions for the dedup suite.

Everything here is engine-portable by construction: the only hash
primitive is ``md5`` (identical lowercase hex in Spark and DuckDB), and
"numeric" hash comparisons are done on hex strings (lexicographic min
over fixed-width hex == numeric min) or via explicit nibble decoding —
so every operator built on these has an exact DuckDB oracle.

Scale notes: all expressions are built-in Catalyst (codegen'd); the
per-row cost is a few md5s over short strings. The heavy parts of
dedup (the self-joins) live in ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def words_col(text: Column) -> Column:
    """Non-empty lowercased word tokens (no stopword removal — dedup
    must see the document verbatim)."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def sql_words_expr(c: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), t -> t <> '')"


def shingles_col(words: Column, k: int = 3) -> Column:
    """Word k-gram shingles, space-joined. Short docs (< k words)
    produce their full token string as a single shingle so they still
    participate."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))


def sql_shingles_expr(words: str, k: int = 3) -> str:
    return (
        f"list_transform(range(1, greatest(len({words}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({words}, i, i + {k - 1}), ' '))"
    )


def minhash_col(shingles: Column, seed: int) -> Column:
    """One MinHash component: the lexicographic min of seed-salted md5
    hex digests over the shingle set. Hex-string min == numeric min of
    the underlying 128-bit value, so this is a faithful MinHash without
    any integer-conversion portability trap."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def sql_minhash_expr(shingles: str, seed: int) -> str:
    return f"list_min(list_transform({shingles}, s -> md5('{seed}|' || s)))"


def band_key_col(words: Column, seeds: tuple[int, ...]) -> Column:
    """LSH band key: md5 of the concatenated MinHash components of the
    band's seeds."""
    sh = shingles_col(words)
    return F.md5(F.concat_ws("|", *[minhash_col(sh, s) for s in seeds]))


def sql_band_key_expr(words: str, seeds: tuple[int, ...]) -> str:
    sh = sql_shingles_expr(words)
    parts = ", ".join(sql_minhash_expr(sh, s) for s in seeds)
    return f"md5(array_to_string([{parts}], '|'))"


_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def simhash16_col(words: Column) -> Column:
    """16-bit SimHash: bit j is the sign of Σ_tokens (2·b_j(tok) − 1)
    where b_j(tok) is the low bit of hex digit j of md5(tok) (digit
    parity — an IN-list check, portable to the oracle verbatim). A
    production 64/128-bit variant only widens the loop."""
    def _balance(j: int) -> Column:
        return F.aggregate(
            words,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.substring(F.md5(t), j + 1, 1).isin(*_ODD_HEX), F.lit(1))
             .otherwise(F.lit(-1)),
        )

    acc = F.lit(0)
    for j in range(16):
        acc = acc + F.when(_balance(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def sql_simhash16_expr(words: str) -> str:
    odd = ", ".join(f"'{d}'" for d in _ODD_HEX)
    terms = []
    for j in range(16):
        bal = (
            f"list_sum(list_transform({words}, t -> "
            f"CASE WHEN substr(md5(t), {j + 1}, 1) IN ({odd}) THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {bal} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def jaccard_col(a: Column, b: Column) -> Column:
    """Set Jaccard over token arrays — integer sizes, one final double
    division (cross-engine exact)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def sql_jaccard_expr(a: str, b: str) -> str:
    return (
        f"(CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
        f"/ CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE))"
    )
