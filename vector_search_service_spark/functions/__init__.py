from .analysis import (
    STOPWORDS_EN,
    analyze_terms,
    tokens_col,
    raw_tokens_col,
    match_all_terms,
    tf_rank_col,
    sql_tokens_expr,
    sql_raw_tokens_expr,
    sql_match_expr,
    sql_tf_rank_expr,
)
from .vectors import cosine_similarity_col, cosine_distance_col, l2_normalize_col

__all__ = [
    "STOPWORDS_EN",
    "analyze_terms",
    "tokens_col",
    "raw_tokens_col",
    "match_all_terms",
    "tf_rank_col",
    "sql_tokens_expr",
    "sql_raw_tokens_expr",
    "sql_match_expr",
    "sql_tf_rank_expr",
    "cosine_similarity_col",
    "cosine_distance_col",
    "l2_normalize_col",
]
