"""Query registry — the driver-facing catalog of implemented operators.

Each entry pairs a Spark query (callable ``(spark, sf_dir) -> DataFrame``)
with its DuckDB oracle SQL (or ``None`` for non-SQL-expressible ops,
which the driver checks rows-only). ``__spark_entry__.py`` re-exports
this registry.

Conventions (driver contract):
- every computed column is aliased identically in Spark and SQL;
- every query is totally ordered or order-insensitive;
- floats avoid cross-row accumulation unless done in DECIMAL (exact,
  order-independent) and cast back at the end.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ref: str = ""  # SURVEY.md §2 operator ids covered
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, *, oracle: str | None, survey_ref: str = "",
             tags: tuple[str, ...] = ()):  # decorator
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref, tags)
        return fn
    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effect: modules self-register on first use
    from . import queries_ann  # noqa: F401
    from . import queries_bpe  # noqa: F401
    from . import queries_bucketed  # noqa: F401
    from . import queries_curate  # noqa: F401
    from . import queries_corpus  # noqa: F401
    from . import queries_curate2  # noqa: F401
    from . import queries_dedup  # noqa: F401
    from . import queries_embed  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_fts2  # noqa: F401
    from . import queries_ingest  # noqa: F401
    from . import queries_mllib  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_pretrain  # noqa: F401
    from . import queries_profile  # noqa: F401
    from . import queries_quantile  # noqa: F401
    from . import queries_rangejoin  # noqa: F401
    from . import queries_reference  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_sampling  # noqa: F401
    from . import queries_sketch  # noqa: F401
    from . import queries_skew  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_subquery  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_tpch2  # noqa: F401
    from . import queries_tpch3  # noqa: F401
    from . import queries_textan  # noqa: F401
    from . import queries_timeseries  # noqa: F401
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v.fn for k, v in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {k: v.oracle for k, v in all_queries().items() if v.oracle is not None}
