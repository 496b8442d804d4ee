"""Query registry: one named entry per operator in SURVEY.md §2B.

Each query is a (builder, oracle_sql) pair registered at import time.
`builder(spark, sf_dir) -> DataFrame` is the Spark-native
implementation; `oracle` is the DuckDB-equivalent ANSI SQL (None for
ops that aren't cleanly SQL-expressible — the driver then records a
rows-only check).

Discipline (SURVEY.md §5.2): every computed column is aliased
identically in both dialects; float aggregates are round(_, 2)-ed on
both sides; timestamps leave the engine as epoch-microsecond BIGINTs
(`unix_micros` / `epoch_us`) so value-hashes are representation-stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL twin; None => rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and return the registry."""
    from .operators import (  # noqa: F401
        aggregates,
        cdc,
        envelope,
        joins,
        reshape,
        scans,
        setops,
        skew,
        timeseries,
        windows,
        workloads,
    )
    from .functions import maps, scalar, scalar2  # noqa: F401
    from .llm import (  # noqa: F401
        clusters,
        dedup,
        kmeans,
        multimodal,
        retrieval,
        similarity,
        textstats,
    )
    from .streaming import stateful, stream_queries  # noqa: F401

    return dict(_REGISTRY)
