"""Declared-query registry — the SURVEY §2 coverage surface.

Every implemented operator is declared here as a named query:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation), and
- an equivalent ANSI-SQL string for the DuckDB oracle (or None for
  genuinely non-SQL-expressible ops → rows-only check).

Determinism rules (FIXTURES.md §3) apply to every entry: deterministic ids,
explicit tie-breaks, decimal-exact aggregation for doubles, no raw
timestamps in outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    def deco(fn):
        REGISTRY[name] = DeclaredQuery(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def load_all() -> dict[str, DeclaredQuery]:
    """Import every query module (side-effect: registration) and return the registry."""
    from vector_graph_rag_spark.queries import (  # noqa: F401
        relational,
        graphrag,
        vector,
        dedup,
        textstats,
        streaming,
        composites,
        extended,
        analytics,
        sampling,
        timeseries,
        ranking,
        hybrid,
    )

    return REGISTRY
