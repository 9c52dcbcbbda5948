"""Query registry — every declared operator (SURVEY.md §2-B) is one named
entry: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) an equivalent DuckDB oracle SQL string over the pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``.

The driver hash-compares collected rows (columns sorted by name), so every
computed column is aliased identically on both sides, and float aggregates
are made cross-engine deterministic via decimal-exact summation (see
``helpers.dsum``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver records rows-only check
    section: str  # SURVEY §2-B family, e.g. "B4-aggregations"


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, section: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, section=section)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
