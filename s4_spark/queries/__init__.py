"""Declared query surface. Importing this package populates the registry."""

from s4_spark.queries.registry import REGISTRY, oracle_sql, queries, query  # noqa: F401

# Each import registers its family's queries (SURVEY.md §2-B sections).
from s4_spark.queries import (  # noqa: F401,E402
    scans,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    functions,
    udfs,
    llm,
    streaming,
    training,
)
