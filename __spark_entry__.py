"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the s4_spark registry — one
entry per implemented operator from SURVEY.md §2-B, each a Spark callable
plus (where SQL-expressible) a DuckDB oracle with identically-aliased
columns. ``entry`` runs the flagship TPC-H-Q1-shape aggregation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s4_spark.queries import registry as _registry
import s4_spark.queries  # noqa: F401  (imports populate the registry)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the q130 corpus-prep pipeline (quality filter ->
    exact dedup -> MinHash-LSH near-dup removal -> per-lang stats): it
    exercises scan, filter, window dedup, the LSH operator stack, and
    aggregation in one plan — the engine's reason to exist."""
    return _registry.REGISTRY["q130_corpus_prep"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
