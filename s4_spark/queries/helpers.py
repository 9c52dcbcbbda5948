"""Cross-engine determinism helpers.

Floating-point aggregation is order-dependent; Spark (partial + final agg
over 32 shuffle partitions) and DuckDB (its own parallel order) will not
produce bit-identical double sums. The driver hash-compares values, so sums
over doubles are computed EXACTLY by casting each addend to a wide decimal
(exact, associative addition) and casting the exact result back to double
at the end. Identical exact decimal -> identical double in both engines.

This is also the right thing at 100 TB: a decimal-sum is still one
partial+final hash aggregate (map-side combine intact); only the addend
type widens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from s4_spark.catalog import SPREAD_KEYS, spread_scan, table

# 4 fractional digits is enough for the 2-decimal TPC-H-ish money/discount
# columns and the events.value payloads; 38-18 integer digits of headroom.
DEC = "decimal(30,6)"


def dsum(col: str | Column) -> Column:
    """Exact (decimal-path) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"


def davg(col: str | Column) -> Column:
    """Exact-sum average: decimal sum / count, evaluated in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def sql_davg(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def csum(col: str | Column) -> Column:
    """Sum of an integer column as bigint (DuckDB sums to HUGEINT — the
    oracle must CAST back to BIGINT to match)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("long")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``t`` + ``catalog.spread_scan``: the table with map-side
    parallelism restored over an under-split (single-row-group) file
    (guide §2.5), hash-spread on the table's natural key. Identity
    above the size gate, so production plans are untouched. Use ONLY
    under partition-count-independent computation — per-row functions
    and orderless/exact aggregates — never under sampling, rand(), or
    monotonically_increasing_id — and only where the map-side work
    above the scan is heavy enough to beat the exchange's fixed cost
    (measure: the r13 A/B rejected it on more call sites than it
    accepted)."""
    return spread_scan(table(spark, sf_dir, name), SPREAD_KEYS[name])


def ordered_small(df: DataFrame, *cols) -> DataFrame:
    """Deterministic output ordering for a BOUNDED result relation —
    grouped aggregates over bounded key spaces (languages, flags,
    nations, calendar buckets), sketch top-k lists, fixed query fan-outs.

    A global ``orderBy`` plans a range-partitioned sort: a SAMPLING pass
    over the sort input (its own Spark job), a range exchange, then the
    sort — measured ~0.2-0.3 s of fixed cost per benched query at sf0.1
    (guide §2.4: an orderBy used only to make output deterministic is a
    removable exchange). For a relation bounded by construction the
    single-partition sort is the plan you'd want at ANY corpus scale:
    the result is dimension-table-sized no matter how big the input, so
    one task sorting a handful of rows beats sampling + exchanging them.
    Row set and row ORDER are identical to ``orderBy`` on the same keys
    (both produce the total order of the keys; callers must pass a
    tie-free key set, which the oracle contract already requires).

    Corpus-scaled outputs (per-row projections, pair lists, per-entity
    rollups) must keep ``orderBy`` — their result grows with the input
    and needs the parallel range sort."""
    return df.coalesce(1).sortWithinPartitions(*cols)
