"""s4_spark — a PySpark-native analytics engine with the capabilities of
findcoo/S4 (streaming log-aggregation pipeline), extended with a full
relational surface and LLM-data-pipeline operators.

Design stance (SURVEY.md §7): no bespoke execution engine. The engine is a
thin, well-tested PySpark library:

- ``s4_spark.pipeline``  — S4-parity pipeline on Structured Streaming
  (reference: /root/reference/main.go, river/, lake/).
- ``s4_spark.queries``   — the declared relational/function surface; every
  operator is a named, tested entry point over DataFrame/SQL so Catalyst
  owns optimization (pushdown, pruning, join selection, AQE, codegen).
- ``s4_spark.operators`` — the only custom algorithms: as-of join,
  MinHash/SimHash dedup, LSH similarity search, text analysis — built from
  higher-order functions and Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from s4_spark.session import get_spark  # noqa: F401
from s4_spark.catalog import load_tables, table  # noqa: F401
