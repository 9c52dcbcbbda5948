"""Table catalog over the driver-generated parquet test data.

Ten tables per scale-factor directory (TESTDATA.md / FIXTURES.md §1):
``region nation customer supplier part orders lineitem events documents
embeddings`` — one parquet each, loaded lazily so Catalyst sees a plain
parquet relation (predicate pushdown / column pruning / partition pruning
all apply).

At 100 TB these would be partitioned parquet/iceberg prefixes on S3; the
loader keys on a directory so swapping ``sf_dir`` for ``s3a://bucket/db``
is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 — fixed size regardless of SF).
BROADCAST_DIMS = frozenset({"region", "nation"})


# events.ts is stored as parquet timestamp[ns]; with
# spark.sql.legacy.parquet.nanosAsLong it scans as int64 nanos and is
# truncated (floored) to µs here — matching DuckDB's TIMESTAMP_NS→TIMESTAMP
# cast, and lossless on the driver data (sub-µs components are all zero).
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
