"""Mergeable sketch operators (SURVEY.md §2-B12 Q204/Q205): count-min
frequency sketch and KMV (k-minimum-values) distinct sketch.

Both are deterministic (md5-derived hashing, no sampled randomness), so
query results are oracle-matched EXACTLY, and both are mergeable — the
property that makes them 100 TB shapes:

- CMS sketches add counter-wise: sketch(A ⊎ B) = sketch(A) + sketch(B)
  (outer-sum on (depth, bucket)); per-shard/day sketches roll up without
  touching rows again.
- KMV sketches re-merge: kmv(A ∪ B) = k smallest of kmv(A) ∪ kmv(B);
  the union estimator needs only merged sketches, and the intersection
  estimator (Beyer et al., SIGMOD'07) reads three sketches.

Both mergeability laws are property-tested in tests/test_properties.py
against a direct build over the concatenated input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32  # md5 head: 8 hex digits


def md5_bucket(col: Column, depth: int, width: int) -> Column:
    """Deterministic per-depth bucket: integer value of the first 8 hex
    digits of md5("<depth>:<value>"), mod width. Expressible identically
    in DuckDB (CAST('0x'||substr(md5(...),1,8) AS BIGINT) % width)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{depth}:"), col)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def _cells(col: Column, depth: int, width: int) -> Column:
    """The exploded (d, bucket) cell array for one value — the ONE place
    the sketch/probe hashing contract lives: cms_sketch and cms_lookup
    must bucket identically or every estimate silently probes the wrong
    counters."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                md5_bucket(col, d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame, col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Count-min sketch as (d, bucket, c) counter rows — a groupBy over
    synthetic keys, so partial aggregation compresses every partition to
    ≤ depth×width rows before the single exchange, whatever the input
    size. Absent counters are implicitly zero (sparse representation —
    merge with an outer sum, look up with coalesce(c, 0))."""
    return (
        df.select(F.explode(_cells(F.col(col), depth, width)).alias("e"))
        .select("e.d", "e.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_lookup(
    sketch: DataFrame,
    probe: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``probe[col]``: min over depths of
    the probed counters (0 when a bucket is absent). Guarantees
    est ≥ true count, always. The SKETCH broadcasts (≤ depth×width
    counter rows by construction — the whole point of the sketch); it
    must be the build side anyway, since the probe is the left/outer
    side of the left join and a left-side broadcast is unsatisfiable."""
    pcells = probe.select(
        col, F.explode(_cells(F.col(col), depth, width)).alias("e")
    ).select(col, "e.d", "e.bucket")
    return (
        pcells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def kmv_hash(col: Column) -> Column:
    """Uniform 32-bit integer hash for KMV: integer value of the first 8
    hex digits of md5(value) — same cross-engine contract as
    md5_bucket."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The k smallest distinct hash values of ``df[col]`` as rows (h).
    Compiles to TakeOrdered (per-partition heap + driver merge) — never
    a global sort. Merge two sketches by union → kmv_merge."""
    return (
        df.select(kmv_hash(F.col(col)).alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """kmv(A ∪ B) from the per-set sketches alone: k smallest of the
    sketch union (property-tested identical to sketching the
    concatenated input)."""
    return a.union(b).distinct().orderBy("h").limit(k)
