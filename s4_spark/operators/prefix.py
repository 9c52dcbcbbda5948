"""Two-phase global prefix computations (rank / running sum) WITHOUT a
single-reducer global sort.

``row_number() / sum() OVER (ORDER BY ...)`` funnels the whole table
through ONE reducer — the thing that cannot survive a 100 TB input. The
two-phase form never does:

  1. bucket rows by range on a numeric order proxy (bounds from one tiny
     ``approxQuantile`` probe — the same sampling a global sort's range
     partitioner performs), assigned via a BROADCAST-joined interval
     table (O(1) plan nodes in bucket count — not chained CASE WHENs,
     the py4j/codegen depth tax measured in round 2);
  2. aggregate per bucket (count and/or value sum — partial agg),
     prefix-sum the |buckets| rows driver-side into per-bucket offsets;
  3. compute the rank/cumsum WITHIN each bucket (independent parallel
     per-bucket windows) and add the bucket offset.

Result is bit-identical to the single-reducer window while the largest
single sort is one bucket. Buckets come from explicit collected bounds,
not ``repartitionByRange``, so phase-1/phase-2 assignment can't drift
with sampling. Used by q182 (global row numbering) and q191 (token-
budget prefix cut).

Correct for any total order (proxy, tiebreakers...): the proxy column
must be a monotone function of the leading sort key (equal-proxy rows
always land in one bucket, where the full ``order_cols`` sort decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LO, _HI = -(1 << 62), (1 << 62)


def with_global_prefix(
    df: DataFrame,
    proxy_col: str,
    order_cols: list[str],
    value_col: str | None = None,
    n_buckets: int = 8,
    rid_col: str = "rid",
    run_sum_col: str = "run_sum",
) -> DataFrame:
    """Attach a 0-based global rank (``rid_col``) — and, when
    ``value_col`` is given, the inclusive global running sum
    (``run_sum_col``) — under the total order ``order_cols``.

    ``proxy_col`` must be a LONG column that orders consistently with
    the first entry of ``order_cols`` (often the same column, or an
    integer prefix of a hash key)."""
    spark = df.sparkSession
    qs = df.approxQuantile(
        proxy_col, [i / n_buckets for i in range(1, n_buckets)], 0.01
    )
    bounds = sorted(set(int(v) for v in qs))
    ranges = spark.createDataFrame(
        [
            (
                i,
                (bounds[i - 1] if i > 0 else _LO),
                (bounds[i] if i < len(bounds) else _HI),
            )
            for i in range(len(bounds) + 1)
        ],
        "bucket int, lo long, hi long",
    )
    # half-open (lo, hi] intervals ≡ "count of bounds < proxy"; each row
    # matches exactly one bucket, so the broadcast NLJ is |rows|×|buckets|
    # comparisons with no exchange of the fact side
    bd = df.join(
        F.broadcast(ranges),
        (F.col(proxy_col) > F.col("lo")) & (F.col(proxy_col) <= F.col("hi")),
    ).drop("lo", "hi")
    aggs = [F.count("*").alias("__n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).cast("long").alias("__v"))
    stats = {r["bucket"]: r for r in bd.groupBy("bucket").agg(*aggs).collect()}
    offsets, acc_n, acc_v = [], 0, 0
    for bidx in range(len(bounds) + 1):
        offsets.append((bidx, acc_n, acc_v))
        if bidx in stats:
            acc_n += stats[bidx]["__n"]
            acc_v += stats[bidx]["__v"] if value_col is not None else 0
    off = spark.createDataFrame(
        offsets, "bucket int, bucket_offset long, bucket_value_offset long"
    )
    w = Window.partitionBy("bucket").orderBy(*order_cols)
    out = bd.join(F.broadcast(off), "bucket").withColumn(
        rid_col, F.row_number().over(w) - 1 + F.col("bucket_offset")
    )
    if value_col is not None:
        wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = out.withColumn(
            run_sum_col,
            (F.sum(value_col).over(wsum) + F.col("bucket_value_offset")).cast(
                "long"
            ),
        )
    return out.drop("bucket", "bucket_offset", "bucket_value_offset")
