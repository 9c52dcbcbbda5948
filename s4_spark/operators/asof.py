"""As-of join — Spark lacks a native ASOF JOIN; this is the scalable
union-merge formulation (SURVEY.md §7 risk 4).

Naive emulation (range-join left⋈right on key + ts<=ts, then max-per-row)
explodes: each left row pairs with ALL earlier right rows of that key —
O(n·m) per key, fatal at 100 TB. Instead we do the classic merge as-of:

    union(left tagged, right tagged)
      -> single shuffle on key
      -> window last(right_ts, ignoreNulls) ordered by (ts, tag)

One shuffle, no row explosion, linear in |left| + |right| per key — the
same cost profile as kdb/QuestDB/DuckDB native as-of joins. Skewed keys
are handled by AQE skew-split since the window partitions by the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (ties on equal
    timestamps resolve to the right row, matching DuckDB ASOF `<=`).

    ``tolerance`` (a SQL interval body, e.g. ``"10 minutes"``) bounds
    match staleness: a matched right row older than
    ``left_ts - tolerance`` is nulled out — pandas ``merge_asof``'s
    tolerance / kdb ``wj``'s window, as a pure post-match projection:
    the merge itself is unchanged, so the cost profile is identical
    and no second pass or join is added.

    Returns the left rows plus ``{right_ts}{suffix}`` and
    ``{v}{suffix}`` for each requested right value column.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_values = right_values or []

    lcols = left.columns
    # tag=1 sorts right rows before left rows at identical timestamps so
    # an equal-ts right row is visible to the left row (<= semantics).
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*[c for c in lcols if c not in keys]).alias("__lrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(f"__rv_{v}") for v in right_values],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            l_tagged.schema["__lrow"].dataType.simpleString()
        ).alias("__lrow"),
        F.col(right_ts).alias("__rts"),
        *[F.col(v).alias(f"__rv_{v}") for v in right_values],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        *keys,
        "__tag",
        "__ts",
        "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        *[
            F.last(f"__rv_{v}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    out = merged.filter(F.col("__tag") == 1)
    rts_out = F.col(f"{right_ts}{suffix}")
    if tolerance is not None:
        fresh = rts_out >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        return out.select(
            *keys,
            *[F.col("__lrow")[c].alias(c) for c in lcols if c not in keys],
            F.when(fresh, rts_out).alias(f"{right_ts}{suffix}"),
            *[
                F.when(fresh, F.col(f"{v}{suffix}")).alias(f"{v}{suffix}")
                for v in right_values
            ],
        )
    return out.select(
        *keys,
        *[F.col("__lrow")[c].alias(c) for c in lcols if c not in keys],
        f"{right_ts}{suffix}",
        *[f"{v}{suffix}" for v in right_values],
    )
