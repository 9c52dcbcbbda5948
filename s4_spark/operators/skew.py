"""Skew mitigation: deterministic key salting.

AQE's skew-join splitting (on in ``session.py``) is the first line of
defense, but it only triggers on sort-merge joins after a shuffle is
already materialized. Salting attacks the skew *before* the shuffle: the
skewed (large) side scatters each hot key across ``n_salts`` sub-keys,
the other side replicates each row ``n_salts`` times, and the join runs
on (key, salt) — every sub-key now holds ~1/n of the hot key's rows.

The salt is derived deterministically (xxhash64 of a row-identifying
column, mod n) — never ``rand()`` — so plans are reproducible, retried
tasks produce identical output (required for exactly-once sinks), and
results are stable across runs.

Cost model: replicating the small side multiplies it by ``n_salts`` —
worth it iff the hot key's row count per task exceeds the replicated
side's size. Use for large⋈medium joins where broadcast doesn't fit and
AQE's post-shuffle split can't help (e.g. shuffle-hash joins, or when a
single key exceeds one task's memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, row_col: str | Column, n_salts: int, out: str = "__salt"
) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) from a row-identifying
    column (NOT the join key — salting the key's own hash would put every
    duplicate of a hot key in the same bucket, defeating the point)."""
    c = F.col(row_col) if isinstance(row_col, str) else row_col
    return df.withColumn(out, F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int"))


def replicate_salts(df: DataFrame, n_salts: int, out: str = "__salt") -> DataFrame:
    """Replicate each row once per salt value (the build/small side)."""
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(out, F.col(out).cast("int"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[tuple[str, str]],
    skewed_row_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` ⋈ ``other`` on equi-pairs ``on`` = [(left, right)]
    with the hot-key rows of ``skewed`` scattered across ``n_salts``
    sub-partitions. Result equals the unsalted join exactly (verified by
    q046's oracle)."""
    s = with_salt(skewed, skewed_row_col, n_salts)
    o = replicate_salts(other, n_salts)
    cond = s["__salt"] == o["__salt"]
    for l, r in on:
        cond = cond & (s[l] == o[r])
    return s.join(o, cond, how).drop("__salt")
