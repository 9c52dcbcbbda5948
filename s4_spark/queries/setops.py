"""B7 — set operations (SURVEY.md §2-B7, Q070-Q072)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s4_spark.queries.helpers import ordered_small, t
from s4_spark.queries.registry import query


@query(
    "q070_union",
    oracle="""
    WITH u_all AS (
      SELECT o_custkey AS k FROM orders
      UNION ALL SELECT c_custkey AS k FROM customer
    ), u_dist AS (
      SELECT o_custkey AS k FROM orders
      UNION SELECT c_custkey AS k FROM customer
    )
    SELECT (SELECT count(*) FROM u_all) AS n_all,
           (SELECT count(*) FROM u_dist) AS n_distinct
    """,
    section="B7-setops",
)
def q070(spark, sf_dir):
    """UNION ALL (concat, no shuffle) vs UNION DISTINCT (hash dedup).

    Both unions live in ONE lazy plan (a 1-row x 1-row cross of the two
    counts) instead of two eager driver ``count()`` actions — the old
    shape ran two sequential jobs at build time on every invocation and
    shipped the scalars back through the driver (guide §5: the driver
    should do no data work); the mechanisms exercised — a shuffle-free
    UNION ALL concat and a hash-dedup UNION DISTINCT — are unchanged
    and both visible in the single plan."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    n_all = o.unionAll(c).agg(F.count("*").alias("n_all"))
    n_distinct = o.union(c).distinct().agg(F.count("*").alias("n_distinct"))
    return n_all.crossJoin(n_distinct)


@query(
    "q071_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
    section="B7-setops",
)
def q071(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    # bounded result (nation-key intersection)
    return ordered_small(c.intersect(s), "k")


@query(
    "q072_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT SELECT o_custkey FROM orders
    ORDER BY k LIMIT 500
    """,
    section="B7-setops",
)
def q072(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.exceptAll(o).distinct().orderBy("k").limit(500)


@query(
    "q208_setops_multiset",
    oracle="""
    WITH i_all AS (
      SELECT o_custkey AS k FROM orders
      INTERSECT ALL
      SELECT c_custkey FROM customer),
    e_all AS (
      SELECT o_custkey AS k FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer)
    SELECT (SELECT count(*) FROM i_all) AS n_intersect_all,
           (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) FROM i_all)
             AS intersect_key_sum,
           (SELECT count(*) FROM e_all) AS n_except_all,
           (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) FROM e_all)
             AS except_key_sum
    """,
    section="B7-setops",
)
def q208(spark, sf_dir):
    """Multiset set operations — INTERSECT ALL / EXCEPT ALL preserve
    DUPLICATE COUNTS (bag semantics: min resp. difference of
    multiplicities per value), which the q071/q072 distinct forms
    erase. The distinction matters whenever rows are observations, not
    identities — e.g. "orders whose customer also exists" keeps one row
    PER ORDER. Orders places multiple orders per customer, so the ALL
    results differ from the distinct ones at every SF.

    Spark implements both as a single hash aggregation computing per-key
    multiplicities on each side then replicating min(na, nb) resp.
    max(na - nb, 0) copies — one shuffle per side, partial-aggregated,
    no join; same scale profile as count-distinct. The check pins
    count + key checksum of both bags (the bag itself is row-count
    data, not interesting to hash whole)."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    i_all = o.intersectAll(c).agg(
        F.count("*").alias("n_intersect_all"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("intersect_key_sum"),
    )
    e_all = o.exceptAll(c).agg(
        F.count("*").alias("n_except_all"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("except_key_sum"),
    )
    return i_all.crossJoin(e_all)
