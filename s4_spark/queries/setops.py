"""B7 — set operations (SURVEY.md §2-B7, Q070-Q072)."""

from __future__ import annotations

from pyspark.sql import functions as F

from s4_spark.queries.helpers import t
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
    """UNION ALL (concat, no shuffle) vs UNION DISTINCT (hash dedup)."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    n_all = o.unionAll(c).count()
    n_distinct = o.union(c).distinct().count()
    return spark.createDataFrame([(n_all, n_distinct)], "n_all long, n_distinct long")


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
    return c.intersect(s).orderBy("k")


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
