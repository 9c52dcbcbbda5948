"""B2 — projections / filters / predicates (SURVEY.md §2-B2, Q010-Q016).

Everything here is a single parquet scan with Catalyst predicate pushdown
and column pruning — at 100 TB these queries read only the referenced
columns and skip row groups via parquet min/max stats (verified by the
plan tests: `PushedFilters` reaches the scan node).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s4_spark.queries.helpers import ordered_small, t
from s4_spark.queries.registry import query


@query(
    "q010_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    section="B2-projection-filter",
)
def q010(spark, sf_dir):
    """Projection with computed column; scan reads only 4 columns."""
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "q011_filter_comparison",
    oracle="""
    SELECT count(*) AS n FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
    """,
    section="B2-projection-filter",
)
def q011(spark, sf_dir):
    """Comparison + boolean conjunction — pushed to the parquet reader."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.08)
    ).agg(F.count("*").alias("n"))


@query(
    "q012_in_predicate",
    oracle="""
    SELECT count(*) AS n FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    section="B2-projection-filter",
)
def q012(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "q013_null_predicates",
    oracle="""
    SELECT count(*) AS n_nonempty,
           count(CASE WHEN nullif(props, '') IS NULL THEN 1 END) AS n_empty,
           count(coalesce(nullif(props, ''), event_type)) AS n_coalesced
    FROM events
    """,
    section="B2-projection-filter",
)
def q013(spark, sf_dir):
    """NULL handling: isNull / coalesce / nullif."""
    ev = t(spark, sf_dir, "events")
    np = F.nullif(F.col("props"), F.lit(""))
    return ev.agg(
        F.count("*").alias("n_nonempty"),
        F.count(F.when(np.isNull(), 1)).alias("n_empty"),
        F.count(F.coalesce(np, F.col("event_type"))).alias("n_coalesced"),
    )


@query(
    "q014_like_regex",
    oracle=r"""
    SELECT count(CASE WHEN p_type LIKE '%BRASS%' THEN 1 END) AS n_like,
           count(CASE WHEN regexp_matches(p_name, '(red|blue)') THEN 1 END) AS n_re,
           count(*) AS n
    FROM part
    """,
    section="B2-projection-filter",
)
def q014(spark, sf_dir):
    """LIKE and regex predicates (rlike ~ regexp_matches)."""
    p = t(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_type").like("%BRASS%"), 1)).alias("n_like"),
        F.count(F.when(F.col("p_name").rlike("(red|blue)"), 1)).alias("n_re"),
        F.count("*").alias("n"),
    )


@query(
    "q015_case_when",
    oracle="""
    SELECT o_orderstatus,
           CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS k,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus, k ORDER BY o_orderstatus, k
    """,
    section="B2-projection-filter",
)
def q015(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .withColumn(
            "k",
            F.when(F.col("o_totalprice") > 100000, "big").otherwise("small"),
        )
        .groupBy("o_orderstatus", "k")
        .agg(F.count("*").alias("n"))
        # bounded result (status x size-class groups)
        .transform(ordered_small, "o_orderstatus", "k")
    )


@query(
    "q016_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    section="B2-projection-filter",
)
def q016(spark, sf_dir):
    """distinct == groupBy all columns; partial-dedup before the shuffle."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        # bounded result (flag x status distinct pairs)
        .transform(ordered_small, "l_returnflag", "l_linestatus")
    )
