"""Set-operation inventory — SURVEY.md §2.7 (absent from the reference;
declared surface): union / unionByName, intersect, except, distinct /
dropDuplicates.

Scale: every set op here runs on pre-projected narrow inputs (key columns
only) so the distinct-shuffle moves minimal bytes; INTERSECT/EXCEPT compile
to semi/anti joins which AQE can broadcast when one side collapses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dsum, query, t


@query(
    "setop_union_active_keys",
    oracle="""
    SELECT k, COUNT(*) AS n_sources FROM (
      SELECT DISTINCT o_custkey AS k, 'orders' AS src FROM orders
      UNION
      SELECT DISTINCT user_id AS k, 'events' AS src FROM events
    ) GROUP BY k
    """,
)
def setop_union_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two keyed activity sets, then per-key source
    count — exercises union + distinct + reaggregation."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), F.lit("orders").alias("src")
    ).distinct()
    e = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.lit("events").alias("src")
    ).distinct()
    return o.union(e).distinct().groupBy("k").agg(F.count(F.lit(1)).alias("n_sources"))


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    return c.intersect(s)


@query(
    "setop_except_inactive_customers",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def setop_except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys that never appear in orders (the set-op twin
    of the anti join)."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@query(
    "setop_dropduplicates_user_type",
    oracle="""
    SELECT user_id, COUNT(*) AS n_distinct_types FROM (
      SELECT DISTINCT user_id, event_type FROM events
    ) GROUP BY user_id
    """,
)
def setop_dropduplicates_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset: distinct (user, event_type)
    pairs, then types-per-user."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type")
    return (
        ev.dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_distinct_types"))
    )


@query(
    "setop_union_by_name_missing",
    oracle="""
    SELECT kind, COUNT(*) AS n, COUNT(acctbal) AS n_with_balance,
           CAST(SUM(CAST(COALESCE(acctbal, 0) AS DECIMAL(28,4))) AS DOUBLE)
             AS total_balance
    FROM (
      SELECT 'customer' AS kind, c_custkey AS key, c_acctbal AS acctbal
      FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS kind, s_suppkey AS key FROM supplier
    )
    GROUP BY kind
    """,
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union — ``unionByName(allowMissingColumns=True)``
    aligns by column name and NULL-fills columns one side lacks (suppliers
    carry no acctbal here). The shape every multi-generation data-lake
    ingest needs when shard schemas drift."""
    cust = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("key")
    )
    u = cust.unionByName(supp, allowMissingColumns=True)
    return u.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("acctbal").alias("n_with_balance"),
        dsum(F.coalesce(F.col("acctbal"), F.lit(0.0))).alias("total_balance"),
    )
