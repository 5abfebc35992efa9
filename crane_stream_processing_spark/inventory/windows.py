"""Window-function inventory — SURVEY.md §2.5 (entirely absent from the
reference; declared surface). Ranking, analytic (lag/lead/first/last),
frames, ntile, and per-group top-k.

Every window totally orders its partition (explicit tiebreak column) so
results are deterministic and oracle-comparable — the same discipline §7's
risk register demands for top-k (the reference breaks ties by Go map
iteration order, server/wordCount.go:107-111).

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here are high-cardinality (custkey, user_id) so state per
key is small; no global orderBy without a limit anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, t


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable form of T2: partial
    top-k per partition, never a global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "sort_multi_key_nulls_last",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 global multi-key sort with explicit nulls ordering + limit. A
    global ORDER BY LIMIT compiles to TakeOrderedAndProject — per-partition
    partial top-k merged on one reducer, never a full global sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "window_rank_dense_rank_parts",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_dense_rank,
           NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
)
def window_rank_dense_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over a per-brand price ordering."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead_user_sessions",
    oracle="""
    SELECT event_id, user_id, event_type,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(COALESCE(date_diff('second', LAG(ts) OVER w, ts), -1) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics along each user's event timeline: neighbouring
    event types and whole-second gap since the previous event (-1 for the
    first event of a user)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(
            (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)), F.lit(-1)
        ).alias("secs_since_prev"),
    )


@query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg_3
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: cumulative spend and a trailing 3-order moving
    average per customer. Decimal-cast accumulation keeps every prefix sum
    bit-identical across engines."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(28,4)")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(run).cast("double").alias("running_spend"),
        (F.sum(dec).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "moving_avg_3"
        ),
    )


@query(
    "window_first_last_order_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_order_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_order_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over the full-partition frame,
    one row per customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_order_price"),
            F.last("o_totalprice").over(w).alias("last_order_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_order_price"),
        )
        .distinct()
    )


@query(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window trio — ntile / percent_rank / cume_dist —
    over a total order (balance, key) so tie groups are single rows and
    every engine agrees. One shuffle on the partition key."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_range_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame over event time: each order's
    trailing-30-day customer spend. Unlike ROWS frames the peer set is
    defined by the ORDER BY value, so ties share a frame — the rolling-
    metric shape (trailing revenue, rate limits, anomaly windows). One
    shuffle on the partition key; decimal-cast sum keeps the running
    totals engine-exact. SQL form: the DataFrame rangeBetween API takes
    long offsets only, so the interval frame is expressed in SQL."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_30d
        FROM orders
        """
    )


@query(
    "window_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), anch AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    ), streaks AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM anch GROUP BY user_id, anchor
    )
    SELECT user_id, COUNT(*) AS n_streaks, MAX(len) AS longest_streak_days
    FROM streaks GROUP BY user_id
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak detection (the OTHER sessionization idiom,
    complementing session_window's gap semantics): consecutive active
    DAYS collapse to one anchor date (day minus its per-user row_number),
    so each maximal run is one group — per-user streak count and longest
    run. One distinct, one window, two map-side-combinable aggregates,
    all partitioned by user: no global ordering anywhere, so the plan is
    the same three hash shuffles at any corpus size."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anch = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = anch.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak_days"),
    )


@query(
    "window_percentrank_cumedist_price",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey)
             AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey)
             AS cume_price
    FROM orders
    """,
)
def window_percentrank_cumedist_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.5 distribution-rank tail: percent_rank and cume_dist of order
    value within each priority class — where every order sits in its
    class's price distribution. Both functions are rank arithmetic over
    one sort: (rank-1)/(n-1) and peers/n from identical integer ranks,
    so the doubles are bit-identical cross-engine and need no rounding.
    The o_orderkey tiebreak makes the ORDER BY total, which pins rank
    (and therefore both outputs) even if two orders ever share a price.
    One shuffle on the partition key, streaming rank within partitions —
    the same plan at any scale."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_price"),
    )
