"""TPC-H suite completion — the 15 query shapes not already in
``analytics.py``, adapted to the driver schema (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate/c_phone columns; a DISTINCT
(l_partkey, l_suppkey) projection of lineitem serves as the part-supplier
bridge, l_returnflag stands in for shipmode, c_mktsegment for the phone
prefix). Together with analytics.py (q1/q3/q5/q6/q10/q14/q18) the engine
covers all 22 TPC-H optimizer shapes: correlated min (q2), EXISTS
semi-join (q4), bi-directional nation pairs (q7), market share (q8),
profit (q9), HAVING vs global scalar (q11), conditional counts (q12),
outer-join distribution (q13), scalar-max view (q15), NOT IN + count
distinct (q16), correlated avg (q17), disjunctive pushdown (q19), nested
IN (q20), EXISTS + NOT EXISTS (q21), anti join + global avg (q22).

Reference parity: the reference's query layer is the per-app imperative
loop (reference ``server/wordCount.go``, ``server/hothttp.go``); these
declarative shapes are the engine's superset surface per SURVEY.md §2.
All money aggregates go through :func:`~..dsum` (exact decimal) so both
engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dsum, query, t


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH esupp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
             MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS mn
      FROM part JOIN bridge ON p_partkey = l_partkey
                JOIN esupp  ON l_suppkey = s_suppkey
      WHERE p_size = 15 AND p_type = 'LARGE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM cand WHERE s_acctbal = mn
    ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
    LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each qualifying part, the
    EUROPE supplier with the minimum account balance (supplycost proxy)
    among suppliers that have actually supplied it (lineitem bridge).
    The correlated-MIN subquery becomes a window MIN over the joined
    relation — one shuffle by p_partkey, no re-scan. Ties keep all rows,
    as in spec; the equality compares stored doubles (no arithmetic), so
    it's exact cross-engine."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    esupp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Semi-filter the bridge on the selective part predicate BEFORE the
    # distinct, so the distinct's shuffle carries only the ~2% of
    # (partkey, suppkey) pairs that can contribute — at 100 TB the
    # unfiltered form shuffles the whole lineitem projection. No
    # broadcast hint: part is SF-scaled, so AQE's size-based planning
    # picks broadcast at benchmark SF and a shuffle join at 100 TB.
    bridge = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            part.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .distinct()
    )
    cand = (
        part
        .join(bridge, F.col("p_partkey") == F.col("l_partkey"))
        .join(esupp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mn"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("p_partkey").asc(), F.col("s_name").asc()
        )
        .limit(20)
    )


@query(
    "tpch_q4_priority_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): one quarter of orders with
    at least one line shipped after the order date (commit/receipt-date
    proxy), counted by priority. The EXISTS is a LEFT SEMI join — lineitem
    is never widened into the output, and the quarter filter pushes into
    the orders scan before the shuffle."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations in both directions, by supplier-nation × customer-nation ×
    ship year. The nation table joins twice under different aliases (both
    broadcast); the disjunctive nation-pair predicate applies after both
    joins, and the two-year range pushes into the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                  THEN CAST(volume AS DECIMAL(28,6)) ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of ECONOMY
    part revenue sold into AMERICA, per order year. Eight-relation join;
    nation/region broadcast by hint; part/supplier carry no hint (they
    are SF-scaled — AQE broadcasts them at benchmark SF, shuffles at
    100 TB); the two fact tables shuffle once each. Numerator and denominator are both exact decimal sums, so
    the only float op is the final division — identical IEEE on both
    engines."""
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(nat, scale=6) / dsum(vol, scale=6)).alias("mkt_share"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_profit
    FROM (
      SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice, l_discount, p_retailprice, l_quantity
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on red parts by
    supplier nation and order year, where profit = revenue minus cost
    (retailprice × quantity standing in for supplycost × quantity). The
    LIKE filter can't push below the scan but prunes before the join;
    profit is summed as one decimal expression so negative amounts stay
    exact."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit, scale=6).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH nat_value AS (
      SELECT l_partkey,
             CAST(l_extendedprice * l_quantity AS DECIMAL(28,6)) AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
    )
    SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
    FROM nat_value
    GROUP BY l_partkey
    HAVING CAST(SUM(v) AS DOUBLE) >
           0.001 * (SELECT CAST(SUM(v) AS DOUBLE) FROM nat_value)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part shipped value from one
    nation's suppliers, kept only where it exceeds a fraction of that
    nation's total (supplycost × availqty proxy = extendedprice ×
    quantity). The global scalar subquery is a single-row broadcast
    cross-join, computed from the SAME shuffled aggregate — one pass over
    lineitem, not two. Both sides of the HAVING compare decimal-exact
    doubles scaled by the same literal."""
    nat_value = (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * F.col("l_quantity"))
            .cast("decimal(28,6)")
            .alias("v"),
        )
    )
    per_part = nat_value.groupBy("l_partkey").agg(
        F.sum("v").alias("pv_dec")
    )
    total = per_part.agg(
        F.sum("pv_dec").cast("double").alias("total_v")
    )
    return (
        per_part.select(
            "l_partkey", F.col("pv_dec").cast("double").alias("part_value")
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("total_v"))
        .select("l_partkey", "part_value")
    )


@query(
    "tpch_q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority): high- vs low-priority
    line counts per lineitem class (returnflag standing in for shipmode)
    for one ship year. Pure conditional-count aggregation over a fact-fact
    join; the year range pushes into the lineitem scan and only three
    orders columns are read."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): histogram of
    orders-per-customer including zero-order customers — the LEFT OUTER
    join with the filter ON the join condition (not WHERE), so customers
    whose only orders are '4-NOT SPECIFIED' still appear with count 0.
    Two cascaded aggregations; the second runs on ~50 distinct counts, so
    AQE coalesces it to a handful of partitions."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    quarterly revenue — the CREATE VIEW + scalar MAX pattern. The revenue
    aggregate is computed once and self-joined against its own single-row
    MAX (broadcast); equality is exact because both sides come from the
    same decimal-sum double. Ties would all surface, as spec requires."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        t(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM bridge JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) bucket, excluding one brand, one type
    family, and suppliers with complaints (negative acctbal proxy). The
    NOT IN subquery is an ANTI join on the excluded-supplier set (no
    hint — supplier is SF-scaled, AQE picks broadcast when it fits); COUNT(DISTINCT) expands to a two-phase aggregate with no extra
    shuffle beyond the group keys.

    No pre-distinct on the bridge: COUNT(DISTINCT l_suppkey) subsumes it
    (duplicate (partkey, suppkey) rows cannot change a distinct count, and
    the anti join is row-local), so the only corpus-sized shuffle is the
    aggregate's own — the oracle keeps the textbook DISTINCT bridge and
    the results are identical."""
    bridge = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        bridge.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS ap_key,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
                    / COUNT(l_quantity)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN part_avg ON ap_key = l_partkey
    WHERE p_brand = 'Brand#7' AND p_size < 10
      AND l_quantity < qty_threshold
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from lines
    ordering less than 20% of a part's average quantity, annualized. The
    correlated per-part AVG decorrelates into one groupBy over lineitem
    joined back on partkey — Catalyst would do the same rewrite for the
    SQL form; writing it explicitly guarantees a single lineitem re-scan.
    The threshold is decimal-sum / count on both engines so the boundary
    compare can't drift."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#7") & (F.col("p_size") < 10)
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice", scale=6) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): three OR'd brand/size/quantity
    brackets across the join — the disjunctive-predicate stress case.
    Catalyst extracts the common single-table conjuncts (p_size >= 1,
    quantity bounds, brand IN set) and pushes them below the join while
    the cross-table residual evaluates post-join; part carries no
    broadcast hint (SF-scaled — AQE decides by measured size)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    br = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(br)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q20_excess_shippers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > CAST(50 AS DECIMAL(28,4))
      )
    ORDER BY s_name
    """,
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): one nation's suppliers
    who shipped more than a threshold quantity of 'small…' parts in a year
    (availqty-excess proxy via the lineitem bridge). The nested IN is an
    aggregate-then-semi-join: the HAVING output is small, so AQE
    broadcasts it into the supplier side (no forced hint — it scales
    with supplier count); the quantity compare stays in decimal."""
    qualifying = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("q"))
        .filter(F.col("q") > F.lit(50).cast("decimal(28,4)"))
        .select("l_suppkey")
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qualifying,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_6'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): on finished
    multi-supplier orders, the line whose supplier shipped LAST (shipdate
    standing in for the receipt/commit delay) — an EXISTS (left-semi on
    orderkey with a supplier-inequality residual) stacked with a NOT
    EXISTS (left-anti with an additional shipdate residual) over the same
    fact table. Three lineitem scans, each pruned to 3 columns; the
    semi/anti shuffles share the l_orderkey partitioning."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    l3 = li.alias("l3")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    return (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
        .join(orders, F.col("o_orderkey") == F.col("l1.l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    )
    SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
    FROM pool
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
               / COUNT(c_acctbal)
        FROM pool WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): well-funded customers
    (above the positive-balance average) with no RECENT orders (the data's
    order history is dense, so "never ordered" would be empty — lapsed
    customers carry the same plan shape), bucketed by market segment
    (phone country-code proxy). The scalar AVG is a single-row broadcast;
    the NOT EXISTS is a left-anti against date-filtered orders projected
    to o_custkey only. Threshold and output sums are decimal-exact on
    both engines."""
    pool = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    )
    thr = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,4)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    orders_keys = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
