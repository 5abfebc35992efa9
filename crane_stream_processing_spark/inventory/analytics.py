"""Multi-join analytics — TPC-H-style queries over the full star schema,
exercising the optimizer paths a single-join query can't: join ordering
across 3-5 tables, mixed broadcast + shuffle strategies, and subquery
decorrelation (SURVEY.md §4 — all Catalyst-built-in, verified here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dsum, query, t


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join with per-table filters pushed to each
    scan, revenue top-10. Catalyst pushes all three predicates into the
    parquet scans and picks broadcast for the filtered customer side."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join (two fact tables, four dims) with a
    region filter that prunes through nation → supplier/customer. The
    c_nationkey = s_nationkey condition makes it a cyclic join graph —
    the optimizer-ordering stress case."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join, no groupBy —
    the predicate-pushdown benchmark. All three range predicates reach the
    parquet reader (PushedFilters) and only 4 of 11 lineitem columns are
    read (ReadSchema); the global aggregate is a map-side partial + a
    single-row final — at 100 TB this is I/O-bound, exactly as it should
    be."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting, adapted to the driver
    schema's columns): customers ranked by revenue lost to returned line
    items in one quarter. Fact-fact join goes sort-merge with AQE; nation
    broadcasts; both date bounds and the returnflag filter push into the
    scans. Deterministic top-20 via (revenue desc, custkey) tiebreak."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT CAST(CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month — conditional
    aggregation over a fact-dim join (part is unhinted — AQE broadcasts
    it when it fits; the month filter
    pushes into the lineitem scan). Both sums go through exact decimal so
    the final division is the only float op, computed identically by both
    engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(promo, scale=6)
                / dsum(rev, scale=6)
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — a HAVING-filtered aggregate
    over the fact table used as a semi-join filter back onto the same
    3-table join. The qualifying-orderkey set is tiny after the >300
    threshold, so AQE broadcasts it as a left-semi (size-based, no
    forced hint); lineitem is
    scanned twice but both scans prune to 2 columns. Quantity compare and
    output go through exact decimal."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            big.withColumnRenamed("l_orderkey", "bk"),
            F.col("o_orderkey") == F.col("bk"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@query(
    "sql_orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def sql_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders 50% above their customer's own
    average. Written as SQL so Catalyst's decorrelation rewrites it into an
    aggregate + join (no per-row re-execution); comparison (not output) of
    the avg, so float last-ulp drift can't flip rows at these magnitudes."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 1.5 * (
          SELECT AVG(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "evt_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
      SELECT e.user_id, MIN(e.ts) AS v_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.s_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM p) AS n_purchased,
           CAST((SELECT COUNT(*) FROM v) AS DOUBLE)
             / (SELECT COUNT(*) FROM s) AS view_rate,
           CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM v) AS purchase_rate
    """,
)
def evt_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (signup -> later view -> later purchase): how
    many users reach each stage, with per-stage conversion. The strictly-
    ordered "first X after the user's first W" semantics can't be one
    conditional aggregate; it's a chain of per-user MIN aggregations, each
    joined back to events on user_id — all three shuffles share the
    user_id partitioning, so at 100 TB this is one exchange reused (no
    re-shuffle between stages), and every stage's state is one row per
    user. The two conversion ratios are single IEEE divisions, identical
    in both engines."""
    ev = t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_viewed"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchased"))))
    )
    return counts.select(
        "n_signup",
        "n_viewed",
        "n_purchased",
        (F.col("n_viewed").cast("double") / F.col("n_signup")).alias("view_rate"),
        (F.col("n_purchased").cast("double") / F.col("n_viewed")).alias(
            "purchase_rate"
        ),
    )


@query(
    "evt_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          date_trunc('week', e.ts)) // 7 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; each later week of activity counts them as retained at
    that offset. Two shuffles, both on user_id (first-seen aggregate +
    the join back), then a small (weeks x offsets) aggregate — the
    cohort matrix stays tiny no matter the corpus size. Both engines
    truncate weeks to Monday and the offset is exact integer day
    arithmetic, so the oracle hashes bit-identically."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "graph_triangle_count_brand",
    oracle="""
    WITH lp AS (
      SELECT DISTINCT l_orderkey, l_partkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), e AS (
      SELECT DISTINCT a.p_brand AS brand, a.l_partkey AS u, b.l_partkey AS v
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand = b.p_brand
       AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT e1.brand, COUNT(*) AS n_tri
      FROM e e1
      JOIN e e2 ON e2.brand = e1.brand AND e2.u = e1.v
      JOIN e e3 ON e3.brand = e1.brand AND e3.u = e1.u AND e3.v = e2.v
      GROUP BY e1.brand
    ), ep AS (
      SELECT brand, COUNT(*) AS n_edges FROM e GROUP BY brand
    )
    SELECT ep.brand, ep.n_edges,
           COALESCE(tri.n_tri, CAST(0 AS BIGINT)) AS n_triangles
    FROM ep LEFT JOIN tri ON ep.brand = tri.brand
    ORDER BY ep.brand
    """,
)
def graph_triangle_count_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics on a derived co-purchase graph: parts are nodes,
    an edge connects two same-brand parts bought in the same order, and
    the query counts triangles per brand (the clustering signal behind
    "frequently bought together" clique mining). Scale shape: the edge
    list is ORIENTED (u < v) so each triangle is enumerated exactly once,
    and the brand key rides every join, partitioning the graph into 25
    independent subgraphs — candidate 2-paths are Σ_brand deg², not
    global deg². All three triangle joins are composite-key equi shuffle
    joins (never a nested loop); at 100 TB the standard next step is
    orienting by degree instead of id, which bounds per-node fan-out by
    sqrt(edges) — id-orientation is kept here because the oracle must
    enumerate identically."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lp = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "l_partkey", "p_brand")
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
        # Materialize the oriented edge list ONCE: it feeds four plan
        # branches (e1/e2/e3 of the triangle join + the per-brand edge
        # count), and Catalyst plans the aliased self-joins as four
        # SEPARATE subtrees with no exchange reuse — 16 parquet scans and
        # four lineitem⋈part⋈self-join⋈distinct builds per run. One
        # localCheckpoint runs the build exactly once; values are
        # preserved bit-for-bit, and the persisted RDD is swept by
        # release_query_caches after grading.
        .localCheckpoint()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.brand") == F.col("e1.brand"))
            & (F.col("e2.u") == F.col("e1.v")),
        )
        .join(
            e3,
            (F.col("e3.brand") == F.col("e1.brand"))
            & (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .groupBy(F.col("e1.brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    ep = e.groupBy("brand").agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        ep.join(tri, "brand", "left")
        .select(
            "brand",
            "n_edges",
            F.coalesce(F.col("n_tri"), F.lit(0).cast("long")).alias("n_triangles"),
        )
        .orderBy("brand")
    )


_PR_EDGES_SQL = """
      SELECT cn.n_name AS u, sn.n_name AS v, COUNT(*) AS w
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
"""


def _pagerank_oracle(iters: int = 10) -> str:
    """Unrolled fixed-iteration PageRank recurrence (DuckDB recursive CTEs
    cannot aggregate over the recursive term, so each iteration is its own
    CTE — exactly the recurrence operators.graph.pagerank runs)."""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    pr{i} AS (
      SELECT ns.node,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * COALESCE(s.acc, CAST(0 AS DOUBLE))
               AS rank
      FROM nodes ns LEFT JOIN (
        SELECT e.v AS node, SUM(p.rank * e.wn) AS acc
        FROM e JOIN pr{i - 1} p ON p.node = e.u
        GROUP BY e.v
      ) s ON s.node = ns.node
    )""")
    return f"""
    WITH edges AS ({_PR_EDGES_SQL}),
    outw AS (SELECT u, SUM(w) AS wu FROM edges GROUP BY u),
    e AS (
      SELECT edges.u, v,
             CAST(w AS DOUBLE) / CAST(wu AS DOUBLE) AS wn
      FROM edges JOIN outw ON edges.u = outw.u
    ),
    nodes AS (SELECT u AS node FROM edges UNION SELECT v FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
      FROM nodes
    ),{",".join(steps)}
    SELECT node AS nation, round(rank, 6) AS pagerank FROM pr{iters}
    """


@query("graph_pagerank_nation", oracle=_pagerank_oracle())
def graph_pagerank_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (customer
    nation -> supplier nation, weight = lineitem count): which nations
    sit at the center of the supply network — the influence-ranking
    complement to graph_triangle_count_brand's clique mining. Damping
    0.85, FIXED 10 iterations so the oracle unrolls the identical
    recurrence (operators/graph.py pagerank; see its docstring for the
    100 TB shape: per-iteration join+aggregate on the EDGE LIST only,
    localCheckpoint lineage control, one collected integer). The edge
    build itself is the tpch_q7-style join chain (nation aliases hinted
    broadcast; customer/supplier unhinted, AQE-sized); the
    25-node graph here is deliberately small so the oracle is exact —
    the operator's data path is the one that runs at billions of
    edges."""
    from ..operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("u")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("v")
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(edges, damping=0.85, iters=10)
    return ranks.select(
        F.col("node").alias("nation"), F.round("rank", 6).alias("pagerank")
    )


@query(
    "evt_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM c
    ORDER BY from_type, to_type
    """,
)
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate): for each
    user's time-ordered event sequence, count type->next-type transitions
    and row-normalize into P(next | current) — the session-behavior model
    behind next-action prediction and anomaly scoring. One window pass per
    user (ts with event_id tiebreak, so ordering is total and
    cross-engine deterministic), one (from,to) aggregate; the normalizing
    window runs over the 25-row matrix, not the events. The probability is
    a single IEEE division on both engines."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm)).alias("p"),
    ).orderBy("from_type", "to_type")


_SP_EDGES_SQL = """
      SELECT cn.n_name AS u, sn.n_name AS v,
             CAST(MIN(l_extendedprice) AS DOUBLE) AS ew
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
"""


def _shortest_cost_oracle(rounds: int = 4) -> str:
    """Unrolled fixed-round Bellman-Ford (the graph_pagerank_nation
    precedent: DuckDB recursive CTEs cannot aggregate over the recursive
    term, so each relaxation round is its own numbered CTE — literally
    the recurrence operators.graph.shortest_paths runs)."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""
    d{i} AS (
      SELECT COALESCE(d.node, s.node) AS node,
             LEAST(d.dist, s.relax) AS dist
      FROM d{i - 1} d FULL JOIN (
        SELECT e.v AS node, MIN(p.dist + e.ew) AS relax
        FROM e JOIN d{i - 1} p ON p.node = e.u
        GROUP BY e.v
      ) s ON s.node = d.node
    )""")
    return f"""
    WITH e AS ({_SP_EDGES_SQL}),
    d0 AS (
      SELECT n_name AS node, CAST(0 AS DOUBLE) AS dist
      FROM nation WHERE n_name = 'NATION_0'
    ),{",".join(steps)}
    SELECT node AS nation, round(dist, 6) AS min_cost FROM d{rounds}
    """


@query("graph_shortest_cost_nation", oracle=_shortest_cost_oracle())
def graph_shortest_cost_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest paths over the nation trade graph
    (edge cost = cheapest lineitem price ever shipped customer-nation ->
    supplier-nation): the min-cost procurement route from NATION_0 to every
    reachable nation, FIXED 4 relaxation rounds so the oracle unrolls the
    identical Bellman-Ford recurrence (operators/graph.py shortest_paths;
    see its docstring for the 100 TB shape: per-round equi-join + MIN
    aggregate on the EDGE LIST only, sparse reached-set state, nothing
    collected). Cross-engine float parity is EXACT, not rounded-away:
    every distance is built from the same MIN/LEAST/+ sequence over the
    same doubles, so both engines produce bit-identical values and the
    final round(6) is cosmetic. The dense 25-node graph means most
    routes are direct, but cheap hub nations do produce genuine 2-hop
    wins — the relaxation is exercised, not vacuous."""
    from ..operators.graph import shortest_paths

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("u")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("v")
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("u", "v")
        .agg(F.min("l_extendedprice").cast("double").alias("w"))
    )
    sources = nat.filter(F.col("n_name") == "NATION_0").select("n_name")
    dist = shortest_paths(edges, sources, rounds=4)
    return dist.select(
        F.col("node").alias("nation"), F.round("dist", 6).alias("min_cost")
    )


@query(
    "evt_anomaly_daily_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS c,
             CAST(SUM(n_events) AS DOUBLE) AS s1,
             CAST(SUM(n_events * n_events) AS DOUBLE) AS s2
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.n_events,
           CASE WHEN c > 1 AND (s2 - s1 * s1 / c) / (c - 1) > 0
                THEN round((CAST(d.n_events AS DOUBLE) - s1 / c)
                           / sqrt((s2 - s1 * s1 / c) / (c - 1)), 6)
           END AS z_score
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    ORDER BY d.event_type, d.day
    """,
)
def evt_anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly score: per event type, each day's event count
    as a z-score against that type's own daily distribution — the
    drift/incident monitor a training-data ingest pipeline runs on every
    source. Two map-side-combinable aggregates (per-day counts, then
    per-type count/sum/sum-of-squares) and a 8-row broadcast back onto
    the daily table; nothing here grows with corpus size except the
    linear first pass. Float parity is exact-by-construction rather than
    tolerance-based: the moments are integer sums (exact in both
    engines' wide-int accumulators) cast to double once, and mean /
    variance / z are then the SAME literal IEEE expression on both
    sides — no Welford merge-order drift to round away (that is why this
    avoids stddev_samp, which agg_stats_moments already grades). Types
    with a single day or zero variance get NULL z (a double NULL —
    driver-safe), never a divide-by-zero: Spark yields NULL on /0 where
    DuckDB errors, so the guard pins one semantics."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum("n_events").cast("double").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("s2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("c")) / (
        F.col("c") - 1
    )
    z = F.when(
        (F.col("c") > 1) & (var > 0),
        F.round(
            (F.col("n_events").cast("double") - F.col("s1") / F.col("c"))
            / F.sqrt(var),
            6,
        ),
    )
    return j.select(
        "event_type", "day", "n_events", z.alias("z_score")
    ).orderBy("event_type", "day")


@query(
    "evt_ewma_daily_smoothing",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, n_events,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ), wt AS (
      SELECT event_type, day, n_events, i,
             CAST(n_events AS DOUBLE)
               * (CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(0.5 AS DOUBLE) END)
               * power(CAST(2.0 AS DOUBLE), i) AS w
      FROM idx
    )
    SELECT event_type, day, n_events,
           round(power(CAST(0.5 AS DOUBLE), i)
                 * SUM(w) OVER (PARTITION BY event_type ORDER BY i), 6)
             AS ewma
    FROM wt ORDER BY event_type, day
    """,
)
def evt_ewma_daily_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing of daily event volume per type (alpha = 0.5,
    seeded at the first day's count) — the trend line behind
    evt_anomaly_daily_zscore's point scores, and the standard load
    forecaster for an ingest pipeline. The recurrence
    s_t = a*x_t + (1-a)*s_{t-1} is linear, so it unrolls to the closed
    form s_t = (1-a)^t * cumsum(x_i * a_i / (1-a)^i) (a_1 = 1) — one
    ordered running SUM per event_type instead of a per-row loop: a
    single shuffle on the partition key, sequential within partitions,
    the same plan at any scale. Both engines evaluate the identical
    IEEE expression and accumulate the running sum in the same row
    order, so agreement is bit-level and round(6) is cosmetic. The
    2^i weights stay finite to i ~ 1000 days per type (double max
    2^1023); beyond that, chunk the series or rebase the exponent —
    noted here because it is the one genuine overflow cliff of the
    closed form."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w_idx = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w_idx))
    wt = idx.withColumn(
        "w",
        F.col("n_events").cast("double")
        * F.when(F.col("i") == 1, F.lit(1.0)).otherwise(F.lit(0.5))
        * F.pow(F.lit(2.0), F.col("i")),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wt.select(
        "event_type",
        "day",
        "n_events",
        F.round(
            F.pow(F.lit(0.5), F.col("i")) * F.sum("w").over(w_run), 6
        ).alias("ewma"),
    ).orderBy("event_type", "day")
