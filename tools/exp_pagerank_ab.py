#!/usr/bin/env python
"""In-process A/B of pagerank edge-materialization strategies.

Alternates variants in one session so JVM/session startup and box drift
cancel; reports per-rep times and medians.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from crane_stream_processing_spark.catalog import load_table
from crane_stream_processing_spark.inventory import release_query_caches
from crane_stream_processing_spark.session import get_spark


def pagerank_impl(edges: DataFrame, checkpoint_edges: bool, damping=0.85, iters=10):
    e = edges.select(
        F.col("u").alias("eu"), F.col("v").alias("ev"),
        F.col("w").cast("double").alias("ew"),
    )
    if checkpoint_edges:
        e = e.localCheckpoint()
    outw = e.groupBy("eu").agg(F.sum("ew").alias("wu"))
    norm = (
        e.join(outw, "eu")
        .select("eu", "ev", (F.col("ew") / F.col("wu")).alias("wn"))
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("eu").alias("node"))
        .union(e.select(F.col("ev")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        contrib = (
            norm.join(ranks, norm.eu == ranks.node)
            .groupBy("ev")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("acc"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.ev, "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))).alias("rank"),
        )
        if i % 3 == 2 and i != iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_pagerank_ab")

    def t(name):
        return load_table(spark, sf_dir, name)

    def edges_df():
        li = t("lineitem").select("l_orderkey", "l_suppkey")
        orders = t("orders").select("o_orderkey", "o_custkey")
        cust = t("customer").select("c_custkey", "c_nationkey")
        supp = t("supplier").select("s_suppkey", "s_nationkey")
        nat = t("nation").select("n_nationkey", "n_name")
        cn = nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("u"))
        sn = nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("v"))
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, F.col("o_custkey") == cust.c_custkey)
            .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("w"))
        )

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(edges_df())  # warm-up
    release_query_caches(spark)

    times = {"before": [], "after": []}
    for rep in range(5):
        for name, ck in (("before", False), ("after", True)):
            t0 = time.perf_counter()
            r = pagerank_impl(edges_df(), checkpoint_edges=ck)
            force(r.select("node", F.round("rank", 6).alias("pagerank")))
            times[name].append(time.perf_counter() - t0)
            release_query_caches(spark)
            print(f"rep{rep} {name}: {times[name][-1]:.3f}", flush=True)
    for k, v in times.items():
        print(k, "median", round(statistics.median(v), 3), [round(x, 2) for x in v])
    spark.stop()


if __name__ == "__main__":
    main()
