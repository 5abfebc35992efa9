#!/usr/bin/env python
"""Replication-scaled throughput probe: rebuild each base table at N× its
sf0.1 volume by cross-joining with a copy index (keys shifted per copy so
join/group cardinality scales realistically — a genuine N× shuffle, not N
repeats of the same keys), then time representative operator shapes warm.

This is the evidence artifact behind DESIGN.md's "Replication-scaled spot
check": the registry's small-SF bench proves correctness-at-speed, this
probe proves the SHAPES stay sub-linear when the data actually grows —
the local stand-in for the 100 TB question. Run from the repo root:

    python tools/scale_probe.py [N ...]      # default: 10 100

Prints one JSON line: {"scales": {"10": {shape: sec, ...}, ...},
"base": {shape: sec at 1x, ...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crane_stream_processing_spark.catalog import load_table  # noqa: E402
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_SHIFT = 1_000_000_000  # beyond any real key at bench scale


def replicate(df: DataFrame, n: int, shift_cols: list[str]) -> DataFrame:
    """N key-shifted copies: copy i adds i*KEY_SHIFT to every key in
    ``shift_cols``, so the result has N× the rows AND N× the distinct
    keys — groupBy/join/window work scales with data, not just row
    count. The crossJoin side is a 1-row-per-copy range (broadcast)."""
    if n == 1:
        return df
    copies = F.broadcast(
        df.sparkSession.range(n).select(F.col("id").alias("__copy"))
    )
    out = df.crossJoin(copies)
    for c in shift_cols:
        out = out.withColumn(c, F.col(c) + F.col("__copy") * KEY_SHIFT)
    return out.drop("__copy")


def force(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def shapes(spark, n: int) -> dict:
    from crane_stream_processing_spark.operators import dedup as D
    from crane_stream_processing_spark.operators import similarity as S

    li = replicate(
        load_table(spark, SF_DIR, "lineitem"), n, ["l_orderkey"]
    )
    orders = replicate(
        load_table(spark, SF_DIR, "orders"), n, ["o_orderkey", "o_custkey"]
    )
    docs = replicate(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
        n,
        ["doc_id"],
    )
    emb = replicate(
        load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding"),
        n,
        ["vec_id"],
    )
    # 256 data-independent centroid directions — far above LITERAL_K_MAX,
    # so the coarse assignment runs through the broadcast matrix relation
    # (the round-5 large-k shape; plan stays O(1) in k).
    cents256 = S.hyperplanes(256, 64, seed="crane-probe-ivf")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return {
        "scan_hash_agg_q1": lambda: force(
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sq"),
                F.sum("l_extendedprice").alias("sp"),
                F.avg("l_discount").alias("ad"),
                F.count(F.lit(1)).alias("n"),
            )
        ),
        "window_running_sum": lambda: force(
            orders.select(
                "o_custkey",
                "o_orderdate",
                F.sum("o_totalprice").over(w).alias("running"),
            )
        ),
        "fact_fact_join_agg": lambda: force(
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s"))
        ),
        # Round-5 shapes: the minhash-LSH banding stage (row-local array
        # pipeline + linear band-bucket count — the dedup scale path) and
        # the RELATIONAL large-k IVF coarse assignment (k=256 via the
        # 1-row broadcast centroid matrix).
        "lsh_band_bucket_count": lambda: force(
            D.lsh_bands(docs, "doc_id", "text")
            .groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
        "ivf_rel_coarse_assign_k256": lambda: force(
            S.ivf_bucket_corpus(emb, cents256)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
    }


def time_shapes(spark, n: int) -> dict:
    out = {}
    for name, fn in shapes(spark, n).items():
        fn()  # warm: JIT/codegen/scan cache
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("scale_probe")
    result = {"base": time_shapes(spark, 1), "scales": {}}
    for n in ns:
        result["scales"][str(n)] = time_shapes(spark, n)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
