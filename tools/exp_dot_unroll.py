#!/usr/bin/env python
"""A/B: interpreted index-fold dot vs unrolled fixed-width dot.

Times the sf0.1 all-pairs cosine workload (the cosine_near_pairs probe
shape: 200 probe x 2000 corpus = 400k cosines) and checks BIT equality
of every rounded cosine between the two forms.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crane_stream_processing_spark.functions import dot as dot_fold
from crane_stream_processing_spark.session import get_spark


def dot_unrolled(a, b, dim: int):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return acc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp_dot_unroll")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    ).filter(F.col("id_a") < 200)
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = F.broadcast(a).join(b, F.col("id_a") < F.col("id_b"))

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def cos(dfn):
        return F.round(
            dfn / (
                F.sqrt(dot_fold("va", "va")) * F.sqrt(dot_fold("vb", "vb"))
            ), 6,
        )

    plans = {
        "fold": pairs.select("id_a", "id_b", F.round(
            dot_fold("va", "vb") / (F.sqrt(dot_fold("va", "va")) * F.sqrt(dot_fold("vb", "vb"))), 6
        ).alias("c")),
        "unroll": pairs.select("id_a", "id_b", F.round(
            dot_unrolled(F.col("va"), F.col("vb"), 64)
            / (F.sqrt(dot_unrolled(F.col("va"), F.col("va"), 64))
               * F.sqrt(dot_unrolled(F.col("vb"), F.col("vb"), 64))), 6
        ).alias("c")),
        "guarded": pairs.select("id_a", "id_b", F.round(
            F.when(F.size("va") == 64,
                   dot_unrolled(F.col("va"), F.col("vb"), 64))
            .otherwise(dot_fold("va", "vb"))
            / (F.sqrt(F.when(F.size("va") == 64,
                             dot_unrolled(F.col("va"), F.col("va"), 64))
                      .otherwise(dot_fold("va", "va")))
               * F.sqrt(F.when(F.size("vb") == 64,
                               dot_unrolled(F.col("vb"), F.col("vb"), 64))
                        .otherwise(dot_fold("vb", "vb")))), 6
        ).alias("c")),
    }
    for name, df in plans.items():
        for r in range(3):
            t0 = time.perf_counter()
            force(df)
            print(f"{name} run{r}: {time.perf_counter()-t0:6.3f}s", flush=True)

    # bit equality of all three
    f = plans["fold"].withColumnRenamed("c", "cf")
    u = plans["unroll"].withColumnRenamed("c", "cu")
    g = plans["guarded"].withColumnRenamed("c", "cg")
    j = f.join(u, ["id_a", "id_b"]).join(g, ["id_a", "id_b"])
    bad = j.filter(
        (F.col("cf") != F.col("cu")) | (F.col("cf") != F.col("cg"))
        | F.col("cf").isNull() != F.col("cu").isNull()
    ).count()
    n = j.count()
    print(f"pairs={n} mismatches={bad}")
    spark.stop()


if __name__ == "__main__":
    main()
