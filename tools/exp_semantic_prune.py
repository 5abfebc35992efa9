#!/usr/bin/env python
"""Interleaved A/B for dedup_semantic_prune's staging (round-10 verdict
item #5: the query drifted 1.43 s (r9) → 1.85 s (r11 baseline) with no
fixture excuse). Variants of operators/dedup.semantic_prune's
soft-assignment staging, run over the REAL graded query shape (trained
k=8 model computed once outside the timers; certificate probes
included):

- r9:    no materialization (the assignment pass plans once per
         self-join leg)
- r10:   post-explode EAGER localCheckpoint (what shipped in round 10)
- preex: pre-explode LAZY localCheckpoint (the compact per-row cells
         array materializes once — k dots per row — and each leg
         explodes from it; ADVICE.md's eager=False note)

Usage: python tools/exp_semantic_prune.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crane_stream_processing_spark.functions import dot, l2norm  # noqa: E402
from crane_stream_processing_spark.inventory import (  # noqa: E402
    REGISTRY,
    release_query_caches,
    t_cpu,
)
from crane_stream_processing_spark.operators import similarity as S  # noqa: E402
from crane_stream_processing_spark.operators.similarity import (  # noqa: E402
    centroid_dots,
    probe_cells,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def prune_variant(emb: DataFrame, centroids, variant: str) -> DataFrame:
    cells = probe_cells(centroid_dots(F.col("embedding"), centroids), 2)
    if variant == "preex":
        assigned = (
            emb.select(
                F.col("vec_id"),
                F.col("embedding"),
                cells.alias("__cells"),
                l2norm("embedding").alias("nrm"),
            )
            .filter(F.col("nrm") > 0)
            .localCheckpoint(eager=False)
        )
        e = assigned.select(
            "vec_id", "embedding", F.explode("__cells").alias("cell"), "nrm"
        )
    else:
        e = emb.select(
            F.col("vec_id"),
            F.col("embedding"),
            F.explode(cells).alias("cell"),
            l2norm("embedding").alias("nrm"),
        ).filter(F.col("nrm") > 0)
        if variant == "r10":
            e = e.localCheckpoint()
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 6) >= 0.4
        )
        .select(F.col("id_b").alias("pruned"))
        .distinct()
    )


def full_query(spark, emb, centroids, variant: str) -> DataFrame:
    sem = (
        prune_variant(emb, centroids, variant)
        .filter(F.col("pruned") < 200)
        .withColumn("__sem", F.lit(1))
    )
    window = emb.filter(F.col("vec_id") < 200)
    ex = (
        S.cosine_near_pairs(
            window, "vec_id", "embedding", threshold=0.4, probe_max_id=200
        )
        .select(F.col("id_b").alias("pruned"))
        .distinct()
        .withColumn("__ex", F.lit(1))
    )
    n_window = window.agg(F.count(F.lit(1)).alias("n_window"))
    return (
        ex.join(sem, "pruned", "full")
        .agg(
            F.count("__ex").alias("n_exact_pruned"),
            F.count("__sem").alias("n_sem_window"),
            F.sum(
                (F.col("__ex").isNotNull() & F.col("__sem").isNotNull())
                .cast("long")
            ).alias("n_both"),
        )
        .crossJoin(F.broadcast(n_window))
        .select(
            "n_exact_pruned",
            (F.col("n_sem_window") <= F.col("n_exact_pruned")).alias(
                "subset_ok"
            ),
            (2 * F.col("n_both") >= F.col("n_exact_pruned")).alias(
                "recall_ok"
            ),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("exp_semantic_prune")
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

    def _ident(it):
        yield from it

    spark.range(0, 64, 1, 64).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    emb = t_cpu(spark, SF_DIR, "embeddings")
    t0 = time.perf_counter()
    centroids = S.kmeans_fit(emb, k=8, iters=2)
    print(f"kmeans_fit(k=8, iters=2): {time.perf_counter() - t0:.3f}s")
    release_query_caches(spark)

    variants = ["r9", "r10", "preex"]
    results = {v: [] for v in variants}
    for rep in range(reps):
        for v in variants:
            t0 = time.perf_counter()
            full_query(spark, emb, centroids, v).write.mode(
                "overwrite"
            ).format("noop").save()
            sec = time.perf_counter() - t0
            release_query_caches(spark)
            results[v].append(sec)
            print(f"rep{rep} {v:6s} {sec:7.3f}s", flush=True)
    print("\nmins: " + "  ".join(
        f"{v}={min(rs):.3f}" for v, rs in results.items()
    ))
    # value-equality probe across variants (distinct pruned sets)
    base = prune_variant(emb, centroids, "r9")
    for v in ("r10", "preex"):
        other = prune_variant(emb, centroids, v)
        d = base.exceptAll(other).count() + other.exceptAll(base).count()
        print(f"row-diff r9 vs {v}: {d}")
        release_query_caches(spark)
    spark.stop()


if __name__ == "__main__":
    main()
