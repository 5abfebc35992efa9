#!/usr/bin/env python
"""In-process A/B for sql_recursive_order_chain's per-step job cost.

Spark 4.1's UnionLoopExec runs, per recursion step: a no-arg round-robin
``repartition()`` of the step output, a ``toRdd.count()`` job (the
convergence probe), and — when the step's row count is at or under
``spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation`` — a
``collect()`` job that turns the next frontier into a LocalRelation
(decompiled from the installed spark-sql 4.1.2 jar; the conf is the
public SQLConf entry). The knobs under test:

- lr: raise the LocalRelation conversion limit so every frontier at
  bench SF converts — the next step then joins a LocalRelation (accurate
  size stats -> broadcast) against the cached edge list instead of
  shuffling both sides.
- parts: the clone session's shuffle.partitions (the per-step
  repartition() width and the count/collect task counts).

Variants alternate inside one session (min-of-N, job/task counts from
the status tracker) so box drift cancels. Usage:
    python tools/exp_recursive_cte.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crane_stream_processing_spark.catalog import load_table  # noqa: E402
from crane_stream_processing_spark.inventory import (  # noqa: E402
    register_query_cache,
    release_query_caches,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SQL = """
WITH RECURSIVE chain(root_key, o_orderkey, depth) AS (
  SELECT o_orderkey, o_orderkey, 1 FROM order_chain_edges WHERE rk = 1
  UNION ALL
  SELECT c.root_key, n.next_key, c.depth + 1
  FROM chain c JOIN order_chain_edges n ON n.o_orderkey = c.o_orderkey
  WHERE n.next_key IS NOT NULL
)
SELECT root_key, o_orderkey, depth FROM chain
"""


def run_variant(spark, lr_limit: int | None, parts: int, aqe: bool = True) -> dict:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rec_parts = max(
        load_table(spark, SF_DIR, "orders").rdd.getNumPartitions(),
        min(parts, spark.sparkContext.defaultParallelism),
    )
    rec = spark.newSession()
    edges = register_query_cache(
        load_table(rec, SF_DIR, "orders")
        .select(
            "o_orderkey",
            F.lead("o_orderkey").over(w).alias("next_key"),
            F.row_number().over(w).alias("rk"),
        )
        .repartition(rec_parts, "o_orderkey")
        .cache()
    )
    edges.count()
    rec.conf.set("spark.sql.shuffle.partitions", str(rec_parts))
    rec.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    if lr_limit is not None:
        rec.conf.set(
            "spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation",
            str(lr_limit),
        )
    edges.createOrReplaceTempView("order_chain_edges")
    df = rec.sql(SQL)
    grp = f"exp-{time.monotonic_ns()}"
    sc = spark.sparkContext
    sc.setJobGroup(grp, "recursion")
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    sec = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(grp)
    n_tasks = 0
    for jid in job_ids:
        ji = tracker.getJobInfo(jid)
        if ji:
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si:
                    n_tasks += si.numTasks
    return {"sec": sec, "jobs": len(job_ids), "tasks": n_tasks}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("exp_recursive_cte")
    # warm-up
    from crane_stream_processing_spark.inventory import REGISTRY

    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

    variants = {
        "noaqe_p8": dict(lr_limit=None, parts=8, aqe=False),
        "noaqe_p4": dict(lr_limit=None, parts=4, aqe=False),
        "noaqe_p2": dict(lr_limit=None, parts=2, aqe=False),
        "noaqe_p1": dict(lr_limit=None, parts=1, aqe=False),
        "cur_p8": dict(lr_limit=None, parts=8),
    }
    try:
        default_lr = spark.conf.get(
            "spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation"
        )
    except Exception:
        default_lr = "?"
    print(f"default localRelationLimit = {default_lr}")
    results: dict[str, list] = {k: [] for k in variants}
    for rep in range(reps):
        for name, kw in variants.items():
            r = run_variant(spark, **kw)
            release_query_caches(spark)
            results[name].append(r)
            print(
                f"rep{rep} {name:8s} {r['sec']:7.3f}s  jobs={r['jobs']:3d}"
                f" tasks={r['tasks']:4d}",
                flush=True,
            )
    print("\nmins:")
    for name, rs in results.items():
        best = min(r["sec"] for r in rs)
        jobs = min(r["jobs"] for r in rs)
        tasks = min(r["tasks"] for r in rs)
        print(f"{name:8s} min={best:7.3f}s jobs={jobs} tasks={tasks}")
    spark.stop()


if __name__ == "__main__":
    main()
