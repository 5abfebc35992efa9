#!/usr/bin/env python
"""Break down the per-drain cost of the streaming family (guide §1).

Runs representative availableNow drains and prints each micro-batch's
``durationMs`` phases from the StreamingQuery progress events
(triggerExecution = total; addBatch = plan execution; the rest —
latestOffset / getBatch / queryPlanning / walCommit / commitOffsets —
is micro-batch machinery), plus the wall clock around start()/stop().

Usage: python tools/exp_stream_floor.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crane_stream_processing_spark.inventory import (  # noqa: E402
    dsum,
    release_query_caches,
)
from crane_stream_processing_spark.inventory.streaming_queries import (  # noqa: E402
    _scoped_stream_partitions,
    _stream_events,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def drain(spark, df, name: str, mode: str, ckpt: str | None = None) -> dict:
    with _scoped_stream_partitions(spark):
        t0 = time.perf_counter()
        w = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
        )
        if ckpt:
            import tempfile
            import uuid

            w = w.option(
                "checkpointLocation", os.path.join(ckpt, uuid.uuid4().hex)
            )
        q = w.start()
        t_started = time.perf_counter() - t0
        q.awaitTermination()
        t_total = time.perf_counter() - t0
        progress = [json.loads(p.json) for p in q.recentProgress]
    spark.catalog.dropTempView(name)
    spark.streams.resetTerminated()
    batches = []
    for p in progress:
        d = p.get("durationMs", {})
        batches.append(
            {
                "batchId": p.get("batchId"),
                "rows": p.get("numInputRows"),
                "trigger": d.get("triggerExecution"),
                "addBatch": d.get("addBatch"),
                "getBatch": d.get("getBatch"),
                "latestOffset": d.get("latestOffset"),
                "queryPlanning": d.get("queryPlanning"),
                "walCommit": d.get("walCommit"),
                "commitOffsets": d.get("commitOffsets"),
            }
        )
    return {"start_sec": t_started, "total_sec": t_total, "batches": batches}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("exp_stream_floor")
    # warm the planner/codegen like bench
    from crane_stream_processing_spark.inventory import REGISTRY

    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

    def tumbling():
        ev = _stream_events(spark, SF_DIR)
        return (
            ev.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("tv"))
        ), "complete"

    def dedup():
        ev = _stream_events(spark, SF_DIR)
        return (
            ev.withColumn("day", F.to_date("ts").cast("string"))
            .withWatermark("ts", "1 day")
            .dropDuplicates(["user_id", "day"])
            .select("user_id", "day")
        ), "append"

    def plain_count():
        ev = _stream_events(spark, SF_DIR)
        return (
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        ), "complete"

    suites = {"tumbling": tumbling, "dedup_day": dedup, "plain_count": plain_count}
    ckpts = {"tmpdisk": None, "shm": "/dev/shm/crane_exp_ck"}
    os.makedirs("/dev/shm/crane_exp_ck", exist_ok=True)
    for rep in range(reps):
        for ckname, ck in ckpts.items():
            for name, build in suites.items():
                df, mode = build()
                r = drain(spark, df, f"exp_{name}", mode, ckpt=ck)
                release_query_caches(spark)
                print(
                    f"rep{rep} {ckname:8s} {name:12s} total={r['total_sec']:6.3f}s "
                    f"start={r['start_sec']:6.3f}s",
                    flush=True,
                )
                for b in r["batches"]:
                    print(f"          batch={b}")
    import shutil

    shutil.rmtree("/dev/shm/crane_exp_ck", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
