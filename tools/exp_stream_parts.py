#!/usr/bin/env python
"""Interleaved A/B of SPARK_GRAFT_STREAM_PARTITIONS over real registry
streaming queries (round-10 verdict item #3: "narrow state-store
partitions per query — the scoped-conf machinery already exists").
The env knob is read at each drain, so variants alternate in-process.

Usage: python tools/exp_stream_parts.py [reps] [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_stream_processing_spark.inventory import (  # noqa: E402
    REGISTRY,
    fixture_seconds,
    release_query_caches,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "stream_tumbling_daily_by_type",
    "stream_session_windows_30m",
    "stream_stream_join_error_purchase",
    "stream_stream_left_join_error_purchase",
    "stream_dedup_user_day",
    "stream_rocksdb_dedup_user_type",
    "stream_append_daily_by_type",
    "stream_curate_pipeline",
    "stream_dedup_minhash",
    "stream_ivfpq_ingest",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3
    names = [a for a in sys.argv[2:]] or QUERIES
    spark = get_spark("exp_stream_parts")
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode(
        "overwrite"
    ).format("noop").save()

    def _ident(it):
        yield from it

    spark.range(0, 64, 1, 64).mapInPandas(_ident, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    release_query_caches(spark)

    variants = ["4", "2", "1"]
    totals: dict[str, dict[str, float]] = {v: {} for v in variants}
    for rep in range(reps):
        for v in variants:
            os.environ["SPARK_GRAFT_STREAM_PARTITIONS"] = v
            for name in names:
                f0 = fixture_seconds()
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, SF_DIR).write.mode(
                    "overwrite"
                ).format("noop").save()
                op = max(
                    time.perf_counter() - t0 - (fixture_seconds() - f0), 0.0
                )
                release_query_caches(spark)
                cur = totals[v].get(name)
                totals[v][name] = op if cur is None else min(cur, op)
            print(
                f"rep{rep} parts={v}: "
                + f"{sum(totals[v].values()):7.3f}s (running mins)",
                flush=True,
            )
    print("\nper-query mins:")
    for name in names:
        row = "  ".join(f"p{v}={totals[v][name]:6.3f}" for v in variants)
        print(f"{name:42s} {row}")
    print("\ntotals: " + "  ".join(
        f"p{v}={sum(totals[v].values()):.3f}" for v in variants
    ))
    spark.stop()


if __name__ == "__main__":
    main()
