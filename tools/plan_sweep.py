#!/usr/bin/env python
"""Registry-wide physical-plan sweep (the round-10 coverage method,
re-run for round 11): for every registry query, count per-source parquet
scans, Exchange / ReusedExchange nodes, join strategies, and Python-eval
nodes from ``explain("formatted")``. Prints one JSON line per query plus
a summary of multi-scan plans — the triage input for guide §2.4 work.

Usage: python tools/plan_sweep.py [--json-out plans/r11/plan_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_stream_processing_spark.inventory import (  # noqa: E402
    REGISTRY,
    release_query_caches,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    spark = get_spark("plan_sweep")
    out: dict[str, dict] = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            release_query_caches(spark)
            continue
        release_query_caches(spark)
        scans: dict[str, int] = {}
        for m in re.finditer(r"Scan parquet[^\n]*\[([^\]]*)\]|Location.*?/([a-zA-Z0-9_.]+\.parquet)", plan):
            src = m.group(2) or "parquet"
            scans[src] = scans.get(src, 0) + 1
        n_scan = plan.count("Scan parquet")
        out[name] = {
            "scan_parquet": n_scan,
            "scan_rdd": plan.count("Scan ExistingRDD"),
            "exchange": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchange": plan.count("ReusedExchange"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "python": plan.count("EvalPython") + plan.count("MapInPandas")
            + plan.count("ArrowEvalPython"),
            "per_source": scans,
        }
    print(json.dumps(out)[:200] + "...")
    multi = {
        n: d for n, d in out.items()
        if not d.get("error") and any(v > 1 for v in d.get("per_source", {}).values())
    }
    print(f"\n{len(multi)} queries with >1 scan of one source:")
    for n, d in sorted(multi.items()):
        print(f"  {n:45s} {d['per_source']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    errs = {n for n, d in out.items() if d.get("error")}
    print(f"\nerrors: {sorted(errs) if errs else 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
