#!/usr/bin/env python
"""Round-10 optimization measurement harness.

Times a named subset of registry queries with the noop sink (guide §1.4)
under the same session config as bench.py, labeling each job (guide
§1.5), and optionally dumps ``explain("formatted")`` to
``plans/r10/<query>_<tag>.txt`` (the judge-checkable plan evidence).

Usage:
    python tools/opt_measure.py [--plans TAG] [--runs N] q1 q2 ...
    python tools/opt_measure.py --top 20            # 20 slowest from BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import json
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

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("CRANE_PLANS_ROUND", "r11")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="add the N slowest queries from BENCH_DETAIL.json")
    ap.add_argument("--runs", type=int, default=2,
                    help="timed runs per query (min is reported)")
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') as plans/r10/<q>_<TAG>.txt")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        detail = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(PLANS_DIR)), "BENCH_DETAIL.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        for n, _ in ranked[: args.top]:
            if n not in names:
                names.append(n)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt_measure")

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    # Warm-up mirrors bench.py: flagship plan + Python worker pool.
    force(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))

    def _ident(it):
        yield from it

    force(spark.range(0, 64, 1, 64).mapInPandas(_ident, "id long"))
    release_query_caches(spark)

    if args.plans:
        os.makedirs(PLANS_DIR, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_measure:{name}")
            f0 = fixture_seconds()
            t0 = time.perf_counter()
            force(REGISTRY[name].fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            op = max(wall - (fixture_seconds() - f0), 0.0)
            best = op if best is None else min(best, op)
            release_query_caches(spark)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 4)
        print(f"{best:8.3f}  {name}", flush=True)
        if args.plans:
            df = REGISTRY[name].fn(spark, sf_dir)
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_query_caches(spark)

    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
