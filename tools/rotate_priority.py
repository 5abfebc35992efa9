#!/usr/bin/env python
"""Plan the next round's GRADE_PRIORITY rotation.

The external driver hash-grades only the FIRST 50 registry entries each
round (verified round 1: graded set == first-50). This tool reads every
CORRECTNESS_r*.json in the repo root, unions the names that already have a
hash-graded row, and prints the 50 highest-priority still-ungraded queries
in registry order — ready to paste into ``GRADE_PRIORITY`` in
``crane_stream_processing_spark/inventory/__init__.py``. Queries that
FAILED at the driver (hash_match false or err) are re-queued FIRST so the
fix is proven in the next window.

Pure planning tool: no Spark session, prints only.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_stream_processing_spark.inventory import REGISTRY  # noqa: E402

WINDOW = 50


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # latest verdict wins per name: files process in round order, so a
    # round-N+1 regression re-queues a query that passed in round N (and
    # vice versa); names no longer in REGISTRY are dropped entirely.
    verdict: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if name not in REGISTRY:
                continue
            verdict[name] = (
                isinstance(row, dict)
                and row.get("hash_match") is True
                and not row.get("err")
            )
    graded = {n for n, ok in verdict.items() if ok}
    failed = [n for n in REGISTRY if verdict.get(n) is False]

    ungraded = [n for n in REGISTRY if n not in graded and n not in failed]
    plan = (failed + ungraded)[:WINDOW]
    pad = [n for n in REGISTRY if n in graded and n not in plan]
    plan += pad[: WINDOW - len(plan)]  # everything graded: re-verify oldest

    print(f"# graded so far: {len(graded)}/{len(REGISTRY)}; "
          f"driver failures to re-prove: {failed or 'none'}")
    print("GRADE_PRIORITY: list[str] = [")
    for n in plan:
        print(f'    "{n}",')
    print("]")
    remaining = len([n for n in REGISTRY if n not in graded]) - len(
        [n for n in plan if n not in graded]
    )
    print(f"# still ungraded after next round: {max(0, remaining)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
