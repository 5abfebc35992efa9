#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Imports ``__spark_entry__`` (the public contract, not package internals),
smoke-checks ``entry(spark)``, then runs every ``queries()[name]`` at
sf0.01 and compares against ``oracle_sql()[name]`` through DuckDB with the
driver's normalization (columns sorted by name, order-insensitive rows,
floats to 9 significant digits). Exit code 1 on any mismatch.
"""

from __future__ import annotations

import glob
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from crane_stream_processing_spark.inventory import (  # noqa: E402
    release_query_caches,
)
from crane_stream_processing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            val = float(f"{v:.9g}")
            return 0.0 if val == 0.0 else val  # canonicalize -0.0 (repr
            # differs, sorts differently, and would false-MISMATCH rows
            # whose order hinges on a signed-zero cell)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(map(c, v))
        return v

    return sorted(cols), sorted([tuple(c(r[i]) for i in order) for r in rows], key=repr)


_KIND = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "int128", "UHUGEINT": "int128",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
}


def _duck_kind(t: str) -> str:
    # before DECIMAL: DECIMAL(2,1)[] is an array. endswith("]") catches
    # both LIST ("DOUBLE[]") and fixed-size ARRAY ("DOUBLE[3]") — both
    # fetch as list cells and crash the driver's pandas sort_values.
    if t.endswith("]"):
        return "array"
    if t.startswith("DECIMAL"):
        return "decimal"
    return _KIND.get(t, t.lower())


def _spark_kind(t: str) -> str:
    base = t.split("(")[0]
    return {
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float", "string": "str",
        "boolean": "bool", "date": "date", "timestamp": "ts",
        "timestamp_ntz": "ts", "decimal": "decimal",
    }.get(base, "array" if base.startswith("array") else base)


def type_audit(con, spark_dtypes, sql: str) -> tuple[list[str], dict[str, str]]:
    """The driver fetches DuckDB results through pandas, where HUGEINT
    (any uncast integer SUM) and int-vs-float divergence become float64 and
    hash-mismatch against Spark even though fetchall()-based value compare
    passes (Python 5 == 5.0). Catch both classes statically: DESCRIBE the
    oracle and require kind-compatible output types per column. Returns
    (errors, column->kind) so the caller's NULL audit reuses one DESCRIBE."""
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    duck = {row[0]: _duck_kind(row[1]) for row in desc}
    spark = {c: _spark_kind(t) for c, t in spark_dtypes}
    errs = [f"oracle col {c!r} is {k} (driver's pandas fetch degrades it)"
            for c, k in duck.items() if k == "int128"]
    # LIST/ARRAY outputs crash the driver's pandas canonicalizer
    # (sort_values -> factorize -> "unhashable type: 'list'" — the exact
    # round-2 sim_random_projection failure; this norm()'s tuple-convert
    # hid it). Ban array-typed graded output columns on EITHER side.
    errs += [f"col {c!r} is array-typed on the {side} side (driver's "
             "pandas sort_values crashes on list cells — posexplode or "
             "emit scalar columns)"
             for side, m in (("oracle", duck), ("spark", spark))
             for c, k in m.items() if k == "array" or k.startswith("map")
             or k.startswith("struct")]
    # Raw timestamp outputs are fetch-unproven at the driver (session-tz
    # LTZ collect vs DuckDB naive/tz-aware pandas drift); every proven
    # window/event query formats bounds via date_format/strftime strings.
    # DATE stayed allowed: r01 drove date outputs green.
    errs += [f"col {c!r} is a raw timestamp on the {side} side "
             "(date_format/strftime it to a string)"
             for side, m in (("oracle", duck), ("spark", spark))
             for c, k in m.items() if k == "ts"]
    for c in set(duck) & set(spark):
        if {duck[c], spark[c]} == {"int", "float"}:
            errs.append(f"col {c!r} kind mismatch spark={spark[c]} duck={duck[c]}")
    return errs, duck


def pandas_canon_smoke(rows, cols) -> str | None:
    """Run the driver's exact canonicalization shape — a pandas DataFrame
    sort_values over ALL columns — purely to detect crash-shapes. The
    round-2 failure died INSIDE this step (factorize -> "unhashable type:
    'list'") before any value compare, so the static type audit is backed
    by structurally executing the same code path on both result sets.
    Returns an error string, or None if canonicalization succeeds."""
    import pandas as pd

    try:
        pd.DataFrame(rows, columns=cols).sort_values(by=sorted(cols))
    except Exception as e:  # noqa: BLE001 — any crash = driver crash
        return f"pandas canonicalization fails: {type(e).__name__}: {e}"
    return None


def main() -> int:
    # Optional argv: query-name prefixes — check only matching queries
    # (entry() smoke skipped) for fast iteration on new registry entries.
    prefixes = sys.argv[1:]
    spark = get_spark("driver_check")
    if not prefixes:
        df = contract.entry(spark)
        n = len(df.collect())
        print(f"entry(): rows={n} cols={df.columns}")

    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = contract.queries(), contract.oracle_sql()
    if prefixes:
        qs = {n_: f for n_, f in qs.items() if any(n_.startswith(p) for p in prefixes)}
        if not qs:  # a typo'd prefix must not report PASS: 0/0, exit 0
            print(f"ERROR: no registry query matches prefixes {prefixes}")
            return 1
    failures = 0
    for name in sorted(qs):
        # Release the PREVIOUS query's registered caches/persistent RDDs
        # (recursive-CTE edges, label-coherence rows, localCheckpoints):
        # the real driver holds one session across all 50 graded queries,
        # and this gate mirrors that lifecycle.
        release_query_caches(spark)
        # One broken query must not abort the gate — every remaining
        # query still gets checked and the summary still prints.
        try:
            sdf = qs[name](spark, SF_DIR)
            sraw = [tuple(r) for r in sdf.collect()]
            sc, sr = norm(sraw, sdf.columns)
            if name not in oracles:
                print(f"{name}: rows-only rows={len(sr)}")
                continue
            terrs, kinds = type_audit(con, sdf.dtypes, oracles[name])
            d = con.execute(oracles[name])
            raw = d.fetchall()
            cols = [x[0] for x in d.description]
            # NULL-bearing integer outputs are the one remaining
            # fetch-sensitive class: pandas degrades nullable int64 to
            # float64 (5 -> 5.0, hash drift) while arrow/fetchall keep
            # ints. Queries must coalesce int outputs to a sentinel.
            # NULL floats/strings are deliberately NOT flagged: round 1
            # proved them safe at the real driver (join_asof passed with
            # 134 NULL doubles; rollup/cube/lag_lead with NULL varchars).
            for i, c in enumerate(cols):
                if kinds.get(c) == "int" and any(r[i] is None for r in raw):
                    terrs.append(f"col {c!r} is a NULL-bearing int output")
            for side, r_, c_ in (("spark", sraw, sdf.columns),
                                 ("oracle", raw, cols)):
                err = pandas_canon_smoke(r_, c_)
                if err:
                    terrs.append(f"{side} {err}")
            dc, dr = norm(raw, cols)
        except Exception as e:  # noqa: BLE001 — count as failure, continue
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if terrs:
            print(f"{name}: TYPE-AUDIT FAIL {terrs}")
            failures += 1
            continue
        ok = sc == dc and sr == dr
        print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(sr)}/{len(dr)}")
        if not ok:
            failures += 1
            if sc != dc:
                print(f"  cols spark={sc}\n  cols duck ={dc}")
            from itertools import zip_longest

            diffs = [p for p in zip_longest(sr, dr) if p[0] != p[1]]
            for a, b in diffs[:3]:
                print(f"  spark={a}\n  duck ={b}")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(qs) - failures}/{len(qs)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
