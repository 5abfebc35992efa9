"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`crane_stream_processing_spark.inventory`; this
file only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crane_stream_processing_spark.inventory import (
    REGISTRY,
    protect_host_caches,
    release_query_caches,
)

# applicationIds whose host-cache snapshot has been taken. Keyed per
# SparkContext (a restarted context reuses RDD ids from 0) and only
# recorded on a SUCCESSFUL snapshot, so a transient failure retries on
# the next call instead of silently leaving host caches unprotected.
_HOST_SNAPSHOT_APPS: set[str] = set()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _released(fn: Callable) -> Callable:
    """Release the PREVIOUS query's registered caches / persistent RDDs
    before building the next one. The grading driver holds ONE session
    across all 50 graded queries and only ever calls queries()[name] —
    it cannot call release_query_caches itself — so without this wrapper
    the cache-owning queries (recursive-CTE edge list, label-coherence
    rows, BPE vocabulary, iterative localCheckpoints) would pin executor
    memory for the rest of the graded run. Releasing at the START of the
    next call (not the end of the current one) keeps each query's cache
    alive through the driver's collect of that query's result.

    The first call snapshots pre-existing persistent RDDs as host-owned
    (``protect_host_caches``): no registry query has run yet, so anything
    already cached belongs to the embedding application and must survive
    every subsequent sweep.

    CONTRACT NOTE (first-call-only snapshot): the snapshot is taken ONCE
    per SparkContext — a host that persists a DataFrame AFTER the first
    registry query has run is outside it and would be swept. Such hosts
    must call
    ``crane_stream_processing_spark.inventory.protect_host_caches(spark)``
    themselves after creating mid-run caches (the function is additive:
    each call unions the currently-persistent RDD ids into the protected
    set for the live applicationId)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            app_id = spark.sparkContext.applicationId
        except Exception:  # noqa: BLE001 — dead session; fn will surface it
            app_id = None
        if app_id is not None and app_id not in _HOST_SNAPSHOT_APPS:
            if protect_host_caches(spark):
                _HOST_SNAPSHOT_APPS.add(app_id)
        release_query_caches(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _released(q.fn) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
