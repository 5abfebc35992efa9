"""Streaming incremental view maintenance — the journal-sink maintainer
and its compaction cycle.

A materialized aggregate (COUNT + exact-decimal SUM per group) is kept
fresh from a stream of SIGNED change rows (key, dn, dv): each micro-batch
folds to per-group partials (one row per touched group) and lands under
its own ``__batch_id=<N>`` partition via the batch-id-idempotent parquet
sink (``streaming.ann_ingest.idempotent_batch_sink`` — a replayed batch
overwrites its own partition, closing the duplicate-apply window of an
at-least-once redelivery; the reference's SDFS append has exactly that
hazard, server/sdfs.go:276-283). The maintained view is the read-time
fold ``base ⊎ journal`` (``inventory.core.ivm_fold_view``).

The journal grows one partition per trigger, so a long-running maintainer
periodically COMPACTS: fold the journal partitions for batch ids strictly
below the last committed batch into a new base, then drop them. Safety
contract (same as every offset-log sink): a batch can only replay while
it is the LAST uncommitted entry in the checkpoint's offset log — once
batch N+1 has committed, batches ≤ N can never be redelivered, so folding
them into the base and deleting their partitions cannot double-count.
Compacting the tail batch before its commit is the one forbidden move,
hence the explicit ``upto_batch_id`` argument rather than "everything".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["start_ivm_maintenance", "compact_ivm_journal", "read_journal"]


def start_ivm_maintenance(
    feed_stream: DataFrame,
    journal_dir: str,
    checkpoint: str,
    key: str = "o_custkey",
    available_now: bool = True,
):
    """Start the streaming IVM maintainer over a signed-change feed.
    Returns ``(StreamingQuery, sink)`` — the sink is exposed so tests and
    the graded query can force a deterministic replay (call it again with
    a batch id). Used by the graded
    ``stream_incremental_agg_maintenance`` and tests/test_streaming_ivm.py."""
    from .ann_ingest import idempotent_batch_sink

    sink = idempotent_batch_sink(
        journal_dir,
        transform=lambda b: b.groupBy(key).agg(
            F.sum("dn").alias("dn"), F.sum("dv").alias("dv")
        ),
    )
    writer = feed_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def read_journal(spark: SparkSession, journal_dir: str, key: str) -> DataFrame:
    """Journal partials at their logical grain (key, dn, dv) —
    ``__batch_id`` is the idempotency ledger, not data."""
    return spark.read.parquet(journal_dir).select(key, "dn", "dv")


def compact_ivm_journal(
    spark: SparkSession,
    base_dir: str,
    journal_dir: str,
    upto_batch_id: int,
    key: str = "o_custkey",
    count_col: str = "n_orders",
    sum_col: str = "total_dec",
) -> int:
    """Fold journal partitions with ``__batch_id <= upto_batch_id`` into
    the materialized base and DELETE them — the maintenance cycle that
    keeps read-time fold cost O(groups + recent batches) forever:

    1. new_base = (base as signed rows) ⊎ (folded partials ≤ upto) —
       one groupBy over |groups| + |folded partials| rows, never facts;
       zero-count groups drop (full-group deletion composes through
       compaction).
    2. The base is rewritten ATOMICALLY from the reader's perspective:
       written to a staging dir, then swapped in with two renames —
       a concurrent reader sees the old base or the new one, never a
       half-written directory.
    3. The folded partitions are removed from the journal.

    Call this ONLY with ``upto_batch_id`` strictly below the checkpoint's
    last committed batch (see module docstring). Returns the number of
    journal partitions folded. The base parquet schema is
    (key, count_col, sum_col) — the same shape ``ivm_base_dir`` writes."""
    import shutil

    parts = [
        d
        for d in os.listdir(journal_dir)
        if d.startswith("__batch_id=")
        and int(d.split("=", 1)[1]) <= upto_batch_id
    ]
    if not parts:
        return 0
    folded = (
        spark.read.parquet(*[os.path.join(journal_dir, d) for d in parts])
        .select(key, "dn", "dv")
    )
    base = spark.read.parquet(base_dir).select(
        key,
        F.col(count_col).cast("long").alias("dn"),
        F.col(sum_col).alias("dv"),
    )
    new_base = (
        base.unionByName(folded)
        .groupBy(key)
        .agg(F.sum("dn").alias(count_col), F.sum("dv").alias(sum_col))
        .filter(F.col(count_col) > 0)
    )
    staging = base_dir.rstrip("/") + ".__compacting"
    retired = base_dir.rstrip("/") + ".__retired"
    new_base.write.mode("overwrite").parquet(staging)
    shutil.rmtree(retired, ignore_errors=True)
    os.rename(base_dir, retired)
    os.rename(staging, base_dir)
    shutil.rmtree(retired, ignore_errors=True)
    for d in parts:
        shutil.rmtree(os.path.join(journal_dir, d), ignore_errors=True)
    return len(parts)
