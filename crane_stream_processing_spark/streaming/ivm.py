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
fold ``base ⊎ journal`` (:func:`signed_fold`, shared with the batch IVM
queries through ``inventory.core.ivm_fold_view``).

The journal grows one partition per trigger, so a long-running maintainer
periodically COMPACTS: fold the journal partitions for batch ids strictly
below the last committed batch into a new base, then drop them.

Crash-safety is FENCED, not assumed: the base directory carries a
``_compacted_upto`` marker recording the highest batch id ever folded
into it, written into the staging directory BEFORE the swap. Readers
(:func:`read_journal`) exclude journal partitions at or below the
fence — so a crash after the base swap but before the partition cleanup
leaves stale partitions that are IGNORED, never double-applied, and the
next compaction removes them. Two residual windows are documented rather
than hidden: (a) the base swap is two directory renames, so a concurrent
reader can hit a brief path-not-found between them — compaction assumes
a single maintainer that does not serve reads mid-swap (pause the read
path or retry on not-found); (b) a crash between the renames leaves the
old base at ``<base>.__retired`` with ``<base>`` absent — recovery is to
rename it back, losing only the compaction (the journal partitions are
still intact because cleanup runs last). Replay safety (same as every
offset-log sink): a batch can only replay while it is the LAST
uncommitted entry in the checkpoint's offset log — once batch N+1 has
committed, batches ≤ N can never be redelivered, so folding them is
sound; compacting the tail batch before its commit is the one forbidden
move, hence the explicit ``upto_batch_id`` argument.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "start_ivm_maintenance",
    "compact_ivm_journal",
    "read_journal",
    "signed_fold",
    "compacted_upto",
]

_MARKER = "_compacted_upto"


def signed_fold(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    count_col: str,
    sum_col: str,
) -> DataFrame:
    """THE signed IVM fold — one definition for the batch queries, the
    streaming journal read, and compaction: the materialized base enters
    as one signed row per group (count → dn, sum → dv), unions the delta
    rows, one groupBy over |groups| + |delta|, and zero-count groups
    drop (full-group deletion). ``base`` columns: (key, count_col,
    sum_col); ``delta`` columns: (key, dn, dv). Output: (key, count_col,
    sum_col) with sum_col still exact decimal — callers cast for
    display."""
    signed_base = base.select(
        key,
        F.col(count_col).cast("long").alias("dn"),
        F.col(sum_col).alias("dv"),
    )
    return (
        signed_base.unionByName(delta.select(key, "dn", "dv"))
        .groupBy(key)
        .agg(F.sum("dn").alias(count_col), F.sum("dv").alias(sum_col))
        .filter(F.col(count_col) > 0)
    )


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


def compacted_upto(base_dir: str | None) -> int:
    """The base's compaction fence: highest batch id ever folded into it
    (−1 when no compaction has run / no base given)."""
    if base_dir is None:
        return -1
    path = os.path.join(base_dir, _MARKER)
    if not os.path.exists(path):
        return -1
    with open(path) as f:
        return int(json.load(f)["upto"])


def read_journal(
    spark: SparkSession,
    journal_dir: str,
    key: str,
    base_dir: str | None = None,
) -> DataFrame:
    """Journal partials at their logical grain (key, dn, dv) —
    ``__batch_id`` is the idempotency ledger, not data. When ``base_dir``
    is given, partitions at or below its compaction fence are EXCLUDED:
    they are stale leftovers of a compaction that crashed between the
    base swap and the cleanup, and their deltas already live in the
    base — the fence is what makes that crash window safe."""
    df = spark.read.parquet(journal_dir)
    fence = compacted_upto(base_dir)
    if fence >= 0:
        df = df.filter(F.col("__batch_id") > fence)
    return df.select(key, "dn", "dv")


def compact_ivm_journal(
    spark: SparkSession,
    base_dir: str,
    journal_dir: str,
    upto_batch_id: int,
    key: str = "o_custkey",
    count_col: str = "n_orders",
    sum_col: str = "total_dec",
) -> int:
    """Fold journal partitions with ``fence < __batch_id <=
    upto_batch_id`` into the materialized base and remove them — the
    maintenance cycle that keeps read-time fold cost
    O(groups + recent batches) forever:

    1. new_base = :func:`signed_fold`(base, folded partials) — one
       groupBy over |groups| + |partials| rows, never facts.
    2. The ``_compacted_upto`` fence marker is written INTO the staging
       directory before the swap, so from the instant the new base is
       visible, :func:`read_journal` ignores the folded partitions even
       if step 3 never runs (crash-safe against double-apply).
    3. The base swaps in via two renames (old → ``.__retired``, staging
       → base) and the folded partitions are deleted as cleanup.

    See the module docstring for the two documented residual windows
    (reader not-found during the swap; ``.__retired`` recovery) and the
    replay-safety precondition on ``upto_batch_id``. Returns the number
    of journal partitions folded."""
    import shutil

    fence = compacted_upto(base_dir)
    parts = [
        d
        for d in os.listdir(journal_dir)
        if d.startswith("__batch_id=")
        and fence < int(d.split("=", 1)[1]) <= upto_batch_id
    ]
    # stale leftovers at or below the fence are pure cleanup — their
    # deltas are already in the base
    stale = [
        d
        for d in os.listdir(journal_dir)
        if d.startswith("__batch_id=") and int(d.split("=", 1)[1]) <= fence
    ]
    for d in stale:
        shutil.rmtree(os.path.join(journal_dir, d), ignore_errors=True)
    if not parts:
        return 0
    folded = spark.read.parquet(
        *[os.path.join(journal_dir, d) for d in parts]
    ).select(key, "dn", "dv")
    new_base = signed_fold(
        spark.read.parquet(base_dir), folded, key, count_col, sum_col
    )
    staging = base_dir.rstrip("/") + ".__compacting"
    retired = base_dir.rstrip("/") + ".__retired"
    new_base.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, _MARKER), "w") as f:
        json.dump({"upto": int(upto_batch_id)}, f)
    shutil.rmtree(retired, ignore_errors=True)
    os.rename(base_dir, retired)
    os.rename(staging, base_dir)
    shutil.rmtree(retired, ignore_errors=True)
    for d in parts:
        shutil.rmtree(os.path.join(journal_dir, d), ignore_errors=True)
    return len(parts)
