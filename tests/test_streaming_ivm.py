"""Streaming incremental view maintenance — the journal sink's
exactly-once and restart contracts, proven on a hand-built signed feed
small enough to reason about row-for-row.

The graded query (stream_incremental_agg_maintenance) drains the sf feed
as one availableNow batch and forces a replay; these tests exercise what
the bounded grade can't: MULTI-batch journals (maxFilesPerTrigger=1),
replay of an individual middle batch, and a true RESTART — a second
streaming query on the SAME checkpoint after new feed files land must
process only the new files and leave the old journal partitions alone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crane_stream_processing_spark.inventory.core import ivm_fold_view
from crane_stream_processing_spark.inventory.streaming_queries import (
    start_ivm_maintenance,
)

FEED_SCHEMA = "o_custkey long, dn long, dv decimal(28,4)"


def _write_feed_file(spark, feed_dir, idx, rows):
    """One parquet file per call — with maxFilesPerTrigger=1 each file is
    its own micro-batch, in mtime order."""
    import glob
    import shutil
    import time

    stage = os.path.join(feed_dir, f"..__stage{idx}")
    spark.createDataFrame(rows, FEED_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(feed_dir, exist_ok=True)
    dst = os.path.join(feed_dir, f"feed{idx}.parquet")
    shutil.move(part, dst)
    os.utime(dst, (1_700_000_000 + idx, 1_700_000_000 + idx))
    shutil.rmtree(stage, ignore_errors=True)


def _base(spark):
    # Materialized view state: customers 1..3 with known counts/sums.
    return spark.createDataFrame(
        [(1, 2, "10.0000"), (2, 1, "5.0000"), (3, 1, "7.0000")],
        "o_custkey long, n_orders long, total_dec string",
    ).select(
        "o_custkey",
        "n_orders",
        F.col("total_dec").cast("decimal(28,4)").alias("total_dec"),
    )


def _view(spark, base_df, journal_dir):
    journal = spark.read.parquet(journal_dir).select("o_custkey", "dn", "dv")
    return {
        (r.o_custkey): (r.n_orders, float(r.total_price))
        for r in ivm_fold_view(base_df, journal).collect()
    }


def _run(spark, feed_dir, journal_dir, ckpt, max_files=None):
    reader = spark.readStream.schema(FEED_SCHEMA)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files))
    q, sink = start_ivm_maintenance(
        reader.parquet(feed_dir), journal_dir, ckpt
    )
    q.awaitTermination()
    return sink


def D(x):
    from decimal import Decimal

    return Decimal(x)


def test_multibatch_journal_and_middle_batch_replay(spark, tmp_path):
    """Three feed files → three __batch_id partitions; replaying batch 1
    through the sink leaves the folded view bit-identical (the overwrite
    replaced, not appended)."""
    feed = str(tmp_path / "feed")
    journal = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    waves = [
        [(1, 1, D("3.0000")), (2, -1, D("-5.0000"))],   # batch 0
        [(1, 1, D("2.0000")), (3, 1, D("4.0000"))],     # batch 1
        [(4, 1, D("9.0000"))],                          # batch 2
    ]
    for i, rows in enumerate(waves):
        _write_feed_file(spark, feed, i, rows)
    sink = _run(spark, feed, journal, ckpt, max_files=1)

    parts = {
        d for d in os.listdir(journal) if d.startswith("__batch_id=")
    }
    assert parts == {"__batch_id=0", "__batch_id=1", "__batch_id=2"}

    base = _base(spark)
    expect = {1: (4, 15.0), 3: (2, 11.0), 4: (1, 9.0)}  # cust 2 zeroed out
    assert _view(spark, base, journal) == expect

    # Replay the MIDDLE batch — same batch id, same rows — and re-check.
    sink(spark.createDataFrame(waves[1], FEED_SCHEMA), 1)
    assert _view(spark, base, journal) == expect


def test_restart_from_checkpoint_processes_only_new_files(spark, tmp_path):
    """Wave 1 drains under checkpoint C; wave 2 lands and a NEW query on
    the SAME checkpoint runs: the old journal partitions are untouched
    (same mtimes), only new batch ids appear, and the folded view equals
    a from-scratch fold of the entire feed — the restart contract a
    production maintainer depends on."""
    feed = str(tmp_path / "feed")
    journal = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    _write_feed_file(spark, feed, 0, [(1, 1, D("3.0000"))])
    _write_feed_file(spark, feed, 1, [(2, 1, D("6.0000"))])
    _run(spark, feed, journal, ckpt, max_files=1)
    before = {
        d: os.path.getmtime(os.path.join(journal, d))
        for d in os.listdir(journal)
        if d.startswith("__batch_id=")
    }
    assert len(before) == 2

    # restart: two more files, NEW query, SAME checkpoint
    _write_feed_file(spark, feed, 2, [(1, -1, D("-3.0000"))])
    _write_feed_file(spark, feed, 3, [(3, 1, D("8.0000"))])
    _run(spark, feed, journal, ckpt, max_files=1)

    after = {
        d: os.path.getmtime(os.path.join(journal, d))
        for d in os.listdir(journal)
        if d.startswith("__batch_id=")
    }
    assert len(after) == 4
    for d, mt in before.items():
        assert after[d] == pytest.approx(mt), f"{d} was rewritten on restart"

    base = _base(spark)
    got = _view(spark, base, journal)
    # from-scratch: fold ALL feed rows in one delta
    scratch = _view_from_batch(spark, base, feed)
    assert got == scratch == {1: (2, 10.0), 2: (2, 11.0), 3: (2, 15.0)}


def _view_from_batch(spark, base_df, feed_dir):
    delta = spark.read.schema(FEED_SCHEMA).parquet(feed_dir)
    return {
        (r.o_custkey): (r.n_orders, float(r.total_price))
        for r in ivm_fold_view(base_df, delta).collect()
    }


def test_journal_compaction_folds_and_preserves_view(spark, tmp_path):
    """Compacting journal partitions <= N into the base must leave the
    folded view bit-identical, delete exactly those partitions, and
    carry zero-count group deletion through the rewrite. The base swap
    is rename-atomic (old dir retired, staging renamed in)."""
    from crane_stream_processing_spark.streaming.ivm import (
        compact_ivm_journal,
        read_journal,
    )

    feed = str(tmp_path / "feed")
    journal = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    base_dir = str(tmp_path / "base")
    _base(spark).write.mode("overwrite").parquet(base_dir)

    waves = [
        [(1, 1, D("3.0000")), (2, -1, D("-5.0000"))],   # batch 0: cust 2 -> 0
        [(1, 1, D("2.0000")), (3, 1, D("4.0000"))],     # batch 1
        [(4, 1, D("9.0000"))],                          # batch 2
    ]
    for i, rows in enumerate(waves):
        _write_feed_file(spark, feed, i, rows)
    _run(spark, feed, journal, ckpt, max_files=1)

    def view():
        return {
            r.o_custkey: (r.n_orders, float(r.total_price))
            for r in ivm_fold_view(
                spark.read.parquet(base_dir),
                read_journal(spark, journal, "o_custkey"),
            ).collect()
        }

    before = view()
    assert before == {1: (4, 15.0), 3: (2, 11.0), 4: (1, 9.0)}

    # batch 2 is the checkpoint's tail; compact everything strictly below
    n = compact_ivm_journal(spark, base_dir, journal, upto_batch_id=1)
    assert n == 2
    left = {d for d in os.listdir(journal) if d.startswith("__batch_id=")}
    assert left == {"__batch_id=2"}
    assert view() == before

    # customer 2 zeroed out in batch 0 must NOT resurface in the new base
    base_keys = {
        r.o_custkey for r in spark.read.parquet(base_dir).collect()
    }
    assert 2 not in base_keys

    # nothing below the mark left -> no-op
    assert compact_ivm_journal(spark, base_dir, journal, upto_batch_id=1) == 0


def test_compaction_fence_survives_crash_before_cleanup(spark, tmp_path):
    """Crash window: the new base (with its _compacted_upto fence) is
    swapped in but the folded journal partitions were never deleted. The
    read path must IGNORE the stale partitions (their deltas already
    live in the base — re-applying them would double-count), and the
    next compaction must treat them as cleanup, not fold input."""
    import shutil

    from crane_stream_processing_spark.streaming.ivm import (
        compact_ivm_journal,
        compacted_upto,
        read_journal,
    )

    feed = str(tmp_path / "feed")
    journal = str(tmp_path / "journal")
    ckpt = str(tmp_path / "ckpt")
    base_dir = str(tmp_path / "base")
    _base(spark).write.mode("overwrite").parquet(base_dir)
    waves = [
        [(1, 1, D("3.0000"))],   # batch 0
        [(3, 1, D("4.0000"))],   # batch 1
        [(4, 1, D("9.0000"))],   # batch 2 (checkpoint tail, never folded)
    ]
    for i, rows in enumerate(waves):
        _write_feed_file(spark, feed, i, rows)
    _run(spark, feed, journal, ckpt, max_files=1)

    # snapshot batch 0's partition, compact through batch 1, then
    # simulate the crash-before-cleanup by restoring the folded
    # partition into the journal
    saved = str(tmp_path / "saved_b0")
    shutil.copytree(os.path.join(journal, "__batch_id=0"), saved)
    assert compact_ivm_journal(spark, base_dir, journal, upto_batch_id=1) == 2
    shutil.copytree(saved, os.path.join(journal, "__batch_id=0"))

    assert compacted_upto(base_dir) == 1
    # the fence excludes the stale partition: only batch 2's delta reads
    rows = read_journal(spark, journal, "o_custkey", base_dir).collect()
    assert {(r.o_custkey, r.dn) for r in rows} == {(4, 1)}
    view = {
        r.o_custkey: (r.n_orders, float(r.total_price))
        for r in ivm_fold_view(
            spark.read.parquet(base_dir),
            read_journal(spark, journal, "o_custkey", base_dir),
        ).collect()
    }
    assert view == {1: (3, 13.0), 2: (1, 5.0), 3: (2, 11.0), 4: (1, 9.0)}

    # next compaction sweeps the stale partition as cleanup (fold count
    # 1: only batch 2), and the fence advances
    assert compact_ivm_journal(spark, base_dir, journal, upto_batch_id=2) == 1
    assert compacted_upto(base_dir) == 2
    assert not any(
        d.startswith("__batch_id=") for d in os.listdir(journal)
    )
    final = {
        r.o_custkey: (r.n_orders, float(r.total_price))
        for r in ivm_fold_view(
            spark.read.parquet(base_dir),
            spark.createDataFrame([], "o_custkey long, dn long, dv decimal(28,4)"),
        ).collect()
    }
    assert final == view
