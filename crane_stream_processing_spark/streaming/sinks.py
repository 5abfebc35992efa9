"""Versioned parquet sink — SDFS's versioned blob store re-expressed
(SURVEY.md §2.1 S5-S8).

The reference stores each ``put`` as a new timestamped version of a named
file and serves ``get`` (latest) / ``get-versions N`` (N newest,
concatenated) from replicas (reference ``server/sdfs.go:276-283``,
``:296-329``); its streaming sink writes the current top-k as a new version
every 10 s (``server/Crane.go:193-204``). Here a *name* is a directory of
``v=<version>/`` parquet subdirs plus a ``_manifest/`` of commit markers:

    <base>/<name>/v=00000000000000000042/part-*.parquet
    <base>/<name>/_manifest/00000000000000000042.json

The marker is written only after the parquet commit succeeds, so readers
never see a half-written version (the reference got the same property from
waiting on all 4 replica acks, ``server/sdfs.go:32-52``). Replication is
the storage layer's job (HDFS/S3), exactly as SURVEY.md §3.2 prescribes.

Scale: each version is a normal partitioned parquet write — the sink
inherits Spark's parallel write path; readers prune to the selected
versions only (directory-level pruning, no full-listing scans).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "VersionedSink",
    "MergeSink",
    "list_versions",
    "read_latest",
    "read_version",
    "read_versions",
    "expire_versions",
    "compact_latest",
    "delete_name",
    "store_names",
]


def _vdir(base_dir: str, name: str, version: int) -> str:
    return os.path.join(base_dir, name, f"v={version:020d}")


def _manifest_dir(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, name, "_manifest")


class VersionedSink:
    """foreachBatch-compatible versioned writer.

    Use either as ``writeStream.foreachBatch(sink)`` (batch_id becomes the
    version) or call :meth:`write_version` directly from batch code.
    """

    def __init__(self, base_dir: str, name: str):
        self.base_dir = base_dir
        self.name = name

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        self.write_version(df, batch_id)

    def write_version(self, df: DataFrame, version: int) -> None:
        path = _vdir(self.base_dir, self.name, version)
        df.write.mode("overwrite").parquet(path)
        os.makedirs(_manifest_dir(self.base_dir, self.name), exist_ok=True)
        marker = {
            "version": version,
            "path": path,
            "committed_at": time.time(),
            "n_columns": len(df.columns),
        }
        mpath = os.path.join(
            _manifest_dir(self.base_dir, self.name), f"{version:020d}.json"
        )
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, mpath)  # atomic commit marker


class MergeSink(VersionedSink):
    """Keyed UPSERT sink (MERGE INTO semantics) over the versioned store —
    the sink-side half of the reference's aggregate commit: the joiner
    folds each committed micro-batch's staged cache into its running
    ``result`` map keyed by word (reference ``server/wordCount.go:33-43``
    ``mergeCache``; commit dispatch ``server/failure-detector.go:139-142``).
    Here each micro-batch MERGEs into the latest snapshot: matched keys are
    replaced by the batch row (last-writer-wins), unmatched keys are
    inserted, and the merged snapshot commits as a NEW version — readers
    time-travel across merge states exactly like SDFS versions.

    Exactly-once: committed foreachBatch ``batch_id``s are recorded in a
    ``_batches/`` ledger SEPARATE from the version-id sequence; a retry of
    an already-committed batch is a no-op, so sink-side duplicates are
    impossible — the property the reference's at-least-once acker could
    not give (SURVEY.md §2.9 ST1). The version id is allocated as
    max(existing)+1, NOT the batch id: versions and batch ids share no
    number line, so an interleaved :func:`compact_latest` (which also
    allocates max+1) can never collide with a future batch and shadow its
    merge. If a crash lands between the version commit and the batch
    marker, the retry re-merges the same batch — content-idempotent, since
    the anti-join replaces the batch's keys with identical rows.

    Scale: each merge rewrites the snapshot (read latest + anti-join +
    union) — O(|snapshot|) per batch, fine while snapshots are aggregate-
    sized (top-k, per-key rollups). For fact-sized snapshots swap the
    store for a format with file-level MERGE (Delta/Iceberg); the sink's
    contract — idempotent keyed upsert per micro-batch — is unchanged."""

    def __init__(self, base_dir: str, name: str, keys: list[str]):
        super().__init__(base_dir, name)
        if not keys:
            raise ValueError("MergeSink needs at least one key column")
        self.keys = list(keys)

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        self.merge_version(df, batch_id)

    def _batch_ledger_dir(self) -> str:
        return os.path.join(self.base_dir, self.name, "_batches")

    def _batch_marker(self, batch_id: int) -> str:
        return os.path.join(self._batch_ledger_dir(), f"{batch_id:020d}.json")

    def merge_version(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._batch_marker(batch_id)):
            return  # retried batch: already committed, idempotent no-op
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(self.keys)
        versions = list_versions(self.base_dir, self.name)
        version = (versions[0] + 1) if versions else 0
        if not versions:
            merged = batch
        else:
            current = read_latest(spark, self.base_dir, self.name)
            kept = current.join(
                batch.select(*self.keys), on=self.keys, how="left_anti"
            )
            merged = kept.unionByName(batch)
        self.write_version(merged, version)
        os.makedirs(self._batch_ledger_dir(), exist_ok=True)
        marker = self._batch_marker(batch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "version": version}, f)
        os.replace(tmp, marker)


def list_versions(base_dir: str, name: str) -> list[int]:
    """Committed versions, newest first (reference ``lsVersions`` order,
    ``server/sdfs.go:296-329``)."""
    mdir = _manifest_dir(base_dir, name)
    if not os.path.isdir(mdir):
        return []
    out = [
        int(fn[: -len(".json")])
        for fn in os.listdir(mdir)
        if fn.endswith(".json")
    ]
    return sorted(out, reverse=True)


def read_latest(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """``get``: the newest committed version (``server/sdfs.go:141-175``)."""
    versions = list_versions(base_dir, name)
    if not versions:
        raise FileNotFoundError(f"no committed versions for {name!r} in {base_dir}")
    return spark.read.parquet(_vdir(base_dir, name, versions[0]))


def expire_versions(base_dir: str, name: str, keep: int) -> list[int]:
    """Retention: drop all but the ``keep`` newest committed versions
    (the reference's SDFS never reclaimed old versions — unbounded growth;
    a real deployment needs a GC). The marker is removed FIRST so readers
    stop resolving the version before its data disappears — the reverse of
    the commit order. Returns the expired version ids."""
    import shutil

    victims = list_versions(base_dir, name)[keep:]
    for v in victims:
        marker = os.path.join(_manifest_dir(base_dir, name), f"{v:020d}.json")
        if os.path.exists(marker):
            os.remove(marker)
        shutil.rmtree(_vdir(base_dir, name, v), ignore_errors=True)
    return victims


def compact_latest(
    spark: SparkSession,
    base_dir: str,
    name: str,
    target_files: int = 1,
) -> int:
    """Delta-OPTIMIZE-style small-file compaction: rewrite the newest
    committed version's data as a NEW version with ``target_files`` output
    files, then commit it. A long-running streaming sink writes one version
    per micro-batch, each with up-to-shuffle-partitions tiny files; at 100
    TB the resulting listing/open overhead dominates reads. Compaction is a
    metadata-transactional rewrite — readers either resolve the old version
    or, after the marker lands, the compacted one; nothing is mutated in
    place (old versions remain for time travel until expire_versions).
    Returns the new version id.

    Interleaving with live sinks: MergeSink allocates its version ids from
    the same max+1 sequence but its exactly-once ledger tracks BATCH ids
    separately, so a compaction between micro-batches is safe. A plain
    VersionedSink in complete mode uses batch_id as the version — a
    compaction there may be overwritten by the next snapshot (harmless:
    complete snapshots carry the full state) — compact those after the
    query stops or on the read path."""
    versions = list_versions(base_dir, name)
    if not versions:
        raise FileNotFoundError(f"no committed versions for {name!r} in {base_dir}")
    latest = versions[0]
    df = spark.read.parquet(_vdir(base_dir, name, latest)).coalesce(target_files)
    new_version = latest + 1
    sink = VersionedSink(base_dir, name)
    sink.write_version(df, new_version)
    return new_version


def read_version(
    spark: SparkSession, base_dir: str, name: str, version: int
) -> DataFrame:
    """Time travel: read one pinned committed version."""
    if version not in list_versions(base_dir, name):
        raise FileNotFoundError(
            f"version {version} of {name!r} not committed in {base_dir}"
        )
    return spark.read.parquet(_vdir(base_dir, name, version))


def read_versions(
    spark: SparkSession, base_dir: str, name: str, n: int
) -> DataFrame:
    """``get-versions N``: the N newest versions concatenated, each row
    tagged with its version (``server/sdfs.go:178-207``, ``:296-329`` —
    the reference concatenates newest-first text; order here is carried as
    an explicit column, the relational form of the same information)."""
    from pyspark.sql import functions as F

    versions = list_versions(base_dir, name)[:n]
    if not versions:
        raise FileNotFoundError(f"no committed versions for {name!r} in {base_dir}")
    dfs = [
        spark.read.parquet(_vdir(base_dir, name, v)).withColumn("version", F.lit(v))
        for v in versions
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def delete_name(base_dir: str, name: str) -> list[int]:
    """``delete``: remove EVERY committed version of ``name`` plus its
    manifest — the reference's all-replica, all-version delete
    (``DelReq``, ``server/sdfs.go:210-240``). Markers go first (readers
    stop resolving before data vanishes), then the whole name dir.
    Returns the deleted version ids."""
    import shutil

    victims = expire_versions(base_dir, name, keep=0)
    shutil.rmtree(os.path.join(base_dir, name), ignore_errors=True)
    return victims


def store_names(base_dir: str) -> list[str]:
    """``store``: names with at least one committed version under the
    store root — the reference's local file listing (``FileList``,
    ``server/sdfs.go:415-419``), resolved from commit markers so
    half-written or deleted names don't appear."""
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        n
        for n in os.listdir(base_dir)
        if os.path.isdir(os.path.join(base_dir, n)) and list_versions(base_dir, n)
    )
