"""Structured-Streaming layer — the reference's stream engine re-expressed.

The reference's mechanisms (XOR acker, UDP transport, role assignment,
replay maps — reference ``server/Crane.go``, ``server/acker.go``) are
deliberately NOT ported: Spark's checkpointed micro-batch execution is the
delivery layer, and it is exactly-once where the reference was
at-least-once-with-duplicates (SURVEY.md §2.9 ST1-ST3).

- :mod:`.sources` — line sources (file-dir, socket, rate) with the
  reference's throttling knobs (S1/S2/S10)
- :mod:`.sinks` — the versioned sink emulating SDFS put/get-versions
  (S5-S7), plus readers
- :mod:`.engine` — the app runner: name→pipeline registry → complete-mode
  periodic-trigger query with checkpointing (ST4/ST9)
- :mod:`.monitor` — delivery accounting: in-plan observed metrics + a
  progress listener (the acker's books without its replay duty)
- :mod:`.ann_ingest` — the production ANN-index ingest: Arrow kernels in
  foreachBatch + a batch-id-idempotent parquet sink (exactly-once on
  plain parquet)
"""

from .sources import file_lines, kafka_lines, rate_lines, socket_lines
from .sinks import MergeSink, VersionedSink, read_latest, read_versions, list_versions
from .engine import start_app, stop_app
from .monitor import ProgressRecorder, with_observed_metrics
from .ann_ingest import (
    compact_index,
    idempotent_batch_sink,
    ivfpq_index_sink,
    read_ivfpq_index,
    start_ivfpq_ingest_arrow,
)

__all__ = [
    "file_lines",
    "socket_lines",
    "rate_lines",
    "kafka_lines",
    "VersionedSink",
    "MergeSink",
    "read_latest",
    "read_versions",
    "list_versions",
    "start_app",
    "stop_app",
    "ProgressRecorder",
    "with_observed_metrics",
    "idempotent_batch_sink",
    "ivfpq_index_sink",
    "start_ivfpq_ingest_arrow",
    "read_ivfpq_index",
    "compact_index",
]
