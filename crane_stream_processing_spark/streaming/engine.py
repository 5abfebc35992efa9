"""App runner — the reference's start/stop lifecycle on Structured
Streaming (SURVEY.md §2.9 ST4/ST9, §3.1).

The reference's ``start <app> <file>`` fans an app name over UDP, assigns
roles from the membership list, and runs spout→workers→sink with an XOR
acker (``server/Crane.go:38-140``, ``:280-323``); ``stop`` RPC-broadcasts a
halt (``:142-176``). Here ``start_app`` builds the registered pipeline over
a streaming line source and starts a complete-mode query that flushes the
current top-k to a new sink version every ``period`` — the reference's 10 s
ticker (``server/Crane.go:30-32``, ``:193-204``). Checkpointing gives
exactly-once across restarts, replacing acker+replay (ST1-ST3 — and
upgrading the reference's documented duplicate-on-replay behavior).
"""

from __future__ import annotations


from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..apps import APP_REGISTRY
from .sinks import VersionedSink, _join
from .sources import file_lines

__all__ = ["start_app", "stop_app"]


def start_app(
    spark: SparkSession,
    app_name: str,
    source_path: str,
    out_dir: str,
    period: str = "10 seconds",
    result_name: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run a registered app as a streaming query.

    Mirrors ``Crane.StartApp``: ``app_name`` is looked up in the registry
    (the reference wires only wordCount and silently ignores the rest — a
    gap we close, ``server/Crane.go:219-232``); ``source_path`` is a text
    file/dir (the SDFS ``demo-data`` analog); results land as versioned
    parquet under ``out_dir/<result_name>`` every ``period``.
    """
    if app_name not in APP_REGISTRY:
        raise KeyError(
            f"unknown app {app_name!r}; registry has {sorted(APP_REGISTRY)}"
        )
    result_name = result_name or f"{app_name.lower()}_result"
    pipeline = APP_REGISTRY[app_name]
    lines = file_lines(spark, source_path, max_files_per_trigger)

    # The pipeline ends in orderBy+limit; complete-mode recomputes the
    # aggregate each trigger, and the sink snapshots it — exactly the
    # reference ticker's "write current top-5 as a new version".
    sink = VersionedSink(out_dir, result_name)  # foreachBatch-callable

    return (
        pipeline(lines)
        .writeStream.outputMode("complete")
        .trigger(processingTime=period)
        .foreachBatch(sink)
        # URI-safe join (not os.path.join): out_dir is a store root that
        # may be a filesystem URI (s3a://...), same convention as sinks.
        .option("checkpointLocation", _join(out_dir, result_name, "_checkpoint"))
        .queryName(f"crane_{app_name}")
        .start()
    )


def stop_app(query: StreamingQuery) -> None:
    """``StopApp`` (``server/Crane.go:142-176``): halt the query. State is
    preserved in the checkpoint; a subsequent start_app with the same
    out_dir resumes exactly-once."""
    query.stop()
