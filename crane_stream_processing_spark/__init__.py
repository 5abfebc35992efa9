"""crane_stream_processing_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference system ``supercharleszhu/Crane-Stream-Processing`` (a Storm-like
record-at-a-time stream processor; see SURVEY.md), re-expressed idiomatically
on the Spark DataFrame API and Structured Streaming:

- the reference's streaming apps (word count, twitter top-users, HTTP hot
  resources — reference ``server/wordCount.go``, ``server/twitter.go``,
  ``server/hothttp.go``) become composable DataFrame pipelines
  (:mod:`.apps`);
- its distributed grep (``server/querier.go``) becomes a distributed text
  scan (:func:`.apps.grep`);
- its versioned SDFS storage (``server/sdfs.go``) becomes a versioned
  parquet sink (:mod:`.streaming.sinks`);
- its XOR-acker at-least-once delivery (``server/acker.go``) is subsumed by
  Structured Streaming's exactly-once checkpointing (:mod:`.streaming.engine`).

On top of that parity surface the engine exposes a full relational operator
inventory (joins incl. as-of/range, aggregations incl. rollup/cube, window
functions, set ops, event-time streaming) plus LLM-data-pipeline operators
(dedup, embedding similarity search, text analysis, multimodal columns),
every operator designed to run partition-parallel at 100 TB scale.
"""

from .session import get_spark
from .catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]

__version__ = "0.1.0"
