"""Streaming line sources (SURVEY.md §2.1 S1/S2/S10).

The reference spout reads an SDFS file line-by-line and throttles emission
with a per-tuple sleep (reference ``server/Crane.go:63-99``, ``:84``); the
Spark equivalents are replayable sources with declarative throttles —
``maxFilesPerTrigger`` for file dirs, ``rowsPerSecond`` for the rate
source. Each returns a streaming DataFrame with a single ``value: string``
column (plus ``ts``/``seq`` for rate), directly consumable by the
:mod:`..apps` pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "file_lines", "socket_lines", "rate_lines", "kafka_lines", "word_cycle",
]


def word_cycle(seq: Column, words: list[str]) -> Column:
    """The rate source's deterministic line synthesis as a standalone
    column expression: word = words[seq mod len(words)]. Factored out so
    the batch inventory can grade the exact content path the streaming
    rate source emits (``src_rate_word_cycle`` — the S2/S10 sources
    themselves are wall-clock/socket-bound and ungradable at the driver,
    but their line-generation logic is engine code and oracle-checkable
    batch-equivalently)."""
    n = len(words)
    return F.array(*[F.lit(w) for w in words])[(seq % n).cast("int")]


def file_lines(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-directory text source — the SDFS-file spout analog (S1). New
    files landing in ``path`` are discovered per micro-batch; offsets are
    checkpointed so a restarted query resumes exactly where it stopped
    (replaces the reference's replay map, ``server/Crane.go:101-128``)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP socket text source (S10) — the reference benchmark rivals'
    input (``spark-streaming/src/word-count.py:42``). Not replayable; for
    demos/benchmarks only."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka text source — the production-scale replayable feed the
    reference's UDP spout (S1/S4) maps to on a real cluster: partitioned,
    offset-tracked, replayable from checkpoint, with declarative
    backpressure (``maxOffsetsPerTrigger`` — the S2 throttle). Values are
    decoded UTF-8 into the same single ``value: string`` shape the app
    pipelines consume.

    Requires the ``spark-sql-kafka`` connector jar on the classpath (not
    bundled in this test container — ``load()`` raises
    DATA_SOURCE_NOT_FOUND there; the wrapper is the deployment surface)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def rate_lines(
    spark: SparkSession, rows_per_second: int, words: list[str] | None = None
) -> DataFrame:
    """Rate-limited synthetic line source — the spout's SendPeriod throttle
    (S2, ``server/Crane.go:84``) as a declarative rowsPerSecond. Each row
    becomes a deterministic pseudo-line (word cycle on the sequence number)
    so aggregations have repeatable content."""
    words = words or ["alpha", "beta", "gamma", "delta"]
    word = word_cycle(F.col("value"), words)
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("seq"),
            word.alias("value"),
        )
    )
