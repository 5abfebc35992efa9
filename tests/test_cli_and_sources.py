"""CLI surface + rate-source smoke tests."""

from __future__ import annotations

import pytest

from crane_stream_processing_spark.cli import main
from crane_stream_processing_spark.streaming.sinks import (
    VersionedSink,
    read_version,
)


def test_cli_apps_and_ls(capsys, tmp_path):
    assert main(["apps"]) == 0
    out = capsys.readouterr().out
    assert {"wordCount", "twitter", "hothttp"} <= set(out.split())
    assert main(["--store", str(tmp_path), "ls", "nothing"]) == 0
    assert capsys.readouterr().out == ""


def test_read_version_pinned(spark, tmp_path):
    sink = VersionedSink(str(tmp_path), "t")
    sink.write_version(spark.createDataFrame([(1,)], "v int"), 0)
    sink.write_version(spark.createDataFrame([(2,)], "v int"), 1)
    assert read_version(spark, str(tmp_path), "t", 0).collect()[0].v == 1
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path), "t", 9)


def test_rate_source_smoke(spark):
    """S2: declarative rate throttle — a couple of micro-batches of the
    synthetic word stream through the wordcount pipeline."""
    from crane_stream_processing_spark.apps import wordcount
    from crane_stream_processing_spark.streaming.sources import rate_lines

    lines = rate_lines(spark, rows_per_second=500)
    seen: list[set] = []

    def sink(df, batch_id):
        seen.append({r.word for r in df.collect()})

    q = (
        wordcount(lines.select("value"))
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline and not any(seen):
            time.sleep(0.5)
    finally:
        q.stop()
    words = set().union(*seen) if seen else set()
    assert words <= {"alpha", "beta", "gamma", "delta"}
    assert words  # at least one batch produced counts
