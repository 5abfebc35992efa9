"""IO-format roundtrips (S11 + P5 malformed handling) and the distributed
grep app over real text files (P4/A4, reference server/querier.go)."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from crane_stream_processing_spark import io as cio
from crane_stream_processing_spark.apps import grep, grep_counts

SCHEMA = "k int, name string, v double"


def test_csv_roundtrip_and_dropmalformed(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("k,name,v\n1,a,1.5\n2,b,2.5\nnot,a,number,at,all\n")
    df = cio.read_csv(spark, p, SCHEMA)
    rows = sorted((r.k, r.name, r.v) for r in df.collect())
    # malformed line dropped — the reference's log-and-drop (P5)
    assert rows == [(1, "a", 1.5), (2, "b", 2.5)]


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.json")
    with open(p, "w") as f:
        f.write('{"k":1,"name":"a","v":1.5}\n{"k":2,"name":"b","v":2.5}\nnot json\n')
    df = cio.read_json(spark, p, SCHEMA)
    assert df.count() == 2


def test_xml_roundtrip_escaping_and_dropmalformed(spark, tmp_path):
    """Spark 4 built-in XML source under the same explicit-schema +
    DROPMALFORMED discipline: entity-escaped text round-trips byte-exact,
    a structurally broken record is dropped, not surfaced as nulls."""
    src = spark.createDataFrame(
        [(1, "a < b & c > d", 1.5), (2, 'quote " and unicode é', 2.5)],
        "k int, name string, v double",
    )
    d = str(tmp_path / "x")
    src.write.mode("overwrite").option("rowTag", "row").option(
        "rootTag", "rows"
    ).format("xml").save(d)
    back = cio.read_xml(spark, d, SCHEMA, row_tag="row")
    rows = sorted((r.k, r.name, r.v) for r in back.collect())
    assert rows == [(1, "a < b & c > d", 1.5), (2, 'quote " and unicode é', 2.5)]

    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "part.xml"), "w") as f:
        f.write(
            "<rows><row><k>1</k><name>ok</name><v>1.0</v></row>"
            "<row><k>oops</k><name>broken</name><v>zzz</v></row></rows>"
        )
    got = cio.read_xml(spark, bad, SCHEMA, row_tag="row").collect()
    assert [(r.k, r.name, r.v) for r in got] == [(1, "ok", 1.0)]


def test_write_partitioned_parquet_prunes(spark, tmp_path):
    out = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)], SCHEMA
    )
    cio.write_table(df, out, partition_by=["name"])
    back = cio.read_parquet(spark, out).filter(F.col("name") == "x")
    assert sorted(r.k for r in back.collect()) == [1, 3]
    # partition pruning: the predicate lands in PartitionFilters (directory
    # pruning BEFORE any file is opened), not as a post-scan Filter
    assert os.path.isdir(os.path.join(out, "name=x"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*name#\d+ = x", plan)


def test_grep_lines_and_counts(spark, tmp_path):
    """MP1 scatter-gather: regex matches annotated with source file + line
    number, per-file counts (reference server/querier.go:15-56)."""
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "vm1.log").write_text("error: disk\ninfo: ok\nerror: net\n")
    (logs / "vm2.log").write_text("info: fine\nerror: cpu\n")

    matches = grep(spark, str(logs), r"^error")
    got = sorted(
        (os.path.basename(r.vm), r.line_no, r.value) for r in matches.collect()
    )
    assert got == [
        ("vm1.log", 1, "error: disk"),
        ("vm1.log", 3, "error: net"),
        ("vm2.log", 2, "error: cpu"),
    ]
    counts = {os.path.basename(r.vm): r.cnt for r in grep_counts(matches).collect()}
    assert counts == {"vm1.log": 2, "vm2.log": 1}

