"""Scale-engineering recipes: custom checkpointed state
(applyInPandasWithState), skew salting, and bucketed co-located joins —
each asserted for both correctness and the plan/state property that makes
it scale."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from crane_stream_processing_spark.catalog import load_table
from crane_stream_processing_spark.operators.skew import (
    salted_agg_sum,
    salted_count,
    salted_join,
)


def test_stateful_running_count_across_batches(spark, tmp_path):
    """applyInPandasWithState: keyed state accumulates across micro-batches
    (the reference joiner's running result map, now checkpointed)."""
    from crane_stream_processing_spark.streaming.stateful import running_keyed_count

    src = tmp_path / "src"
    src.mkdir()
    out: dict[str, int] = {}

    def sink(df, batch_id):
        for r in df.collect():
            out[r.key] = r.total

    (src / "b1.txt").write_text("a\nb\na\n")
    lines = spark.readStream.format("text").load(str(src)).select(
        F.col("value").alias("key")
    )
    q = (
        running_keyed_count(lines)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert out == {"a": 2, "b": 1}
        # second batch: state carries over
        (src / "b2.txt").write_text("a\nc\n")
        q.processAllAvailable()
    finally:
        q.stop()
    assert out == {"a": 3, "b": 1, "c": 1}


def test_stateful_state_survives_restart(spark, tmp_path):
    """Kill the stateful query, restart from the SAME checkpoint: GroupState
    must be restored, so totals keep accumulating (the reference lost all
    joiner state on restart, SURVEY.md §2.9 ST6)."""
    from pyspark.sql import functions as F

    from crane_stream_processing_spark.streaming.stateful import running_keyed_count

    src = tmp_path / "src"
    src.mkdir()
    out: dict[str, int] = {}

    def sink(df, batch_id):
        for r in df.collect():
            out[r.key] = r.total

    def run_once():
        lines = spark.readStream.format("text").load(str(src)).select(
            F.col("value").alias("key")
        )
        q = (
            running_keyed_count(lines)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "b1.txt").write_text("a\na\nb\n")
    run_once()
    assert out == {"a": 2, "b": 1}
    (src / "b2.txt").write_text("a\nb\nb\n")
    run_once()  # fresh query object, same checkpoint → state restored
    assert out == {"a": 3, "b": 3}


def test_salted_count_and_sum_match_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {r.event_type: r.cnt for r in salted_count(ev, ["event_type"]).collect()}
    assert salted == plain

    plain_sum = {
        r.event_type: round(r.s, 6)
        for r in ev.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    got_sum = {
        r.event_type: round(r.sum_value, 6)
        for r in salted_agg_sum(ev, ["event_type"], "value").collect()
    }
    assert got_sum.keys() == plain_sum.keys()
    for k in plain_sum:
        assert got_sum[k] == pytest.approx(plain_sum[k], rel=1e-9)


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").count()
    got = salted_join(orders, cust, "o_custkey", salt_buckets=4).count()
    assert got == plain


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketed tables co-located on the join key: the sort-merge join
    reads pre-bucketed files — no Exchange on either side (the 100 TB
    repeated-join pattern: pay the shuffle once at write time)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for df, name in ((orders, "orders_b"), (li, "lineitem_b")):
        df.write.mode("overwrite").bucketBy(8,
            "o_orderkey" if name == "orders_b" else "l_orderkey"
        ).sortBy("o_orderkey" if name == "orders_b" else "l_orderkey").saveAsTable(name)
    try:
        j = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and it's still correct
        want = {
            r.o_orderstatus: r.n
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {r.o_orderstatus: r.n for r in j.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_countmin_never_undercounts(spark, sf_dir):
    """CMS structural guarantee: every estimate >= the true count (each
    bucket sums a superset of the key's rows), and the estimate equals
    the minimum across the 3 independent hash rows."""
    from crane_stream_processing_spark.inventory import REGISTRY

    rows = REGISTRY["agg_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.cms_estimate >= r.true_count for r in rows)


def test_quality_gate_audit_is_consistent(spark, sf_dir):
    """Per-rule failure counts must cover all non-passing docs: a doc
    fails the gate iff it fails >=1 rule, so n_docs - n_pass <= sum of
    rule-failure counts (a doc can fail several rules) and every rule
    count <= n_docs - n_pass is NOT required — but n_pass + any single
    rule's failures <= n_docs always holds."""
    from crane_stream_processing_spark.inventory import REGISTRY

    for r in REGISTRY["curate_quality_gate"].fn(spark, sf_dir).collect():
        fails = r.fail_len + r.fail_wordlen + r.fail_stop + r.fail_rep
        assert r.n_docs - r.n_pass <= fails
        for f in (r.fail_len, r.fail_wordlen, r.fail_stop, r.fail_rep):
            assert r.n_pass + f <= r.n_docs


def test_deterministic_hll_accuracy(spark, sf_dir):
    """The md5-HLL estimate must land within the sketch's theoretical
    error envelope (~1.04/sqrt(256) ≈ 6.5% per-group; allow 3 sigma) of
    the exact distinct count it reports alongside."""
    from crane_stream_processing_spark.inventory import REGISTRY

    rows = REGISTRY["agg_hll_deterministic_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact <= 0.20, (
            r.event_type, r.hll_estimate, r.n_exact
        )


def test_stateful_running_count_long_key(spark, tmp_path):
    """Non-string grouping keys (long user ids) must work: the output
    schema mirrors the input key column's name and type instead of a
    hardcoded 'key string'."""
    import os

    from crane_stream_processing_spark.streaming.stateful import (
        running_keyed_count,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write('{"user_id": 7}\n{"user_id": 7}\n{"user_id": 9}\n')
    stream = spark.readStream.schema("user_id long").json(src)
    out = running_keyed_count(stream, key_col="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("long_key_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.user_id, r.total) for r in spark.table("long_key_counts").collect()}
    assert got == {(7, 2), (9, 1)}
