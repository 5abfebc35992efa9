"""Property tests for the deterministic sampling operators: reproducibility
(the defining feature), fraction accuracy, cap enforcement, and the
plan shapes the scale story depends on (filter-only stratification, top-k
not global sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crane_stream_processing_spark.operators import sampling as SA


def _people(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_stratified_fractions_and_determinism(spark):
    df = _people(spark)
    frac = {"0": 0.5, "1": 0.1}
    got1 = SA.stratified_sample(df, "grp", frac, "pid", default_fraction=0.25)
    got2 = SA.stratified_sample(df, "grp", frac, "pid", default_fraction=0.25)
    rows1 = {r.pid for r in got1.collect()}
    rows2 = {r.pid for r in got2.collect()}
    assert rows1 == rows2  # identical draw every run
    by_grp = {
        r.grp: r.n
        for r in got1.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # 500 rows per stratum; md5 is uniform so tolerate ±40%
    assert 150 <= by_grp["0"] <= 350
    assert 20 <= by_grp["1"] <= 90
    assert 75 <= by_grp["2"] <= 180


def test_stratified_is_filter_only(spark):
    plan = SA.stratified_sample(
        _people(spark), "grp", {"0": 0.5}, "pid"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure codegen filter, no shuffle


def test_uniform_k_exact_size_and_topk_plan(spark):
    df = _people(spark)
    sample = SA.uniform_k(df, 50, "pid")
    assert sample.count() == 50
    assert {r.pid for r in sample.collect()} == {
        r.pid for r in SA.uniform_k(df, 50, "pid").collect()
    }
    plan = sample._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global Sort


def test_cap_per_group_enforced(spark):
    df = _people(spark)
    capped = SA.cap_per_group(df, "grp", 7, "pid")
    sizes = [
        r.n for r in capped.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert sizes == [7, 7, 7, 7]
    # under-cap groups pass through whole
    small = SA.cap_per_group(_people(spark, 8), "grp", 7, "pid")
    assert small.count() == 8


def test_hex_threshold_edges(spark):
    assert SA.hex_threshold(0.0) == "00000000"
    assert SA.hex_threshold(0.5) == "80000000"
    # fraction=1.0 must sort above EVERY hex hash (a naive 9-digit
    # '100000000' sorts below 'f...' and drops ~15/16 of rows)
    assert SA.hex_threshold(1.0) > "ffffffff"
    df = _people(spark, 100)
    assert SA.stratified_sample(df, "grp", {}, "pid", default_fraction=1.0).count() == 100
    assert SA.stratified_sample(df, "grp", {}, "pid", default_fraction=0.0).count() == 0


def test_weighted_sample_matches_scalar_thresholds(spark):
    """hex_threshold_col(lit(f)) must select exactly the rows the scalar
    hex_threshold(f) selects — the column form is the same mapping."""
    df = _people(spark)
    for f in (0.0, 0.25, 1.0):
        col_rows = {
            r.pid for r in SA.weighted_sample(df, F.lit(f), "pid").collect()
        }
        scalar_rows = {
            r.pid
            for r in df.filter(
                SA.hash_uniform_hex("pid") < F.lit(SA.hex_threshold(f))
            ).collect()
        }
        assert col_rows == scalar_rows, f"fraction {f}"
    assert SA.weighted_sample(df, F.lit(0.0), "pid").count() == 0
    assert SA.weighted_sample(df, F.lit(1.0), "pid").count() == df.count()


def test_weighted_sample_per_row_weights(spark):
    """Per-row weights: rows with weight 1 all kept, weight 0 all dropped,
    and the mid stratum lands near its fraction; draws are reproducible."""
    df = _people(spark).withColumn(
        "w",
        F.when(F.col("grp") == "0", 1.0)
        .when(F.col("grp") == "1", 0.0)
        .otherwise(0.5),
    )
    got = SA.weighted_sample(df, F.col("w"), "pid")
    by_grp = {
        r.grp: r.n
        for r in got.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_grp["0"] == 500
    assert "1" not in by_grp
    assert 350 <= by_grp["2"] + by_grp["3"] <= 650
    again = {r.pid for r in SA.weighted_sample(df, F.col("w"), "pid").collect()}
    assert again == {r.pid for r in got.collect()}


def test_null_id_rows_participate_in_samples(spark):
    """md5(NULL) is NULL and NULL < t is unknown — without the sentinel
    draw, malformed-id rows silently vanish from every sample even at
    keep-probability 1.0."""
    df = spark.createDataFrame(
        [(None, "broken"), (1, "a"), (2, "b")], "doc_id int, tag string"
    )
    kept = SA.weighted_sample(df, F.lit(1.0), "doc_id").collect()
    assert len(kept) == 3  # keep-everything keeps the NULL-id row too

    frac = SA.stratified_sample(
        df, "tag", {"broken": 1.0, "a": 1.0, "b": 1.0}, "doc_id"
    ).count()
    assert frac == 3


def test_stratified_many_strata_stays_flat(spark):
    """300 strata must analyze/execute fine (flat chained CASE, not
    300-deep nesting)."""
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 300).cast("string").alias("s"),
    )
    fractions = {str(i): (1.0 if i % 2 else 0.0) for i in range(300)}
    got = SA.stratified_sample(df, "s", fractions, "doc_id")
    n = got.count()
    assert 0 < n < 3000
    assert got.filter((F.col("doc_id") % 300) % 2 == 0).count() == 0
