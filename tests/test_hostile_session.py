"""Hostile-session regression: the driver runs registry queries on ITS OWN
SparkSession — default confs, arbitrary timezone, none of the engine's
builder config. Every conf the engine depends on (UTC semantics, NANOS
timestamp reads, the InferFiltersFromGenerate exclusion) must be
self-set at runtime by load_table / the streaming readers, not assumed.

spark.newSession() shares the SparkContext but gets its own SQLConf; the
test then actively sets adversarial values to prove the engine recovers.
"""

from __future__ import annotations

import pytest

from crane_stream_processing_spark.inventory import REGISTRY

from .conftest import assert_query_matches_oracle

# One query per self-set dependency: timestamp semantics (events table),
# the generate-filter exclusion (shingle explode), money aggregates (UTC
# date predicate), a streaming reader with its own conf path, the
# saveAsTable/warehouse path (bucketed fixture on a catalog the engine
# didn't prepare), and the Arrow Python-worker path.
HOSTILE_CHECKED = [
    "evt_tumbling_daily_by_type",
    "curate_decontaminate",
    "q1_pricing_summary",
    "stream_tumbling_daily_by_type",
    "io_bucketed_colocated_join",
    "udf_flatmap_token_rows",
    # round-2 additions with their own timezone-sensitive surface:
    # date_trunc('week')+date_format (retention) and the forward as-of's
    # timestamp formatting must self-correct on a non-UTC session
    "evt_retention_cohorts",
    "join_asof_next_purchase_after_error",
]


@pytest.fixture(scope="module")
def hostile(spark):
    ns = spark.newSession()
    # Adversarial defaults: wrong timezone, NANOS reads disabled, no
    # optimizer exclusions. The engine must override all three itself.
    ns.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ns.conf.set("spark.sql.optimizer.excludedRules", "")
    return ns


@pytest.mark.parametrize("name", HOSTILE_CHECKED)
def test_query_matches_oracle_on_hostile_session(hostile, duck, sf_dir, name):
    q = REGISTRY[name]
    assert_query_matches_oracle(hostile, duck, q.fn, q.oracle, sf_dir)


# Fixture-memoized queries can skip load_table entirely on a session that
# didn't create the fixture — the conf self-set must then come from the
# query body (catalog.ensure_engine_confs). Prime the memo on the normal
# session FIRST so the hostile session truly hits the memoized path; both
# picked queries compare/format timestamps, the conf-sensitive operation.
MEMOIZED_TS_SENSITIVE = ["src_orc_roundtrip", "io_zorder_layout"]


@pytest.mark.parametrize("name", MEMOIZED_TS_SENSITIVE)
def test_memoized_fixture_query_on_hostile_session(
    spark, hostile, duck, sf_dir, name
):
    q = REGISTRY[name]
    q.fn(spark, sf_dir).collect()  # populate the per-process fixture memo
    hostile.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    assert_query_matches_oracle(hostile, duck, q.fn, q.oracle, sf_dir)
