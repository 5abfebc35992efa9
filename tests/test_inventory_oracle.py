"""Driver-shaped differential test: every REGISTRY query with an oracle is
run on Spark and on DuckDB over the same parquet tables and must match on
column names, row count, and (order-insensitively) values — the same gate
the driver applies at sf0.01 (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from crane_stream_processing_spark.inventory import REGISTRY

from .conftest import assert_query_matches_oracle

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    assert_query_matches_oracle(spark, duck, q.fn, q.oracle, sf_dir)


def test_no_rows_only_queries():
    """Every registry query is oracle-backed: estimates and iterative
    algorithms grade through certificate contracts (exact columns + an
    oracle-asserted bound), so the driver's weaker rows-only check is
    never needed. Rows-only rows may not silently reappear."""
    assert sorted(n for n, q in REGISTRY.items() if q.oracle is None) == []
