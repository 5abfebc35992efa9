"""UDF-surface tests (SURVEY.md §2.10): the four extension points of the
reference App interface as Arrow-batched pandas UDFs, each checked against
the equivalent built-in expression on real driver-table data."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pytest

from pyspark.sql import functions as F

from crane_stream_processing_spark.functions.udf import (
    flat_map,
    grouped_agg_pandas_udf,
    grouped_map,
    scalar_pandas_udf,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    from crane_stream_processing_spark.catalog import load_table

    return load_table(spark, sf_dir, "orders")


def test_scalar_pandas_udf(spark, orders):
    net = scalar_pandas_udf(lambda s: s * 0.9, "double")
    got = orders.select(
        F.round(net("o_totalprice"), 6).alias("a"),
        F.round(F.col("o_totalprice") * 0.9, 6).alias("b"),
    )
    assert got.filter(F.col("a") != F.col("b")).count() == 0


def test_grouped_agg_pandas_udf(spark, orders):
    mean_udf = grouped_agg_pandas_udf(lambda s: s.mean(), "double")
    got = {
        r.o_orderstatus: r.m
        for r in orders.groupBy("o_orderstatus")
        .agg(F.round(mean_udf("o_totalprice"), 6).alias("m"))
        .collect()
    }
    want = {
        r.o_orderstatus: r.m
        for r in orders.groupBy("o_orderstatus")
        .agg(F.round(F.avg("o_totalprice"), 6).alias("m"))
        .collect()
    }
    assert got == want


def test_grouped_map_apply_in_pandas(spark, orders):
    def top1(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.nlargest(1, "o_totalprice")
        return out[["o_custkey", "o_orderkey", "o_totalprice"]]

    got = grouped_map(
        orders,
        ["o_custkey"],
        top1,
        "o_custkey long, o_orderkey long, o_totalprice double",
    )
    # cross-check per-customer max price against built-in agg
    want = orders.groupBy("o_custkey").agg(F.max("o_totalprice").alias("mx"))
    joined = got.join(want, "o_custkey")
    assert joined.filter(F.col("o_totalprice") != F.col("mx")).count() == 0
    assert got.count() == want.count()


def test_flat_map_in_pandas(spark, orders):
    def split_priority(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "o_orderkey": pdf["o_orderkey"].repeat(2),
                    "tag": ["a", "b"] * len(pdf),
                }
            )

    got = flat_map(orders, split_priority, "o_orderkey long, tag string")
    assert got.count() == 2 * orders.count()
    assert set(r.tag for r in got.select("tag").distinct().collect()) == {"a", "b"}
