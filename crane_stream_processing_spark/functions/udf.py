"""User-extension surface — the reference's ``App`` interface re-expressed
(SURVEY.md §2.10).

A reference application supplies one flatMap-like ``transform`` (worker)
and one keyed-merge ``join`` aggregate (sink) in Go
(reference ``server/Crane.go:179-188``). The Spark-native equivalents:

- scalar element-wise logic → :func:`scalar_pandas_udf` (Arrow-batched;
  10-100× over row-at-a-time Python UDFs — the engine's default Python
  escape hatch)
- keyed aggregate → :func:`grouped_agg_pandas_udf` (partial-aggregatable
  where possible; else applied post-shuffle per group)
- per-group arbitrary logic (the general ``join``) → :func:`grouped_map`
  (``applyInPandas``)
- table-valued / flatMap transform → :func:`flat_map` (``mapInPandas``)

All four run partition-parallel over Arrow batches; none materialize a
group or partition on the driver. Built-in column expressions remain the
fast path — these wrappers exist for logic that genuinely needs Python
(SURVEY.md §4: UDFs are the slow path; keep hot paths JVM-side).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DataType

__all__ = [
    "scalar_pandas_udf",
    "grouped_agg_pandas_udf",
    "grouped_map",
    "flat_map",
]


def scalar_pandas_udf(fn: Callable[..., pd.Series], return_type: DataType | str):
    """Wrap a pandas Series→Series function as an Arrow-batched scalar UDF —
    the element-wise half of the reference ``transform``."""
    return pandas_udf(fn, returnType=return_type)


def grouped_agg_pandas_udf(fn: Callable[..., Any], return_type: DataType | str):
    """Wrap a pandas Series→scalar function as a grouped-aggregate UDF —
    the keyed-merge ``join`` (``server/wordCount.go:45-74``) without the
    per-messageId staging cache (micro-batch transactionality is Spark's).

    Uses the type-hint dispatch (Series → scalar annotation), not the
    deprecated ``PandasUDFType.GROUPED_AGG`` enum — the enum path warns on
    every call under Spark 4 and is slated for removal. The output type is
    governed by ``return_type``; the ``float`` hint only selects the
    aggregate (Series-to-scalar) evaluation mode. Variadic: a
    multi-column aggregate (weighted mean over (value, weight)) receives
    one Series per bound column — a fixed single-Series wrapper would
    TypeError at execution for every multi-column call."""

    def agg(*cols: pd.Series) -> float:
        return fn(*cols)

    return pandas_udf(agg, returnType=return_type)


def grouped_map(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: Any,
) -> DataFrame:
    """Per-group arbitrary pandas logic via applyInPandas: one shuffle on
    ``keys``, then each group processed as a local pandas frame. Groups must
    fit in executor memory — keep keys high-cardinality (the 100 TB rule;
    the reference instead funneled ALL keys to one sink node, its admitted
    bottleneck, SURVEY.md §4)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def flat_map(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: Any,
) -> DataFrame:
    """Arrow-batched flatMap via mapInPandas — the table-valued transform
    (0..n output rows per input row), partition-parallel, no shuffle."""
    return df.mapInPandas(fn, schema=schema)
