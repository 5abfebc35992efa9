"""Named query inventory — the driver-facing surface of the engine.

Every operator from SURVEY.md §2 (and the north-star LLM-pipeline ops) is
exposed as a named query: a Spark callable ``(spark, sf_dir) -> DataFrame``
paired, where SQL-expressible, with an equivalent ANSI-SQL oracle string the
driver runs through DuckDB on the same parquet tables. Column names/aliases
match exactly between the two — the driver's compare hashes values after
sorting columns by name.

Float determinism: cross-engine double aggregation differs in the last ulps
(summation order), so money/quantity aggregates go through an exact decimal
cast on BOTH sides (:func:`dsum` here, ``CAST(SUM(CAST(x AS DECIMAL(..))) AS
DOUBLE)`` in the oracle) — decimal addition is exact and order-independent,
and the final decimal→double conversion is identical IEEE rounding in both
engines. Timestamps in query outputs are formatted to strings to dodge
timezone/typing drift between Spark (session-TZ) and DuckDB (naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

__all__ = ["Query", "REGISTRY", "query", "t", "t_cpu", "dsum", "davg"]


@dataclass(frozen=True)
class Query:
    """One named engine query: the Spark implementation plus (optionally)
    the DuckDB oracle SQL. ``oracle=None`` → driver runs a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name``. Used as a decorator; the decorated
    function's docstring becomes the query's doc."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_SCAN_PARTS: dict[tuple[str, str], int] = {}  # (sf_dir, table) → scan partitions


def t_cpu(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table for a CPU-bound per-row operator (minhash, simhash,
    per-pair dot products): when the scan yields fewer partitions than the
    session's parallelism (small/single parquet files), repartition so the
    heavy row-local compute uses every core. At 100 TB the scan already has
    more partitions than cores and this is a no-op — the guard keeps the
    extra shuffle strictly for the under-partitioned case. The probe
    (an RDD conversion) is cached per (sf_dir, table): static input files
    → static partition count."""
    df = load_table(spark, sf_dir, name)
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = (sf_dir, name)
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    if _SCAN_PARTS[key] < p:
        df = df.repartition(p)
    return df


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent, cross-engine-exact SUM of a double column: cast to
    decimal (exact, associative addition), sum, cast back to double.
    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(28,scale))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """AVG with the same exactness trick: exact decimal sum divided by count
    in double. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(28,scale))) AS DOUBLE) / COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def _load_all() -> None:
    # Import side-effect registers every query module.
    from . import core  # noqa: F401

    for mod in ("joins", "aggregates", "windows", "scalars", "setops",
                "eventtime", "northstar", "streaming_queries", "analytics",
                "tpch_full", "spark4", "curation", "relevance"):
        __import__(f"{__name__}.{mod}")


_load_all()
