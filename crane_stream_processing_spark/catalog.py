"""Table catalog for the driver-generated parquet tables (TESTDATA.md).

The reference system's "catalog" was SDFS's name→versions map
(reference ``server/sdfs.go:24``); here tables are parquet directories and
the catalog is this module: explicit schemas (FIXTURES.md §B) so readers
never rely on inference, plus loaders that register temp views.

At 100 TB each table is a partitioned parquet dataset; nothing here assumes
single-file layout — ``load_table`` takes any path spark.read.parquet accepts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import exclude_generate_filter_rule

__all__ = [
    "TABLES",
    "SCHEMAS",
    "default_sf_dir",
    "load_table",
    "load_tables",
    "normalize_events_ts",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_engine_confs(spark: SparkSession) -> None:
    """Self-set the confs the engine's semantics depend on, runtime-safe
    on sessions the engine didn't build (the driver's own session):

    - UTC timestamp semantics — oracle-comparable, cluster-independent
      rendering/windowing/literal-casting of TIMESTAMP values;
    - the InferFiltersFromGenerate exclusion (see session.py).

    ``load_table`` calls this on every read; queries that serve from a
    memoized fixture directory (and so may never touch ``load_table`` on
    a fresh session) must call it directly before building
    timestamp-sensitive expressions."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    exclude_generate_filter_rule(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Parquet carries its own schema; the catalog
    schema in SCHEMAS is the declared contract (asserted in tests)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    ensure_engine_confs(spark)
    if name == "events":
        # events.ts may be stored as TIMESTAMP(NANOS) (generation-dependent);
        # without this conf such a scan throws PARQUET_TYPE_ILLEGAL. Harmless
        # for MICROS files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and "ts" in df.columns:
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts → TIMESTAMP_LTZ (UTC session) whatever the stored type:
    TIMESTAMP(NANOS) arrives as long under nanosAsLong → integer-divide
    ns → µs (no double-precision loss; DuckDB truncates identically);
    TIMESTAMP(MICROS) NTZ → reinterpret in the UTC session. The single
    definition of the timestamp contract — batch (load_table) and
    streaming (streaming_queries) both call it, so the two paths cannot
    disagree on the same column."""
    kind = df.schema["ts"].dataType.typeName()
    if kind == "long":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if kind == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so SQL queries can run against it
    (mirrors the DuckDB-side view registration the driver does)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
