"""Batch IO — S11 (parquet/csv/json scans) plus the reference's
malformed-record discipline (P5: log-and-drop, SURVEY.md §1.3).

The reference parses lines positionally and drops arity mismatches
(reference ``server/wordCount.go:46-49`` "data format error"); the
relational equivalent is schema-on-read with ``DROPMALFORMED``. All readers
take an explicit schema — inference is a correctness hazard (sampling) and
a performance hazard (extra pass) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_parquet", "read_csv", "read_json", "read_xml", "write_table"]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — schema from file metadata, predicate/projection
    pushdown into row groups for free."""
    return spark.read.parquet(path)


def _reject_reserved(options: dict, reserved: dict[str, str]) -> None:
    for opt, owner in reserved.items():
        if opt in options:
            raise ValueError(
                f"reader option {opt!r} is owned by the {owner} parameter — "
                "set that instead of passing it through **options"
            )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    drop_malformed: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema; malformed rows dropped (the
    reference's log-and-drop) unless ``drop_malformed=False`` (PERMISSIVE:
    bad cells become NULL).

    Engine caveat (verified on Spark 4.1): DROPMALFORMED validates only
    the columns a query actually parses, so the VISIBLE row set is
    projection-scoped — ``count()`` (parses nothing) counts malformed
    rows that a full-row ``collect()`` drops, and the historical
    ``spark.sql.csv.parser.columnPruning.enabled=false`` escape hatch no
    longer changes this. When drops must be deterministic and auditable
    regardless of projection, parse PERMISSIVE with a
    ``columnNameOfCorruptRecord`` field, CACHE the parsed result, then
    filter — or land the file as-is and gate it through the DQ audit
    (``curate_dq_audit``) before use."""
    _reject_reserved(options, {"mode": "drop_malformed", "header": "header"})
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    drop_malformed: bool = True,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with explicit schema (never inference — one pass,
    stable types)."""
    _reject_reserved(options, {"mode": "drop_malformed"})
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return spark.read.schema(schema).options(mode=mode, **options).json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    row_tag: str = "row",
    drop_malformed: bool = True,
    **options: str,
) -> DataFrame:
    """XML scan (Spark 4 built-in ``xml`` source) with explicit schema —
    same discipline as the CSV/JSON readers: no inference pass, malformed
    records dropped (the reference's log-and-drop, P5)."""
    _reject_reserved(options, {"mode": "drop_malformed", "rowTag": "row_tag"})
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return (
        spark.read.schema(schema)
        .options(rowTag=row_tag, mode=mode, **options)
        .format("xml")
        .load(path)
    )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write a table; ``partition_by`` produces hive-style directory
    partitioning so downstream scans prune partitions on those keys."""
    w = df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
