"""Multi-dimensional data layout: Z-order (Morton) clustering for writes.

The reference stores blobs whole (server/sdfs.go:243-285) — it has no
notion of data layout. At 100 TB, layout IS the query optimizer's best
friend: parquet row-group min/max stats can only skip files if the writer
clustered the data. Hive partitioning (io_partitioned_roundtrip) handles
ONE low-cardinality dimension; Z-ordering handles the common case of TWO
high-cardinality predicate dimensions (customer × date, part × supplier)
by interleaving the bits of both keys into a single sort key, so a range
box on EITHER dimension maps to a bounded set of Z-runs — every file
holds a small rectangle of the (a, b) space and per-file min/max stats
prune on both columns at once.

Everything here is pure column expressions (whole-stage codegen; the
classic magic-number bit spread is 4 shift-mask steps per key) plus a
``repartitionByRange`` — one shuffle at write time buys file skipping on
every future scan. No UDFs, no driver work; the range exchange samples
the Z key distribution, so skew in either raw key is absorbed by the
sampler, and the write parallelism equals the target file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_interleave", "write_zordered"]

# (mask, shift) steps spreading a 16-bit int so its bits occupy even
# positions of a 32-bit int: 0xFFFF -> 0x55555555 pattern.
_SPREAD_STEPS = (
    (0x00FF00FF, 8),
    (0x0F0F0F0F, 4),
    (0x33333333, 2),
    (0x55555555, 1),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions (long
    arithmetic end-to-end; matches the SQL-expressible shift/mask ladder
    so any engine derives the identical value)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for mask, shift in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_interleave(a: Column, b: Column) -> Column:
    """32-bit Morton code of two 16-bit keys: bits of ``a`` at even
    positions, ``b`` at odd. Values beyond 16 bits are masked (layout
    keys, not identities — collisions only cost locality, never
    correctness)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of
    ``(col_a, col_b)``: range-partition on the Morton code (the exchange
    samples the code distribution — balanced files even when the raw
    keys are skewed), sort within each partition, drop the helper
    column. Each output file then covers a small rectangle of the key
    space and its parquet min/max stats prune scans filtered on either
    column. At 100 TB: one extra shuffle per write, file skipping on
    every read thereafter.

    Both keys are min-max scaled to the full 16-bit range before
    interleaving — REQUIRED for the curve to actually alternate between
    dimensions. Raw keys of different magnitudes (customer id vs epoch
    day) put all their varying bits at different Morton positions, so
    the sort would effectively order by the wider key alone and the
    narrow key would never cluster (the first version of this module
    did exactly that; tests/test_layout.py now measures the rectangle
    property). The min/max pass is a two-column aggregate — one cheap
    extra scan; swap in approx-quantile bucket boundaries
    (rank-normalization, Delta-style) if a key's distribution is so
    skewed that linear scaling collapses most rows into few codes."""
    # Namespaced helper columns: un-prefixed names like a_min would
    # collide with same-named user columns after the condition-less
    # broadcast join (ambiguous reference, or drop() stripping the
    # user's own column from the written table).
    A_MIN, A_MAX = "__crane_a_min__", "__crane_a_max__"
    B_MIN, B_MAX = "__crane_b_min__", "__crane_b_max__"
    stats = df.agg(
        F.min(col_a).alias(A_MIN),
        F.max(col_a).alias(A_MAX),
        F.min(col_b).alias(B_MIN),
        F.max(col_b).alias(B_MAX),
    )

    def scaled(col: str, lo: Column, hi: Column) -> Column:
        # Guard only the constant-column case; flooring the span at 1
        # would collapse all codes for float keys with range < 1 (score
        # columns in [0, 1]).
        raw = (hi - lo).cast("double")
        span = F.when(raw <= 0, F.lit(1.0)).otherwise(raw)
        return ((F.col(col) - lo).cast("double") / span * 65535).cast("long")

    z = "__crane_zorder__"
    (
        df.join(F.broadcast(stats))
        .withColumn(
            z,
            morton_interleave(
                scaled(col_a, F.col(A_MIN), F.col(A_MAX)),
                scaled(col_b, F.col(B_MIN), F.col(B_MAX)),
            ),
        )
        .drop(A_MIN, A_MAX, B_MIN, B_MAX)
        .repartitionByRange(num_files, F.col(z))
        .sortWithinPartitions(z)
        .drop(z)
        .write.mode(mode)
        .parquet(path)
    )
