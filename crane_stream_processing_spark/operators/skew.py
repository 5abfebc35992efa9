"""Skew-mitigation recipes: salting for hot keys (SURVEY.md scale rules).

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.get_spark); these
explicit recipes cover the cases AQE can't — a single hot GROUP BY key
whose partial aggregate is itself too large for one task, and broadcast-
ineligible joins against a skewed key distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_count", "salted_agg_sum", "salted_join"]


def _salt(df: DataFrame, n: int) -> Column:
    # DETERMINISTIC spread: hash of the full row content, mod n. F.rand
    # would be wrong here, not just untidy — rand is seeded per partition
    # index and row order, so a partial stage retry after a fetch failure
    # can re-salt rows onto different reduce partitions than the surviving
    # shuffle output, duplicating or losing rows. A content hash assigns
    # every recomputation of a row the same salt. Identical rows share a
    # salt (their partials collapse into one bucket), which slightly
    # weakens spreading for mass-duplicated rows but never correctness —
    # and the salt never reaches output columns.
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast(
        "int"
    )


def salted_count(df: DataFrame, keys: Sequence[str], salt_buckets: int = 16) -> DataFrame:
    """Two-phase count: groupBy(key, salt) partial → groupBy(key) final.
    A key with 10^9 rows becomes ``salt_buckets`` parallel partials instead
    of one straggler task."""
    keys = list(keys)
    partial = (
        df.withColumn("__salt", _salt(df, salt_buckets))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("cnt"))


def salted_agg_sum(
    df: DataFrame, keys: Sequence[str], value: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase sum with the same salting shape (decimal-safe: caller
    casts if cross-engine exactness is needed)."""
    keys = list(keys)
    partial = (
        df.withColumn("__salt", _salt(df, salt_buckets))
        .groupBy(*keys, "__salt")
        .agg(F.sum(value).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"sum_{value}"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed-side salting: the skewed fact side gets a random salt in
    [0, n); the small side is exploded n× with every salt value, then the
    join runs on (key, salt) — the hot key's rows spread over n tasks.

    Use when the small side is too big to broadcast but the key histogram
    is pathological; cost = n× replication of the small side.

    ``how`` must not preserve unmatched SMALL-side rows: the small side is
    physically replicated per salt, so right/full outer would emit each
    unmatched small row ``salt_buckets`` times (and pad matched keys with
    one null-extended row per salt the fact rows missed). Salt the other
    side instead for those shapes."""
    if how in ("right", "rightouter", "right_outer", "full", "outer",
               "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched small-side "
            "rows once per salt bucket; swap the sides (salt the small "
            "side's counterpart) for right/full outer semantics"
        )
    salted_fact = skewed.withColumn("__salt", _salt(skewed, salt_buckets))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
