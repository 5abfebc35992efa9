"""Sampling operators (north-star surface): the corpus-shaping steps of a
training-data pipeline — stratified sampling, uniform-k selection, and
per-group caps (domain balancing).

All sampling here is DETERMINISTIC: the "random" draw for a row is a pure
hash of its id (md5, the one hash Spark and DuckDB share bit-for-bit), so
a sample is reproducible across runs, engines, and cluster layouts —
exactly what a data pipeline wants for auditable corpus construction, and
what lets the DuckDB oracle reproduce every sampled row. The reference has
no sampling surface (SURVEY.md §2); this is north-star machinery.

Scale: every operator is a narrow projection + filter (no shuffle) or a
single window/top-k:

- ``stratified_sample``: filter only — the hash threshold is evaluated
  per-row inside codegen; the scan prunes nothing but the filter is
  pipeline-parallel. 100 TB → still one pass, no shuffle.
- ``uniform_k``: global top-k by hash order → TakeOrderedAndProject
  (per-partition heap + driver merge of k·partitions rows), never a full
  sort. k must fit on the driver, which it does by definition of a sample.
- ``cap_per_group``: one hash-partitioned window (row_number per group,
  ordered by hash). Skewed groups are exactly the point (cap the giant
  domain); the shuffle key is the group, so a pathological single-group
  corpus should pre-salt — see operators.skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_uniform_hex",
    "hex_threshold",
    "hex_threshold_col",
    "stratified_sample",
    "weighted_sample",
    "uniform_k",
    "cap_per_group",
    "weighted_topk_es",
]

_HEX_DIGITS = 8  # 32 bits of the digest: plenty for sampling resolution


def hash_uniform_hex(key: Column | str) -> Column:
    """First 8 hex chars of md5(key) — a uniform draw in [0, 16^8)
    represented as a STRING, compared lexicographically (hex strings of
    equal length order identically to their numeric values). Stays a
    string so DuckDB reproduces it with substr(md5(..)) verbatim.

    NULL ids draw from a NUL-byte sentinel instead of propagating NULL:
    md5(NULL) is NULL, every ``NULL < threshold`` comparison is unknown,
    and a bare filter would silently delete malformed-id rows from every
    sample even at keep-probability 1.0. With the sentinel, NULL-id rows
    participate deterministically like any other value (oracle twin:
    ``md5(COALESCE(CAST(id AS VARCHAR), CHR(0)))``)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.coalesce(c.cast("string"), F.lit("\x00"))), 1, _HEX_DIGITS
    )


def hash_bucket(key: Column | str, n: int) -> Column:
    """Deterministic bucket in [0, n) from the id-hash: integer value of
    the first 4 hex digits of md5(key), mod n. Engine-portable — the
    DuckDB twin is ``CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 4))
    AS INTEGER) % n`` — and stable across re-runs/partitionings, which is
    what makes hash sharding resumable and hash splits contamination-safe.
    16 bits of hash: fine for bucket counts << 65536."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")
        % n
    )


def hex_threshold(fraction: float) -> str:
    """The 8-hex-digit threshold t such that P[hash_uniform_hex < t] ==
    fraction (up to 1/16^8): row kept iff its hash string sorts below.
    fraction=1.0 returns 'g', which sorts above every hex string — a
    9-digit '100000000' would sort BELOW 'f...' lexicographically and
    silently drop ~15/16 of rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    val = int(fraction * (16**_HEX_DIGITS))
    if val >= 16**_HEX_DIGITS:
        return "g"
    return format(val, f"0{_HEX_DIGITS}x")


def hex_threshold_col(fraction: Column) -> Column:
    """Column form of :func:`hex_threshold` for per-row/per-group keep
    probabilities. Every step (multiply by the exactly-representable 16^8,
    floor, hex) is IEEE/integer-deterministic, so any engine computing the
    same fraction double produces the same threshold string. fraction >= 1
    maps to 'g' (sorts above all hex — keep everything); lpad would
    otherwise TRUNCATE the 9-digit 16^8 to a near-zero threshold.

    The fraction is let-bound — it is read twice (guard + scale), and
    callers pass computed weights (e.g. size(tokens(text))/100) that must
    not be re-evaluated per reference site."""
    from ..functions import let

    def body(f: Column) -> Column:
        scaled = F.floor(f * F.lit(float(16**_HEX_DIGITS))).cast("bigint")
        # NULL or <= 0 must mean keep-NOTHING ('0'*8 sorts below every md5
        # prefix). Unclamped, a negative weight's two's-complement hex
        # would lpad-truncate to 'ffffffff' — keep-probability ~1, the
        # exact inversion of the caller's intent (e.g. a model score
        # dipping below zero).
        return (
            F.when(~(f > 0.0) | f.isNull(), F.lit("0" * _HEX_DIGITS))
            .when(f >= 1.0, F.lit("g"))
            .otherwise(F.lpad(F.lower(F.hex(scaled)), _HEX_DIGITS, "0"))
        )

    return let(fraction.cast("double"), body)


def weighted_sample(df: DataFrame, weight: Column, id_col: str) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its id-hash draw
    falls below its own weight (a [0,1] keep-probability column — e.g.
    quality score, length/100, a model score). Same contract as
    stratified_sample but the 'stratum' is per-row. Pure filter: no
    shuffle, reproducible on any engine/layout."""
    return df.filter(hash_uniform_hex(id_col) < hex_threshold_col(weight))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its id-hash falls
    below its stratum's threshold. Per-stratum fractions rebalance a
    corpus (e.g. downsample the dominant language); strata absent from
    ``fractions`` get ``default_fraction``. Pure filter — no shuffle, no
    state, same rows every run on any cluster."""
    u = hash_uniform_hex(id_col)
    # Flat chained CASE, not per-stratum nesting: hundreds of strata as
    # nested when(...).otherwise(when(...)) builds an expression tree
    # hundreds of levels deep (slow analysis; eventually codegen stack
    # limits), while a chained when stays constant-depth.
    thresh: Column | None = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(hex_threshold(frac))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    default = F.lit(hex_threshold(default_fraction))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(u < thresh)


def uniform_k(df: DataFrame, k: int, id_col: str) -> DataFrame:
    """Uniform-without-replacement k-sample as a deterministic top-k: the
    k rows with the smallest id-hash. Equivalent in distribution to a
    reservoir sample, but reproducible and engine-portable; executes as
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    return (
        df.withColumn("__u", hash_uniform_hex(id_col))
        .orderBy(F.col("__u").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__u")
    )


def cap_per_group(df: DataFrame, group_col: str, n: int, id_col: str) -> DataFrame:
    """At most ``n`` rows per group, chosen by smallest id-hash — the
    domain-balancing cap of web-corpus curation (no single source may
    dominate). One window over (group, hash-order); rank ties broken by
    id so the result is total-order deterministic."""
    w = Window.partitionBy(group_col).orderBy(
        hash_uniform_hex(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_topk_es(
    df: DataFrame, k: int, weight_col: str, id_col: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, via the
    Efraimidis–Spirakis A-Res keys (Efraimidis & Spirakis, IPL 2006):
    each row draws u ∈ (0, 1] and ranks by u^(1/w) descending —
    equivalently by −ln(u)/w ascending, the form used here (scaled
    ×1000 into O(1) range and ROUNDED to 6 so the cut is engine-exact
    despite ln's last-ulp divergence; id tiebreak). Items win
    proportionally to weight, but each at most once — the property
    `weighted_sample` (Bernoulli, with-replacement-like independence)
    can't give. u derives from the id hash (+1 so ln never sees 0), so
    the draw is deterministic, engine-portable, and stable under
    re-runs/backfills like every other sampler here. Executes as
    TakeOrderedAndProject: per-partition k-heaps, merged on the driver
    — 100 TB in, k rows out, no global sort. Zero/negative weights are
    excluded (their key is undefined/infinite)."""
    u = (
        F.conv(hash_uniform_hex(id_col), 16, 10).cast("long") + 1
    ) / F.lit(float(16**_HEX_DIGITS))
    key = F.round(-F.log(u) * 1000.0 / F.col(weight_col), 6)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").asc(), F.col(id_col).asc())
        .limit(k)
    )
