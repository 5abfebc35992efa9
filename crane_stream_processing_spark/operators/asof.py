"""As-of join: for each left row, attach the latest right row with
right.ts <= left.ts within the same key group (SURVEY.md §2.3 J6 — absent
from both the reference and core Spark; DuckDB ``ASOF JOIN`` oracles it).

Strategy — union + running ``last(ignorenulls)`` window, NOT a range join:
tag both sides, union, then one window pass per key ordered by time carries
the most recent right-side values forward onto left rows. Cost is a single
hash shuffle on the key plus a per-partition sort — linear, skew-tolerant,
and radically cheaper at 100 TB than the naive conditional-join +
row_number() which materializes O(|L|·|R|/keys) intermediate rows.

Equi-join NULL semantics are enforced explicitly: right rows with a NULL
join key or NULL timestamp are dropped before the union (a NULL key never
equals anything; ``NULL <= ts`` is unknown) — without the filter, Spark's
window ``partitionBy`` groups NULL keys into one partition (phantom
NULL=NULL matches) and NULLs-first ordering would let a NULL-ts right row
be carried onto every left row that has no real earlier match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_RESERVED = ("__t", "__side", "__r", "__rlast", "__rback", "__rfwd", "__tb")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_r",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join.

    ``direction="backward"`` (default): for each ``left`` row, the
    ``value_cols`` of the ``right`` row with the greatest ``right_ts``
    satisfying ``right_ts <= left_ts`` and equal join keys — same as DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``. ``direction="forward"``: the right
    row with the SMALLEST ``right_ts >= left_ts`` (the "next event after"
    lookup — DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``); implemented as the
    mirror of the same linear union+window recipe (the window orders time
    descending), so it keeps the single-shuffle cost — never a range join.

    ``direction="nearest"``: whichever of the backward and forward
    candidates lies closer to ``left_ts`` (ties prefer backward, like
    pandas ``merge_asof``); with a ``tolerance`` each candidate is
    bounds-checked BEFORE choosing, so an out-of-range backward match
    never shadows an in-range forward one. Implemented as two window
    frames over the same key shuffle (one Exchange, two Sorts — still
    never a range join).

    ``tolerance`` (optional): a Column bounding how far the matched right
    row may lie from the left timestamp (``F.expr("INTERVAL 7 DAYS")``
    for timestamps, a numeric literal for numeric ts). A match farther
    than the tolerance yields NULLs, exactly like pandas
    ``merge_asof(tolerance=...)``. Implemented as a post-carry filter on
    the matched row's own timestamp (carried inside the struct), so the
    single-shuffle linear plan is unchanged — tolerance adds zero extra
    joins or scans.

    NULLs when no matching right row exists (including every left row
    with a NULL join key — equi-join semantics). Ties on the timestamp are
    broken toward the right row (right sorts before left at equal ts), i.e.
    a right row at exactly ``left_ts`` matches in both directions. Multiple
    right rows at the same (key, ts) are resolved deterministically: the
    lexicographically greatest ``value_cols`` struct wins, so results are
    stable across runs and partitionings.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    value_cols = list(value_cols)

    for c in left.columns:
        if c in _RESERVED:
            raise ValueError(f"left column {c!r} collides with a reserved name")
        if any(c == f"{v}{suffix}" for v in value_cols):
            raise ValueError(
                f"left column {c!r} collides with output alias; pick a "
                f"different suffix"
            )
    for v in value_cols:
        if v in _RESERVED:
            raise ValueError(f"value column {v!r} collides with a reserved name")

    lhs = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    # The matched right row travels as ONE struct: last(ignorenulls) must
    # pick the whole most-recent right ROW, not carry each value column
    # independently — per-column carry would skip a NULL in the newest
    # right row back to a STALE older row's value (and could stitch
    # together columns from different right rows). The struct itself is
    # non-null for every right row (even when all its fields are NULL),
    # so NULL values inside the matched row are preserved as NULLs.
    null_key = F.lit(False)
    for k in on:
        null_key = null_key | F.col(k).isNull()
    # __tb (the right row's own timestamp) rides FIRST in the struct:
    # at equal (key, ts) it's equal across tied rows, so the documented
    # greatest-value-struct tie-break is unchanged, and the tolerance
    # check below can read the matched row's time after the carry.
    rhs = right.filter(~null_key & F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__tb"),
            *[F.col(v).alias(v) for v in value_cols],
        ).alias("__r"),
    )
    # unionByName with missing-column fill keeps left payload columns and
    # leaves __r NULL on left rows (so ignorenulls skips them).
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows (side=0) sort before left rows at the same timestamp, so a
    # same-instant right row is visible to the left row; among equal-ts
    # right rows the greatest __r struct sorts last and wins (NULL on left
    # rows — Spark sorts NULL structs first, which keeps left rows after
    # any tied right rows irrelevant since __side already orders them).
    # Forward direction mirrors time: descending __t makes "the nearest
    # right row at-or-after" the last non-null __r in the running frame.
    # NULLs FIRST in both directions is load-bearing: a left row with a
    # NULL timestamp must match nothing (right_ts >= NULL is unknown), so
    # it must sort BEFORE every (non-null-ts, pre-filtered) right row —
    # desc's default nulls-LAST would put it after all rights and wrongly
    # hand it the earliest right value.
    if direction == "nearest":
        # Both candidates from ONE key shuffle: ascending time, backward
        # candidate = running last non-null __r (same-instant rights sort
        # before the left row, so distance-0 matches land here), forward
        # candidate = first non-null __r in the following frame. The
        # forward frame orders tied-ts rights by __r DESC so first() picks
        # the greatest struct — the same tie rule last() gives backward.
        wb = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__t").asc_nulls_first(),
                F.col("__side").asc(),
                F.col("__r").asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*on)
            .orderBy(
                F.col("__t").asc_nulls_first(),
                F.col("__side").asc(),
                F.col("__r").desc(),
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.select(
            "*",
            F.last(F.col("__r"), ignorenulls=True).over(wb).alias("__rback"),
            F.first(F.col("__r"), ignorenulls=True).over(wf).alias("__rfwd"),
        )
        bdist = F.col("__t") - F.col("__rback.__tb")
        fdist = F.col("__rfwd.__tb") - F.col("__t")
        bok = F.col("__rback").isNotNull() & (
            F.lit(True) if tolerance is None else bdist <= tolerance
        )
        fok = F.col("__rfwd").isNotNull() & (
            F.lit(True) if tolerance is None else fdist <= tolerance
        )
        use_back = bok & (~fok | (bdist <= fdist))
        chosen = F.when(
            # a NULL left timestamp matches nothing: the ascending sort
            # protects only the backward frame (NULLs first), while the
            # forward frame would see every right row — guard explicitly.
            F.col("__t").isNotNull(),
            F.when(use_back, F.col("__rback")).when(fok, F.col("__rfwd")),
        )
        out_cols: list[Column] = [F.col(c) for c in left.columns] + [
            chosen.getField(v).alias(f"{v}{suffix}") for v in value_cols
        ]
        return carried.filter(F.col("__side") == 1).select(*out_cols)

    t_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.col("__side").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__rlast")
    )
    if tolerance is None:
        keep = F.lit(True)
    elif direction == "backward":
        keep = (F.col("__t") - F.col("__rlast.__tb")) <= tolerance
    else:
        keep = (F.col("__rlast.__tb") - F.col("__t")) <= tolerance
    out_cols: list[Column] = [F.col(c) for c in left.columns] + [
        # keep is NULL when no row was carried -> when() yields NULL,
        # identical to the no-match case.
        F.when(keep, F.col(f"__rlast.{v}")).alias(f"{v}{suffix}")
        for v in value_cols
    ]
    return carried.filter(F.col("__side") == 1).select(*out_cols)
