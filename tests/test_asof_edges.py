"""Edge-case unit tests for the as-of join — the load-bearing custom
operator (SURVEY.md §2.3 J6): same-instant ties, no-prior-match NULLs,
multiple keys, and carry-forward across many left rows."""

from __future__ import annotations

from datetime import datetime

from crane_stream_processing_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_basic_tie_and_null(spark):
    left = _df(
        spark,
        [
            (1, ts("2024-01-01 10:00:00"), "L-before-any"),
            (1, ts("2024-01-01 12:00:00"), "L-at-tie"),
            (1, ts("2024-01-01 13:00:00"), "L-after"),
            (2, ts("2024-01-01 09:00:00"), "L-other-key"),
        ],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [
            (1, ts("2024-01-01 12:00:00"), 100.0),
            (1, ts("2024-01-01 12:30:00"), 200.0),
        ],
        "k int, t timestamp, v double",
    )
    out = {
        r.tag: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    assert out["L-before-any"] is None  # no prior right row
    assert out["L-at-tie"] == 100.0  # same-instant right row matches
    assert out["L-after"] == 200.0  # latest prior wins
    assert out["L-other-key"] is None  # keys don't leak


def test_asof_carry_forward_many_lefts(spark):
    left = _df(
        spark,
        [(1, ts(f"2024-01-01 10:0{i}:00"), i) for i in range(5)],
        "k int, t timestamp, i int",
    )
    right = _df(
        spark,
        [(1, ts("2024-01-01 10:01:30"), 7.0)],
        "k int, t timestamp, v double",
    )
    got = {
        r.i: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    assert got == {0: None, 1: None, 2: 7.0, 3: 7.0, 4: 7.0}


def test_asof_multiple_value_columns(spark):
    left = _df(spark, [(1, ts("2024-01-01 12:00:00"))], "k int, t timestamp")
    right = _df(
        spark,
        [(1, ts("2024-01-01 11:00:00"), 1.5, "x")],
        "k int, t timestamp, v double, s string",
    )
    r = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t", value_cols=["v", "s"]
    ).collect()[0]
    assert (r.v_r, r.s_r) == (1.5, "x")


def test_asof_null_key_and_null_ts_never_match(spark):
    """Equi-join NULL semantics: a right row with NULL key or NULL ts can
    never be a match, and a NULL-key left row matches nothing — without
    the explicit right-side filter, window partitionBy would group NULL
    keys together and NULLS-FIRST ordering would carry a NULL-ts right
    row onto every otherwise-unmatched left row."""
    left = _df(
        spark,
        [
            (None, ts("2024-01-01 10:00:00"), "L-null-key"),
            (1, ts("2024-01-01 10:00:00"), "L-no-prior"),
        ],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [
            (None, ts("2024-01-01 09:00:00"), 7.0),   # NULL key
            (1, None, 9.0),                            # NULL ts
        ],
        "k int, t timestamp, v double",
    )
    out = {
        r.tag: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    assert out == {"L-null-key": None, "L-no-prior": None}


def test_asof_equal_ts_right_rows_resolve_deterministically(spark):
    """Two right rows at the identical (key, ts): the greatest value
    struct wins, every run."""
    left = _df(
        spark, [(1, ts("2024-01-01 12:00:00"), "L")],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [(1, ts("2024-01-01 11:00:00"), 1.0),
         (1, ts("2024-01-01 11:00:00"), 2.0)],
        "k int, t timestamp, v double",
    )
    for _ in range(3):
        r = asof_join(
            left, right.repartition(4), on=["k"], left_ts="t",
            right_ts="t", value_cols=["v"],
        ).collect()[0]
        assert r.v_r == 2.0


def test_asof_rejects_colliding_columns(spark):
    left = _df(
        spark, [(1, ts("2024-01-01 12:00:00"), 5.0)],
        "k int, t timestamp, v_r double",
    )
    right = _df(
        spark, [(1, ts("2024-01-01 11:00:00"), 1.0)],
        "k int, t timestamp, v double",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collides"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  value_cols=["v"])


def test_asof_forward_basic_tie_and_null(spark):
    """Forward direction: first right row at-or-AFTER each left row; a
    same-instant right row matches; lefts after the last right get NULL."""
    left = _df(
        spark,
        [
            (1, ts("2024-01-01 10:00:00"), "L-before-any"),
            (1, ts("2024-01-01 12:00:00"), "L-at-tie"),
            (1, ts("2024-01-01 13:00:00"), "L-after-all"),
            (2, ts("2024-01-01 09:00:00"), "L-other-key"),
        ],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [
            (1, ts("2024-01-01 12:00:00"), 100.0),
            (1, ts("2024-01-01 12:30:00"), 200.0),
        ],
        "k int, t timestamp, v double",
    )
    out = {
        r.tag: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    assert out == {
        "L-before-any": 100.0,   # earliest right at-or-after 10:00
        "L-at-tie": 100.0,       # right at exactly 12:00 matches
        "L-after-all": None,     # nothing at-or-after 13:00
        "L-other-key": None,     # no rights under key 2
    }


def test_asof_forward_equal_ts_rights_resolve_deterministically(spark):
    """Two right rows at the SAME future instant: the lexicographically
    greatest value struct wins — same contract as backward."""
    left = _df(spark, [(1, ts("2024-01-01 10:00:00"), "L")],
               "k int, t timestamp, tag string")
    right = _df(
        spark,
        [(1, ts("2024-01-01 11:00:00"), 5.0), (1, ts("2024-01-01 11:00:00"), 9.0)],
        "k int, t timestamp, v double",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        value_cols=["v"], direction="forward",
    ).collect()
    assert [r.v_r for r in rows] == [9.0]


def test_asof_rejects_unknown_direction(spark):
    left = _df(spark, [(1, ts("2024-01-01 10:00:00"))], "k int, t timestamp")
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on=["k"], left_ts="t", right_ts="t",
                  value_cols=["t"], direction="sideways")


def test_asof_forward_null_left_ts_never_matches(spark):
    """A left row with a NULL timestamp must match nothing in EITHER
    direction (right_ts >= NULL is unknown) — forward needs explicit
    nulls-first ordering or the NULL-ts row sorts after every right row
    and wrongly picks up the earliest right value."""
    left = _df(
        spark,
        [(1, None, "L-null-ts"), (1, ts("2024-01-01 09:00:00"), "L-real")],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark, [(1, ts("2024-01-01 10:00:00"), 99.0)],
        "k int, t timestamp, v double",
    )
    for direction, want_real in (("forward", 99.0), ("backward", None)):
        out = {
            r.tag: r.v_r
            for r in asof_join(
                left, right, on=["k"], left_ts="t", right_ts="t",
                value_cols=["v"], direction=direction,
            ).collect()
        }
        assert out["L-null-ts"] is None, direction
        assert out["L-real"] == want_real, direction


def test_asof_tolerance_bounds_backward_and_forward(spark):
    """tolerance NULLs a match farther than the bound but keeps the row
    (left join semantics), in both directions; an exactly-at-bound match
    survives (<=, matching pandas merge_asof)."""
    from pyspark.sql import functions as F

    left = _df(
        spark,
        [
            (1, ts("2024-01-10 00:00:00"), "L-near"),
            (1, ts("2024-01-20 00:00:00"), "L-far"),
            (1, ts("2024-01-08 00:00:00"), "L-at-bound"),
        ],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [(1, ts("2024-01-06 00:00:00"), 50.0)],
        "k int, t timestamp, v double",
    )
    back = {
        r.tag: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], tolerance=F.expr("INTERVAL 2 DAYS"),
        ).collect()
    }
    assert back["L-at-bound"] == 50.0  # exactly 2 days: inclusive
    assert back["L-near"] is None  # 4 days back: beyond tolerance
    assert back["L-far"] is None
    assert len(back) == 3  # rows survive as NULLs, not dropped

    fleft = _df(
        spark,
        [(1, ts("2024-01-01 00:00:00"), "F-ok"), (1, ts("2023-12-01 00:00:00"), "F-far")],
        "k int, t timestamp, tag string",
    )
    fwd = {
        r.tag: r.v_r
        for r in asof_join(
            fleft, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], direction="forward",
            tolerance=F.expr("INTERVAL 7 DAYS"),
        ).collect()
    }
    assert fwd["F-ok"] == 50.0  # 5 days ahead, within bound
    assert fwd["F-far"] is None  # 36 days ahead, beyond bound


def test_asof_tolerance_does_not_fall_back_to_older_match(spark):
    """merge_asof semantics: tolerance filters THE as-of match — it never
    substitutes an older in-tolerance... (there is none older) nor skips
    to a different row; with the nearest match out of bound the result
    is NULL even though no other candidate exists."""
    from pyspark.sql import functions as F

    left = _df(spark, [(1, ts("2024-03-01 00:00:00"), "L")],
               "k int, t timestamp, tag string")
    right = _df(
        spark,
        [
            (1, ts("2024-01-01 00:00:00"), 1.0),   # 60 days back
            (1, ts("2024-02-20 00:00:00"), 2.0),   # 10 days back — the match
        ],
        "k int, t timestamp, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        value_cols=["v"], tolerance=F.expr("INTERVAL 5 DAYS"),
    ).collect()
    assert out[0].v_r is None  # nearest (2.0) out of bound -> NULL, no fallback


def test_asof_rejects_reserved_value_col(spark):
    import pytest

    left = _df(spark, [(1, ts("2024-01-01 00:00:00"))], "k int, t timestamp")
    right = _df(
        spark, [(1, ts("2024-01-01 00:00:00"), 1.0)],
        "k int, t timestamp, __tb double",
    )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  value_cols=["__tb"])


def test_asof_nearest_picks_closer_side_and_prefers_backward_ties(spark):
    left = _df(
        spark,
        [
            (1, ts("2024-01-10 00:00:00"), "closer-behind"),
            (1, ts("2024-01-13 00:00:00"), "closer-ahead"),
            (1, ts("2024-01-12 00:00:00"), "equidistant"),
            (1, ts("2024-01-01 00:00:00"), "only-ahead"),
            (2, ts("2024-01-10 00:00:00"), "no-candidates"),
        ],
        "k int, t timestamp, tag string",
    )
    right = _df(
        spark,
        [
            (1, ts("2024-01-09 00:00:00"), 1.0),  # behind
            (1, ts("2024-01-15 00:00:00"), 2.0),  # ahead
        ],
        "k int, t timestamp, v double",
    )
    out = {
        r.tag: r.v_r
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], direction="nearest",
        ).collect()
    }
    assert out["closer-behind"] == 1.0   # 1 day back vs 5 ahead
    assert out["closer-ahead"] == 2.0    # 4 back vs 2 ahead
    assert out["equidistant"] == 1.0     # 3 == 3: backward preferred
    assert out["only-ahead"] == 1.0      # no backward candidate: first ahead
    assert out["no-candidates"] is None


def test_asof_nearest_with_tolerance_bounds_both_sides(spark):
    """nearest + tolerance: the in-bound candidate wins even when the
    out-of-bound side exists; when both candidates exceed the bound the
    row keeps NULL. (With a symmetric bound, filtering candidates before
    choosing equals choosing-then-filtering — the closer candidate is out
    of bound only if both are; this pins that consistency.)"""
    from pyspark.sql import functions as F

    left = _df(spark, [(1, ts("2024-01-10 00:00:00"), "L")],
               "k int, t timestamp, tag string")
    right = _df(
        spark,
        [
            (1, ts("2024-01-02 00:00:00"), 1.0),  # 8 days back
            (1, ts("2024-01-13 00:00:00"), 2.0),  # 3 days ahead
        ],
        "k int, t timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                    value_cols=["v"], direction="nearest",
                    tolerance=F.expr("INTERVAL 4 DAYS")).collect()
    assert out[0].v_r == 2.0  # backward out of bound, forward within
    none = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                     value_cols=["v"], direction="nearest",
                     tolerance=F.expr("INTERVAL 1 DAY")).collect()
    assert none[0].v_r is None  # both out of bound


def test_asof_nearest_null_left_ts_never_matches(spark):
    left = _df(spark, [(1, None, "L-null-ts")],
               "k int, t timestamp, tag string")
    right = _df(spark, [(1, ts("2024-01-01 00:00:00"), 9.0)],
                "k int, t timestamp, v double")
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                    value_cols=["v"], direction="nearest").collect()
    assert out[0].v_r is None
