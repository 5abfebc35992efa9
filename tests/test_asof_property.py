"""Property-based test: asof_join vs a brute-force Python reference on
randomized inputs (hypothesis). The custom operator's semantics — latest
right at-or-before each left, per key, ties toward the right row — must
hold for ANY input, not just the curated cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crane_stream_processing_spark.operators.asof import asof_join

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from crane_stream_processing_spark.session import get_spark

        _spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    return _spark


row = st.tuples(
    st.integers(min_value=0, max_value=2),   # key
    st.integers(min_value=0, max_value=20),  # ts (small int domain → ties likely)
    st.integers(min_value=0, max_value=99),  # payload
)


def brute_asof(left, right):
    out = {}
    for i, (lk, lt, lv) in enumerate(left):
        best = None
        for rk, rt, rv in right:
            if rk == lk and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        # ties between right rows at the same ts: max rv of the max-ts rows
        # is NOT defined by the operator — only the ts is. Compare ts only.
        out[i] = best[0] if best else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(row, min_size=1, max_size=12),
    right=st.lists(row, min_size=0, max_size=12),
)
def test_asof_matches_bruteforce(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(left)],
        "idx int, k int, t int, lv int",
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t, v) in right] or [(None, None, None)],
        "k int, t int, rts int",
    ).filter("k is not null")
    # carry the right ts itself as the payload → ties in value don't matter
    rdf = rdf.withColumn("rts", rdf["t"])
    got = {
        r.idx: r.rts_r
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="t", right_ts="t", value_cols=["rts"]
        ).collect()
    }
    want = brute_asof(left, right)
    assert got == want


def brute_asof_forward(left, right):
    out = {}
    for i, (lk, lt, lv) in enumerate(left):
        best = None
        for rk, rt, rv in right:
            if rk == lk and rt >= lt and (best is None or rt < best[0]):
                best = (rt, rv)
        out[i] = best[0] if best else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(row, min_size=1, max_size=12),
    right=st.lists(row, min_size=0, max_size=12),
)
def test_asof_forward_matches_bruteforce(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(left)],
        "idx int, k int, t int, lv int",
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t, v) in right] or [(None, None, None)],
        "k int, t int, rts int",
    ).filter("k is not null")
    rdf = rdf.withColumn("rts", rdf["t"])
    got = {
        r.idx: r.rts_r
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="t", right_ts="t",
            value_cols=["rts"], direction="forward",
        ).collect()
    }
    assert got == brute_asof_forward(left, right)
