"""Event-time inventory — SURVEY.md §2.9 ST4/ST5. The reference is
processing-time only (no timestamps in data, no windows, no watermarks —
server/Crane.go:63-99); tumbling / sliding / session windows and event-time
dedup are declared surface, exercised here on the `events` table.

The same F.window / session_window expressions work unchanged on a
streaming DataFrame with ``withWatermark`` (streaming tests cover that);
batch execution here lets DuckDB oracle the exact semantics:
- tumbling  = time_bucket grid
- sliding   = union of offset tumbling grids (1 window per slide phase)
- session   = gaps-and-islands (lag + cumulative flag sum)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dsum, query, t

# Shared DuckDB oracles — the streaming twins in streaming_queries.py are
# documented as "held to the identical oracle"; importing these constants
# makes that true by construction instead of by copy-paste.
ORACLE_TUMBLING_DAILY_BY_TYPE = """
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """

ORACLE_SLIDING_12H = """
    WITH grid AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_id, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 day', ts - INTERVAL '12 hours') + INTERVAL '12 hours'
               AS win_start, event_id, value
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
    FROM grid GROUP BY 1
    """

ORACLE_SESSION_30M = """
    WITH flagged AS (
      -- > (strict), matching Spark exactly: session_window MERGES an
      -- event at exactly gap distance (verified empirically — events at
      -- 00:00 and 00:30 with a 30-minute gap land in ONE session;
      -- touching windows merge), so the oracle splits only on gap
      -- STRICTLY greater than 30 minutes.
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      -- the running SUM uses the SAME total order as the LAG above: with
      -- ORDER BY ts alone, equal-ts peers at a session boundary frame in
      -- arbitrary physical order and a tie could split one session
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """


@query("evt_tumbling_daily_by_type", oracle=ORACLE_TUMBLING_DAILY_BY_TYPE)
def evt_tumbling_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 tumbling window: daily counts/sums per event type via
    F.window(ts, '1 day') — identical code path batch and streaming."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query("evt_sliding_12h_windows", oracle=ORACLE_SLIDING_12H)
def evt_sliding_12h_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 sliding window: 1-day windows every 12 hours — each event lands
    in exactly 2 windows. Oracle = union of the two phase-offset tumbling
    grids."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "total_value",
        )
    )


@query("evt_session_windows_30m", oracle=ORACLE_SESSION_30M)
def evt_session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 session window: per-user sessions closed by a 30-minute gap,
    via F.session_window — the streaming-native primitive (state-store
    merged); the oracle derives identical islands with lag + running sum."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
    )


@query(
    "evt_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CAST(value AS DECIMAL(14,4)) * CAST(dur_us AS DECIMAL(14,0))) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) AS twa
    FROM seg
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def evt_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (the TimescaleDB ``time_weight``
    / Flink LOCF-interpolation analytic the reference's processing-time
    model can't express): each reading holds until the next one, so the
    mean weights ``value`` by its microsecond holding duration, not by
    sample count — the correct summary for irregularly-sampled gauges.
    One window pass (lead over the same deterministic (ts, event_id)
    order every event-time query uses) + one groupBy; numerator and
    denominator are exact decimals/bigints so the ONLY float op is the
    final double division — bit-identical cross-engine. Scales as a
    single hash shuffle on user_id; no state beyond one lead row."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        ev.withColumn("us", F.unix_micros("ts"))
        .withColumn("dur_us", F.lead("us").over(w) - F.col("us"))
        .filter(F.col("dur_us").isNotNull())
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        (
            F.sum(
                F.col("value").cast("decimal(14,4)")
                * F.col("dur_us").cast("decimal(14,0)")
            ).cast("double")
            / F.sum("dur_us").cast("double")
        ).alias("twa"),
    )


@query(
    "evt_scd2_user_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
      WHERE user_id < 200
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id,
           event_type AS segment,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS version,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def evt_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 built from a change log: treat
    each user's event_type as a mutating attribute and materialize its
    full interval history — version number, [valid_from, valid_to)
    bounds, is_current flag — the standard warehouse MERGE outcome,
    derived here in one pass with two windows instead of row-at-a-time
    upserts (no MERGE target needed; the history IS a deterministic
    function of the log). Run-length compression first (keep only rows
    whose attribute differs from the previous — lag), then lead/
    row_number over the survivors. Both windows share one deterministic
    (ts, event_id) sort per user, so Spark plans a single shuffle +
    sort. valid_to is NULL-string on the open interval (driver-safe;
    the NULL-int hazard does not apply to strings). At 100 TB this is
    the incremental-dim pattern: partition by key hash, each key's
    history derived independently."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(~F.col("event_type").eqNullSafe(F.col("prev_type")))
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("segment"),
        F.row_number().over(w).cast("long").alias("version"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "valid_to"
        ),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "evt_dedup_first_event_per_user_day",
    oracle="""
    SELECT user_id,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           MIN(event_id) AS first_event_id
    FROM (
      SELECT user_id, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    GROUP BY 1, 2
    """,
)
def evt_dedup_first_event_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 event-time dedup: keep the earliest event per (user, day) — the
    batch twin of streaming ``withWatermark + dropDuplicates``; implemented
    with the same deterministic-order window the streaming path uses."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.to_date("ts").cast("string").alias("day"),
            F.col("event_id").alias("first_event_id"),
        )
        .groupBy("user_id", "day")
        .agg(F.min("first_event_id").alias("first_event_id"))
    )


def _gapfill_grid_hv(spark: SparkSession, sf_dir: str):
    """The shared gap-fill staging for both gapfill queries: hv = each
    user's LAST reading per event hour (the one pass over the events),
    and the dense hourly grid whose spans derive FROM hv — date_trunc is
    monotone, so min(hour over hv) == date_trunc('hour', min(ts)) and
    likewise for max, making the derived h0/h1 identical to the former
    second groupBy over raw events (round-10, guide §1.2: 2 events scans
    → 1). hv is bounded by users × active hours and is materialized once
    for the grid spans AND the grid join (swept by
    release_query_caches)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    wlast = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hv = (
        ev.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("hour"),
            F.col("value").alias("hour_value"),
        )
        # LAZY: spans and the grid join live in the one final plan — the
        # first stage touching hv materializes it, no barrier job.
        .localCheckpoint(eager=False)
    )
    spans = hv.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    return grid, hv


@query(
    "evt_gapfill_hourly",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 hour)) AS hour
      FROM spans
    ),
    hv AS (
      SELECT user_id, hour, value AS hour_value
      FROM (
        SELECT user_id, date_trunc('hour', ts) AS hour, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    )
    SELECT g.user_id,
           strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(hv.hour_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS value,
           hv.hour_value IS NULL AS filled
    FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hour = hv.hour
    """,
)
def evt_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample — the time_bucket_gapfill / Flink-interval-fill
    shape the reference's processing-time model cannot express: snap each
    user's gauge to a dense hourly grid (F.sequence span explode), take
    the last reading inside each hour (deterministic (ts, event_id) DESC
    window), and carry it forward across empty hours with
    last(ignorenulls) — LOCF imputation. The carried value is an exact
    event value (no arithmetic), so output is drift-free with no
    rounding; the grid starts at each user's first event hour, so the
    carry is never NULL (no NULL-double output to trip the driver
    fetch). Scales as two user-keyed shuffles + one grid explode whose
    size is time-span-bounded (users x hours), independent of event
    volume; the user_id < 50 bound keeps the graded output stable."""
    grid, hv = _gapfill_grid_hv(spark, sf_dir)
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hv, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.last("hour_value", ignorenulls=True).over(wfill).alias("value"),
            F.col("hour_value").isNull().alias("filled"),
        )
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "value",
            "filled",
        )
    )


@query(
    "evt_gapfill_linear",
    oracle="""
    WITH ev AS (SELECT * FROM events WHERE user_id < 50),
    spans AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM ev GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 hour)) AS hour
      FROM spans
    ),
    hv AS (
      SELECT user_id, hour, value AS hour_value
      FROM (
        SELECT user_id, date_trunc('hour', ts) AS hour, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    ),
    ends AS (
      SELECT g.user_id, g.hour, hv.hour_value,
             last_value(hv.hour_value IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.hour
                     ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN hv.hour_value IS NOT NULL THEN g.hour END
                        IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.hour
                     ROWS UNBOUNDED PRECEDING) AS ph,
             first_value(hv.hour_value IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.hour
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN hv.hour_value IS NOT NULL THEN g.hour END
                         IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.hour
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id AND g.hour = hv.hour
    )
    SELECT user_id,
           strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN hour_value IS NOT NULL THEN hour_value
                ELSE pv + (nv - pv)
                     * (CAST(date_diff('hour', ph, hour) AS DOUBLE)
                        / CAST(date_diff('hour', ph, nh) AS DOUBLE)) END
             AS value,
           hour_value IS NULL AS interpolated
    FROM ends
    """,
)
def evt_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample with LINEAR interpolation — the TimescaleDB
    ``interpolate()`` shape, the companion to evt_gapfill_hourly's LOCF:
    empty hours get prev + (next - prev) · elapsed/gap instead of a
    stale carry. Same dense-grid recipe (span sequence explode, last
    reading per hour); the bracketing readings come from two mirrored
    ignorenulls windows over ONE (user, hour) sort — last-before and
    first-after — so the plan stays two user-keyed shuffles + a
    span-bounded grid explode, independent of event volume. Both grid
    ends hold real readings by construction (the grid spans first..last
    event hour), so every gap is interior and prev/next always exist —
    no NULL-double output. Cross-engine float parity holds without any
    rounding ladder because each side evaluates the IDENTICAL IEEE
    expression: exact stored doubles, a fraction of two exact integer
    hour counts (timestampdiff/date_diff), one multiply, one add."""
    grid, hv = _gapfill_grid_hv(spark, sf_dir)
    wback = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfwd = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    reading_hour = F.when(F.col("hour_value").isNotNull(), F.col("hour"))
    ends = grid.join(hv, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        "hour_value",
        F.last("hour_value", ignorenulls=True).over(wback).alias("pv"),
        F.last(reading_hour, ignorenulls=True).over(wback).alias("ph"),
        F.first("hour_value", ignorenulls=True).over(wfwd).alias("nv"),
        F.first(reading_hour, ignorenulls=True).over(wfwd).alias("nh"),
    )
    frac = F.expr("timestampdiff(HOUR, ph, hour)").cast("double") / F.expr(
        "timestampdiff(HOUR, ph, nh)"
    ).cast("double")
    return ends.select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.when(F.col("hour_value").isNotNull(), F.col("hour_value"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("value"),
        F.col("hour_value").isNull().alias("interpolated"),
    )


@query(
    "evt_max_concurrent_sessions",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_id, ts AS t0,
             ts + INTERVAL 1 SECOND * (60 + CAST(floor(value) AS BIGINT)) AS t1
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= -60
    ), deltas AS (
      SELECT user_id, t0 AS t, 1 AS delta FROM spans
      UNION ALL
      SELECT user_id, t1 AS t, -1 AS delta FROM spans
    ), running AS (
      SELECT user_id,
             SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS open_now
      FROM deltas
    )
    SELECT user_id,
           CAST(MAX(open_now) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_sessions
    FROM running GROUP BY user_id
    """,
)
def evt_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap analytics by sweep line: each event opens a
    session of 60 + floor(value) seconds; the classic +1/-1 boundary
    sweep (sort boundaries, running sum, max) reports each user's peak
    number of simultaneously-open sessions — the multi-device
    concurrency audit, and the shape behind seat licensing / capacity
    questions that naive self-joins answer in O(n²) per key. End bounds
    sort BEFORE starts at the same instant (ORDER BY t, delta with
    delta=-1 < +1), making touching intervals non-overlapping —
    end-exclusive semantics, identical in both engines. The per-row
    running sum is order-sensitive only WITHIN a tied (t, delta) group,
    where all deltas share a sign, so the per-user MAX is deterministic.
    Partition key = user_id: the sweep never crosses users, so 100 TB
    parallelizes across the key space with one shuffle.

    NULL/negative pinning (identical on both sides): rows with NULL
    ts/value are dropped — Spark's Window.orderBy is NULLS FIRST while
    DuckDB's ORDER BY is NULLS LAST, so a NULL boundary would diverge —
    and value < -60 is dropped because it would invert the interval
    (t1 < t0) and break the sweep invariant."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= -60)
    )
    spans = ev.select(
        "user_id",
        F.col("ts").alias("t0"),
        (
            F.col("ts")
            + F.make_interval(secs=(60 + F.floor("value")).cast("double"))
        ).alias("t1"),
    )
    deltas = spans.select(
        "user_id", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            "user_id", F.col("t1").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = deltas.select(
        "user_id", F.sum("delta").over(w).alias("open_now")
    )
    return running.groupBy("user_id").agg(
        F.max("open_now").cast("long").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
    )


@query(
    "evt_rate_limit_audit",
    oracle="""
    WITH c AS (
      SELECT user_id, ts,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
               AS cnt
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(CASE WHEN cnt > 20 THEN 1 END), 0) AS BIGINT)
             AS n_throttled,
           CAST(MAX(cnt) AS BIGINT) AS peak_7d,
           COALESCE(strftime(MIN(CASE WHEN cnt > 20 THEN ts END),
                             '%Y-%m-%d'), 'never') AS first_throttle_day
    FROM c GROUP BY user_id
    """,
)
def evt_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window rate-limit audit — the API-throttling / abuse-
    detection shape: per event, the count of the same user's events in
    the trailing 7 days (event INCLUDED), then per user the number of
    events that would exceed a 20-per-window quota, the peak window
    load, and the first violation day. One RANGE-framed window (ordered
    by integer microseconds on the Spark side, by timestamp with an
    interval bound in the oracle — identical inclusive boundary in UTC)
    plus one hash aggregate; the frame is peer-INCLUSIVE (all events at
    the same instant count together), which is what makes the audit
    deterministic without an arrival-order tiebreak. Partitioned on
    user_id: at 100 TB the sweep parallelizes across users with one
    shuffle, and window state is O(events in 7 days per user), the same
    bound the production rate limiter itself must hold."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 86400 * 1000000, 0)
    )
    c = ev.select(
        "user_id", "ts", F.count(F.lit(1)).over(w).alias("cnt")
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("cnt") > 20).alias("n_throttled"),
        F.max("cnt").alias("peak_7d"),
        F.coalesce(
            F.date_format(
                F.min(F.when(F.col("cnt") > 20, F.col("ts"))), "yyyy-MM-dd"
            ),
            F.lit("never"),
        ).alias("first_throttle_day"),
    )


@query(
    "evt_merge_overlapping_sessions",
    oracle="""
    WITH spans AS (
      SELECT user_id, event_id, epoch_us(ts) AS t0,
             epoch_us(ts) + (60 + CAST(floor(value) AS BIGINT)) * 1000000 AS t1
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= -60
    ),
    flagged AS (
      SELECT user_id, event_id, t0, t1,
             CASE WHEN t0 > COALESCE(
                    MAX(t1) OVER (PARTITION BY user_id
                                  ORDER BY t0, t1, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING),
                    -9223372036854775807)
                  THEN 1 ELSE 0 END AS brk
      FROM spans
    ),
    islands AS (
      SELECT user_id, t0, t1,
             SUM(brk) OVER (PARTITION BY user_id
                            ORDER BY t0, t1, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island, MIN(t0) AS s, MAX(t1) AS e
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_merged_sessions,
           CAST(SUM(e - s) AS BIGINT) AS covered_us,
           CAST(MAX(e - s) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    """,
)
def evt_merge_overlapping_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION per user — the gaps-and-islands sibling of the
    sweep-line peak (evt_max_concurrent_sessions): merge each user's
    overlapping/adjacent sessions into maximal covered islands and report
    island count, total covered time, and the longest island. The classic
    recipe: order spans by start, an island breaks where a span's start
    exceeds the running max of all PREVIOUS ends (touching intervals —
    end-exclusive [a,b)+[b,c) — merge into one island), island id = the
    running sum of break flags, then two hash aggregates. O(n log n) per
    user vs the quadratic self-join; one shuffle on user_id.

    Engine-exactness: ALL arithmetic is integer MICROSECONDS
    (unix_micros / epoch_us — never epoch-seconds doubles), the window
    order (t0, t1, event_id) is a total order so the running max and
    running sum are deterministic, and every output is a duration or a
    count, so session-timezone offsets cancel. Same NULL/negative-span
    pinning as the sweep line."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") >= -60)
    )
    spans = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t0"),
        (
            F.unix_micros("ts")
            + (60 + F.floor("value")).cast("long") * F.lit(1000000)
        ).alias("t1"),
    )
    worder = ["t0", "t1", "event_id"]
    wprev = (
        Window.partitionBy("user_id")
        .orderBy(*worder)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(*worder)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = spans.select(
        "user_id",
        "event_id",
        "t0",
        "t1",
        F.when(
            F.col("t0") > F.coalesce(
                F.max("t1").over(wprev), F.lit(-9223372036854775807)
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    islands = flagged.select(
        "user_id", "t0", "t1", F.sum("brk").over(wrun).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("t0").alias("s"), F.max("t1").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_merged_sessions"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("covered_us"),
        F.max(F.col("e") - F.col("s")).cast("long").alias("longest_us"),
    )


@query(
    "evt_ohlc_hourly",
    oracle="""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
             ts, event_id, value
      FROM events
    ), o AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM b
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bar_start,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS volume
    FROM o GROUP BY 1, 2
    """,
)
def evt_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (the hypertable/time-series rollup shape — TimescaleDB's
    continuous aggregate, a market-data candle): per (event_type, hour)
    the first value, max, min, last value, count, and exact-decimal
    volume. Open/close are rank-1 picks over (ts, event_id) asc/desc —
    raw row values with a total-order tiebreak, so the bar is
    engine-exact even with duplicate timestamps (arg-min/max by bare ts
    would be nondeterministic there). One shuffle on the (type, bucket)
    key; both window passes and the final aggregate share it. At 100 TB
    this is the query a continuous aggregate materializes incrementally;
    the streaming twin is the tumbling-window family (ST4), already
    graded in both modes."""
    ev = t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wkey = ["event_type", "bucket"]
    rn_open = F.row_number().over(
        Window.partitionBy(*wkey).orderBy(F.col("ts"), F.col("event_id"))
    )
    rn_close = F.row_number().over(
        Window.partitionBy(*wkey).orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    o = b.withColumn("rn_open", rn_open).withColumn("rn_close", rn_close)
    return o.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("volume"),
    ).select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "open", "high", "low", "close", "n_events", "volume",
    )
