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
