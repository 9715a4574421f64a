"""Streaming-analog queries, batch-checkable (SURVEY §2.3).

The same groupBy-window logical operators run identically under
Structured Streaming (streaming/windows.py wires them to readStream with
watermarks; parity is asserted in tests/test_streaming.py). Window starts
are emitted as epoch seconds (BIGINT) — timezone- and precision-neutral
for the oracle hash.

Both engines align tumbling/sliding windows to the epoch origin
(1970-01-01), so bucket boundaries agree; events.ts (ns) is truncated to
µs identically on both sides (see sources/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T

QUERIES = {}
ORACLE = {}


def q(key, sql=None):
    def deco(fn):
        QUERIES[key] = fn
        if sql is not None:
            ORACLE[key] = sql
        return fn
    return deco


def _events_ltz(spark, sf):
    """events with ts as TIMESTAMP (UTC session) so epoch math is exact."""
    return T(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))


@q(
    "q_stream_tumbling",
    """
    SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP),
                TIMESTAMP '1970-01-01')) // 1000000 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_val
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf):
    e = _events_ltz(spark, sf)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "cnt",
            "sum_val",
        )
    )


@q(
    "q_stream_sliding",
    """
    WITH buckets AS (
        SELECT gs.b AS bucket_start
        FROM generate_series(TIMESTAMP '2023-12-31 23:00:00',
                             TIMESTAMP '2024-02-29 00:00:00',
                             INTERVAL '15 minutes') gs(b)
    )
    SELECT CAST(epoch_us(b.bucket_start) // 1000000 AS BIGINT) AS bucket_start,
           COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_val
    FROM buckets b
    JOIN (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events) e
      ON e.ts >= b.bucket_start AND e.ts < b.bucket_start + INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def q_stream_sliding(spark, sf):
    # 1h windows sliding 15min: each event lands in 4 windows; only
    # non-empty windows are emitted (matches the oracle's inner join).
    e = _events_ltz(spark, sf)
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"), "cnt", "sum_val"
        )
    )


@q(
    "q_stream_sessionize",
    """
    WITH marked AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER w AS TIMESTAMP)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM marked
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess
    """,
)
def q_stream_sessionize(spark, sf):
    # session_window merges events < 30min apart; a gap of exactly 30min
    # starts a new session (Spark's session end = last+gap is exclusive) —
    # the oracle's `>= INTERVAL '30 minutes'` mirrors that.
    e = _events_ltz(spark, sf)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
