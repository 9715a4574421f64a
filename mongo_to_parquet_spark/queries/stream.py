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

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


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


# ------------------------------------------------- event analytics (batch) --
@q(
    "q_funnel",
    """
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    v AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 2, 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 3, 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
)
def q_funnel(spark, sf):
    # ordered-funnel analysis: stage N counts users whose stage-N event
    # STRICTLY FOLLOWS their stage-(N−1) anchor — each stage is one
    # groupBy(user) on the previous stage's survivors, so the events table
    # is filtered before every shuffle and the per-stage frames shrink
    # monotonically. All three stage aggs partition by user_id: after the
    # first shuffle the join + regroup reuse the partitioning.
    e = _events_ltz(spark, sf).select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def step(n, name, df):
        return df.agg(
            F.lit(n).cast("int").alias("step"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
    return (
        step(1, "view", v)
        .unionByName(step(2, "view>click", c))
        .unionByName(step(3, "view>click>purchase", p))
    )


def window_funnel_levels(e, horizon_us: int, steps=("view", "click", "purchase")):
    """Per-user max funnel level for the 3-step chain within ``horizon_us``
    of the anchor (q_funnel_window's core; property-tested against brute-
    force chain enumeration in tests/test_properties.py).

    ``e`` must have columns (user_id, event_type, tsu:long). Returns
    (user_id, lvl) with lvl in {1,2,3} for every user having a step-1
    event.
    """
    s1, s2, s3 = steps
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    n = e.select(
        "user_id",
        "event_type",
        "tsu",
        F.min(F.when(F.col("event_type") == s2, F.col("tsu"))).over(w).alias("nc"),
        F.min(F.when(F.col("event_type") == s3, F.col("tsu"))).over(w).alias("np"),
    )
    anchors = n.filter(F.col("event_type") == s1).select("user_id", "tsu", "nc")
    clicks = (
        n.filter(F.col("event_type") == s2)
        .select("user_id", F.col("tsu").alias("ctsu"), "np")
        .distinct()
    )
    lv = anchors.join(
        clicks,
        (anchors.user_id == clicks.user_id) & (clicks.ctsu == anchors.nc),
        "left",
    ).select(
        anchors.user_id,
        F.when(
            F.col("np").isNotNull() & (F.col("np") <= anchors.tsu + horizon_us), 3
        )
        .when(F.col("nc").isNotNull() & (F.col("nc") <= anchors.tsu + horizon_us), 2)
        .otherwise(1)
        .alias("lvl"),
    )
    return lv.groupBy("user_id").agg(F.max("lvl").alias("lvl"))


@q(
    "q_funnel_window",
    """
    WITH e AS (SELECT user_id, event_type,
                      CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS tsu
               FROM events),
    n AS (SELECT user_id, event_type, tsu,
                 MIN(CASE WHEN event_type = 'click' THEN tsu END) OVER w AS nc,
                 MIN(CASE WHEN event_type = 'purchase' THEN tsu END) OVER w AS np
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                       RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
    anchors AS (SELECT user_id, tsu, nc FROM n WHERE event_type = 'view'),
    clicks AS (SELECT DISTINCT user_id, tsu, np FROM n
               WHERE event_type = 'click'),
    lv AS (SELECT a.user_id,
                  CASE WHEN c.np IS NOT NULL
                            AND c.np <= a.tsu + 86400000000 THEN 3
                       WHEN a.nc IS NOT NULL
                            AND a.nc <= a.tsu + 86400000000 THEN 2
                       ELSE 1 END AS lvl
           FROM anchors a
           LEFT JOIN clicks c ON a.user_id = c.user_id AND c.tsu = a.nc),
    ul AS (SELECT user_id, MAX(lvl) AS lvl FROM lv GROUP BY user_id),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN lvl >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n2,
                   CAST(SUM(CASE WHEN lvl >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n3
            FROM ul)
    SELECT CAST(1 AS INT) AS step, 'view' AS stage, n1 AS n_users,
           ROUND(CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) AS share
    FROM agg
    UNION ALL
    SELECT CAST(2 AS INT), 'view>click<=24h', n2,
           ROUND(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) FROM agg
    UNION ALL
    SELECT CAST(3 AS INT), 'view>click>purchase<=24h', n3,
           ROUND(CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE), 4) FROM agg
    """,
)
def q_funnel_window(spark, sf):
    # windowFunnel (ClickHouse-style) — q_funnel's ordered stages PLUS a
    # bounded conversion window: a user reaches level 3 iff some view is
    # followed by a click then a purchase, all within 24h OF THAT VIEW.
    # Greedy-earliest is provably optimal per anchor (if any chain from
    # anchor v fits the window, the chain through the EARLIEST click
    # after v and the earliest purchase after that click also fits — an
    # exchange argument), so two "next event of type X strictly after
    # me" attributes decide every anchor exactly. Both next-event
    # attributes come from ONE window ordering (house rule: frames
    # differing only in the CASE share a single sort), with RANGE
    # BETWEEN 1 FOLLOWING on integer microseconds so "strictly later"
    # is tie-safe and deterministic — no ROWS-frame dependence on the
    # order of equal timestamps. The purchase-after-the-click lookup is
    # function COMPOSITION (np of the click nc points at), resolved by
    # one equi-join of view anchors to click rows on (user, tsu=nc) —
    # same-(user,tsu) click duplicates collapse first (their RANGE frame
    # is identical, so np is too).
    #
    # Scale: one shuffle for the per-user window, one user-keyed equi
    # join of two already-partitioned projections of it (the shuffle
    # partitioning is reused), then user-sized aggregates down to one
    # row. No per-anchor scan, no time-range join explosion; per-user
    # state is the event stream itself, never materialized as pairs.
    e = _events_ltz(spark, sf).select(
        "user_id", "event_type", F.unix_micros("ts").alias("tsu")
    )
    ul = window_funnel_levels(e, horizon_us=24 * 3600 * 1000000)
    agg = ul.agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("lvl") >= 2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("lvl") >= 3, 1).otherwise(0)).cast("bigint").alias("n3"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("step"),
                F.lit(name).alias("stage"),
                F.col(c).alias("n_users"),
                F.round(F.col(c).cast("double") / F.col("n1").cast("double"), 4).alias(
                    "share"
                ),
            )
            for s, name, c in [
                (1, "view", "n1"),
                (2, "view>click<=24h", "n2"),
                (3, "view>click>purchase<=24h", "n3"),
            ]
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.step", "r.stage", "r.n_users", "r.share"
    )


@q(
    "q_retention_cohort",
    """
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    su AS (SELECT user_id, MIN(ts) AS cohort_ts FROM e
           WHERE event_type = 'signup' GROUP BY user_id)
    SELECT strftime(CAST(date_trunc('week', su.cohort_ts) AS DATE), '%Y-%m-%d')
               AS cohort_week,
           CAST(datediff('day', CAST(date_trunc('week', su.cohort_ts) AS DATE),
                         CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
               AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM e JOIN su USING (user_id)
    WHERE e.ts >= su.cohort_ts
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark, sf):
    # classic cohort-retention matrix: users bucketed by signup week,
    # counted distinct in each subsequent activity week. Both engines
    # truncate weeks to Monday and the offsets divide day-diffs of
    # week-aligned dates (exact multiples of 7). Exact distinct per cell —
    # the scale path swaps in approx_count_distinct or HLL sketches
    # (q_agg_hll_sketch) for mergeable incremental rollups.
    e = _events_ltz(spark, sf).select("user_id", "event_type", "ts")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cohort_ts"))
    )
    # dates as ISO strings — the repo's cross-engine date convention
    cohort_week = F.date_format(
        F.date_trunc("week", F.col("cohort_ts")).cast("date"), "yyyy-MM-dd"
    )
    return (
        e.join(su, "user_id")
        .filter(F.col("ts") >= F.col("cohort_ts"))
        .select(
            "user_id",
            cohort_week.alias("cohort_week"),
            F.expr("datediff(cast(date_trunc('week', ts) as date), cast(date_trunc('week', cohort_ts) as date)) div 7")
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@q(
    "q_win_fill_forward",
    """
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase_value
    FROM events
    """,
)
def q_win_fill_forward(spark, sf):
    # forward-fill (gap-fill primitive): carry each user's most recent
    # purchase value onto every later event — last(ignorenulls) over a
    # running frame, the window idiom behind densify/LOCF pipelines.
    # Deterministic tiebreak on event_id under the µs-truncated ts.
    from pyspark.sql import Window

    e = _events_ltz(spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_value"),
    )


@q(
    "q_anomaly_zscore",
    """
    WITH s AS (
        SELECT event_id, user_id, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sd
        FROM events WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id,
           ROUND((value - mu) / sd, 4) AS zscore,
           (ABS(ROUND((value - mu) / sd, 4)) > 2.0) AS is_outlier
    FROM s WHERE sd > 0
    """,
)
def q_anomaly_zscore(spark, sf):
    # per-entity outlier scoring: each event's value standardized against
    # its user's full-history mean/stddev. One whole-partition window =
    # ONE shuffle on user_id computing both moments and the per-row score
    # (vs. groupBy-stats + join back = shuffle + join). The outlier flag
    # compares the ROUNDED score so the boolean is as hash-stable as the
    # score itself. Single-event users (sd undefined) are excluded on
    # both engines by `sd > 0`. At 100 TB: user_id partitions are small
    # and dense; skewed hot users fall to AQE skew handling, or to the
    # salted two-pass moments in operators/skew.py if one user floods.
    from pyspark.sql import Window

    e = _events_ltz(spark, sf)
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return (
        e.select("event_id", "user_id", "value", mu.alias("mu"), sd.alias("sd"))
        .filter(F.col("sd") > 0)
        .select(
            "event_id",
            "user_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("zscore"),
            (
                F.abs(F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)) > 2.0
            ).alias("is_outlier"),
        )
    )


@q(
    "q_agg_time_weighted",
    """
    WITH o AS (
        SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
               lead(CAST(ts AS TIMESTAMP)) OVER
                   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS nxt
        FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * (epoch_us(nxt) - epoch_us(ts)))
                 / SUM(epoch_us(nxt) - epoch_us(ts)), 4) AS tw_avg,
           COUNT(*) AS n_intervals
    FROM o WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def q_agg_time_weighted(spark, sf):
    # time-weighted average (the irregular-series aggregate behind sensor /
    # metric rollups): each value weighted by how long it was current
    # (delta to the next event, last observation open-ended and excluded).
    # lead() and the groupBy both key on user_id, so the aggregation reuses
    # the window's shuffle partitioning - one exchange total. Durations are
    # integer microseconds (exact); only the final ratio is floating, ROUND
    # 4 for the hash.
    from pyspark.sql import Window

    e = _events_ltz(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return (
        e.select("user_id", "value", dur.alias("dur_us"))
        .filter(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("tw_avg"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


@q(
    "q_events_transitions",
    """
    WITH o AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS nxt
        FROM events
    )
    SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS cnt,
           ROUND(COUNT(*) * 1.0 /
                 SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS p
    FROM o WHERE nxt IS NOT NULL
    GROUP BY event_type, nxt
    """,
)
def q_events_transitions(spark, sf):
    # first-order Markov transition matrix over each user's event sequence
    # (the sequence-mining primitive behind journey analysis and n-gram
    # LMs over action streams). lead() shuffles once on user_id; the
    # transition count then aggregates on (from, to) whose cardinality is
    # |types|^2 - tiny - so the second exchange moves partial counts only.
    # The row-probability window runs on that tiny aggregate. Counts are
    # exact ints; only p is floating, ROUND 4.
    from pyspark.sql import Window

    e = _events_ltz(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") * F.lit(1.0) / F.sum("cnt").over(wp), 4).alias("p"),
    )


_STEP_US = 21_600_000_000  # 6-hour resample grid, in µs


@q(
    "q_ts_interpolate",
    f"""
    WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ev_t,
                       value, event_id
                FROM events),
    b AS (SELECT user_id, MIN(ev_t) AS mn, MAX(ev_t) AS mx
          FROM ev GROUP BY user_id),
    grid AS (
        SELECT user_id,
               unnest(generate_series((mn + {_STEP_US - 1}) // {_STEP_US} * {_STEP_US},
                                      mx // {_STEP_US} * {_STEP_US},
                                      {_STEP_US})) AS gt
        FROM b
        WHERE (mn + {_STEP_US - 1}) // {_STEP_US} <= mx // {_STEP_US}
    ),
    u AS (
        SELECT user_id, ev_t AS gt, ev_t, value, event_id, 0 AS is_grid FROM ev
        UNION ALL
        SELECT user_id, gt, NULL, NULL, NULL, 1 FROM grid
    ),
    f AS (
        SELECT *,
            last_value(value IGNORE NULLS) OVER wp AS pv,
            last_value(ev_t IGNORE NULLS) OVER wp AS pt,
            first_value(value IGNORE NULLS) OVER wn AS nv,
            first_value(ev_t IGNORE NULLS) OVER wn AS nt
        FROM u
        WINDOW wp AS (PARTITION BY user_id
                      ORDER BY gt, is_grid, coalesce(event_id, -1)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id
                      ORDER BY gt, is_grid, coalesce(event_id, -1)
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, gt AS grid_us,
           ROUND(CASE WHEN nt IS NULL OR nt = pt THEN pv
                      ELSE pv + (nv - pv) * CAST(gt - pt AS DOUBLE)
                                          / CAST(nt - pt AS DOUBLE) END,
                 4) AS value
    FROM f WHERE is_grid = 1
    """,
)
def q_ts_interpolate(spark, sf):
    # Time-series resampling with linear interpolation: each user's
    # irregular event series re-sampled onto a regular 6-hour grid, value
    # at each grid point interpolated between the nearest events either
    # side (exact-hit grid points take the event value). The regularized
    # series is what downstream models / gap-fill joins consume;
    # complements q_win_fill_forward (LOCF) with the two-sided estimate
    # and q_agg_time_weighted (which integrates instead of resampling).
    #
    # Shape: grid points are generated per user from its [min, max] span
    # (integer µs arithmetic — floor/ceil division, no float rounding),
    # unioned with the events, and BOTH neighbors come from two
    # ignore-nulls running windows sharing ONE partitioning AND ONE sort
    # order (only the frame direction differs) — one Exchange, one Sort,
    # no join, no per-grid-point range probe. Scale: state per task is
    # one user's rows; the grid never shuffles separately. Exact-hit grid
    # points need no special ordering: pt == gt zeroes the interpolation
    # factor, so the event's own value falls out of the formula.
    from pyspark.sql import Window

    ev = T(spark, sf, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_t"),
        "value",
        "event_id",
    )
    step = F.lit(_STEP_US).cast("long")
    bounds = ev.groupBy("user_id").agg(
        F.min("ev_t").alias("mn"), F.max("ev_t").alias("mx")
    )
    grid = (
        bounds.select(
            "user_id",
            (F.expr(f"(mn + {_STEP_US - 1}) div {_STEP_US}") * step).alias("g0"),
            (F.expr(f"mx div {_STEP_US}") * step).alias("g1"),
        )
        .filter(F.col("g0") <= F.col("g1"))
        .select("user_id", F.explode(F.sequence("g0", "g1", F.lit(_STEP_US))).alias("gt"))
    )
    u = ev.select(
        "user_id",
        F.col("ev_t").alias("gt"),
        "ev_t",
        "value",
        "event_id",
        F.lit(0).alias("is_grid"),
    ).unionByName(
        grid.select(
            "user_id",
            "gt",
            F.lit(None).cast("long").alias("ev_t"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(1).alias("is_grid"),
        )
    )
    eid = F.coalesce(F.col("event_id"), F.lit(-1))
    wp = (
        Window.partitionBy("user_id")
        .orderBy(F.col("gt").asc(), F.col("is_grid").asc(), eid.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # IDENTICAL ordering to wp (frame direction differs): Spark plans both
    # windows over ONE sort — exact-hit grid points no longer need the
    # reverse is_grid order because interpolation degenerates to pv when
    # pt == gt (factor (gt-pt)/(nt-pt) is exactly 0), and a grid point
    # coinciding with the partition's last event takes the nt-NULL branch.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.col("gt").asc(), F.col("is_grid").asc(), eid.asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    f = u.select(
        "user_id",
        "gt",
        "is_grid",
        F.last("value", ignorenulls=True).over(wp).alias("pv"),
        F.last("ev_t", ignorenulls=True).over(wp).alias("pt"),
        F.first("value", ignorenulls=True).over(wn).alias("nv"),
        F.first("ev_t", ignorenulls=True).over(wn).alias("nt"),
    )
    return f.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("gt").alias("grid_us"),
        F.round(
            F.when(
                F.col("nt").isNull() | (F.col("nt") == F.col("pt")), F.col("pv")
            ).otherwise(
                F.col("pv")
                + (F.col("nv") - F.col("pv"))
                * (F.col("gt") - F.col("pt")).cast("double")
                / (F.col("nt") - F.col("pt")).cast("double")
            ),
            4,
        ).alias("value"),
    )


@q(
    "q_ts_max_concurrency",
    """
    WITH iv AS (
        SELECT l_suppkey AS k, epoch_us(o_orderdate) AS s,
               epoch_us(l_shipdate) AS e
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
    ),
    ev AS (
        SELECT k, s AS ts, 1 AS delta FROM iv
        UNION ALL
        SELECT k, e + 1 AS ts, -1 AS delta FROM iv
    ),
    c AS (
        SELECT k, SUM(delta) OVER (PARTITION BY k ORDER BY ts, delta
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cur
        FROM ev
    )
    SELECT k AS s_suppkey, CAST(MAX(cur) AS BIGINT) AS max_concurrent
    FROM c GROUP BY k
    """,
)
def q_ts_max_concurrency(spark, sf):
    # peak simultaneous open order→ship spans per supplier — the
    # capacity question that LOOKS like an interval self-join
    # (q_join_interval_overlap) but needs no pairs at all:
    # operators/rangejoin.max_concurrency runs the classic +1/−1 sweep
    # (start opens at s, closed end releases at e+1), one shuffle on the
    # key, one ordered window — O(n log n) per key vs the join's
    # O(pairs). When only the PEAK matters, sweep; materialize pairs
    # only when the pair list itself is the product. Tie rows are
    # identical (+1/+1 or −1/−1 at one µs), so any tie order gives the
    # same running-sum multiset — deterministic across engines.
    from mongo_to_parquet_spark.operators.rangejoin import max_concurrency

    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("l_suppkey").alias("k"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("e_us"),
        )
    )
    return max_concurrency(iv).select(
        F.col("k").alias("s_suppkey"), "max_concurrent"
    )


@q(
    "q_ts_interval_coalesce",
    """
    WITH iv AS (
        SELECT l_suppkey AS k, epoch_us(o_orderdate) AS s,
               epoch_us(l_shipdate) AS e
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
    ),
    marked AS (
        SELECT k, s, e,
               CASE WHEN max(e) OVER prior IS NULL OR s > max(e) OVER prior
                    THEN 1 ELSE 0 END AS is_new
        FROM iv
        WINDOW prior AS (PARTITION BY k ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    islands AS (
        SELECT k, s, e,
               SUM(is_new) OVER (PARTITION BY k ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
        FROM marked
    ),
    agg AS (
        SELECT k, island, MIN(s) AS i_s, MAX(e) AS i_e
        FROM islands GROUP BY k, island
    )
    SELECT k AS s_suppkey,
           COUNT(*) AS n_islands,
           CAST(SUM(i_e - i_s) AS BIGINT) AS covered_us,
           CAST(MAX(i_e - i_s) AS BIGINT) AS longest_us
    FROM agg GROUP BY k
    """,
)
def q_ts_interval_coalesce(spark, sf):
    # Coalesce each supplier's order→ship busy spans into maximal
    # islands and report coverage — the utilization question that looks
    # like the transitive closure of q_join_interval_overlap's pair list
    # but needs NO pairs and NO union-find: a per-key running-max sweep
    # (operators/rangejoin.coalesce_intervals) marks island starts in
    # one ordered window. Both engines order by (s, e); rows tying on
    # both are identical intervals, so island boundaries — and the
    # per-island MIN/MAX/SUM — are tie-order invariant, and all math is
    # integer µs: hash-exact.
    #
    # Scale: one shuffle on the key + one window sort; the follow-up
    # island aggregates touch island-count rows, already tiny. The
    # pair-join + connected-components route this replaces is quadratic
    # per hot key before the iterative CC even starts.
    from mongo_to_parquet_spark.operators.rangejoin import coalesce_intervals

    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("l_suppkey").alias("k"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("e_us"),
        )
    )
    isl = coalesce_intervals(iv)
    span = F.col("island_end") - F.col("island_start")
    return (
        isl.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(span).cast("bigint").alias("covered_us"),
            F.max(span).cast("bigint").alias("longest_us"),
        )
        .select(F.col("k").alias("s_suppkey"), "n_islands", "covered_us", "longest_us")
    )


# -------------------------------------------------- CUSUM changepoint ------
@q(
    "q_ts_changepoint",
    """
    WITH e AS (SELECT event_type,
                      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
               FROM events),
    hc AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c
           FROM e GROUP BY 1, 2),
    t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
                 CAST(SUM(c) * 100 // COUNT(*) AS BIGINT) AS target_x100
          FROM hc GROUP BY 1),
    c1 AS (
      SELECT hc.event_type, hc.h, t.n_hours, t.target_x100,
             SUM(hc.c * 100 - t.target_x100) OVER (
                 PARTITION BY hc.event_type ORDER BY hc.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hc JOIN t USING (event_type)),
    c2 AS (
      SELECT *, cum - LEAST(CAST(0 AS BIGINT), MIN(cum) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM c1)
    SELECT event_type, MAX(n_hours) AS n_hours,
           MAX(target_x100) AS target_x100,
           CAST(MAX(s) AS BIGINT) AS peak_cusum_x100,
           CAST(COUNT(*) FILTER (WHERE s > 12 * target_x100) AS BIGINT)
               AS n_alarms,
           COALESCE(CAST(epoch_us(MIN(h) FILTER (WHERE s > 12 * target_x100))
                         // 1000000 AS BIGINT), 0) AS first_alarm_epoch
    FROM c2 GROUP BY event_type
    """,
)
def q_ts_changepoint(spark, sf):
    # One-sided CUSUM changepoint detection on each event type's hourly
    # rate — the streaming-monitor question ("when did traffic shift?")
    # that per-point z-scores miss because small sustained drifts never
    # clear a per-point threshold. The recursive textbook form
    # S_i = max(0, S_{i-1} + dev_i) is NOT a plain window — but it
    # telescopes to S_i = cum_i − min(0, min_{j≤i} cum_j), turning the
    # recursion into a running SUM plus a running MIN over the same
    # ordering (one sort, two frames — the q_ts_interpolate trick).
    # All arithmetic is integer fixed-point: the per-hour reference rate
    # is ⌊total·100 / n_hours⌋ so deviations, cumulative sums and the
    # 12-hour-burst alarm threshold (s > 12·target) compare exactly in
    # both engines — no float drift at alarm boundaries. The sf0.001
    # fixture is rate-uniform (0 alarms, COALESCE branch), sf0.01 has
    # real bursts — both sides of the alarm predicate are gate-checked.
    #
    # Scale: the hourly pre-aggregation map-side-combines the raw events
    # to one row per (type, hour) BEFORE any shuffle; the windows then
    # sort only that tiny rate series per key. State per type is O(1).
    # Keys = event types (few, bounded); a per-user variant would hash
    # users across partitions with identical plans.
    e = _events_ltz(spark, sf)
    hc = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    t = hc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.expr("div(sum(c) * 100, count(*))").cast("bigint").alias("target_x100"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c1 = hc.join(t, "event_type").withColumn(
        "cum", F.sum(F.col("c") * 100 - F.col("target_x100")).over(w)
    )
    c2 = c1.withColumn(
        "s", F.col("cum") - F.least(F.lit(0).cast("bigint"), F.min("cum").over(w))
    )
    alarm = F.col("s") > 12 * F.col("target_x100")
    return c2.groupBy("event_type").agg(
        F.max("n_hours").alias("n_hours"),
        F.max("target_x100").alias("target_x100"),
        F.max("s").cast("bigint").alias("peak_cusum_x100"),
        F.count_if(alarm).cast("bigint").alias("n_alarms"),
        F.coalesce(
            (F.unix_micros(F.min(F.when(alarm, F.col("h")))) / F.lit(1000000))
            .cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("first_alarm_epoch"),
    )


# ------------------------------------------------------ dialog assembly ----
@q(
    "q_dialog_assemble",
    """
    WITH m AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER w AS TIMESTAMP)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new,
               CASE WHEN lag(event_type) OVER w = event_type
                         AND NOT (lag(ts) OVER w IS NULL
                                  OR CAST(ts AS TIMESTAMP)
                                     - CAST(lag(ts) OVER w AS TIMESTAMP)
                                     >= INTERVAL '30 minutes')
                    THEN 1 ELSE 0 END AS is_repeat
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess
        FROM m
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sess AS BIGINT) AS sess,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS started_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS ended_us,
           string_agg(event_type, '|' ORDER BY ts, event_id) AS dialog,
           CAST(SUM(is_repeat) AS BIGINT) AS n_repeats
    FROM s GROUP BY user_id, sess
    """,
)
def q_dialog_assemble(spark, sf):
    # conversation assembly — the SFT-data shape: burst-sessionize each
    # user's event stream (30-min gaps), then materialize every session
    # as ONE ordered dialog record (turn count, span, the turn-type
    # transcript, and a consecutive-same-role violation count — the
    # alternation check an instruction-data pipeline runs before
    # training). Repetition is flagged in the SAME window pass that marks
    # session starts (lag over one (user, ts, id) ordering; a repeat
    # across a session boundary doesn't count), so sessionization,
    # alternation audit and the cumulative session id all share ONE sort.
    # Transcript order is total — (ts, event_id) tiebreak — and the
    # Spark side materializes it via sort_array(collect_list(struct)),
    # whose struct-prefix sort is the same order, so both engines emit
    # identical strings.
    #
    # Scale: one shuffle on user_id (the window), one groupBy on (user,
    # sess) that AQE coalesces — per-session transcripts are
    # data-bounded (a user's 30-min burst), never corpus-bounded. The
    # collect_list is per session, the canonical "assemble training
    # records" fan-in.
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.unix_micros(F.col("ts").cast("timestamp")) - prev_ts >= gap_us), 1
    ).otherwise(0)
    is_rep = F.when(
        (F.lag("event_type").over(w) == F.col("event_type"))
        & ~(prev_ts.isNull() | (F.unix_micros(F.col("ts").cast("timestamp")) - prev_ts >= gap_us)),
        1,
    ).otherwise(0)
    m = e.select(
        "user_id", "event_id", "event_type", "ts",
        is_new.alias("is_new"), is_rep.alias("is_repeat"),
    )
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = m.withColumn("sess", F.sum("is_new").over(ws))
    turns = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                    F.col("event_id").alias("i"),
                    F.col("event_type").alias("e"),
                )
            )
        ),
        lambda x: x["e"],
    )
    return (
        s.groupBy(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("sess").cast("bigint").alias("sess"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("started_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("ended_us"),
            F.array_join(turns, "|").alias("dialog"),
            F.sum("is_repeat").cast("bigint").alias("n_repeats"),
        )
    )
