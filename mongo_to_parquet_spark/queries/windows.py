"""Window-function queries (SURVEY §2.3).

All single-shuffle: one exchange on the partition key, then sorted runs.
Every ranking carries a deterministic tiebreak so the oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


_ORD = "ORDER BY o_totalprice DESC, o_orderkey ASC"


@q(
    "q_win_rank",
    f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank()       OVER (PARTITION BY o_custkey {_ORD}) AS INT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey {_ORD}) AS INT) AS drnk,
           CAST(row_number() OVER (PARTITION BY o_custkey {_ORD}) AS INT) AS rn
    FROM orders
    """,
)
def q_win_rank(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.row_number().over(w).cast("int").alias("rn"),
    )


@q(
    "q_win_topk_group",
    f"""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey {_ORD}) AS INT) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def q_win_topk_group(spark, sf):
    # top-3 per group via rank-filter: Spark pushes a per-partition limit
    # into the window sort (WindowGroupLimit) — no full materialization.
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        T(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@q(
    "q_win_lag_lead",
    """
    SELECT event_id, user_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value,
           ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 4) AS delta
    FROM events
    """,
)
def q_win_lag_lead(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@q(
    "q_win_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
    FROM orders
    """,
)
def q_win_running(spark, sf):
    # DECIMAL window sums → bit-identical doubles in both engines (frame avgs
    # over tiny counts sit ON round-tie boundaries constantly otherwise).
    ww = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    run = ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = ww.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias("moving_avg3"),
    )


@q(
    "q_win_distribution",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_custkey {_ORD}) AS INT) AS quartile,
           ROUND(percent_rank() OVER (PARTITION BY o_custkey {_ORD}), 6) AS pct_rank,
           ROUND(cume_dist() OVER (PARTITION BY o_custkey {_ORD}), 6) AS cdist,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey {_ORD}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS biggest_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey {_ORD}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS smallest_order
    FROM orders
    """,
)
def q_win_distribution(spark, sf):
    # distribution family: ntile / percent_rank / cume_dist are exact integer
    # ratios → bit-identical doubles (ROUND 6 is belt-and-braces only).
    # first/last_value get an EXPLICIT unbounded frame: the default frame
    # stops at CURRENT ROW, which silently turns last_value into a no-op.
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(full).alias("biggest_order"),
        F.last("o_orderkey").over(full).alias("smallest_order"),
    )


@q(
    "q_win_range_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE) AS cum_share
    FROM orders
    """,
)
def q_win_range_frame(spark, sf):
    ww = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    run = ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = Window.partitionBy("o_custkey")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec).over(run).cast("double") / F.sum(dec).over(total).cast("double")).alias(
            "cum_share"
        ),
    )


@q(
    "q_win_count_distinct",
    """
    WITH ev AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    f AS (
        SELECT *, CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                               ORDER BY ts, event_id) = 1
                       THEN 1 ELSE 0 END AS first_seen
        FROM ev
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS run_distinct_types
    FROM f
    """,
)
def q_win_count_distinct(spark, sf):
    # Running COUNT(DISTINCT) over a window — which Spark (and ANSI SQL)
    # does not support directly — via the first-occurrence-flag idiom:
    # flag each (user, type)'s earliest row, then running-SUM the flags in
    # time order. The flag window deliberately partitions by user_id ALONE
    # and sorts (event_type, ts, event_id): each type block's head is that
    # type's time-first row (within the block the order IS time), which is
    # the same flag a (user,type)-partitioned row_number()==1 would give —
    # but now both windows share HashPartitioning(user_id), so the whole
    # query is ONE Exchange + two Sorts (asserted in tests) instead of two
    # full shuffles of the event stream. The per-user "distinct behaviors
    # so far" curve is the engagement-breadth signal in event analytics.
    ev = T(spark, sf, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    wtype = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_type = F.lag("event_type").over(wtype)
    return (
        ev.withColumn(
            "first_seen",
            F.when(prev_type.isNull() | (prev_type != F.col("event_type")), 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(wrun).cast("bigint").alias("run_distinct_types"),
        )
    )


@q(
    "q_win_median",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(quantile_cont(o_totalprice, 0.5) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
    FROM orders
    """,
)
def q_win_median(spark, sf):
    # Rolling exact median over the last 5 orders per customer — the
    # robust (outlier-immune) baseline that rolling AVG (q_win_running)
    # is not. Spark's percentile aggregate runs as a window function with
    # an explicit ROWS frame; interpolation semantics match DuckDB's
    # quantile_cont (equivalence pinned by q_agg_stats).
    #
    # Scale: one shuffle by customer; per-row cost is the O(frame) sort
    # buffer, constant here (frame=5). Wide frames at 100 TB would switch
    # to q_agg_approx_percentile's GK sketch per bucket instead — exact
    # sliding medians over big frames don't decompose.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.expr("percentile(o_totalprice, 0.5)").over(w), 4).alias("med5"),
    )


@q(
    "q_agg_weighted_median",
    """
    WITH t AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(l_quantity AS DECIMAL(18,2)) AS w
        FROM lineitem
    ),
    c AS (
        SELECT flag, v, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(w) OVER (PARTITION BY flag) AS tot
        FROM t
    )
    SELECT flag AS l_returnflag,
           MIN(v) AS weighted_median,
           CAST(CAST(MAX(tot) AS DECIMAL(18,2)) AS DOUBLE) AS total_weight
    FROM c
    WHERE 2 * cum >= tot
    GROUP BY flag
    """,
)
def q_agg_weighted_median(spark, sf):
    # Exact quantity-weighted median price per return flag — the
    # lower weighted median: smallest v whose cumulative weight reaches
    # half the total. percentile()/quantile_cont() can't take weights,
    # so this is the cumulative-weight-window formulation: one ordered
    # window for the running weight, one unbounded window for the total
    # (both share the single per-flag exchange), filter 2·cum ≥ tot,
    # MIN(v) per group.
    #
    # Hash-exact by construction: weights ride DECIMAL(18,2) (integer
    # cents — no float accumulation order issues), and the answer is a
    # SELECTED input double, bit-identical from parquet on both engines,
    # never a computed float. Value ties need no tiebreak: the last row
    # of a tied run always carries the run's full cumulative weight, so
    # whether ANY row of value v qualifies is permutation-invariant,
    # and MIN(v) over qualifying rows with it.
    #
    # Scale: one shuffle on the group key + one sort — the same envelope
    # as any per-key window; no join, no second pass. At 100 TB with
    # millions of rows per group this stays a single window; only if one
    # group outgrows a task's sort budget would it demote to the GK
    # sketch (q_agg_approx_percentile), which ignores weights.
    li = T(spark, sf, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("decimal(18,2)").alias("w"),
    )
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("flag")
    c = t.select(
        "flag",
        "v",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("tot"),
    )
    return (
        c.filter(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tot").cast("decimal(18,2)").cast("double").alias("total_weight"),
        )
        .select(F.col("flag").alias("l_returnflag"), "weighted_median", "total_weight")
    )
