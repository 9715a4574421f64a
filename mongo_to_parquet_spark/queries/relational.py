"""Scans, filters, joins, aggregations, sorts, set ops (SURVEY §2.3).

Generalizes the reference's scan/filter/project surface (R1-R3,
reference main.py:288-303,107) to the full relational core. Physical-plan
intent per query is noted where it matters at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.functions import sketch as _sk
from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

# the reference's only predicate: inclusive-both-ends date range
# (main.py:291,293) — reused as this module's canonical range.
DATE_START = "1996-01-01"
DATE_END = "1997-12-31"

QUERIES, ORACLE, q = make_registry()


# ---------------------------------------------------------------- scans ----
@q("q_scan_full", "SELECT * FROM region")
def q_scan_full(spark, sf):
    # R1: full collection scan. Trivially parallel; nothing to optimize.
    return T(spark, sf, "region")


@q("q_scan_project", "SELECT l_orderkey, l_extendedprice FROM lineitem")
def q_scan_project(spark, sf):
    # R3 done right: projection reaches the parquet scan (ReadSchema shows
    # 2 of 11 columns) instead of the reference's client-side pop (main.py:107).
    return T(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")


@q(
    "q_json_extract",
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events",
)
def q_json_extract(spark, sf):
    # Mongo-document analog: JSON prop extraction, JVM-side.
    return T(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


# -------------------------------------------------------------- filters ----
@q(
    "q_filter_daterange",
    f"SELECT * FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '{DATE_START}' AND TIMESTAMP '{DATE_END}'",
)
def q_filter_daterange(spark, sf):
    # R2 exactly: inclusive bounds both ends; Catalyst pushes to the scan.
    return T(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between(F.lit(DATE_START).cast("timestamp_ntz"),
                                    F.lit(DATE_END).cast("timestamp_ntz"))
    )


@q(
    "q_filter_compound",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F') AND o_totalprice > 150000.0)
       OR (NOT o_orderpriority = '1-URGENT' AND o_totalprice <= 30000.0)
    """,
)
def q_filter_compound(spark, sf):
    o = T(spark, sf, "orders")
    cond = (F.col("o_orderstatus").isin("O", "F") & (F.col("o_totalprice") > 150000.0)) | (
        (~(F.col("o_orderpriority") == "1-URGENT")) & (F.col("o_totalprice") <= 30000.0)
    )
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@q(
    "q_filter_like",
    r"""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%bolt%' OR regexp_matches(p_name, '^(red|blue) ')
    """,
)
def q_filter_like(spark, sf):
    p = T(spark, sf, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_name").rlike("^(red|blue) ")
    ).select("p_partkey", "p_name")


# ---------------------------------------------------------------- joins ----
@q(
    "q_join_broadcast",
    """
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast(spark, sf):
    # small dim → explicit broadcast: no shuffle of the fact side.
    n, r = T(spark, sf, "nation"), T(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .select("n_nationkey", "n_name", "r_name")
    )


@q(
    "q_join_sortmerge",
    """
    SELECT o_orderkey, o_custkey, l_linenumber, l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def q_join_sortmerge(spark, sf):
    # large×large equi-join: hinted to SortMergeJoin so the plan exercised
    # here IS the plan two fact tables get at 100 TB (without the hint,
    # Catalyst broadcasts the small test-scale orders side — a plan that
    # cannot exist at scale). Measured faster than the broadcast plan at
    # sf0.1 anyway: no driver collect of a fact table.
    o, l = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    return o.hint("merge").join(l, o.o_orderkey == l.l_orderkey, "inner").select(
        "o_orderkey", "o_custkey", "l_linenumber", "l_extendedprice"
    )


@q(
    "q_join_multiway",
    f"""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate BETWEEN TIMESTAMP '{DATE_START}' AND TIMESTAMP '{DATE_END}'
    GROUP BY r_name, n_name
    """,
)
def q_join_multiway(spark, sf):
    # TPC-H-style chain: facts shuffle on their keys (hinted to sort-merge —
    # the only plan that exists at 100 TB, and ~30% faster than letting the
    # optimizer broadcast a fact table at test scale), dims broadcast.
    c, o, l = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    c, l = c.hint("merge"), l.hint("merge")
    o = o.hint("merge")
    return (
        c.join(
            o.filter(
                F.col("o_orderdate").between(
                    F.lit(DATE_START).cast("timestamp_ntz"), F.lit(DATE_END).cast("timestamp_ntz")
                )
            ),
            c.c_custkey == o.o_custkey,
        )
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            # exact DECIMAL aggregation, cast to double at the end: the fixture
            # prices/discounts are 2-decimal values, so decimal math makes the
            # sum a single exact rational in BOTH engines → bit-identical
            # doubles, no ROUND boundary hazard (see tools/parity.py notes).
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "q_join_left",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@q(
    "q_join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "q_join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "q_join_theta_range",
    """
    SELECT a.event_id AS id1, b.event_id AS id2,
           epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) AS delta_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) <= 300000000
    """,
)
def q_join_theta_range(spark, sf):
    # time-banded range join — see operators/rangejoin.py for why this is
    # the 100 TB-safe shape (per-key fan bounded by stream density, not
    # total history).
    from mongo_to_parquet_spark.operators.rangejoin import banded_pairs

    e = T(spark, sf, "events").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    return banded_pairs(e, band_us=300_000_000)


#: q_join_interval_overlap cell width: 30 days in µs — near the ~39-day
#: median order→ship span, so each interval covers ~2 grid cells
_IV_CELL_US = 2_592_000_000_000


@q(
    "q_join_interval_overlap",
    """
    WITH iv AS (
        SELECT l_suppkey AS k, l_orderkey * 10 + l_linenumber AS iv_id,
               epoch_us(o_orderdate) AS s, epoch_us(l_shipdate) AS e
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-07-01'
          AND l_shipdate >= o_orderdate
    )
    SELECT a.k AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
               AS total_overlap_us
    FROM iv a JOIN iv b
      ON a.k = b.k AND a.iv_id < b.iv_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.k
    """,
)
def q_join_interval_overlap(spark, sf):
    # INTERVAL OVERLAP self-join (ranges × ranges — the shape as-of and
    # banded point joins don't cover): per supplier, pairs of
    # order→ship spans that were open simultaneously, with total overlap
    # time — the concurrent-workload report. The oracle is the naive
    # theta join; the engine runs operators/rangejoin.py
    # interval_overlap_pairs — grid-cell blocking with the
    # first-shared-cell guard, so every overlapping pair is met exactly
    # once via an equi-join on (key, cell) and per-cell fan-out is
    # bounded by interval DENSITY, never by a supplier's full history.
    # Inverted spans (shipdate before orderdate — present in the
    # fixture) are excluded identically in both formulations.
    from mongo_to_parquet_spark.operators.rangejoin import interval_overlap_pairs

    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
        )
        .select(
            F.col("l_suppkey").alias("k"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iv_id"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("e_us"),
        )
    )
    pairs = interval_overlap_pairs(iv, cell_us=_IV_CELL_US)
    return pairs.groupBy(F.col("k").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("overlap_us").cast("bigint").alias("total_overlap_us"),
    )


@q(
    "q_join_asof",
    """
    SELECT e.event_id, e.user_id, s.ts AS signup_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def q_join_asof(spark, sf):
    from mongo_to_parquet_spark.operators.asof import asof_join

    e = T(spark, sf, "events")
    left = e.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = asof_join(left, right, on="user_id", left_time="ts", right_time="ts", carry=["ts"])
    return out.select("event_id", "user_id", F.col("ts_asof").alias("signup_ts"))


_ASOF_TOL_US = 86_400_000_000  # 1 day


@q(
    "q_join_asof_tolerance",
    f"""
    SELECT e.event_id, e.user_id,
           CASE WHEN s.ts IS NOT NULL
                     AND epoch_us(e.ts) - epoch_us(s.ts) <= {_ASOF_TOL_US}
                THEN s.ts END AS signup_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
    ASOF LEFT JOIN
         (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def q_join_asof_tolerance(spark, sf):
    # bounded-staleness as-of: a prior signup only matches within 1 day
    # of the event — older state is treated as missing (market-data /
    # attribution semantics: a quote from last week is not "the" quote).
    # Same union + one running window plan as q_join_asof; the tolerance
    # is a post-fill guard, not an extra join (operators/asof.py).
    from mongo_to_parquet_spark.operators.asof import asof_join

    e = T(spark, sf, "events")
    left = e.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = asof_join(
        left, right, on="user_id", left_time="ts", right_time="ts",
        carry=["ts"], tolerance_us=_ASOF_TOL_US,
    )
    return out.select("event_id", "user_id", F.col("ts_asof").alias("signup_ts"))


# ----------------------------------------------------------------- aggs ----
@q(
    "q_agg_global",
    """
    SELECT COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def q_agg_global(spark, sf):
    return T(spark, sf, "lineitem").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@q(
    "q_agg_groupby",
    f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{DATE_END}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark, sf):
    # TPC-H Q1 shape: partial (map-side) + final hash agg on 2 low-card keys.
    l = T(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(DATE_END).cast("timestamp_ntz")
    )
    # DECIMAL-exact money aggregation (see q_join_multiway note); averages as
    # exact-sum / count so both engines divide bit-identical numerators.
    dec_price = F.col("l_extendedprice").cast("decimal(18,2)")
    dec_disc = F.col("l_discount").cast("decimal(8,2)")
    dec_tax = F.col("l_tax").cast("decimal(8,2)")
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.sum(dec_price * (F.lit(1) - dec_disc)).cast("double").alias("sum_disc_price"),
        F.sum(dec_price * (F.lit(1) - dec_disc) * (F.lit(1) + dec_tax))
        .cast("double")
        .alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(dec_price).cast("double") / cnt).alias("avg_price"),
        (F.sum(dec_disc).cast("double") / cnt).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "q_agg_distinct",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
    )


@q(
    "q_agg_approx_distinct",
    f"""
    WITH d AS (SELECT DISTINCT {_sk.kmv_hash_sql('user_id')} AS h
               FROM events WHERE user_id IS NOT NULL),
    kd AS (SELECT h FROM d ORDER BY h ASC LIMIT {_sk.DEFAULT_K}),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta FROM kd)
    SELECT {_sk.kmv_estimate_sql('m', 'theta', _sk.DEFAULT_K)} AS approx_users
    FROM s
    """,
)
def q_agg_approx_distinct(spark, sf):
    # approximate distinct count, hash-checkable: a KMV sketch over
    # md5-derived hashes (functions/sketch.py) replaces the engine-native
    # HLL++ so the DuckDB oracle matches bit-for-bit — the HLL
    # formulation stays as the bench-only q_agg_approx_distinct_native.
    # Plan: distinct-hash set → global k-smallest (TakeOrdered: per-
    # partition top-k, then a k·partitions driver merge — never a full
    # sort) → 1-row estimate. At 100 TB the distinct pre-shrink is the
    # only shuffle, same as exact countDistinct's first phase; the
    # sketch itself adds nothing.
    k = _sk.DEFAULT_K
    d = (
        T(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select(_sk.kmv_hash(F.col("user_id")).alias("h"))
        .distinct()
    )
    s = d.orderBy("h").limit(k).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"), F.max("h").alias("theta")
    )
    return s.select(
        _sk.kmv_estimate(F.col("m"), F.col("theta"), k).alias("approx_users")
    )


def q_agg_approx_distinct_native(spark, sf):
    # the production 100 TB formulation (bench-only, BENCH_ONLY below):
    # approx_count_distinct's HLL++ buffer is fixed-size mergeable state
    # in ONE HashAggregate pass — no distinct pre-shrink shuffle at all.
    # Estimates are engine-specific, so the declared key uses the KMV
    # twin above for the oracle gate.
    return T(spark, sf, "events").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


@q(
    "q_agg_rollup",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           ROUND(SUM(o_totalprice), 2) AS total,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT))
    """,
)
def q_agg_rollup(spark, sf):
    o = T(spark, sf, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        "o_totalprice",
    )
    return o.rollup("yr", "mo").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("cnt")
    )


@q(
    "q_agg_cube",
    """
    SELECT event_type, CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS yr,
           COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_val
    FROM events
    GROUP BY CUBE (event_type, CAST(year(CAST(ts AS TIMESTAMP)) AS INT))
    """,
)
def q_agg_cube(spark, sf):
    e = T(spark, sf, "events").select(
        "event_type", F.year("ts").cast("int").alias("yr"), "value"
    )
    return e.cube("event_type", "yr").agg(
        F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_val")
    )


@q(
    "q_agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark, sf):
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@q(
    "q_agg_stats",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark, sf):
    # statistical aggregates: EXACT continuous percentiles (F.percentile,
    # not percentile_approx — same interpolation definition as DuckDB's
    # quantile_cont, so it hash-matches), correlation, sample
    # covariance/stddev. corr/covar/stddev carry O(groups) moment state
    # through the shuffle; the EXACT percentile buffers the group's values
    # (ObjectHashAggregate) — the oracle-checkable baseline. At 100 TB
    # swap in approx_percentile (t-digest sketch, O(groups) state) and
    # accept sketch error, the same exact-vs-scale split as countDistinct
    # vs approx_count_distinct.
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 2).alias("p50_price"),
            F.round(F.percentile("l_extendedprice", 0.95), 2).alias("p95_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        )
    )


#: q_agg_approx_percentile sample threshold: keep rows whose md5 row-hash
#: falls below p·2^32 with p = 1/4 — a deterministic uniform sample, so
#: both engines select the identical subset
_PCTL_SAMPLE_MAX = U32_QUARTER = 1073741824


@q(
    "q_agg_approx_percentile",
    f"""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    WHERE {_sk.kmv_hash_sql('event_id', salt='smp:')} < {_PCTL_SAMPLE_MAX}
    GROUP BY event_type
    """,
)
def q_agg_approx_percentile(spark, sf):
    # approximate percentiles, hash-checkable: a DETERMINISTIC md5-hash
    # row sample (keep iff h(event_id) < p·2³², p = 1/4) feeds the exact
    # interpolated percentile — both engines select the identical subset
    # and F.percentile ≡ DuckDB quantile_cont on it (the q_agg_stats
    # equivalence), so the estimates hash-match. Rank error of a uniform
    # p-sample is O(1/√(p·n)) per group — the same bounded-error contract
    # as a GK sketch, with the knob being sample rate instead of summary
    # size. The engine-native GK formulation (approx_percentile: O(1/ε)
    # state per group through the shuffle, no value buffering — the shape
    # for a single 100 TB group) stays as the bench-only
    # q_agg_approx_percentile_native.
    e = T(spark, sf, "events")
    s = e.filter(_sk.kmv_hash(F.col("event_id"), salt="smp:") < _PCTL_SAMPLE_MAX)
    return s.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
    )


def q_agg_approx_percentile_native(spark, sf):
    # bench-only (BENCH_ONLY below): the GK-sketch scale path; estimates
    # are engine-specific so the declared key samples deterministically
    # instead. tests/test_operators.py pins each value within rank-error
    # of the exact percentile.
    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("value", F.lit(0.9), F.lit(10000)).alias("p90"),
            F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("p99"),
        )
    )


@q(
    "q_agg_having",
    """
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 500000.0
    """,
)
def q_agg_having(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("_spend_raw"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("_spend_raw") > 500000.0)  # HAVING on the unrounded sum
        .select(
            "o_custkey", F.round("_spend_raw", 2).alias("spend"), "n_orders"
        )
    )


@q(
    "q_join_full",
    """
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, a.cnt_o, b.cnt_p
    FROM (SELECT o_custkey, COUNT(*) AS cnt_o FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
    FULL JOIN
         (SELECT o_custkey, COUNT(*) AS cnt_p FROM orders
          WHERE o_orderstatus = 'P' GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark, sf):
    # full outer over two aggregated slices ('P' is rare → both null sides
    # exercised). Full outer has no broadcast strategy: planned as SMJ on the
    # join key, which is also the only shape that exists at 100 TB.
    o = T(spark, sf, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k_o"))
        .agg(F.count(F.lit(1)).alias("cnt_o"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "P")
        .groupBy(F.col("o_custkey").alias("k_p"))
        .agg(F.count(F.lit(1)).alias("cnt_p"))
    )
    return a.join(b, a.k_o == b.k_p, "full").select(
        F.coalesce("k_o", "k_p").alias("custkey"), "cnt_o", "cnt_p"
    )


@q(
    "q_pivot",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS total_o,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_f,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS total_p
    FROM orders GROUP BY CAST(year(o_orderdate) AS INT)
    """,
)
def q_pivot(spark, sf):
    # pivot with an EXPLICIT value list: without it Spark runs a distinct-
    # collect pre-pass over the pivot column — a full extra scan at 100 TB.
    piv = (
        T(spark, sf, "orders")
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("yr")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("price").cast("double"))
    )
    return piv.select(
        "yr",
        F.col("O").alias("total_o"),
        F.col("F").alias("total_f"),
        F.col("P").alias("total_p"),
    )


@q(
    "q_unpivot",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
    """,
)
def q_unpivot(spark, sf):
    # unpivot/melt: wide → long without a shuffle (Expand node, one scan).
    p = T(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot(["p_partkey"], ["size", "retailprice"], "metric", "value")


@q(
    "q_subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
    """,
)
def q_subquery_scalar(spark, sf):
    # uncorrelated scalar subquery via the SQL surface: planned as an
    # independent agg whose single-row result is injected into the scan's
    # filter — the main scan reads once, no self-join. DECIMAL-exact avg so
    # the cut-off is bit-identical in both engines.
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM orders)
        """
    )


@q(
    "q_subquery_correlated",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_subquery_correlated(spark, sf):
    # correlated scalar subquery: Catalyst decorrelates it
    # (RewriteCorrelatedScalarSubquery) into an aggregate + equi-join on the
    # correlation key — one shuffle, no per-row re-execution, unlike the
    # nested-loop reading of the SQL.
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@q(
    "q_agg_listagg",
    """
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_listagg(spark, sf):
    # listagg/string_agg: collect_list is order-nondeterministic under
    # parallel merge, so sort INSIDE the group before joining — the only way
    # a concatenation hash-matches across engines (or across two Spark runs).
    return (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@q(
    "q_join_salted",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_salted(spark, sf):
    # skew-proof equi-join (operators/skew.py): fact rows salted on the
    # within-key-varying linenumber, orders replicated n_salt x, join on
    # (key, salt). Hash-identical to the plain join — the oracle IS the
    # plain join — while a hot orderkey's lineitems spread over 8 reducers
    # instead of one. The n_salt x dim scan is the price; broadcast remains
    # cheaper whenever the dim fits.
    from mongo_to_parquet_spark.operators.skew import salted_join

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    o = T(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_totalprice"
    )
    return salted_join(li, o, on=["l_orderkey"], salt_from="l_linenumber", n_salt=8)


@q(
    "q_agg_distinct_salted",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct_salted(spark, sf):
    # skew-proof EXACT count-distinct (operators/skew.py): the value hash
    # picks the salt, so phase-1 dedup spreads each hot group over 64
    # reducers and phase-2 just sums per-salt counts. Same answer as
    # COUNT(DISTINCT) — pinned by the oracle — without funnelling a hot
    # group's whole value set through one task.
    from mongo_to_parquet_spark.operators.skew import salted_distinct_count

    return salted_distinct_count(
        T(spark, sf, "lineitem"), ["l_returnflag"], "l_partkey", n_salt=64
    )


@q(
    "q_agg_argminmax",
    """
    SELECT o_orderstatus,
           arg_max(o_totalprice, o_orderkey) AS price_of_last_order,
           arg_min(o_totalprice, o_orderkey) AS price_of_first_order,
           arg_max(o_orderkey, o_orderkey) AS max_orderkey
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_argminmax(spark, sf):
    # min_by / max_by: single-pass argmin/argmax carried through the partial
    # aggregate — replaces the self-join-on-max idiom (two scans + shuffle)
    # with one map-side-combined agg. Ordering column is the UNIQUE orderkey,
    # so ties can't make the answer engine-dependent.
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_totalprice", "o_orderkey").alias("price_of_last_order"),
            F.min_by("o_totalprice", "o_orderkey").alias("price_of_first_order"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
    )


@q(
    "q_agg_mode",
    """
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT o_orderstatus, o_orderpriority, cnt,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY cnt DESC, o_orderpriority ASC) AS rn
        FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM r WHERE rn = 1
    """,
)
def q_agg_mode(spark, sf):
    # deterministic MODE: SQL's mode() is tie-nondeterministic, so the
    # engine defines it as count-rank with a total order (count desc, value
    # asc) — reproducible across engines and runs. Physically: one
    # map-side-combined count aggregate shrinks the data to the group x
    # value cardinality, then the rank window runs on that tiny frame; the
    # window's partition key is a prefix of the agg key, so AQE coalesces
    # the second exchange to almost nothing. Never window over raw rows for
    # a mode — aggregate first.
    from pyspark.sql import Window

    c = (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "cnt"
        )
    )


@q(
    "q_agg_bitwise",
    """
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS band,
           bit_or(o_orderkey) AS bor,
           bit_xor(o_orderkey) AS bxor,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_bitwise(spark, sf):
    # bitwise + boolean aggregates and FILTER'd count — all commutative /
    # associative, so partial aggregation (map-side combine) applies and the
    # shuffle carries one row per (partition, status).
    big = F.col("o_totalprice") > 200000
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").alias("band"),
            F.bit_or("o_orderkey").alias("bor"),
            F.bit_xor("o_orderkey").alias("bxor"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count(F.when(big, 1)).alias("n_big"),
        )
    )


# -------------------------------------------------------- sorts / top-k ----
@q(
    "q_sort_multi",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
)
def q_sort_multi(spark, sf):
    # global range-partitioned sort (sample → range exchange → local sort)
    return (
        T(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


@q(
    "q_topk_global",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def q_topk_global(spark, sf):
    # planned as TakeOrderedAndProject: per-partition top-10 + driver merge —
    # no global sort, the right plan at any scale.
    return (
        T(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
    )


# -------------------------------------------------------------- set ops ----
_SLICE_O = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
_SLICE_F = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"


@q("q_set_union_all", f"{_SLICE_O} UNION ALL {_SLICE_F}")
def q_set_union_all(spark, sf):
    o = T(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.unionByName(b)


@q("q_set_intersect", f"{_SLICE_O} INTERSECT {_SLICE_F}")
def q_set_intersect(spark, sf):
    o = T(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@q("q_set_except", f"{_SLICE_O} EXCEPT ALL {_SLICE_F}")
def q_set_except(spark, sf):
    o = T(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@q("q_set_intersect_all", f"{_SLICE_O} INTERSECT ALL {_SLICE_F}")
def q_set_intersect_all(spark, sf):
    # multiset intersect: keeps min(multiplicity) copies per value —
    # completes the bag-semantics trio (union all / intersect all /
    # except all). Same plan family as q_set_intersect: a count-per-value
    # aggregation on each side, joined on the value.
    o = T(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


@q(
    "q_agg_custdist",
    """
    WITH co AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q_agg_custdist(spark, sf):
    # TPC-H Q13 shape: distribution of orders-per-customer, INCLUDING the
    # zero-order customers (left join, count of the nullable side). Two
    # stacked aggregations: the first shuffles by customer (same key as
    # the join, exchange reused), the second reduces #customers rows to
    # #distinct-counts — at 100 TB the histogram rows are trivially small,
    # so the cost is one fact shuffle.
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@q(
    "q_quality_checks",
    """
    SELECT 'date_not_null' AS chk,
           CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'price_range',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0 OR o_totalprice > 10000000) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_domain',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'custkey_fk',
           CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
                 ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT)
    """,
)
def q_quality_checks(spark, sf):
    # pipeline-gate validation (operators/validate.py): the three row-level
    # rules fuse into ONE scan+agg (adding a rule costs a column, not a
    # scan); uniqueness is count-minus-distinct; FK orphans an anti join.
    # Zero-violation rows stay in the report as evidence the check ran.
    from mongo_to_parquet_spark.operators import validate as V

    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    return V.run_checks(
        V.row_checks(
            o,
            {
                "date_not_null": F.col("o_orderdate").isNull(),
                "price_range": (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 10_000_000),
                "status_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
            },
        ),
        V.unique_check(o, ["o_orderkey"], "orderkey_unique"),
        V.fk_check(o, "o_custkey", c, "c_custkey", "custkey_fk"),
    )


@q(
    "q_agg_hll_sketch",
    f"""
    WITH d AS (SELECT DISTINCT event_type, {_sk.kmv_hash_sql('user_id')} AS h
               FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
          FROM d),
    sk AS (SELECT event_type, h FROM r WHERE rn <= {_sk.DEFAULT_K}),
    per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta
            FROM sk GROUP BY event_type),
    mk AS (SELECT h FROM (SELECT DISTINCT h FROM sk)
           ORDER BY h ASC LIMIT {_sk.DEFAULT_K}),
    ms AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta FROM mk)
    SELECT event_type,
           {_sk.kmv_estimate_sql('m', 'theta', _sk.DEFAULT_K)} AS approx_users
    FROM per
    UNION ALL
    SELECT '__total__' AS event_type,
           {_sk.kmv_estimate_sql('m', 'theta', _sk.DEFAULT_K)} AS approx_users
    FROM ms
    """,
)
def q_agg_hll_sketch(spark, sf):
    # MERGEABLE distinct-count sketches, hash-checkable: per-type KMV
    # sketches (k smallest distinct md5 hashes) are built once, then the
    # __total__ row MERGES the per-type sketches — union the retained
    # hashes, re-truncate to the k smallest, re-estimate — with NO second
    # scan of the data. Same composition contract as the DataSketches HLL
    # union (kept as the bench-only q_agg_hll_sketch_native): store
    # sketches per partition/day, merge for any slice, never recount.
    # Plan: one distinct shuffle on (type, hash), a per-type top-k window
    # over ≤k·types rows, and a k-row merge — the sketches, not the data,
    # are what moves.
    from pyspark.sql import Window

    k = _sk.DEFAULT_K
    w = Window.partitionBy("event_type").orderBy("h")
    d = (
        T(spark, sf, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", _sk.kmv_hash(F.col("user_id")).alias("h"))
        .distinct()
    )
    sk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"), F.max("h").alias("theta")
    )
    per_est = per.select(
        "event_type", _sk.kmv_estimate(F.col("m"), F.col("theta"), k).alias("approx_users")
    )
    total = (
        sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"), F.max("h").alias("theta"))
        .select(
            F.lit("__total__").alias("event_type"),
            _sk.kmv_estimate(F.col("m"), F.col("theta"), k).alias("approx_users"),
        )
    )
    return per_est.unionByName(total)


def q_agg_hll_sketch_native(spark, sf):
    # bench-only (BENCH_ONLY below): DataSketches HLL per-type sketches +
    # hll_union_agg merge — the production mergeable-rollup primitive;
    # binary estimates are engine-specific so the declared key uses the
    # KMV twin. tests/test_operators.py pins estimates within HLL error
    # and checks union-merge == direct whole-table sketch.
    e = T(spark, sf, "events")
    per = e.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    total = (
        per.agg(F.hll_union_agg("sk").alias("u"))
        .select(
            F.lit("__total__").alias("event_type"),
            F.hll_sketch_estimate("u").alias("approx_users"),
        )
    )
    return per_est.unionByName(total)


@q(
    "q_merge_upsert",
    """
    WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    upd AS (
        SELECT o_orderkey, 'X' AS o_orderstatus,
               o_totalprice * 0.5 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT -o_orderkey AS o_orderkey, 'N' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT * FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    UNION ALL
    SELECT * FROM upd
    """,
)
def q_merge_upsert(spark, sf):
    # SCD-1 merge (operators/merge.py): a synthetic change-set — price
    # corrections on every 7th key, inserts on negated 11th keys — applied
    # onto orders. The anti-join sees only the updates' DISTINCT KEY SET,
    # so base never shuffles when the change-set is broadcast-sized.
    from mongo_to_parquet_spark.operators.merge import merge_upsert

    o = T(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(0.5)).alias("o_totalprice"),
    )
    ins = o.filter(F.col("o_orderkey") % 11 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    return merge_upsert(o, upd.unionByName(ins), ["o_orderkey"])


@q(
    "q_agg_histogram",
    """
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 600000.0 THEN 13
                ELSE CAST(FLOOR((o_totalprice - 0.0) / ((600000.0 - 0.0) / 12))
                          AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY 1
    """,
)
def q_agg_histogram(spark, sf):
    # equi-width histogram via the built-in width_bucket — the profiling
    # primitive behind skew detection and range-boundary picking. One
    # map-side-combinable groupBy on a 14-value key; DECIMAL-exact money
    # sums per the cross-engine convention. The oracle mirrors
    # width_bucket's exact float path ((v-lo)/((hi-lo)/n), here /50000.0
    # exact) so boundary values bucket identically in both engines.
    o = T(spark, sf, "orders")
    b = F.width_bucket(
        F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)
    )
    return o.groupBy(b.cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@q(
    "q_sql_surface",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_sql_surface(spark, sf):
    # the engine's SECOND entry surface (SURVEY §3.4): the same Catalyst
    # pipeline entered through the SQL parser over the registered fixture
    # views — TPC-H Q3 shape (unshipped high-revenue orders), near-verbatim
    # the oracle text. Everything the DataFrame queries rely on (decimal
    # money sums, broadcast dims, partial aggs, TakeOrderedAndProject for
    # the limit) falls out of the identical plan.
    from mongo_to_parquet_spark.sources.catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
               date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS order_date
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP_NTZ '1998-01-01'
          AND l_shipdate > TIMESTAMP_NTZ '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """
    )


@q(
    "q_profile",
    """
    SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           strftime(MIN(o_orderdate), '%Y-%m-%d'), strftime(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    """,
)
def q_profile(spark, sf):
    # dataset profiling (operators/validate.py profile_columns): the
    # ingest-time "describe" every pipeline runs before trusting a new
    # drop. Exact mode: TWO 1-row aggregates (nulls/min/max; distincts)
    # cross-joined - mixing them in one agg drags everything through the
    # distinct rewrite's Expand+SortAggregate (30x slower, see operator
    # docstring); approx mode is a true single HashAggregate pass. Either
    # beats the oracle's 5-way UNION ALL of separate scans. Min/max format
    # AFTER aggregation (native-type compare, then repr): money through
    # DECIMAL(18,2) for a fixed 2dp rendering, timestamps through an
    # explicit date format - both engine-stable.
    from mongo_to_parquet_spark.operators.validate import profile_columns

    o = T(spark, sf, "orders")
    return profile_columns(
        o,
        {
            "o_orderkey": None,
            "o_custkey": None,
            "o_orderstatus": None,
            "o_totalprice": lambda c: c.cast("decimal(18,2)").cast("string"),
            "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd"),
        },
    )


#: q_profile_approx hash inputs: engine-stable canonical strings per
#: column type (ints/strings as-is; money through DECIMAL(18,2); the
#: timestamp through an explicit second-precision format) — Spark's
#: cast-to-string and DuckDB's CAST AS VARCHAR agree on these exactly.
_PROFILE_KMV_ORACLE = f"""
    WITH pairs AS (
        SELECT 'o_orderkey' AS col_name, {_sk.kmv_hash_sql('o_orderkey')} AS h
        FROM orders
        UNION ALL
        SELECT 'o_custkey', {_sk.kmv_hash_sql('o_custkey')} FROM orders
        UNION ALL
        SELECT 'o_orderstatus', {_sk.kmv_hash_sql('o_orderstatus')} FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               {_sk.kmv_hash_sql('CAST(o_totalprice AS DECIMAL(18,2))')}
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               {_sk.kmv_hash_sql("strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')")}
        FROM orders
    ),
    d AS (SELECT DISTINCT col_name, h FROM pairs WHERE h IS NOT NULL),
    r AS (SELECT col_name, h,
                 ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY h ASC) AS rn
          FROM d),
    sk AS (SELECT col_name, h FROM r WHERE rn <= {_sk.DEFAULT_K}),
    est AS (SELECT col_name, CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta
            FROM sk GROUP BY col_name),
    base AS (
        SELECT 'o_orderkey' AS col_name,
               CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
               strftime(MIN(o_orderdate), '%Y-%m-%d'),
               strftime(MAX(o_orderdate), '%Y-%m-%d')
        FROM orders
    )
    SELECT b.col_name, b.n_nulls,
           COALESCE({_sk.kmv_estimate_long_sql('e.m', 'e.theta', _sk.DEFAULT_K)},
                    0) AS n_distinct,
           b.min_repr, b.max_repr
    FROM base b LEFT JOIN est e USING (col_name)
"""


@q("q_profile_approx", _PROFILE_KMV_ORACLE)
def q_profile_approx(spark, sf):
    # the approximate profiling mode, hash-checkable: KMV-estimated
    # distinct counts (operators/validate.profile_columns_kmv) instead of
    # engine-specific HLL — the nulls/min/max base is ONE 1-row aggregate
    # pass and ALL columns' hash pairs come from ONE stacked Generate
    # scan feeding distinct + WindowGroupLimit-bounded row_number<=k
    # (2 scans total; bench-protocol best-of-3 at sf0.1 measured 1.63s
    # vs 2.34s for the round-5 collect_set form on the same box —
    # see validate.profile_columns_kmv for the full history).
    # The single-pass HLL formulation (profile_columns exact=False —
    # the true one-scan 100 TB mode) stays as the bench-only
    # q_profile_approx_native so the exact-vs-approx cost split is still
    # measured.
    from mongo_to_parquet_spark.operators.validate import profile_columns_kmv

    o = T(spark, sf, "orders")
    return profile_columns_kmv(
        o,
        {
            "o_orderkey": None,
            "o_custkey": None,
            "o_orderstatus": None,
            "o_totalprice": lambda c: c.cast("decimal(18,2)").cast("string"),
            "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd"),
        },
        hash_inputs={
            "o_totalprice": F.col("o_totalprice").cast("decimal(18,2)"),
            "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        },
        k=_sk.DEFAULT_K,
    )


def q_profile_approx_native(spark, sf):
    # bench-only (BENCH_ONLY below): ONE HashAggregate pass over one scan
    # — approx_count_distinct's fixed-size HLL buffer keeps the distinct
    # metric out of the Expand+SortAggregate distinct rewrite entirely
    # (see q_profile / operators/validate.py). Engine-specific estimates,
    # so the declared key uses the KMV twin.
    from mongo_to_parquet_spark.operators.validate import profile_columns

    o = T(spark, sf, "orders")
    return profile_columns(
        o,
        {
            "o_orderkey": None,
            "o_custkey": None,
            "o_orderstatus": None,
            "o_totalprice": lambda c: c.cast("decimal(18,2)").cast("string"),
            "o_orderdate": lambda c: F.date_format(c, "yyyy-MM-dd"),
        },
        exact=False,
    )


@q(
    "q_join_fuzzy",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON string_split(a.p_name, ' ')[-1] = string_split(b.p_name, ' ')[-1]
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q_join_fuzzy(spark, sf):
    # fuzzy entity matching: edit-distance similarity join over distinct
    # part names, BLOCKED on the last token. The block key turns an O(N^2)
    # cross join into an equi-join (hash/SMJ at scale) whose per-bucket
    # fan-out is bounded by block cardinality - the standard blocking
    # pattern for record linkage; levenshtein runs only within blocks.
    names = (
        T(spark, sf, "part")
        .select("p_name")
        .distinct()
        .withColumn("blk", F.element_at(F.split(F.col("p_name"), " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).cast("int"))
        .filter(F.col("dist") <= 4)
        .select(
            F.col("a.p_name").alias("name1"),
            F.col("b.p_name").alias("name2"),
            "dist",
        )
    )


@q(
    "q_sql_recursive",
    """
    WITH RECURSIVE anc AS (
        SELECT c_custkey AS leaf, c_custkey AS node, 0 AS depth FROM customer
        UNION ALL
        SELECT leaf, node // 2, depth + 1 FROM anc WHERE node > 1
    )
    SELECT leaf, node, CAST(depth AS INT) AS depth FROM anc
    """,
)
def q_sql_recursive(spark, sf):
    # WITH RECURSIVE on the SQL surface (Spark 4 recursive CTEs): every
    # customer's full ancestor chain in an implicit binary hierarchy
    # (parent = key div 2) — the org-chart / BOM-explosion recursion shape.
    # Spark supports UNION ALL recursion only, so the walk is designed
    # explosion-free: each row has exactly one parent, depth is bounded by
    # log2(max key), and total output is Σ(log2(key)+1) rows — the
    # recursion does one self-join per level against a shrinking frontier.
    # At 100 TB each level is a frontier-sized shuffle; hierarchies deeper
    # than ~100 need spark.sql.cteRecursionLevelLimit raised.
    from mongo_to_parquet_spark.sources.catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT c_custkey AS leaf, c_custkey AS node, 0 AS depth FROM customer
            UNION ALL
            SELECT leaf, node div 2, depth + 1 FROM anc WHERE node > 1
        )
        SELECT leaf, node, CAST(depth AS INT) AS depth FROM anc
        """
    )


@q(
    "q_agg_distinct_bitmap",
    """
    SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_buyers
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct_bitmap(spark, sf):
    # EXACT count-distinct via bitmap buckets (Spark 4 bitmap_* aggs) —
    # the third point on the distinct-count frontier alongside
    # q_agg_distinct (Expand-based exact) and q_agg_approx_distinct (HLL
    # approx): each 32k-id bucket aggregates into a fixed-size bitmap, so
    # the shuffle carries (group, bucket, bitmap) blobs whose size depends
    # on the ID RANGE, not the row count — exact answers with
    # sketch-shaped shuffle volume. The oracle is plain COUNT(DISTINCT):
    # the bitmap decomposition must reproduce it bit-for-bit.
    #
    # Scale: partial bitmap_construct_agg ORs bitmaps map-side; the final
    # per-group sum of bucket popcounts is exact under any partitioning.
    # Sparse/huge ID spaces (uuids) don't fit dense bitmaps — hash to a
    # dense surrogate first or fall back to HLL.
    o = T(spark, sf, "orders")
    buckets = (
        o.groupBy(
            "o_orderstatus",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"))
    )
    return buckets.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_buyers")
    )


@q(
    "q_json_flatten",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
    FROM events
    """,
)
def q_json_flatten(spark, sf):
    # the Mongo-document ingestion idiom as a declared query: parse the
    # JSON column under an EXPLICIT schema and flatten the struct to
    # top-level columns (operators/nested.py) — what q_json_extract does
    # per-field, done once for the whole document with the schema as a
    # pinned artifact. Zero shuffle; the from_json + struct projection
    # stay inside codegen.
    from mongo_to_parquet_spark.operators import nested

    ev = T(spark, sf, "events").select("event_id", "props")
    return nested.parse_and_flatten(ev, "props", "struct<k: bigint>").select(
        "event_id", "props_k"
    )


@q(
    "q_sql_pipe",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderstatus
    """,
)
def q_sql_pipe(spark, sf):
    # Spark 4 SQL pipe syntax (|>): the same logical plan entered as a
    # linear FROM → WHERE → AGGREGATE chain — reads in execution order,
    # composes by appending stages, and parses to the identical Catalyst
    # plan as the nested-SELECT oracle text (same pushdown, same partial
    # aggregation).
    from mongo_to_parquet_spark.sources.catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           GROUP BY o_orderstatus
        """
    )


@q(
    "q_sql_lateral",
    """
    SELECT c_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC
             LIMIT 1)
    """,
)
def q_sql_lateral(spark, sf):
    # LATERAL correlated derived table: each customer's single biggest
    # order, expressed as a per-row subquery instead of the window-rank
    # idiom (q_win_topk_group) — the SQL surface for "top-1 per entity"
    # that planners decorrelate into exactly that window/aggregation
    # under the hood. Customers with no orders drop (inner lateral),
    # matching the oracle.
    from mongo_to_parquet_spark.sources.catalog import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC
                 LIMIT 1)
        """
    )


#: engine-native approximate formulations, kept OUT of the declared
#: (oracle-gated) surface — their sketch estimates are engine-specific
#: and can never hash-match DuckDB — but still benchmarked (bench.py
#: merges this registry) so the production 100 TB paths keep a tracked
#: number alongside their hash-checkable KMV twins.
BENCH_ONLY = {
    "q_agg_approx_distinct_native": q_agg_approx_distinct_native,
    "q_agg_approx_percentile_native": q_agg_approx_percentile_native,
    "q_agg_hll_sketch_native": q_agg_hll_sketch_native,
    "q_profile_approx_native": q_profile_approx_native,
}


# ------------------------------------------------- quarantine routing ------
@q(
    "q_quality_quarantine",
    """
    WITH checked AS (
        SELECT o_orderkey,
               list_filter([
                   CASE WHEN NOT (o_totalprice <= 450000) THEN 'price_cap' END,
                   CASE WHEN NOT (o_totalprice >= 5000) THEN 'price_floor' END,
                   CASE WHEN NOT (o_orderpriority <> '1-URGENT'
                                  OR year(o_orderdate) >= 1994)
                        THEN 'stale_urgent' END
               ], x -> x IS NOT NULL) AS reasons
        FROM orders
    )
    SELECT o_orderkey,
           array_to_string(reasons, ',') AS reasons,
           CAST(len(reasons) AS INT) AS n_violations
    FROM checked WHERE len(reasons) > 0
    """,
)
def q_quality_quarantine(spark, sf):
    # dead-letter routing — the ingest-side twin of q_quality_checks'
    # report: every row is evaluated against the rule set in ONE pass and
    # failing rows land in the quarantine table WITH the list of rules
    # they violated (the reasons column is what lets an operator triage a
    # 100 TB load's rejects without re-running checks). The clean side is
    # the complement filter over the same expression — route both from
    # one scan; the declared result is the quarantine relation, whose
    # rule names are built in a FIXED order so both engines emit
    # identical reason strings.
    #
    # Scale: map-side only (per-row CASE array + filter, codegen), no
    # shuffle, no per-rule rescans — cost is one scan regardless of rule
    # count.
    o = T(spark, sf, "orders")
    reasons = F.filter(
        F.array(
            F.when(~(F.col("o_totalprice") <= 450000), F.lit("price_cap")),
            F.when(~(F.col("o_totalprice") >= 5000), F.lit("price_floor")),
            F.when(
                ~(
                    (F.col("o_orderpriority") != "1-URGENT")
                    | (F.year("o_orderdate") >= 1994)
                ),
                F.lit("stale_urgent"),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    checked = o.select("o_orderkey", reasons.alias("r"))
    return checked.filter(F.size("r") > 0).select(
        "o_orderkey",
        F.array_join(F.col("r"), ",").alias("reasons"),
        F.size("r").cast("int").alias("n_violations"),
    )
