"""TPC-DS-shaped retail report pack — Expand-heavy planner shapes.

The TPC-H pack (queries/tpch.py) covers the join/selectivity yardstick;
what it does NOT exercise is the retail-report side of TPC-DS: CUBE /
ROLLUP / GROUPING SETS over channel hierarchies (Expand-based plans with
k+1× row amplification), ratio-of-conditional-aggregates reports,
year-over-year pivots, and multi-channel set intersections. These are
the shapes this module adds, adapted to the fixture star schema
(c_mktsegment plays the sales channel, o_orderpriority the "store", the
1995-2001 o_orderdate span the date dim).

Shape provenance per query (TPC-DS query numbers are the spec's):
  - q_ds_returns_ratio        → Q93/Q81 (per-customer return ratio)
  - q_ds_channel_cube         → Q77/Q5 (cross-channel report, CUBE)
  - q_ds_report_grouping_sets → Q27/Q67 (hierarchy report, GROUPING SETS)
  - q_ds_rollup_share_rank    → Q36 (share ROLLUP + RANK within parent
                                 hierarchy level — Expand feeding Window)
  - q_ds_yoy_growth           → Q74 (year-over-year customer pivot)
  - q_ds_cross_channel        → Q38/Q87 (customers present in ALL channels)
  - q_ds_distinct_cube        → Q14-flavor (COUNT(DISTINCT) under CUBE:
                                 Expand × distinct-rewrite interplay)
  - q_ds_multi_supplier_clean → Q94 (orders from ≥2 suppliers with no
                                 returned line — grouped semi/anti logic)
  - q_ds_returns_above_avg    → Q1 (returns above 1.2× the channel
                                 average — correlated subquery
                                 decorrelated to agg → re-agg → join)
  - q_ds_channel_migration    → cross-channel behavior flavor (modal
                                 channel per year, year-over-year shift)
  - q_ds_cumulative_crossover → Q51 (two channels' cumulative series
                                 full-outer aligned with ignore-nulls
                                 gap fill; overtake days reported)
  - q_ds_timeband_counts      → Q88 (8 filtered-count subqueries fused
                                 into one conditional aggregate)
  - q_ds_basket_buckets       → Q34/Q73 (order-size buckets per sales
                                 attribute; orderkey-co-partitioned join)
  - q_ds_hour_ratio           → Q90 (am/pm activity ratio, NULL-guarded
                                 division)

Determinism (the cross-engine conventions from queries/__init__.py):
money sums in DECIMAL cast to DOUBLE at the end; ratios as
DOUBLE/DOUBLE division of those exact values; years CAST to INT;
GROUPING() flags CAST to INT; rank order keys COALESCE NULL dims so
Spark/DuckDB NULL-ordering defaults never matter.

Scale notes: every query is scan → (broadcast dim joins) → one grouped
aggregate; Expand multiplies rows by the grouping-set count BEFORE the
shuffle but partial aggregation still combines map-side, so the shuffle
carries ≤ sets × |groups| rows, not sets × |input|. The distinct-cube
is the one deliberate Expand × Expand plan — its input is pre-projected
to 3 columns so the amplification applies to narrow rows (the same
rationale as q_tpch_q16). Plan assertions: tests/test_plans.py
(Expand present, partial agg present, dims broadcast).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.sources.catalog import register_views
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


def _dec_rev():
    # lineitem net revenue in exact DECIMAL (the tpch.py convention)
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(8,2)))"
)


# ------------------------------------------------------ returns ratio ------
@q(
    "q_ds_returns_ratio",
    f"""
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CASE WHEN l_returnflag = 'R' THEN {_REV_SQL} ELSE 0 END)
                   AS ret_dec,
               SUM({_REV_SQL}) AS tot_dec
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey
    )
    SELECT o_custkey AS c_custkey,
           CAST(ret_dec AS DOUBLE) AS returned_rev,
           CAST(tot_dec AS DOUBLE) AS total_rev,
           ROUND(CAST(ret_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE), 4)
               AS return_ratio
    FROM per_cust
    WHERE tot_dec > 0
      AND CAST(ret_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) >= 0.5
    """,
)
def q_ds_returns_ratio(spark, sf):
    # TPC-DS Q93/Q81 shape: per-customer returned-vs-total revenue, kept
    # where returns dominate (the "problem customers" report). One
    # orders⋈lineitem SMJ on orderkey, one groupBy custkey — both
    # conditional sums ride the same aggregate, so returns cost no
    # second pass. Ratio arithmetic happens on the exact-DECIMAL sums
    # cast to DOUBLE (identical IEEE inputs in both engines).
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem")
    rev = _dec_rev()
    per = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", rev).otherwise(F.lit(0)))
            .alias("ret_dec"),
            F.sum(rev).alias("tot_dec"),
        )
    )
    ratio = F.col("ret_dec").cast("double") / F.col("tot_dec").cast("double")
    return (
        per.filter((F.col("tot_dec") > 0) & (ratio >= 0.5))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("ret_dec").cast("double").alias("returned_rev"),
            F.col("tot_dec").cast("double").alias("total_rev"),
            F.round(ratio, 4).alias("return_ratio"),
        )
    )


# ------------------------------------------------------- channel cube ------
@q(
    "q_ds_channel_cube",
    """
    SELECT c_mktsegment AS channel,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_channel,
           CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, year(o_orderdate))
    """,
)
def q_ds_channel_cube(spark, sf):
    # TPC-DS Q77/Q5 shape: the cross-channel × year report with all
    # margins (CUBE → 4 grouping sets, Expand ×4). GROUPING() flags
    # disambiguate "aggregated away" from a (non-existent) NULL channel.
    # customer broadcasts; the Expand amplifies a 3-column projection of
    # orders, and partial aggregation collapses it map-side to
    # ≤ 4 × |channels × years| rows into the shuffle.
    o = T(spark, sf, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("channel"),
            F.year("o_orderdate").cast("int").alias("yr"),
            "o_totalprice",
        )
        .cube("channel", "yr")
        .agg(
            F.grouping("channel").cast("int").alias("g_channel"),
            F.grouping("yr").cast("int").alias("g_yr"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            "channel", "yr", "g_channel", "g_yr", "n_orders", "revenue"
        )
    )


# ------------------------------------------------- grouping-sets report ----
@q(
    "q_ds_report_grouping_sets",
    """
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_order
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, year(o_orderdate)), (n_name),
                            (year(o_orderdate)), ())
    """,
)
def q_ds_report_grouping_sets(spark, sf):
    # TPC-DS Q27/Q67 shape: the hierarchy report — detail cells, each
    # one-dimension margin, and the grand total in ONE pass (GROUPING
    # SETS → Expand ×4; four separate aggregates would scan four times).
    # avg_order is derived sum/count of the SAME aggregate outputs, not
    # a separate AVG (float-stable: exact-decimal sum ÷ bigint count in
    # DOUBLE). Dims broadcast; SQL form shared with the oracle verbatim.
    register_views(spark, sf)
    return spark.sql(ORACLE["q_ds_report_grouping_sets"])


# ------------------------------------------------- rollup + share rank -----
@q(
    "q_ds_rollup_share_rank",
    """
    WITH cells AS (
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS INT) + CAST(GROUPING(n_name) AS INT)
                   AS lochierarchy,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(18,2))
                             ELSE 0 END) AS DOUBLE) AS filled_rev,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    )
    SELECT r_name, n_name, lochierarchy,
           ROUND(filled_rev / total_rev, 4) AS fill_share,
           CAST(RANK() OVER (
               PARTITION BY lochierarchy,
                            CASE WHEN g_nation = 1 THEN NULL ELSE r_name END
               ORDER BY filled_rev / total_rev DESC,
                        COALESCE(n_name, '') ASC,
                        COALESCE(r_name, '') ASC
           ) AS INT) AS rank_within_parent
    FROM cells
    """,
)
def q_ds_rollup_share_rank(spark, sf):
    # TPC-DS Q36, the canonical Expand-feeds-Window plan: ROLLUP over the
    # (region, nation) hierarchy, a share-of-revenue ratio per cell, and
    # ASSUMPTION (both engines): total_rev > 0 for every ROLLUP cell — a
    # cell exists only if it has orders, and fixture prices are positive.
    # A zero-total cell would divide by zero, where ANSI Spark errors and
    # DuckDB returns inf; guard with a HAVING total_rev > 0 in both
    # formulations if the data could carry zero/negative prices.
    # RANK WITHIN PARENT — rank nations inside their region, regions
    # inside the grand total — via the spec's lochierarchy =
    # GROUPING(r)+GROUPING(n) trick. Rank order carries COALESCE'd
    # tiebreaks so NULL-ordering defaults (Spark NULLS FIRST vs DuckDB
    # NULLS LAST on ASC) can never split the engines. The window
    # partitions by (level, parent), so its sort is per-parent-sized —
    # never a global sort at scale. SQL form shared with the oracle.
    register_views(spark, sf)
    return spark.sql(ORACLE["q_ds_rollup_share_rank"])


# ------------------------------------------------------- yoy growth --------
@q(
    "q_ds_yoy_growth",
    """
    WITH per AS (
        SELECT o_custkey,
               SUM(CASE WHEN year(o_orderdate) = 1996
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END)
                   AS r96_dec,
               SUM(CASE WHEN year(o_orderdate) = 1997
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END)
                   AS r97_dec
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY o_custkey
    )
    SELECT o_custkey AS c_custkey,
           CAST(r96_dec AS DOUBLE) AS rev_1996,
           CAST(r97_dec AS DOUBLE) AS rev_1997,
           ROUND(CAST(r97_dec AS DOUBLE) / CAST(r96_dec AS DOUBLE), 4)
               AS growth
    FROM per
    WHERE r96_dec > 0
      AND CAST(r97_dec AS DOUBLE) / CAST(r96_dec AS DOUBLE) > 1.5
    """,
)
def q_ds_yoy_growth(spark, sf):
    # TPC-DS Q74 shape: the year-over-year customer pivot. Both years
    # come out of ONE conditional aggregate over a year-pruned scan —
    # never a self-join of two per-year aggregates (which would scan and
    # shuffle twice). At 100 TB with year partitioning the IN-filter is
    # partition pruning, and the single groupBy is the only shuffle.
    o = T(spark, sf, "orders")
    yr = F.year("o_orderdate")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    per = (
        o.filter(yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1996, price).otherwise(F.lit(0))).alias("r96_dec"),
            F.sum(F.when(yr == 1997, price).otherwise(F.lit(0))).alias("r97_dec"),
        )
    )
    growth = F.col("r97_dec").cast("double") / F.col("r96_dec").cast("double")
    return (
        per.filter((F.col("r96_dec") > 0) & (growth > 1.5))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("r96_dec").cast("double").alias("rev_1996"),
            F.col("r97_dec").cast("double").alias("rev_1997"),
            F.round(growth, 4).alias("growth"),
        )
    )


# ----------------------------------------------------- cross-channel -------
@q(
    "q_ds_cross_channel",
    """
    SELECT o_custkey AS c_custkey,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_channels
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) = 5
    """,
)
def q_ds_cross_channel(spark, sf):
    # TPC-DS Q38/Q87 shape: customers active in EVERY channel (all 5
    # order priorities). The spec writes it as a 3-way INTERSECT; the
    # scale-correct plan is one distinct-count per customer — a single
    # grouped aggregate instead of N channel scans + N-way set ops
    # (Spark rewrites INTERSECT to joins; this form shuffles narrow
    # (custkey, prio) pairs once).
    o = T(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    return (
        o.groupBy("o_custkey")
        .agg(F.count_distinct("o_orderpriority").alias("n_channels"))
        .filter(F.col("n_channels") == 5)
        .select(F.col("o_custkey").alias("c_custkey"), "n_channels")
    )


# ------------------------------------------------------ distinct cube ------
@q(
    "q_ds_distinct_cube",
    """
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
)
def q_ds_distinct_cube(spark, sf):
    # TPC-DS Q14-flavor: distinct-customer counts under CUBE — the
    # Expand × distinct-rewrite interplay (grouping-set Expand ×4, then
    # the count-distinct rewrite's second Expand). Input pre-projected
    # to 3 narrow columns so both amplifications apply to minimal rows;
    # at 100 TB this is the query you'd demote to the KMV/HLL sketch
    # per cell (q_agg_approx_distinct pattern) — this exact form is the
    # oracle-checkable baseline.
    o = T(spark, sf, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("yr"),
        "o_custkey",
    )
    return (
        o.cube("o_orderstatus", "yr")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("yr").cast("int").alias("g_yr"),
            F.count_distinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("o_orderstatus", "yr", "g_status", "g_yr", "n_cust", "n_orders")
    )


# ----------------------------------------- multi-supplier clean orders -----
@q(
    "q_ds_multi_supplier_clean",
    f"""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret,
               SUM({_REV_SQL}) AS rev_dec
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(rev_dec) AS DOUBLE) AS total_rev
    FROM per_order
    WHERE n_supp >= 2 AND n_ret = 0
    """,
)
def q_ds_multi_supplier_clean(spark, sf):
    # TPC-DS Q94 shape: orders fulfilled from ≥2 "warehouses" (distinct
    # suppliers) with NO returned line — the spec's EXISTS(other
    # warehouse) + NOT EXISTS(return) pair collapsed into one grouped
    # aggregate per order: the semi and anti conditions become HAVING
    # predicates on the same pass, so lineitem is scanned and shuffled
    # once instead of three times (the planner cannot fuse correlated
    # EXISTS pairs this way itself — q_tpch_q21 documents the same
    # decorrelation).
    li = T(spark, sf, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_ret"),
        F.sum(_dec_rev()).alias("rev_dec"),
    )
    return (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 0))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev_dec").cast("double").alias("total_rev"),
        )
    )


# ------------------------------------------------ returns above average ----
@q(
    "q_ds_returns_above_avg",
    f"""
    WITH ret AS (
        SELECT c_mktsegment AS channel, o_custkey,
               SUM({_REV_SQL}) AS ret_dec
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY c_mktsegment, o_custkey
    ),
    avgs AS (
        SELECT channel,
               CAST(SUM(ret_dec) AS DOUBLE) / COUNT(*) AS channel_avg
        FROM ret GROUP BY channel
    )
    SELECT r.channel, r.o_custkey AS c_custkey,
           CAST(r.ret_dec AS DOUBLE) AS ret_rev,
           ROUND(a.channel_avg, 4) AS channel_avg
    FROM ret r JOIN avgs a ON r.channel = a.channel
    WHERE CAST(r.ret_dec AS DOUBLE) > 1.2 * a.channel_avg
    """,
)
def q_ds_returns_above_avg(spark, sf):
    # TPC-DS Q1 shape: customers whose channel returns exceed 1.2× their
    # channel's average — the spec's correlated subquery ("more than 20%
    # above the store average") DECORRELATED by hand into aggregate →
    # re-aggregate → broadcast-join-back: the per-channel average table
    # is |channels| rows, so the probe side never shuffles twice and the
    # correlation never becomes a per-row subquery. Returned revenue is
    # derived from l_returnflag (the fixture's stand-in for the separate
    # store_returns fact). Average computed as exact-DECIMAL sum ÷ count
    # in DOUBLE — both engines bit-identical, so the 1.2× boundary
    # cannot drift.
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    c = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    ret = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("channel"), "o_custkey")
        .agg(F.sum(_dec_rev()).alias("ret_dec"))
    )
    avgs = ret.groupBy("channel").agg(
        (F.sum("ret_dec").cast("double") / F.count(F.lit(1))).alias("channel_avg")
    )
    return (
        ret.join(F.broadcast(avgs), "channel")
        .filter(F.col("ret_dec").cast("double") > F.lit(1.2) * F.col("channel_avg"))
        .select(
            "channel",
            F.col("o_custkey").alias("c_custkey"),
            F.col("ret_dec").cast("double").alias("ret_rev"),
            F.round("channel_avg", 4).alias("channel_avg"),
        )
    )


# ------------------------------------------------- channel migration -------
@q(
    "q_ds_channel_migration",
    """
    WITH per AS (
        SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
               o_orderpriority AS channel, COUNT(*) AS n
        FROM orders
        WHERE year(o_orderdate) IN (1996, 1997)
        GROUP BY o_custkey, year(o_orderdate), o_orderpriority
    ),
    dom AS (
        SELECT o_custkey, yr, channel FROM (
            SELECT o_custkey, yr, channel,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, yr
                                      ORDER BY n DESC, channel ASC) AS rn
            FROM per) WHERE rn = 1
    )
    SELECT a.o_custkey AS c_custkey,
           a.channel AS channel_1996, b.channel AS channel_1997
    FROM dom a JOIN dom b
      ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
    WHERE a.channel <> b.channel
    """,
)
def q_ds_channel_migration(spark, sf):
    # dominant-channel migration: each customer's modal order priority
    # per year (deterministic tie-break: highest count, then channel
    # name), reported where 1996's mode differs from 1997's — the
    # channel-shift report behind TPC-DS's cross-channel behavior
    # queries. One narrow (cust, yr, channel) count aggregate feeds a
    # per-(cust, yr) top-1 window (WindowGroupLimit — rank short-
    # circuits in-partition); the year-on-year compare is a self-join
    # of the mode table on custkey, which is |customers|-sized, not
    # fact-sized — the fact is touched once.
    o = T(spark, sf, "orders")
    yr = F.year("o_orderdate").cast("int")
    per = (
        o.filter(yr.isin(1996, 1997))
        .groupBy("o_custkey", yr.alias("yr"), F.col("o_orderpriority").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_custkey", "yr").orderBy(
        F.col("n").desc(), F.col("channel").asc()
    )
    dom = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "yr", "channel")
    )
    a = dom.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("channel").alias("channel_1996")
    )
    b = dom.filter(F.col("yr") == 1997).select(
        "o_custkey", F.col("channel").alias("channel_1997")
    )
    return (
        a.join(b, "o_custkey")
        .filter(F.col("channel_1996") != F.col("channel_1997"))
        .select(
            F.col("o_custkey").alias("c_custkey"), "channel_1996", "channel_1997"
        )
    )


# ------------------------------------------------ cumulative crossover -----
@q(
    "q_ds_cumulative_crossover",
    """
    WITH daily AS (
        SELECT c_mktsegment AS seg,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY c_mktsegment, year(o_orderdate), CAST(o_orderdate AS DATE)
    ),
    cum AS (
        SELECT seg, yr, d,
               SUM(rev) OVER (PARTITION BY seg, yr ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_rev
        FROM daily
    ),
    al AS (
        SELECT COALESCE(a.yr, b.yr) AS yr, COALESCE(a.d, b.d) AS d,
               a.cum_rev AS ca, b.cum_rev AS cb
        FROM (SELECT * FROM cum WHERE seg = 'BUILDING') a
        FULL OUTER JOIN (SELECT * FROM cum WHERE seg = 'MACHINERY') b
          ON a.yr = b.yr AND a.d = b.d
    ),
    filled AS (
        SELECT yr, d,
               COALESCE(LAST_VALUE(ca IGNORE NULLS) OVER (
                   PARTITION BY yr ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS cum_building,
               COALESCE(LAST_VALUE(cb IGNORE NULLS) OVER (
                   PARTITION BY yr ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS cum_machinery
        FROM al
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           ROUND(CAST(cum_building AS DOUBLE), 2) AS cum_building,
           ROUND(CAST(cum_machinery AS DOUBLE), 2) AS cum_machinery
    FROM filled
    WHERE cum_building > cum_machinery
    """,
)
def q_ds_cumulative_crossover(spark, sf):
    # TPC-DS Q51 shape: two channels' CUMULATIVE revenue series aligned
    # day-by-day, reporting the days one channel's running total leads
    # the other — the overtake/crossover report. The load-bearing plan
    # pieces: per-channel running sums (window, partitioned by
    # (channel, year) so no global single-partition sort — the
    # within-year reset is the scale adaptation of Q51's per-item
    # partitioning), a FULL OUTER alignment on the day spine (each
    # channel has sales-days the other lacks), and ignore-nulls
    # LAST_VALUE gap fill so a missing day carries the prior cumulative
    # forward. All sums stay exact DECIMAL until the final output cast,
    # so the > comparison cannot drift between engines.
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    wcum = (
        Window.partitionBy("seg", "yr")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.withColumn("cum_rev", F.sum("rev").over(wcum))
    a = cum.filter(F.col("seg") == "BUILDING").select(
        "yr", "d", F.col("cum_rev").alias("ca")
    )
    b = cum.filter(F.col("seg") == "MACHINERY").select(
        F.col("yr").alias("yr_b"), F.col("d").alias("d_b"),
        F.col("cum_rev").alias("cb"),
    )
    al = a.join(
        b, (a.yr == b.yr_b) & (a.d == b.d_b), "full_outer"
    ).select(
        F.coalesce("yr", "yr_b").alias("yr"),
        F.coalesce("d", "d_b").alias("d"),
        "ca",
        "cb",
    )
    wfill = (
        Window.partitionBy("yr")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = al.select(
        "yr",
        "d",
        F.coalesce(
            F.last("ca", ignorenulls=True).over(wfill), F.lit(0).cast("decimal(28,2)")
        ).alias("cum_building"),
        F.coalesce(
            F.last("cb", ignorenulls=True).over(wfill), F.lit(0).cast("decimal(28,2)")
        ).alias("cum_machinery"),
    )
    return (
        filled.filter(F.col("cum_building") > F.col("cum_machinery"))
        .select(
            # ROUND-wrapped: the running sums are wide decimals, and
            # unrounded doubles from >18-digit decimals hit DuckDB's
            # double-rounding conversion (queries/__init__ rules); the
            # crossover COMPARISON stays on exact decimals above
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(F.col("cum_building").cast("double"), 2).alias("cum_building"),
            F.round(F.col("cum_machinery").cast("double"), 2).alias("cum_machinery"),
        )
    )


# ----------------------------------------------- Q88: time-band report ----
@q(
    "q_ds_timeband_counts",
    """
    WITH e AS (SELECT CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                   AS h
               FROM events WHERE event_type <> 'error')
    SELECT CAST(SUM(CASE WHEN h BETWEEN 0  AND 2  THEN 1 ELSE 0 END) AS BIGINT) AS h0_2,
           CAST(SUM(CASE WHEN h BETWEEN 3  AND 5  THEN 1 ELSE 0 END) AS BIGINT) AS h3_5,
           CAST(SUM(CASE WHEN h BETWEEN 6  AND 8  THEN 1 ELSE 0 END) AS BIGINT) AS h6_8,
           CAST(SUM(CASE WHEN h BETWEEN 9  AND 11 THEN 1 ELSE 0 END) AS BIGINT) AS h9_11,
           CAST(SUM(CASE WHEN h BETWEEN 12 AND 14 THEN 1 ELSE 0 END) AS BIGINT) AS h12_14,
           CAST(SUM(CASE WHEN h BETWEEN 15 AND 17 THEN 1 ELSE 0 END) AS BIGINT) AS h15_17,
           CAST(SUM(CASE WHEN h BETWEEN 18 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS h18_20,
           CAST(SUM(CASE WHEN h BETWEEN 21 AND 23 THEN 1 ELSE 0 END) AS BIGINT) AS h21_23
    FROM e
    """,
)
def q_ds_timeband_counts(spark, sf):
    # TPC-DS Q88 shape: the spec writes EIGHT separate filtered-count
    # subqueries cross-joined into one row; the engine fuses them into
    # ONE conditional aggregate over ONE scan — the canonical
    # multi-band report rewrite (same fusion discipline as
    # q_ds_yoy_growth's join-free pivot). Eight counts, zero joins.
    #
    # Scale: single map-combined aggregate; the shuffle carries 8
    # integers per map partition. The filter prunes before the scan
    # (PushedFilters on event_type).
    e = T(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    h = F.hour("ts")
    bands = [(0, 2), (3, 5), (6, 8), (9, 11), (12, 14), (15, 17), (18, 20), (21, 23)]
    return e.filter(F.col("event_type") != "error").agg(
        *[
            F.sum(F.when(h.between(lo, hi), 1).otherwise(0))
            .cast("bigint")
            .alias(f"h{lo}_{hi}")
            for lo, hi in bands
        ]
    )


# ------------------------------------- Q34/Q73: basket-size distribution ---
@q(
    "q_ds_basket_buckets",
    """
    WITH per_order AS (SELECT l_orderkey AS ok, COUNT(*) AS n_items
                       FROM lineitem GROUP BY l_orderkey),
    b AS (SELECT o.o_orderpriority,
                 CASE WHEN p.n_items <= 3 THEN '1-3'
                      WHEN p.n_items <= 6 THEN '4-6'
                      ELSE '7+' END AS bucket
          FROM per_order p JOIN orders o ON p.ok = o.o_orderkey)
    SELECT o_orderpriority, bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY o_orderpriority, bucket
    ORDER BY o_orderpriority, bucket
    """,
)
def q_ds_basket_buckets(spark, sf):
    # TPC-DS Q34/Q73 shape: order-size distribution per sales attribute
    # (basket buckets 1-3 / 4-6 / 7+ per order priority). The per-order
    # item census is the only fact-sized aggregate; the join back to
    # orders is keyed on o_orderkey — the natural co-partitioning key —
    # and the final (priority, bucket) aggregate is 15 rows.
    #
    # Scale: lineitem shuffles once on orderkey (map-combined count);
    # the join with orders is orderkey-to-orderkey, so with bucketed or
    # AQE-partitioned storage neither side re-shuffles more than once,
    # and skew is impossible (one row per orderkey on the build side).
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_items")
    )
    bucket = (
        F.when(F.col("n_items") <= 3, "1-3")
        .when(F.col("n_items") <= 6, "4-6")
        .otherwise("7+")
    )
    return (
        per_order.join(o, per_order.ok == o.o_orderkey)
        .select("o_orderpriority", bucket.alias("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority", "bucket")
    )


# --------------------------------------------- Q90: time-of-day ratio -----
@q(
    "q_ds_hour_ratio",
    """
    WITH e AS (SELECT event_type,
                      CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                          AS h
               FROM events),
    a AS (SELECT event_type,
                 CAST(SUM(CASE WHEN h BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
                      AS BIGINT) AS am_cnt,
                 CAST(SUM(CASE WHEN h BETWEEN 18 AND 23 THEN 1 ELSE 0 END)
                      AS BIGINT) AS pm_cnt
          FROM e GROUP BY event_type)
    SELECT event_type, am_cnt, pm_cnt,
           ROUND(CAST(am_cnt AS DOUBLE) / CAST(NULLIF(pm_cnt, 0) AS DOUBLE), 4)
               AS am_pm_ratio
    FROM a ORDER BY event_type
    """,
)
def q_ds_hour_ratio(spark, sf):
    # TPC-DS Q90 shape: morning/evening activity ratio per type — the
    # spec's two filtered scalar subqueries fused into one conditional
    # aggregate (as in q_ds_timeband_counts), with the division NULL-
    # guarded identically on both engines (NULLIF, not a CASE, so the
    # NULL propagates through ROUND the same way).
    #
    # Scale: one map-combined groupBy to |event_type| rows; nothing else.
    e = T(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    h = F.hour("ts")
    a = e.groupBy("event_type").agg(
        F.sum(F.when(h.between(6, 11), 1).otherwise(0)).cast("bigint").alias("am_cnt"),
        F.sum(F.when(h.between(18, 23), 1).otherwise(0)).cast("bigint").alias("pm_cnt"),
    )
    return a.select(
        "event_type",
        "am_cnt",
        "pm_cnt",
        F.round(
            F.col("am_cnt").cast("double")
            / F.nullif(F.col("pm_cnt"), F.lit(0)).cast("double"),
            4,
        ).alias("am_pm_ratio"),
    ).orderBy("event_type")
