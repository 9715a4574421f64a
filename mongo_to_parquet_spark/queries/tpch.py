"""Adapted TPC-H pack — the recognizable OLAP yardstick, on the fixture
star schema.

The fixtures are TPC-H-shaped but trimmed (no partsupp; no
commit/receipt dates, shipmode, phone, comment columns), so these are
the classic queries ADAPTED to the available columns — each keeps its
original join/aggregation shape and selectivity character, which is what
exercises the planner. Together with q_agg_groupby (Q1), q_sql_surface
(Q3) and q_agg_custdist (Q13) declared elsewhere, all 22 TPC-H query
shapes are covered: the five partsupp-dependent ones (Q2/Q9/Q11/Q16/Q20)
run against a part↔supplier relation derived from lineitem history (see
the derived-catalog section below), preserving each query's correlation
/ threshold / semi-join structure.

Determinism: all money aggregates run in DECIMAL and cast to DOUBLE at
the end (exact rational → bit-identical doubles in both engines — the
q_join_multiway convention); every LIMIT carries a total order with a
key tiebreak; Q22's threshold is exact-sum/count, not a float AVG, so
the boundary comparison cannot drift between engines.

Scale notes: dims broadcast, facts sort-merge on their keys (hinted
where the test-scale optimizer would otherwise broadcast a fact), and
every aggregation partial-combines map-side — same posture as the
relational core (SCALE.md §Joins/§Aggregations).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.queries._registry import make_registry

QUERIES, ORACLE, q = make_registry()


_REV_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(8,2))))"
)


def _rev():
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,2)"))
    )


@q(
    "q_tpch_q5",
    f"""
    SELECT n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf):
    # Q5 (local supplier volume): the c_nationkey = s_nationkey residual
    # makes the supplier join a join-with-filter — revenue only where the
    # customer and supplier share a nation inside the chosen region.
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    return (
        c.hint("merge")
        .join(
            o.hint("merge").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            c.c_custkey == o.o_custkey,
        )
        .join(li.hint("merge"), o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev().cast("double").alias("revenue"))
    )


@q(
    "q_tpch_q6",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf):
    # Q6 (forecast revenue change): pure scan-filter-aggregate — every
    # predicate pushes to parquet, no joins, no shuffle beyond the 1-row
    # final combine. The discount literals hit the fixture's 2-dec grid
    # exactly in both engines (same nearest-double).
    li = T(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(8,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "q_tpch_q10",
    f"""
    SELECT c_custkey, c_name, n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf):
    # Q10 (returned-item reporting): who returned the most revenue last
    # quarter. Group-by customer then global top-20 — the ORDER BY runs
    # on the decimal-exact revenue so both engines rank identically.
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    n = T(spark, sf, "nation")
    return (
        c.hint("merge")
        .join(
            o.hint("merge").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
            ),
            c.c_custkey == o.o_custkey,
        )
        .join(
            li.hint("merge").filter(F.col("l_returnflag") == "R"),
            o.o_orderkey == li.l_orderkey,
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@q(
    "q_tpch_q14",
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(8,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST({_REV_SQL} AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14(spark, sf):
    # Q14 (promotion effect): conditional share of revenue. Numerator and
    # denominator are each exact decimals → the double division is
    # bit-identical; ROUND(4) is cosmetic.
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@q(
    "q_tpch_q18",
    """
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q18(spark, sf):
    # Q18 (large-volume customers): aggregate-then-semi-join shape — the
    # HAVING subquery reduces lineitem to qualifying orderkeys first, so
    # the customer join only sees the (few) big orders. Quantities are
    # small integers stored as doubles: their double sum is exact, so the
    # >150 cut is engine-stable.
    li, o, c = T(spark, sf, "lineitem"), T(spark, sf, "orders"), T(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o.hint("merge"), big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@q(
    "q_tpch_q19",
    f"""
    SELECT CAST({_REV_SQL} AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark, sf):
    # Q19 (discounted revenue, disjunctive predicates): the OR-of-ANDs
    # spans both sides of the join, so it can only be applied post-join —
    # the planner's job is pushing the per-side residuals (brand IN (...),
    # quantity range) down anyway. Broadcast part keeps it one pass.
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        _rev().cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@q(
    "q_tpch_q22",
    """
    WITH thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey AS INT) AS nat,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, thr
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark, sf):
    # Q22 (global sales opportunity): rich customers with no urgent
    # order, by nation (the fixture has no phone column — nationkey
    # stands in for the country code; every fixture customer HAS orders,
    # so the anti-join conditions on urgent ones to stay selective). The
    # threshold is exact-decimal-sum / count, NOT a float AVG: both
    # engines derive the identical double, so the c_acctbal > a boundary
    # cannot drift — the float-avg version is the canonical cross-engine
    # flake.
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("int").alias("nat"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@q(
    "q_tpch_q12",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE l_shipdate > o_orderdate
                                       + INTERVAL 90 DAY) AS BIGINT) AS late_lines,
           CAST(COUNT(*) FILTER (WHERE l_shipdate <= o_orderdate
                                       + INTERVAL 90 DAY) AS BIGINT) AS ontime_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q12(spark, sf):
    # Q12 (shipping-priority audit, adapted: no shipmode/commit columns —
    # "late" = shipped more than 90 days after ordering): the predicate
    # spans BOTH join sides (interval arithmetic on order date vs ship
    # date), so it evaluates post-join as FILTER'd conditional counts.
    # Timestamp + interval is exact integer µs math in both engines.
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    return (
        o.hint("merge")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(li.hint("merge"), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(late, 1)).alias("late_lines"),
            F.count(F.when(~late, 1)).alias("ontime_lines"),
        )
    )


@q(
    "q_tpch_q15",
    f"""
    WITH revenue AS (
        SELECT l_suppkey, CAST({_REV_SQL} AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark, sf):
    # Q15 (top supplier): a derived revenue view consumed twice — once
    # joined to supplier, once reduced to its MAX as a scalar subquery.
    # The view is tiny post-aggregation (one row per supplier), so the
    # second consumption is a broadcast of one scalar; revenue is
    # decimal-exact so "equals the max" cannot straddle engines.
    li, s = T(spark, sf, "lineitem"), T(spark, sf, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(_rev().cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "q_tpch_q17",
    """
    WITH pa AS (
        SELECT l_partkey AS pk, 0.2 * (SUM(l_quantity) / COUNT(*)) AS lim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < lim
    """,
)
def q_tpch_q17(spark, sf):
    # Q17 (small-quantity-order revenue): the classic correlated
    # aggregate — each lineitem compares against ITS part's average
    # quantity — decorrelated by hand into a per-part aggregate joined
    # back (exactly what Catalyst's DecorrelateInnerQuery would emit).
    # The per-part limit is sum/count of small integers: exact in double,
    # one division, same literal 0.2 → boundary-stable across engines.
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    pa = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))).alias("lim"))
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#23")),
                li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
             / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_LATE_SQL = "l_shipdate > o_orderdate + INTERVAL 90 DAY"


@q(
    "q_tpch_q4",
    f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND {_LATE_SQL})
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf):
    # Q4 (order-priority checking, adapted: "late" = shipped >90 days
    # after ordering): correlated EXISTS whose predicate references the
    # OUTER row's date — as a DataFrame this is a left-semi join whose
    # condition mixes the equi key with the cross-side inequality; the
    # equi part keeps it hash-partitionable.
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    cond = (filtered.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > filtered.o_orderdate + F.expr("INTERVAL 90 DAY")
    )
    return (
        filtered.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@q(
    "q_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, yr, CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(8,2))) AS vol
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
           OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9')
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q_tpch_q7(spark, sf):
    # Q7 (volume shipping between two nations): the OR-of-nation-pairs
    # predicate spans two different join branches (supplier's nation vs
    # customer's nation), so each branch pre-filters to the two nations
    # (pushdown) and the pair constraint applies post-join.
    li, o, c = T(spark, sf, "lineitem"), T(spark, sf, "orders"), T(spark, sf, "customer")
    s, n = T(spark, sf, "supplier"), T(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_11"))
        | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_9"))
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        s.join(li.hint("merge"), s.s_suppkey == li.l_suppkey)
        .join(o.hint("merge"), o.o_orderkey == li.l_orderkey)
        .join(c.hint("merge"), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


@q(
    "q_tpch_q8",
    f"""
    SELECT yr,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN vol
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 4) AS mkt_share
    FROM (
        SELECT n1.n_name AS supp_nation,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(8,2))) AS vol
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    GROUP BY yr
    """,
)
def q_tpch_q8(spark, sf):
    # Q8 (national market share): one nation's slice of a region's
    # revenue per year — conditional numerator over common denominator,
    # both exact decimals so the share divides bit-identically.
    li, o, c = T(spark, sf, "lineitem"), T(spark, sf, "orders"), T(spark, sf, "customer")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("rk2"))
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        s.join(li.hint("merge"), s.s_suppkey == li.l_suppkey)
        .join(o.hint("merge"), o.o_orderkey == li.l_orderkey)
        .join(c.hint("merge"), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("rk2") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@q(
    "q_tpch_q21",
    f"""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 10
    """,
)
def q_tpch_q21(spark, sf):
    # Q21 (suppliers who kept orders waiting, adapted to ship-lag
    # lateness): the notorious EXISTS + NOT-EXISTS double correlation.
    # The DataFrame side is the DE-correlated formulation — per
    # (order, supplier) compute an is_late flag once, per order count
    # suppliers and late-suppliers, then "only me late in a multi-
    # supplier order" is a plain filter (n_supp > 1 AND n_late = 1 AND
    # me late). One extra aggregation replaces two correlated probes of
    # the fact table — at 100 TB that is one shuffle instead of two
    # re-scans of lineitem, and it is exactly the rewrite Catalyst's
    # decorrelation cannot produce for the NOT-EXISTS arm (the oracle
    # runs the literal nested form; results must match).
    li, o, s = T(spark, sf, "lineitem"), T(spark, sf, "orders"), T(spark, sf, "supplier")
    of = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    ).cast("int")
    per_os = (
        li.join(of.hint("merge"), li.l_orderkey == of.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late).alias("is_late"),
            # the original counts each LATE LINE of the waiting supplier,
            # not each (order, supplier) pair — carry the line count
            F.sum(late).alias("n_late_lines"),
        )
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    waiting = (
        per_os.filter(F.col("is_late") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------- derived part↔supplier -----
# Q2/Q11/Q16/Q20 need the part↔supplier relation the trimmed schema lacks
# (no partsupp table). Every adaptation below derives it from lineitem
# history — "supplier S offers part P" ⇔ S has shipped P — with the
# MINIMUM observed line price standing in for ps_supplycost: an exact
# DECIMAL min (no division, no averaging) so the correlated-min semantics
# of Q2 stay boundary-stable across engines. The derived relation is
# |distinct (part, supplier)| rows: one fact-sized shuffle to build, then
# dimension-sized for everything downstream — the same cost profile the
# real partsupp scan would have.

_PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _ps(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ps_cost"))


@q(
    "q_tpch_q2",
    f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
        SELECT ps_partkey, ps_suppkey, ps_cost, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    mn AS (SELECT ps_partkey AS mk, MIN(ps_cost) AS min_cost
           FROM eu GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(ps_cost AS DOUBLE) AS supply_cost
    FROM eu
    JOIN part ON p_partkey = ps_partkey
    JOIN mn   ON mk = ps_partkey AND ps_cost = min_cost
    WHERE p_size IN (5, 10, 15) AND p_type LIKE 'S%'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf):
    # Q2 (minimum-cost supplier, adapted): the classic correlated-min —
    # each (part, supplier) offer survives only if it matches the MIN
    # cost among that part's EUROPE offers — decorrelated into a per-part
    # min aggregate joined back (the DecorrelateInnerQuery rewrite, by
    # hand). The region-filtered offer relation `eu` feeds both the min
    # aggregate and the final probe; AQE ReuseExchange dedupes the
    # shared subtree at runtime, so no persist (the q_graph_triangles
    # measurement). Dims broadcast; the only fact-sized shuffle is the
    # derived-catalog groupBy. LIMIT carries a total order (s_name is
    # unique per supplier, p_partkey breaks multi-part ties).
    s, n, r, p = (
        T(spark, sf, "supplier"), T(spark, sf, "nation"),
        T(spark, sf, "region"), T(spark, sf, "part"),
    )
    eu = (
        _ps(spark, sf)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("ps_partkey", "ps_suppkey", "ps_cost", "s_acctbal", "s_name", "n_name")
    )
    mn = eu.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_cost").alias("min_cost")
    )
    pf = p.filter(F.col("p_size").isin(5, 10, 15) & F.col("p_type").like("S%"))
    return (
        eu.join(F.broadcast(pf), eu.ps_partkey == pf.p_partkey)
        .join(
            mn,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@q(
    "q_tpch_q9",
    """
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def q_tpch_q9(spark, sf):
    # Q9 (product-type profit, adapted): ps_supplycost is replaced by the
    # part's retail price (the one per-part cost column the schema has),
    # so profit = revenue − retail·qty per line. All arithmetic stays in
    # DECIMAL until the final cast — the sum is an exact rational, so
    # both engines round identically. Plan: part (name-filtered) and the
    # dims broadcast into the lineitem scan, orders sort-merges on the
    # orderkey, and the (nation, year) aggregate partial-combines
    # map-side — the fact is shuffled once for the join and once, already
    # collapsed to |nations|×|years| partials, for the final agg.
    li, s, p = T(spark, sf, "lineitem"), T(spark, sf, "supplier"), T(spark, sf, "part")
    o, n = T(spark, sf, "orders"), T(spark, sf, "nation")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,2)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_name").like("%red%"))),
                li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@q(
    "q_tpch_q11",
    """
    WITH nat AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_8'
    ),
    v AS (
        SELECT l_partkey AS ps_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem JOIN nat ON l_suppkey = s_suppkey
        GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(value) AS t FROM v)
    SELECT ps_partkey, CAST(value AS DOUBLE) AS part_value
    FROM v, tot
    WHERE value * 10000 > t
    """,
)
def q_tpch_q11(spark, sf):
    # Q11 (important stock, adapted): per-part shipped value from one
    # nation's suppliers, kept where the part exceeds 1/10000 of the
    # nation's total. The threshold compare is INTEGER-scaled
    # (value·10000 > total) instead of total·0.0001 — both sides stay
    # exact DECIMAL, so the boundary cannot drift between engines. The
    # total is a 1-row broadcast crossJoin over the per-part aggregate;
    # the per-part relation is computed once and feeds both (AQE reuse).
    li, s, n = T(spark, sf, "lineitem"), T(spark, sf, "supplier"), T(spark, sf, "nation")
    nat = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_8")),
               s.s_nationkey == n.n_nationkey)
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(nat), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    tot = v.agg(F.sum("value").alias("t"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value") * 10000 > F.col("t"))
        .select("ps_partkey", F.col("value").cast("double").alias("part_value"))
    )


@q(
    "q_tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND l_suppkey IS NOT NULL
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf):
    # Q16 (parts/supplier relationship, adapted): how many distinct
    # suppliers ship each surviving (brand, type, size), excluding
    # negative-balance suppliers — the NOT IN becomes a broadcast
    # left-anti join (s_suppkey is non-null, so anti ≡ NOT IN here; a
    # nullable column would need the null-aware form). The exact
    # distinct-count goes through Spark's Expand rewrite; its input is
    # pre-shrunk to the filtered parts only, so the k+1× amplification
    # applies to a sliver of the fact.
    li, p, s = T(spark, sf, "lineitem"), T(spark, sf, "part"), T(spark, sf, "supplier")
    pf = p.filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
    )
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # NULL probe keys: NOT IN with a NON-EMPTY subquery never admits
        # a NULL l_suppkey, but a left-anti join KEEPS it — and with an
        # EMPTY subquery NOT IN flips to keeping everything including
        # NULLs. Rather than depend on the exclusion set's emptiness,
        # BOTH formulations drop NULL probes explicitly (the filter here,
        # `l_suppkey IS NOT NULL` in the oracle) — a no-op today; the
        # fixture has no null foreign keys.
        li.filter(F.col("l_suppkey").isNotNull())
        .join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@q(
    "q_tpch_q20",
    """
    SELECT s_name, n_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 30)
    """,
)
def q_tpch_q20(spark, sf):
    # Q20 (potential part promotion, adapted): suppliers in one region
    # who moved real volume (> 30 units of some 'small%' part in 1996) —
    # the grouped-HAVING subquery feeding an IN becomes an aggregate +
    # left-semi join. The quantity sum is integer-valued doubles (exact),
    # so the HAVING boundary is stable. Part filter broadcasts into the
    # date-pruned lineitem scan; the semi join probes with the tiny
    # qualified-supplier set, which itself broadcasts.
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    qualified = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p.filter(F.col("p_name").like("small%"))),
              li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name", "s_acctbal")
    )
