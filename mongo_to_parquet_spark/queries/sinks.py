"""Sink queries — the reference's export semantics end-to-end (SURVEY §2.3).

``q_sink_partitioned`` runs the real partitioned write (R4+R5: year/month/
day derivation, ``year=`` hive layout, ``year=unknown`` bucket, zstd) into
a scratch dir, re-reads the output, and returns per-partition counts. The
returned DataFrame is oracle-checked — the side effect itself is verified
by reading back what was written.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mongo_to_parquet_spark.functions.layout import zorder_oracle_expr, zorder_value
from mongo_to_parquet_spark.sources.catalog import load_table as T
from mongo_to_parquet_spark.sources.export import export_partitioned

QUERIES = {}
ORACLE = {}


def q(key, sql=None):
    def deco(fn):
        QUERIES[key] = fn
        if sql is not None:
            ORACLE[key] = sql
        return fn
    return deco


@q(
    "q_sink_partitioned",
    """
    SELECT CAST(year(o_orderdate) AS VARCHAR) AS year,
           COUNT(*) AS cnt,
           COUNT(DISTINCT month(o_orderdate)) AS n_months
    FROM orders GROUP BY 1
    """,
)
def q_sink_partitioned(spark, sf):
    scratch = os.path.join(os.path.dirname(__file__), "..", "..", "_scratch")
    out = os.path.abspath(
        os.path.join(scratch, "sink_partitioned", os.path.basename(sf.rstrip("/")))
    )
    export_partitioned(T(spark, sf, "orders"), out, date_field="o_orderdate")
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("year").cast("string").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("month").alias("n_months"),
        )
    )


@q(
    "q_sink_formats",
    """
    SELECT fmt,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
    FROM (SELECT 'csv' AS fmt, o_totalprice, o_orderdate FROM orders
          UNION ALL SELECT 'json', o_totalprice, o_orderdate FROM orders
          UNION ALL SELECT 'orc', o_totalprice, o_orderdate FROM orders
          UNION ALL SELECT 'parquet', o_totalprice, o_orderdate FROM orders)
    GROUP BY fmt
    """,
)
def q_sink_formats(spark, sf):
    # multi-format sink/source round-trip: write orders to csv/json/orc/
    # parquet, read each back (text formats under the ORIGINAL schema — the
    # reader must not re-infer), and aggregate. Hash-matching the source
    # table proves every format preserves doubles (Java shortest-repr
    # round-trip) and ms timestamps end-to-end. Decimal-cast before SUM so
    # the result is addition-order-free.
    scratch = os.path.join(os.path.dirname(__file__), "..", "..", "_scratch")
    outroot = os.path.abspath(
        os.path.join(scratch, "sink_formats", os.path.basename(sf.rstrip("/")))
    )
    o = T(spark, sf, "orders")
    parts = None
    for fmt in ("csv", "json", "orc", "parquet"):
        path = os.path.join(outroot, fmt)
        w = o.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        r = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            r = r.schema(o.schema)
        if fmt == "csv":
            r = r.option("header", "true")
        back = r.load(path).select(
            F.lit(fmt).alias("fmt"), "o_totalprice", "o_orderdate"
        )
        parts = back if parts is None else parts.unionByName(back)
    return parts.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
    )


_Z = zorder_oracle_expr("a", "b", 8)


@q(
    "q_cluster_zorder",
    f"""
    WITH d AS (
        SELECT o_orderkey,
               o_custkey % 256 AS a,
               COALESCE(dayofyear(o_orderdate), 0) % 256 AS b
        FROM orders
    ), z AS (SELECT o_orderkey, a, b, {_Z} AS zval FROM d)
    SELECT zval // 256 AS z_bucket,
           COUNT(*) AS cnt,
           MIN(a) AS min_cust, MAX(a) AS max_cust,
           MIN(b) AS min_doy, MAX(b) AS max_doy
    FROM z GROUP BY 1
    """,
)
def q_cluster_zorder(spark, sf):
    # the z-order layout key (functions/layout.py) as a checkable query:
    # Morton-interleave (customer-bucket, day-of-year) and aggregate per
    # z-bucket (top 4 bits of each dimension). Each bucket's min/max spans
    # a <=16-wide rectangle in BOTH dimensions - the footer-stats locality
    # that export_zordered turns into two-dimensional file pruning at
    # 100 TB. Pure codegen'd integer bit math; nulls route to b=0 exactly
    # like the reference's unknown-date bucket (main.py:110).
    o = T(spark, sf, "orders")
    a = (F.col("o_custkey") % 256).cast("long")
    b = (F.coalesce(F.dayofyear("o_orderdate"), F.lit(0)) % 256).cast("long")
    return (
        o.select(
            a.alias("a"),
            b.alias("b"),
            zorder_value(a, b, 8).alias("zval"),
        )
        .select(F.expr("zval div 256").alias("z_bucket"), "a", "b")
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("a").alias("min_cust"),
            F.max("a").alias("max_cust"),
            F.min("b").alias("min_doy"),
            F.max("b").alias("max_doy"),
        )
    )
