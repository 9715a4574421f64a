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
