"""Catalog + timestamp-precision semantics (SURVEY §2.3 hard-parts list)."""

from __future__ import annotations

import duckdb

from mongo_to_parquet_spark.sources.catalog import TABLES, load_table, register_views


def test_all_tables_load(spark, sf_dir):
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        assert df.count() > 0, t


def test_events_ns_truncation_matches_duckdb(spark, sf_dir):
    """Spark's ns→µs floor (nanosAsLong + div 1000) must be bit-identical to
    DuckDB's CAST(ts AS TIMESTAMP) — this is what makes every ts-bearing
    oracle comparison sound."""
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_id"]: r["ts"]
        for r in ev.select("event_id", "ts").orderBy("event_id").limit(50).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id LIMIT 50"
        ).fetchall()
    )
    assert got == want


def test_register_views_sql_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT COUNT(*) AS c FROM lineitem").collect()[0]["c"]
    assert n > 0
    j = spark.sql(
        "SELECT COUNT(*) AS c FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).collect()[0]["c"]
    assert j == 25


def test_sql_surface_matches_dataframe_api(spark, sf_dir):
    """register_views + spark.sql is a first-class entry point: ANSI SQL
    over the temp views returns exactly what the DataFrame API builds
    (same Catalyst pipeline, entered at the parser — SURVEY §3.4)."""
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.sources.catalog import load_table, register_views

    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus
        """
    )
    api = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))

    joined = spark.sql(
        "SELECT n_name, COUNT(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )
    assert joined.count() > 0
