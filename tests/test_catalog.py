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
