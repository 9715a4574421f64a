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


def test_compact_dataset_reduces_file_count(spark, sf_dir, tmp_path):
    """Compaction: a deliberately fragmented write (50 shuffle files) is
    rewritten to ceil(rows/target) files with identical content."""
    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import compact_dataset

    o = load_table(spark, sf_dir, "orders")
    frag = str(tmp_path / "frag")
    o.repartition(50).write.parquet(frag)
    out = str(tmp_path / "compact")
    stats = compact_dataset(spark, frag, out, target_rows_per_file=10_000,
                            partition_col=None)
    assert stats["files_before"] == 50
    assert stats["files_after"] == max(1, -(-stats["rows"] // 10_000))
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, o.collect()))


def test_export_sorted_footer_ranges_disjoint(spark, sf_dir, tmp_path):
    """Range-clustered export: per-file parquet footer min/max of the sort
    column must be pairwise disjoint — the property that makes min-max file
    pruning possible for range predicates."""
    import glob

    import pyarrow.parquet as pq

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import export_sorted

    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "sorted")
    export_sorted(li, out, ["l_shipdate"], n_files=8)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4  # repartitionByRange actually split the data
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_export_zordered_two_dimensional_narrowness(spark, sf_dir, tmp_path):
    """Z-order-clustered export: per-file footer min/max rectangles must be
    substantially narrower than the full domain in BOTH interleaved
    dimensions — the property that lets min-max stats prune files for
    predicates on either column (single-column sort gives this for one
    dimension only)."""
    import glob

    import pyarrow.parquet as pq

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import export_zordered

    o = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey",
            "cast(o_custkey % 256 as long) as ca",
            "cast(coalesce(dayofyear(o_orderdate), 0) % 256 as long) as db",
        )
    )
    out = str(tmp_path / "zorder")
    export_zordered(o, out, "ca", "db", bits=8, n_files=16)

    back = spark.read.parquet(out)
    assert back.count() == o.count()

    def spans(col):
        widths = []
        for f in glob.glob(out + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min); maxs.append(st.max)
            widths.append(max(maxs) - min(mins) + 1)
        return widths

    ca_w, db_w = spans("ca"), spans("db")
    assert len(ca_w) >= 8
    # average per-file span must cover well under the full 256-wide domain
    # in BOTH dimensions; an unsorted or single-column layout leaves the
    # other dimension near 256 in every file.
    assert sum(ca_w) / len(ca_w) < 160, ca_w
    assert sum(db_w) / len(db_w) < 160, db_w
