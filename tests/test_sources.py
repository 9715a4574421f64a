"""Round-2 source/sink additions: the mongoexport extended-JSON Python
DataSource and the observed (in-plan metrics) export."""

from __future__ import annotations

import datetime as dt
import json


EXT_ROWS = [
    {"_id": {"$oid": "65a1"}, "created_at": {"$date": "2020-06-01T12:30:00Z"},
     "n": {"$numberLong": "42"}, "price": {"$numberDouble": "1.5"},
     "name": "alpha", "tags": ["a", "b"]},
    {"_id": {"$oid": "65a2"}, "created_at": {"$date": {"$numberLong": "1716000000000"}},
     "n": {"$numberInt": "7"}, "price": 2.25, "name": "beta", "tags": []},
    {"_id": {"$oid": "65a3"}, "created_at": None, "n": None, "price": None,
     "name": "gamma", "tags": None},
]


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_mongoexport_source_unwraps_envelopes(spark, tmp_path):
    from mongo_to_parquet_spark.sources.extjson import MongoExportDataSource

    d = tmp_path / "dump"
    d.mkdir()
    _write_jsonl(d / "part0.jsonl", EXT_ROWS[:2])
    _write_jsonl(d / "part1.jsonl", EXT_ROWS[2:])
    spark.dataSource.register(MongoExportDataSource)
    df = (
        spark.read.format("mongoexport")
        .schema("_id string, created_at timestamp, n bigint, price double, name string")
        .load(str(d))
    )
    rows = {r["_id"]: r for r in df.collect()}
    assert rows["65a1"]["created_at"] == dt.datetime(2020, 6, 1, 12, 30)
    assert rows["65a1"]["n"] == 42 and rows["65a1"]["price"] == 1.5
    assert rows["65a2"]["created_at"] == dt.datetime.fromtimestamp(
        1716000000, dt.timezone.utc
    ).replace(tzinfo=None)
    assert rows["65a2"]["n"] == 7 and rows["65a2"]["price"] == 2.25
    assert rows["65a3"]["created_at"] is None and rows["65a3"]["n"] is None
    # one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_mongoexport_decimal128_stays_exact(spark, tmp_path):
    """$numberDecimal (BSON Decimal128 — money) must bind losslessly to a
    DecimalType field; a float round-trip would corrupt the one BSON
    numeric type whose purpose is exact decimal representation."""
    from decimal import Decimal

    from mongo_to_parquet_spark.sources.extjson import (
        MongoExportDataSource,
        unwrap_extjson,
    )

    # 0.1 + 0.2-style values and a 20-significant-digit amount no double holds
    rows = [
        {"_id": {"$oid": "d1"}, "amount": {"$numberDecimal": "0.30"}},
        {"_id": {"$oid": "d2"}, "amount": {"$numberDecimal": "12345678901234567.89"}},
    ]
    assert unwrap_extjson(rows[0])["amount"] == Decimal("0.30")
    f = tmp_path / "dump.jsonl"
    _write_jsonl(f, rows)
    spark.dataSource.register(MongoExportDataSource)
    got = {
        r["_id"]: r["amount"]
        for r in spark.read.format("mongoexport")
        .schema("_id string, amount decimal(19,2)")
        .load(str(f))
        .collect()
    }
    assert got == {"d1": Decimal("0.30"), "d2": Decimal("12345678901234567.89")}


def test_mongoexport_source_schemaless_raw_mode(spark, tmp_path):
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.sources.extjson import MongoExportDataSource

    f = tmp_path / "dump.jsonl"
    _write_jsonl(f, EXT_ROWS)
    spark.dataSource.register(MongoExportDataSource)
    df = spark.read.format("mongoexport").load(str(f))
    assert df.columns == ["doc"]
    names = sorted(
        r["name"] for r in df.select(F.get_json_object("doc", "$.name").alias("name")).collect()
    )
    assert names == ["alpha", "beta", "gamma"]


def test_mongoexport_roundtrip_through_export(spark, tmp_path):
    """The reference's whole pipeline on the new source: extended-JSON in,
    date-partitioned parquet out, unknown bucket for the null date."""
    from mongo_to_parquet_spark.sources.export import export_partitioned
    from mongo_to_parquet_spark.sources.extjson import MongoExportDataSource

    f = tmp_path / "dump.jsonl"
    _write_jsonl(f, EXT_ROWS)
    spark.dataSource.register(MongoExportDataSource)
    df = (
        spark.read.format("mongoexport")
        .schema("_id string, created_at timestamp, n bigint, name string")
        .load(str(f))
    )
    out = str(tmp_path / "out")
    export_partitioned(df, out, date_field="created_at")
    back = spark.read.parquet(out)
    assert back.count() == 3
    years = {r["year"] for r in back.select("year").collect()}
    assert years == {"2020", "2024", "unknown"}
    assert "_id" not in back.columns  # reference R3: _id dropped at export


def test_observed_export_returns_in_plan_metrics(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import export_partitioned_observed

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "obs")
    m = export_partitioned_observed(orders, out, date_field="o_orderdate")
    back = spark.read.parquet(out)
    assert m["rows_written"] == orders.count() == back.count()
    assert m["rows_unknown_year"] == 0  # fixture dates are all valid
    assert m["n_partitions"] == back.select("year").distinct().count()


def test_mongoexport_streaming_source_tails_new_files(spark, tmp_path):
    """The streaming twin of the mongoexport reader: new dump files become
    new micro-batches; restarts resume from the checkpoint with no dupes
    and no gaps — the jar-less analog of tailing a Mongo change feed."""
    import time

    from mongo_to_parquet_spark.sources.extjson import MongoExportDataSource

    dump = tmp_path / "dump"
    dump.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(MongoExportDataSource)

    def run():
        q = (
            spark.readStream.format("mongoexport")
            .schema("_id string, n bigint, name string")
            .load(str(dump))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def mk(path, rows):
        _write_jsonl(path, rows)

    mk(dump / "part0.jsonl", [{"_id": {"$oid": "a1"}, "n": {"$numberLong": "1"}, "name": "one"}])
    mk(dump / "part1.jsonl", [{"_id": {"$oid": "a2"}, "n": {"$numberLong": "2"}, "name": "two"}])
    run()
    got = {r["_id"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert got == {"a1": 1, "a2": 2}

    time.sleep(0.1)
    mk(dump / "part2.jsonl", [{"_id": {"$oid": "a3"}, "n": {"$numberLong": "3"}, "name": "three"}])
    run()  # restart: only the NEW file lands — no dupes, no gaps
    got = sorted((r["_id"], r["n"]) for r in spark.read.parquet(out).collect())
    assert got == [("a1", 1), ("a2", 2), ("a3", 3)]

    run()  # nothing new: no-op
    assert spark.read.parquet(out).count() == 3


def test_mongoexport_writer_roundtrip_and_overwrite(spark, tmp_path):
    # df.write.format("mongoexport") → dump dir → read back identically;
    # overwrite replaces the previous write's files (manifest-driven)
    import datetime as dt

    from pyspark.sql import Row

    from mongo_to_parquet_spark.sources.extjson import MongoExportDataSource

    spark.dataSource.register(MongoExportDataSource)
    rows = [
        Row(_id="a1", n=7, price=1.5, name="x",
            created_at=dt.datetime(2024, 1, 1, 12, 0, 0, 250000)),
        Row(_id="a2", n=None, price=None, name=None, created_at=None),
    ]
    df = spark.createDataFrame(
        rows, "_id string, n long, price double, name string, created_at timestamp"
    )
    out = str(tmp_path / "dump")
    df.write.format("mongoexport").mode("append").save(out)
    back = (
        spark.read.format("mongoexport")
        .schema("_id string, n bigint, price double, name string, created_at timestamp")
        .load(out)
    )
    got = {r["_id"]: r for r in back.collect()}
    assert set(got) == {"a1", "a2"}
    assert got["a1"]["n"] == 7 and got["a1"]["price"] == 1.5
    # $date carries millisecond precision (mongoexport's own grain)
    assert got["a1"]["created_at"] == dt.datetime(2024, 1, 1, 12, 0, 0, 250000)
    assert got["a2"]["n"] is None and got["a2"]["created_at"] is None

    # overwrite: only the second write's rows survive
    df2 = spark.createDataFrame(
        [Row(_id="b1", n=1, price=0.5, name="y", created_at=None)],
        "_id string, n long, price double, name string, created_at timestamp",
    )
    df2.write.format("mongoexport").mode("overwrite").save(out)
    back2 = (
        spark.read.format("mongoexport")
        .schema("_id string, n bigint, price double, name string, created_at timestamp")
        .load(out)
    )
    assert [r["_id"] for r in back2.collect()] == ["b1"]

    # append accumulates onto the manifest
    df.write.format("mongoexport").mode("append").save(out)
    assert (
        spark.read.format("mongoexport").schema("_id string").load(out).count() == 3
    )


def test_run_query_cli_lists_and_runs(spark, sf_dir, capsys):
    from mongo_to_parquet_spark import run_query

    assert run_query.main(["--list"]) == 0
    listed = capsys.readouterr().out
    assert "q_agg_global\toracle" in listed
    assert run_query.main(["q_agg_global", "--sf-dir", sf_dir, "--json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and '"cnt"' in out[0]
    assert run_query.main(["no_such_key"]) == 2


def test_live_mongo_roundtrip_gated(spark, tmp_path):
    """R1 against a REAL MongoDB (reference main.py:297-303), opt-in:
    requires MONGO_TEST_URI pointing at a reachable mongod AND the
    mongo-spark-connector jar on the session classpath — both absent in
    the sandbox image, so this skips there. Where the environment allows,
    it seeds a collection via pymongo and round-trips it through
    read_collection → ExportJob, closing the one ingestion route the
    mongoexport extended-JSON path (test above / q_mongo_export) cannot
    cover: the live connector scan."""
    import os

    import pytest

    uri = os.environ.get("MONGO_TEST_URI")
    if not uri:
        pytest.skip("MONGO_TEST_URI not set (live-Mongo smoke is opt-in)")
    pymongo = pytest.importorskip("pymongo")

    from mongo_to_parquet_spark.config import JobConfig
    from mongo_to_parquet_spark.sources.mongo import ExportJob, read_collection

    client = pymongo.MongoClient(uri, serverSelectionTimeoutMS=5000)
    db = client["m2p_smoke"]
    db.drop_collection("orders_smoke")
    db["orders_smoke"].insert_many(
        [
            {"o_orderkey": i, "o_orderdate": dt.datetime(1996 + i % 2, 1, 1 + i),
             "v": float(i)}
            for i in range(5)
        ]
    )
    try:
        read_collection(spark, uri, "m2p_smoke", "orders_smoke").count()
    except NotImplementedError:
        pytest.skip("mongo-spark-connector jar not on the classpath")

    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        date_collections={"orders_smoke": "o_orderdate"},
    )
    totals = ExportJob(
        spark, cfg,
        reader=lambda c: read_collection(spark, uri, "m2p_smoke", c),
        database="m2p_smoke",
    ).run()
    assert totals["orders_smoke"] == 5
    back = spark.read.parquet(str(tmp_path / "out" / "orders_smoke"))
    assert back.count() == 5
    assert {"year", "month", "day"} <= set(back.columns)
    assert "_id" not in back.columns  # reference drops _id (main.py:107)
