"""Pin the reference's edge semantics (SURVEY §2.1 traps; FIXTURES.md
micro-fixtures): inclusive date bounds, year=unknown routing, _id drop,
schema policy, config behavior."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mongo_to_parquet_spark.config import JobConfig
from mongo_to_parquet_spark.sources.export import (
    UNKNOWN_BUCKET,
    export_bucketed,
    export_partitioned,
    filter_date_range,
    with_date_parts,
)


def _mongo_docs(spark):
    # FIXTURES.md `mongo_docs` micro-fixture
    return spark.createDataFrame(
        [
            Row(_id="a", created_at=dt.datetime(2020, 5, 17), payload=Row(k=1), tags=["x"]),
            Row(_id="b", created_at=dt.datetime(2021, 1, 1), payload=Row(k=2), tags=[]),
            Row(_id="c", created_at=None, payload=Row(k=3), tags=["y", "z"]),
        ]
    )


def test_inclusive_bounds_both_ends(spark):
    # reference main.py:291,293 — $gte AND $lte
    df = spark.createDataFrame(
        [Row(d=dt.datetime(2020, 1, 1)), Row(d=dt.datetime(2020, 6, 1)), Row(d=dt.datetime(2020, 12, 31))]
    )
    got = filter_date_range(df, "d", dt.datetime(2020, 1, 1), dt.datetime(2020, 12, 31)).count()
    assert got == 3  # rows exactly ON both bounds are kept


def test_no_filter_when_bounds_none(spark):
    df = spark.createDataFrame([Row(d=dt.datetime(2020, 1, 1)), Row(d=None)])
    assert filter_date_range(df, "d", None, None).count() == 2


def test_year_unknown_bucket(spark):
    # reference main.py:110 — missing/invalid date → year="unknown"
    out = with_date_parts(_mongo_docs(spark), "created_at")
    rows = {r["_id"]: r for r in out.collect()}
    assert rows["a"]["year"] == "2020" and rows["a"]["month"] == 5 and rows["a"]["day"] == 17
    assert rows["c"]["year"] == UNKNOWN_BUCKET
    assert rows["c"]["month"] is None and rows["c"]["day"] is None


def test_preexisting_year_is_overwritten(spark):
    """DELIBERATE DIVERGENCE from reference main.py:110: a document that
    arrives with its own year/month/day must NOT control partition
    placement — the reference lets a stale/poisoned `year` field route the
    row silently; the engine always derives from the date field."""
    df = spark.createDataFrame(
        [
            Row(_id="a", created_at=dt.datetime(2020, 5, 17), year="1999", month=12, day=31),
            Row(_id="b", created_at=None, year="2030", month=1, day=1),
        ]
    )
    rows = {r["_id"]: r for r in with_date_parts(df, "created_at").collect()}
    assert rows["a"]["year"] == "2020" and rows["a"]["month"] == 5 and rows["a"]["day"] == 17
    # even a null date ignores the claimed year: unknown bucket, null parts
    assert rows["b"]["year"] == UNKNOWN_BUCKET and rows["b"]["month"] is None


def test_export_partition_layout(spark, tmp_path):
    out = str(tmp_path / "exp")
    export_partitioned(_mongo_docs(spark), out, "created_at")
    back = spark.read.parquet(out)
    # _id dropped (reference main.py:107), hive year= dirs incl. unknown
    assert "_id" not in back.columns
    years = {r["year"] for r in back.select("year").distinct().collect()}
    assert years == {"2020", "2021", UNKNOWN_BUCKET}
    # schema is uniform across partitions (NOT the reference's per-partition
    # frozen inference, main.py:120-127)
    assert back.filter(F.col("year") == UNKNOWN_BUCKET).columns == back.columns


def test_export_respects_date_range(spark, tmp_path):
    out = str(tmp_path / "exp2")
    export_partitioned(
        _mongo_docs(spark), out, "created_at",
        start=dt.datetime(2020, 1, 1), end=dt.datetime(2020, 12, 31),
    )
    back = spark.read.parquet(out)
    assert back.count() == 1 and back.collect()[0]["year"] == "2020"


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Co-located layout (SCALE.md): orders and lineitem bucketed by the
    join key into the same bucket count, joined as SortMergeJoin with no
    Exchange on either side — the recurring shuffle is paid once at write
    time."""
    from mongo_to_parquet_spark.plans.checks import formatted_plan
    from mongo_to_parquet_spark.sources.catalog import load_table

    export_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", "o_orderkey",
        num_buckets=8, path=str(tmp_path / "orders_b"),
    )
    export_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey",
        num_buckets=8, path=str(tmp_path / "lineitem_b"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and the result is right: every lineitem finds its order
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_config_include_exclude_xor():
    # reference main.py:35-36
    with pytest.raises(ValueError):
        JobConfig(include_databases=["a"], exclude_databases=["b"])


def test_config_batch_size_typo_fixed(tmp_path):
    # the reference only honors the misspelled "bacth_size" (main.py:31);
    # we honor both, preferring the correct spelling
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"bacth_size": 123}))
    assert JobConfig.from_json(p).batch_size == 123
    p.write_text(json.dumps({"batch_size": 456, "bacth_size": 123}))
    assert JobConfig.from_json(p).batch_size == 456


def test_config_db_selection():
    cfg = JobConfig(include_databases=["a", "b"])
    assert cfg.select_databases(["a", "c"]) == ["a"]
    cfg2 = JobConfig(exclude_databases=["c"])
    assert cfg2.select_databases(["a", "c"]) == ["a"]


def test_cli_export_job(spark, sf_dir, tmp_path):
    """python -m mongo_to_parquet_spark --config ... --source-dir ... — the
    reference's console-script entry point (pyproject.toml:17-18,
    main.py:315-325) end-to-end on the parquet-backed source."""
    import json as _json

    from mongo_to_parquet_spark.__main__ import main as cli_main

    cfg = {
        "output_dir": str(tmp_path / "out"),
        "start_date": "1996-01-01T00:00:00",
        "end_date": "1997-12-31T00:00:00",
        "date_collections": {"orders": "o_orderdate"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))
    assert cli_main(["--config", str(cfg_path), "--source-dir", sf_dir]) == 0
    back = spark.read.parquet(str(tmp_path / "out" / "orders"))
    assert back.count() > 0
    assert set(back.select("year").distinct().toPandas()["year"]) == {"1996", "1997"}


def test_export_job_multi_collection_totals(spark, sf_dir, tmp_path):
    """ExportJob.run exports every configured collection (reference
    main.py:241-309) and reports rows-written per collection (R12)."""
    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob

    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        date_collections={"orders": "o_orderdate", "lineitem": "l_shipdate"},
    )
    job = ExportJob(spark, cfg, reader=lambda coll: load_table(spark, sf_dir, coll))
    totals = job.run()
    assert set(totals) == {"orders", "lineitem"}
    assert totals["orders"] == load_table(spark, sf_dir, "orders").count()
    assert totals["lineitem"] == load_table(spark, sf_dir, "lineitem").count()
    back = spark.read.parquet(str(tmp_path / "out" / "orders"))
    assert {"year", "month", "day"} <= set(back.columns)


def test_export_job_concurrent_overlaps_and_totals_match(spark, sf_dir, tmp_path):
    """max_concurrent>1 restores the reference's per-database thread
    overlap (main.py:266-273) Spark-first: collection exports are
    SUBMITTED concurrently (observed overlap below) and the per-collection
    totals are identical to the sequential run."""
    import threading
    import time

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob

    colls = {"orders": "o_orderdate", "lineitem": "l_shipdate", "events": "ts"}
    lock, active, seen_overlap = threading.Lock(), [0], [0]

    def reader(coll):
        with lock:
            active[0] += 1
            seen_overlap[0] = max(seen_overlap[0], active[0])
        time.sleep(0.3)  # hold the slot long enough for siblings to enter
        try:
            return load_table(spark, sf_dir, coll)
        finally:
            with lock:
                active[0] -= 1

    cfg = JobConfig(output_dir=str(tmp_path / "conc"), date_collections=colls)
    totals = ExportJob(spark, cfg, reader=reader, max_concurrent=3).run()
    assert seen_overlap[0] >= 2  # at least two exports in flight at once
    seq_cfg = JobConfig(output_dir=str(tmp_path / "seq"), date_collections=colls)
    seq = ExportJob(
        spark, seq_cfg, reader=lambda c: load_table(spark, sf_dir, c)
    ).run()
    assert totals == seq
    for c in colls:
        assert totals[c] == load_table(spark, sf_dir, c).count()


def test_export_compression_and_file_rolling(spark, sf_dir, tmp_path):
    """Sink heritage pinned at the file level: outputs are zstd-compressed
    (reference main.py:23) and roll into multiple files when the row cap
    is exceeded (main.py:225-228 -> maxRecordsPerFile)."""
    import glob

    import pyarrow.parquet as pq

    from mongo_to_parquet_spark.sources.catalog import load_table

    old = spark.conf.get("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "400")
    try:
        out = str(tmp_path / "roll")
        export_partitioned(
            load_table(spark, sf_dir, "orders").coalesce(1), out, "o_orderdate"
        )
        files = glob.glob(f"{out}/year=*/*.parquet")
        n_rows = spark.read.parquet(out).count()
        assert len(files) >= n_rows // 400, "file cap not honored"
        meta = pq.ParquetFile(files[0]).metadata
        assert meta.row_group(0).column(0).compression == "ZSTD"
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)


def test_cli_export_job_mongoexport_source(spark, sf_dir, tmp_path):
    """CLI end-to-end on Mongo-shaped input: a mongoexport dump directory,
    sampled schema inference (envelopes unwrapped first), config-driven
    export — the reference's console workflow without a mongod."""
    import json as _json

    from mongo_to_parquet_spark.__main__ import main as cli_main
    from mongo_to_parquet_spark.sources.extjson import write_extjson_lines

    src = tmp_path / "dumps"
    src.mkdir()
    write_extjson_lines(
        src / "orders.jsonl",
        (
            {
                "_id": f"{i:x}",
                "o_orderkey": i,
                "o_orderdate": dt.datetime(1996 + i % 2, 3, 1 + i % 28),
                "o_total": float(i) + 0.25,
            }
            for i in range(200)
        ),
    )
    cfg = {
        "output_dir": str(tmp_path / "out"),
        "date_collections": {"orders": "o_orderdate"},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))
    rc = cli_main(
        [
            "--config", str(cfg_path),
            "--source-dir", str(src),
            "--source-format", "mongoexport",
            "--max-concurrent", "2",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(str(tmp_path / "out" / "orders"))
    assert back.count() == 200
    assert set(r["year"] for r in back.select("year").distinct().collect()) == {
        "1996", "1997",
    }
    assert "_id" not in back.columns  # R3: _id dropped at export
    assert dict(back.dtypes)["o_orderkey"] == "bigint"  # $numberLong inferred


def test_bucketed_point_lookup_prunes_buckets(spark, sf_dir, tmp_path):
    """Bucket pruning: an equality predicate on the bucket key reads ONE
    bucket of 8 (`SelectedBucketsCount: 1 out of 8` in the scan) — at
    100 TB a keyed lookup touches 1/num_buckets of the files before any
    row is read, the same effect partition pruning has for dates."""
    from mongo_to_parquet_spark.plans.checks import formatted_plan
    from mongo_to_parquet_spark.sources.catalog import load_table

    export_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_bp", "o_orderkey",
        num_buckets=8, path=str(tmp_path / "orders_bp"),
    )
    # autoBucketedScan rewrites bucket-irrelevant reads as plain scans
    # (more parallelism); force the bucketed form so pruning is visible
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        key = spark.table("orders_bp").select(F.min("o_orderkey")).first()[0]
        lookup = spark.table("orders_bp").filter(F.col("o_orderkey") == key)
        plan = formatted_plan(lookup)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:1500]
        assert lookup.count() >= 1
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old)
        spark.sql("DROP TABLE IF EXISTS orders_bp")


def test_no_date_field_exports_whole(spark, sf_dir, tmp_path):
    """Reference main.py:93-94 + :289: a collection configured WITHOUT a
    date field is exported whole — no date filter applied, no
    year/month/day enrichment, flat (unpartitioned) directory layout."""
    import os

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.export import export_partitioned

    src = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_flat")
    # start/end present in the config must be IGNORED without a date field
    export_partitioned(src, out, None, start="1996-01-01", end="1996-12-31")
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert "year" not in back.columns and "month" not in back.columns
    assert not any(d.startswith("year=") for d in os.listdir(out))


def test_joblog_json_lines_format(spark, sf_dir, tmp_path):
    """Reference main.py:49-58: job events append to a JSON-lines log —
    one {"ts","level","msg"} object per line — with the reference's
    START/END collection lifecycle lines (main.py:295,309)."""
    import json as _json

    from mongo_to_parquet_spark.joblog import create_logger
    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob

    from datetime import datetime

    log_path = str(tmp_path / "job.log")
    logger = create_logger(log_path)
    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        date_collections={"orders": "o_orderdate"},
        start_date=datetime(1992, 1, 1),
        end_date=datetime(1999, 1, 1),
    )
    job = ExportJob(
        spark, cfg, lambda c: load_table(spark, sf_dir, c), logger=logger,
        database="testdb",
    )
    totals = job.run()
    lines = [
        _json.loads(line)
        for line in open(log_path).read().splitlines()
        if line.strip()
    ]
    msgs = [entry["msg"] for entry in lines]
    # msg CONTENT parity with the reference (main.py:295,309): the
    # db-qualified collection and the rendered Mongo filter document, so
    # msg-level parsers (not just the JSON envelope) keep working
    expected_query = {
        "o_orderdate": {"$gte": datetime(1992, 1, 1), "$lte": datetime(1999, 1, 1)}
    }
    assert f"START testdb.orders | query={expected_query}" in msgs
    assert f"END testdb.orders | documents={totals['orders']}" in msgs
    assert all({"ts", "level", "msg"} <= set(entry) for entry in lines)
    # idempotent handler attach: a second create_logger must not double-log
    assert create_logger(log_path) is logger


def test_config_host_port_synthesizes_uri(tmp_path):
    """Reference configs address Mongo as mongodb_host + mongodb_port
    (main.py:20-21); from_json must synthesize mongo_uri so the SAME
    cfg.json works unchanged (MIGRATION.md's promise)."""
    import json as _json

    p = tmp_path / "cfg.json"
    p.write_text(_json.dumps({
        "mongodb_host": "db.internal", "mongodb_port": 27018,
        "date_collections": {"orders": "o_orderdate"},
    }))
    cfg = JobConfig.from_json(p)
    assert cfg.mongo_uri == "mongodb://db.internal:27018"
    # port defaults like pymongo's when absent
    p.write_text(_json.dumps({"mongodb_host": "h"}))
    assert JobConfig.from_json(p).mongo_uri == "mongodb://h:27017"


def test_file_roll_point_follows_row_group_size(tmp_path):
    """The reference rolls files at row_group_size * 10 (main.py:225) —
    NOT at a fixed 4M; max_rows_per_file derives accordingly unless
    explicitly overridden."""
    assert JobConfig().max_rows_per_file == 4_000_000  # 400k * 10
    assert JobConfig(row_group_size=1000).max_rows_per_file == 10_000
    assert JobConfig(row_group_size=1000, max_rows_per_file=99).max_rows_per_file == 99


def test_export_job_applies_roll_point_and_skips_missing(spark, sf_dir, tmp_path):
    """ExportJob (a) rolls output files at the config's derived
    max_rows_per_file for the duration of the job (restoring the session
    conf afterwards), and (b) skips configured-but-absent collections
    with the reference's log line (main.py:280-283) instead of failing."""
    import glob
    import logging

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("test_m2p_skip")
    logger.setLevel(logging.INFO)
    logger.addHandler(Capture())

    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        date_collections={"orders": "o_orderdate", "ghost_coll": "ts"},
        row_group_size=500,  # roll point derives to 5000 rows
    )
    before = spark.conf.get("spark.sql.files.maxRecordsPerFile")
    totals = ExportJob(
        spark, cfg,
        reader=lambda c: load_table(spark, sf_dir, c),
        logger=logger,
        database="refdb",
        collection_exists=lambda c: c != "ghost_coll",
    ).run()
    assert spark.conf.get("spark.sql.files.maxRecordsPerFile") == before
    assert set(totals) == {"orders"}  # ghost skipped, not errored
    # reference lifecycle ORDER (main.py:276-285): START DB first, then
    # per-collection skip lines, END DB last
    assert "Collection ghost_coll not found in refdb, skipping." in records
    assert records.index("START DB refdb") < records.index(
        "Collection ghost_coll not found in refdb, skipping."
    )
    assert records[-1] == "END DB refdb" or "END DB refdb" in records
    n_rows = load_table(spark, sf_dir, "orders").count()
    if n_rows > 5000:  # sf0.01: 15k rows → at least one partition rolls
        # database set ⇒ reference layout output_dir/db/coll (main.py:112-117)
        files = glob.glob(
            str(tmp_path / "out" / "refdb" / "orders" / "year=*" / "*.parquet")
        )
        import pyarrow.parquet as pq

        assert max(pq.ParquetFile(f).metadata.num_rows for f in files) <= 5000


def test_run_all_databases_selection_banner_and_fanout(spark, sf_dir, tmp_path):
    """The reference's top-level run() (main.py:250-273): include ∩ /
    exclude − database selection, the 'Databases to process' banner, the
    'No databases to process.' WARNING on empty selection, and one job
    per selected database. Verified with injected fakes (no live Mongo):
    per-DB outputs land under output_dir/<db>/<coll> (main.py:112-117)."""
    import logging

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob, run_all_databases

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append((record.levelname, record.getMessage()))

    logger = logging.getLogger("test_m2p_alldb")
    logger.setLevel(logging.INFO)
    logger.handlers[:] = [Capture()]

    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        date_collections={"orders": "o_orderdate"},
        include_databases=["db_a", "db_b"],
    )

    def make_job(db_name):
        return ExportJob(
            spark, cfg, reader=lambda c: load_table(spark, sf_dir, c),
            logger=logger, database=db_name,
        )

    totals = run_all_databases(
        cfg, lambda: ["db_a", "db_b", "db_skip"], make_job, logger=logger
    )
    assert set(totals) == {"db_a", "db_b"}  # include ∩ server names
    n = load_table(spark, sf_dir, "orders").count()
    assert totals["db_a"]["orders"] == n and totals["db_b"]["orders"] == n
    assert ("INFO", "Databases to process: {'db_a', 'db_b'}") in records
    for db in ("db_a", "db_b"):
        assert (tmp_path / "out" / db / "orders").is_dir()

    # empty selection: WARNING + nothing exported (main.py:260-262)
    records.clear()
    empty = run_all_databases(
        cfg, lambda: ["other1", "other2"], make_job, logger=logger
    )
    assert empty == {}
    assert records == [("WARNING", "No databases to process.")]


def test_export_job_iterates_collections_in_config_order(spark, sf_dir, tmp_path):
    """main.py:279 iterates date_collections in CONFIG insertion order —
    not sorted — so lifecycle log lines and the totals dict follow the
    user's config file (big-collections-first configs stay meaningful)."""
    import logging

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.sources.mongo import ExportJob

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("test_m2p_order")
    logger.setLevel(logging.INFO)
    logger.handlers[:] = [Capture()]

    cfg = JobConfig(
        output_dir=str(tmp_path / "out"),
        # reverse-alphabetical on purpose: sorted() would flip these
        date_collections={"region": None, "nation": None},
    )
    totals = ExportJob(
        spark, cfg, reader=lambda c: load_table(spark, sf_dir, c), logger=logger
    ).run()
    assert list(totals) == ["region", "nation"]
    starts = [m for m in records if m.startswith("START ")]
    assert starts == ["START region | query={}", "START nation | query={}"]
