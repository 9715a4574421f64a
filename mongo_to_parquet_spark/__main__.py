"""CLI entry point — the reference's console script, Spark-first.

The reference ships ``mongo-to-parquet --config cfg.json`` (reference
pyproject.toml:17-18 → main.py:315-325). The equivalent here:

    python -m mongo_to_parquet_spark --config cfg.json [--source-dir DIR]

Reads the reference-compatible JSON config (config.py), builds the engine
SparkSession, and runs the export job for every configured collection.
Sources: with ``--source-dir``, collections are read as parquet tables
from that directory (the fixture-backed path that works everywhere);
without it, the MongoDB Spark connector is used against ``mongo_uri``
(requires the connector jar — see sources/mongo.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from mongo_to_parquet_spark.config import JobConfig
from mongo_to_parquet_spark.session import get_spark
from mongo_to_parquet_spark.sources.mongo import ExportJob, read_collection


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mongo-to-parquet-spark")
    ap.add_argument("--config", required=True, help="JSON job config (reference-compatible)")
    ap.add_argument(
        "--source-dir",
        help="read collections from this directory instead of MongoDB",
    )
    ap.add_argument(
        "--source-format",
        choices=("parquet", "mongoexport"),
        default="parquet",
        help="with --source-dir: <dir>/<name>.parquet tables, or "
        "<dir>/<name>.jsonl (or <dir>/<name>/ shards) mongoexport "
        "extended-JSON dumps with sampled schema inference",
    )
    ap.add_argument("--database", default="default", help="Mongo database (connector path)")
    ap.add_argument(
        "--all-databases",
        action="store_true",
        help="connector path: enumerate server databases and export every "
        "one the config's include/exclude selects, 6 DB workers "
        "(reference main.py:250-273)",
    )
    ap.add_argument(
        "--max-concurrent",
        type=int,
        default=1,
        help="collection exports submitted at once (FAIR pool overlap for "
        "many-small-collection configs; reference main.py:266-273)",
    )
    ap.add_argument(
        "--log-file",
        default=None,
        help="JSON-lines job log (reference main.py:52 default "
        "mongodb_to_parquet.log when set to the empty string)",
    )
    args = ap.parse_args(argv)

    cfg = JobConfig.from_json(args.config)
    logger = None
    if args.log_file is not None:
        from mongo_to_parquet_spark.joblog import DEFAULT_LOG_PATH, create_logger

        logger = create_logger(args.log_file or DEFAULT_LOG_PATH)
    spark = get_spark("mongo-to-parquet-spark-export")
    import os

    if args.source_dir and args.source_format == "mongoexport":
        from mongo_to_parquet_spark.sources.extjson import (
            MongoExportDataSource,
            infer_extjson_schema,
        )

        spark.dataSource.register(MongoExportDataSource)

        def reader(coll):
            p = os.path.join(args.source_dir, f"{coll}.jsonl")
            if not os.path.exists(p):
                p = os.path.join(args.source_dir, coll)
            schema = infer_extjson_schema(spark, p)
            return spark.read.format("mongoexport").schema(schema).load(p)

        # reference main.py:280-283: configured-but-absent collections
        # skip with a log line instead of failing the whole job
        exists = lambda c: (  # noqa: E731
            os.path.exists(os.path.join(args.source_dir, f"{c}.jsonl"))
            or os.path.isdir(os.path.join(args.source_dir, c))
        )
    elif args.source_dir:
        reader = lambda coll: spark.read.parquet(f"{args.source_dir}/{coll}.parquet")  # noqa: E731
        exists = lambda c: os.path.exists(  # noqa: E731
            os.path.join(args.source_dir, f"{c}.parquet")
        )
    else:
        reader = lambda coll: read_collection(  # noqa: E731
            spark, cfg.mongo_uri, args.database, coll
        )
        # the reference consults list_collection_names() via pymongo
        # (main.py:280); do the same when pymongo is importable so absent
        # collections skip with the reference's log line instead of
        # failing the job — without pymongo the read surfaces the error
        try:
            import pymongo

            _names = set(
                pymongo.MongoClient(cfg.mongo_uri, serverSelectionTimeoutMS=5000)[
                    args.database
                ].list_collection_names()
            )
            exists = lambda c: c in _names  # noqa: E731
        except Exception:
            exists = None
    if args.all_databases and not args.source_dir:
        # the reference's top-level fan-out: include/exclude selection +
        # 6 DB-worker threads + the selection banner (main.py:250-273)
        from mongo_to_parquet_spark.sources.mongo import run_all_databases

        import pymongo

        client = pymongo.MongoClient(cfg.mongo_uri, serverSelectionTimeoutMS=5000)

        def make_job(db_name: str) -> ExportJob:
            db = client[db_name]
            return ExportJob(
                spark,
                cfg,
                lambda coll: read_collection(spark, cfg.mongo_uri, db_name, coll),
                max_concurrent=args.max_concurrent,
                logger=logger,
                database=db_name,
                collection_exists=lambda c: c in set(db.list_collection_names()),
            )

        all_totals = run_all_databases(
            cfg, client.list_database_names, make_job, logger=logger
        )
        print(json.dumps({"rows_written": all_totals}))
        return 0
    totals = ExportJob(
        spark, cfg, reader, max_concurrent=args.max_concurrent, logger=logger,
        # connector path: qualify START/END log lines like the reference
        # (main.py:295 '{db}.{coll}'); file-backed sources have no db
        database=args.database if not args.source_dir else "",
        collection_exists=exists,
    ).run()
    # one JSON line per collection — the reference's END log (main.py:309)
    print(json.dumps({"rows_written": totals}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
