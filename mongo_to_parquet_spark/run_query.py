"""Run any declared query from the command line.

    python -m mongo_to_parquet_spark.run_query q_bm25
    python -m mongo_to_parquet_spark.run_query q_dedup_exact --sf-dir /data/sf0.1 --limit 5
    python -m mongo_to_parquet_spark.run_query --list

The registry (queries()/oracle_sql(), SURVEY §2.3) is the engine's user
surface; this makes every key executable without writing a driver script —
the interactive twin of the export CLI in ``__main__.py``. ``--explain``
prints the formatted physical plan instead of rows (the fastest way to
check pushdown/broadcast behavior on your own data directory).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mongo-to-parquet-spark-query")
    ap.add_argument("key", nargs="?", help="query key (see --list)")
    ap.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="fixture/table directory (parquet tables per FIXTURES.md)",
    )
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    ap.add_argument("--json", action="store_true", help="one JSON object per row")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan, not rows"
    )
    ap.add_argument("--list", action="store_true", help="list declared query keys")
    args = ap.parse_args(argv)

    from mongo_to_parquet_spark.queries import oracle_sql, queries

    qs = queries()
    if args.list or not args.key:
        orc = oracle_sql()
        for k in sorted(qs):
            print(f"{k}\t{'oracle' if k in orc else 'rows-only'}")
        return 0
    if args.key not in qs:
        print(f"unknown query {args.key!r}; try --list", file=sys.stderr)
        return 2

    from mongo_to_parquet_spark import get_spark

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.key](spark, args.sf_dir)
    if args.explain:
        from mongo_to_parquet_spark.plans.checks import formatted_plan

        print(formatted_plan(df))
        return 0
    rows = df.limit(args.limit).collect()
    if args.json:
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    else:
        width = {c: max(len(c), *(len(str(r[c])) for r in rows)) if rows else len(c)
                 for c in df.columns}
        print("  ".join(c.ljust(width[c]) for c in df.columns))
        for r in rows:
            print("  ".join(str(r[c]).ljust(width[c]) for c in df.columns))
    return 0


if __name__ == "__main__":
    sys.exit(main())
