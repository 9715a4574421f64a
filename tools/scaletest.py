"""Measured scaling curves: do the headline plans scale ~linearly?

SCALE.md argues each operator's shuffle/partition strategy survives
growth; this script MEASURES it. It synthesizes sf0.2 / sf0.5 / sf1.0
inputs by replicating the sf0.1 fixture with disjoint key spaces —
structure-preserving growth:

  - lineitem/orders: all keys offset by replica*KEY_STRIDE, so joins and
    the part co-occurrence graph become N disjoint copies (same shape,
    N x size) instead of N x denser hot keys;
  - documents: doc_id offset AND a per-replica token appended to the
    text, so near-dup density stays constant (naive replication would
    give every doc N-1 exact twins and quadratically exploding LSH
    candidate sets — a different workload, not a bigger one).

Then each probe query runs best-of-3 (after an sf0.001 warmup) at every
scale, identical to bench.py's protocol. The verdict column is
t(sf) / (t(0.1) * sf/0.1) — 1.0 is perfectly linear, < 1 superlinear
throughput (fixed overheads amortizing), > 1 sublinear (a scale hazard).

Usage: python tools/scaletest.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mongo_to_parquet_spark import get_spark  # noqa: E402
from mongo_to_parquet_spark.queries import queries  # noqa: E402

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
SCRATCH = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "_scratch", "scaletest")
)
KEY_STRIDE = 10**9

#: probe queries and the tables each needs materialized at scale
PROBES = {
    "q_agg_groupby": ["lineitem"],
    "q_join_sortmerge": ["lineitem", "orders"],
    "q_graph_triangles": ["lineitem"],
    "q_dedup_minhash": ["documents"],
    "q_text_entropy": ["documents"],
    "q_win_running": ["orders"],
}

#: per-table key columns to offset per replica
OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "documents": ["doc_id"],
}


def materialize(spark, mult: int) -> str:
    out = os.path.join(SCRATCH, f"m{mult}")
    tables = sorted({t for ts in PROBES.values() for t in ts})
    for t in tables:
        dest = os.path.join(out, f"{t}.parquet")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            continue
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        reps = []
        for i in range(mult):
            r = base
            for c in OFFSETS[t]:
                r = r.withColumn(c, F.col(c) + F.lit(i * KEY_STRIDE))
            if t == "documents" and i > 0:
                # keep near-dup density CONSTANT across scales
                r = r.withColumn("text", F.concat("text", F.lit(f" replica{i}")))
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    spark = get_spark("scaletest")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    mults = [1, 2, 5, 10]  # sf0.1, 0.2, 0.5, 1.0
    dirs = {m: materialize(spark, m) if m > 1 else BASE for m in mults}

    for key in PROBES:
        qs[key](spark, WARM).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for key in PROBES:
        row = {}
        for m in mults:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                qs[key](spark, dirs[m]).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            row[f"x{m}"] = round(best, 3)
        base = row["x1"]
        row["linearity"] = {
            f"x{m}": round(row[f"x{m}"] / (base * m), 3) for m in mults if m > 1
        }
        results[key] = row
        print(key, json.dumps(row))

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaletest.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
