"""Isolated key timing for same-session A/B decisions: warm each key at
sf0.001 once, then min-of-N noop-sink reps at $SPARK_GRAFT_SF_DIR.

    python tools/ab_key.py key [key ...]   (N via AB_REPS, default 5)

Prints one line per key. Use for BEFORE/AFTER pairs in one session where
possible (stash-based); cross-session numbers are noisy (SCALE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mongo_to_parquet_spark import get_spark  # noqa: E402
from mongo_to_parquet_spark.queries import bench_only, queries  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    reps = int(os.environ.get("AB_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    spark = get_spark("ab_key")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**queries(), **bench_only()}
    for key in keys:
        qs[key](spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            f"{key}: min={min(times):.3f} "
            f"all=[{', '.join(f'{t:.3f}' for t in times)}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
