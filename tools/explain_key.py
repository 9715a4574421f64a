"""Dump .explain('formatted') for declared keys to plans/$PLANS_ROUND/<key>_<tag>.txt
(PLANS_ROUND defaults to r12).

    python tools/explain_key.py <before|after> key [key ...]

For driver-loop keys whose declared DataFrame is a bounded
createDataFrame result (trainers), the dumped plan is still the declared
one; the interesting internal stages are captured separately where the
optimization notes say so.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mongo_to_parquet_spark import get_spark  # noqa: E402
from mongo_to_parquet_spark.queries import bench_only, queries  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(__file__), "..", "plans",
        os.environ.get("PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**queries(), **bench_only()}
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
