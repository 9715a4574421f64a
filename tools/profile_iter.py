"""Phase-profile the iterative-driver compile floor (round-12 item 1).

Decomposes one iteration of each trainer loop into:
  t_sql     spark.sql() call           -> parse + analyze
  t_plan    queryExecution().executedPlan() -> optimize + physical plan
  t_exec    collect()                  -> codegen + schedule + run + fetch

plus trivial-statement floors for reference. Run AFTER the bench (idle
box); prints a table. Usage: python tools/profile_iter.py [bpe|wp|qlr|floor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mongo_to_parquet_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def phases(spark, sql_text, reps=6):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = spark.sql(sql_text)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
        out.append((t1 - t0, t2 - t1, t3 - t2))
    return out


def show(name, rows):
    for i, (a, b, c) in enumerate(rows):
        print(
            f"{name}[{i}] sql={a*1000:7.1f}ms plan={b*1000:7.1f}ms "
            f"exec={c*1000:7.1f}ms total={(a+b+c)*1000:7.1f}ms"
        )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("profile_iter")
    spark.sparkContext.setLogLevel("ERROR")

    if which in ("floor", "all"):
        show("select1", phases(spark, "SELECT 1"))
        show("range", phases(spark, "SELECT sum(id) FROM range(0, 1000)"))

    if which in ("bpe", "all"):
        from mongo_to_parquet_spark.queries.curation import (
            _PAIR_ARGMAX_SQL,
            _bpe_census,
            _merge_loop_env,
        )

        with _merge_loop_env(_bpe_census(spark, SF)) as (spark2, st, view):
            show("bpe_argmax", phases(spark, _PAIR_ARGMAX_SQL.format(view=view)))

    if which in ("wp", "all"):
        from mongo_to_parquet_spark.queries.curation import (
            _WP_ARGMAX_SQL,
            _WP_SCALE,
            _bpe_census,
            _merge_loop_env,
        )

        with _merge_loop_env(_bpe_census(spark, SF)) as (spark2, st, view):
            show(
                "wp_argmax",
                phases(spark, _WP_ARGMAX_SQL.format(view=view, scale=_WP_SCALE)),
            )

    if which in ("qlr", "all"):
        from mongo_to_parquet_spark.operators.classifier import (
            N_W,
            S,
            doc_dense,
        )
        from mongo_to_parquet_spark.sources.catalog import load_table

        docs = load_table(spark, SF, "documents")
        dense = doc_dense(docs).persist()
        n = dense.count()
        parts = max(1, min(dense.rdd.getNumPartitions(), 1 + n // 100_000))
        it_rel = (
            dense.coalesce(parts)
            if parts < dense.rdd.getNumPartitions()
            else dense
        )
        it_rel.createOrReplaceTempView("qlr_prof")
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        sig = f"{S} div 2 + (m * {S}) div (2 * ({S} + abs(m)))"

        def stmt(w):
            arr = ", ".join(f"CAST({int(wi)} AS BIGINT)" for wi in w)
            return (
                f"SELECT j, CAST(SUM((xj * r) div {S}) AS BIGINT) AS g FROM ("
                f"  SELECT posexplode(xa) AS (j, xj),"
                f"         CAST(y AS BIGINT) * {S} - ({sig}) AS r FROM ("
                f"    SELECT xa, y, aggregate(zip_with(xa, array({arr}),"
                f"      (a, b) -> (a * b) div {S}), CAST(0 AS BIGINT),"
                f"      (acc, t) -> acc + t) AS m FROM qlr_prof))"
                f" GROUP BY j"
            )

        try:
            # same weights every rep (codegen-cache best case)
            show("qlr_same_w", phases(spark, stmt([0] * N_W)))
            # different weights each rep (the real loop)
            rows = []
            for i in range(6):
                w = [i * 1000 + j for j in range(N_W)]
                rows.extend(phases(spark, stmt(w), reps=1))
            show("qlr_diff_w", rows)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.catalog.dropTempView("qlr_prof")
            dense.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
