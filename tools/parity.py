"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at a given sf dir; compares row count, column names/dtypes, and an
order-insensitive value comparison (exact, NaN-safe). Run before every
commit:

    python tools/parity.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mongo_to_parquet_spark import get_spark  # noqa: E402
from mongo_to_parquet_spark.queries import oracle_sql, queries  # noqa: E402
from mongo_to_parquet_spark.sources.catalog import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, values normalized for comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v) if not isinstance(v, str) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            ok = (
                (sa.isna() & sb.isna())
                | (sa.astype("float64") == sb.astype("float64"))
            ).all()
        else:
            ok = sa.equals(sb)
        if not ok:
            bad = (
                ~((sa.isna() & sb.isna()) | (sa.fillna(0) == sb.fillna(0)))
            )
            i = bad[bad].index[:3].tolist() if bad.any() else []
            return f"values differ in col {c!r} at rows {i}: spark={sa.iloc[i[0]] if i else '?'} duck={sb.iloc[i[0]] if i else '?'}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    qs, os_ = queries(), oracle_sql()
    fails = []
    for key, fn in sorted(qs.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            fails.append(key)
            print(f"FAIL {key}: spark error\n{traceback.format_exc()}")
            continue
        if key not in os_:
            print(f"ok?  {key}: rows-only, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {key}: zero rows")
            continue
        try:
            ddf = con.execute(os_[key]).df()
        except Exception:
            fails.append(key)
            print(f"FAIL {key}: duckdb error\n{traceback.format_exc()}")
            continue
        err = compare(sdf, ddf)
        if err:
            fails.append(key)
            print(f"FAIL {key}: {err} ({time.time()-t0:.1f}s)")
        else:
            print(f"PASS {key}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
