"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multiway-join query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — the SURVEY §2.3 inventory, implemented
in mongo_to_parquet_spark.queries.* (one module per operator family).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongo_to_parquet_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q_join_multiway: 6-table TPC-H-style chain with date filter, broadcast
    dims, hash aggregation — scan/filter/join/agg in one plan.
    """
    return _registry.queries()["q_join_multiway"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; approximate / hash-dependent /
    side-effect-verified keys are omitted (driver's rows-only check)."""
    return _registry.oracle_sql()
