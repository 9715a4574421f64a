"""The driver-checked query registry (SURVEY §2.3 — the t2 contract).

Each family module exposes ``QUERIES: dict[str, callable(spark, sf_dir) ->
DataFrame]`` and ``ORACLE: dict[str, str]`` (DuckDB SQL). Keys without an
oracle entry get the driver's weaker rows-only check (approximate /
side-effecting / hash-function-dependent ops only).

Determinism rules applied throughout (SURVEY §2.3 header):
  - every computed column aliased identically in Spark and SQL
  - floating aggregates ROUND-wrapped (2dp money, 4dp ratios/similarity)
  - every LIMIT carries a total order with an id tiebreak
  - integer-ish result columns cast so Spark and DuckDB dtypes agree
    (DuckDB: year()->BIGINT, count->BIGINT, sum(BIGINT)->HUGEINT, ...)
  - UNROUNDED double outputs must not pass through a WIDE decimal:
    DuckDB converts INT128-backed DECIMAL(>18 digits) to DOUBLE as
    unscaled/10^s in float (double-rounds, off-by-1-ulp vs Spark's
    correctly-rounded BigDecimal path). Either ROUND the output, keep
    precision <= 18 digits, or stay in integer/fixed-point space
    (q_score_recency_decay). POWER()/exp()/ln() are libm — never in an
    unrounded output either, even for exact-representable results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongo_to_parquet_spark.queries import (
    analytics,
    curation,
    geo,
    lakehouse,
    llm,
    privacy,
    relational,
    retail,
    retrieval,
    scalars,
    sinks,
    stream,
    tpch,
    udf,
    windows,
)

_MODULES = (
    relational, tpch, retail, windows, scalars, stream, udf, llm, curation,
    lakehouse, retrieval, sinks, analytics, privacy, geo,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:  # raise, not assert: must survive python -O
            raise ValueError(f"duplicate query keys across modules: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    qk = queries().keys()
    stray = out.keys() - qk
    if stray:
        raise ValueError(f"oracle without query: {stray}")
    return out


def bench_only() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Engine-native approximate formulations measured by bench.py but
    deliberately NOT declared to the driver (their sketch outputs are
    engine-specific, so the oracle gate uses hash-checkable KMV twins
    under the declared keys instead — see functions/sketch.py)."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        extra = getattr(m, "BENCH_ONLY", None)
        if extra:
            overlap = out.keys() & extra.keys()
            if overlap:
                raise ValueError(f"duplicate bench-only keys: {overlap}")
            out.update(extra)
    # a bench-only key colliding with a DECLARED key would silently
    # shadow the oracle-gated implementation in bench.py's merged dict
    shadow = out.keys() & queries().keys()
    if shadow:
        raise ValueError(f"bench-only keys shadow declared queries: {shadow}")
    return out
