"""Physical-plan introspection helpers (SURVEY §4).

The engine's optimizer posture is "declare the plan, let Catalyst pick the
physical strategy" — these helpers make that checkable: tests assert that
pushdown / pruning / broadcast / top-k plans actually materialized, so a
regression that silently de-optimizes a query (e.g. a UDF blocking
pushdown) fails CI instead of shipping a 100× slowdown to the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) plan — run the query first for adaptive decisions."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — column-pruning evidence."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def count_nodes(df: DataFrame, node: str) -> int:
    """Number of distinct physical nodes named ``node`` (the formatted plan
    prints each node twice — tree + detail section — so count the
    "(id) Name" detail headers, one per node)."""
    import re

    return len(re.findall(rf"^\(\d+\) {re.escape(node)}\b", formatted_plan(df), re.M))


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment in p for p in pf), f"no pushed filter containing {fragment!r}: {pf}"


def assert_scan_columns_at_most(df: DataFrame, table_fragment: str, n: int) -> None:
    """The scan whose ReadSchema line follows a Location containing
    ``table_fragment`` must read ≤ n columns."""
    plan = formatted_plan(df).splitlines()
    loc_ok = False
    for line in plan:
        s = line.strip()
        if s.startswith("Location:"):
            loc_ok = table_fragment in s
        elif s.startswith("ReadSchema:") and loc_ok:
            cols = s.split("struct<", 1)[-1].count(":")
            assert cols <= n, f"scan of {table_fragment} reads {cols} cols (> {n}): {s}"
            return
    raise AssertionError(f"no scan of {table_fragment} found")


def shuffle_join_subtrees(df: DataFrame) -> list[str]:
    """The full subtree string of every SortMergeJoin / ShuffledHashJoin
    node in the executed plan — lets a gate ask WHAT a non-broadcast join
    is joining (e.g. whether a loaded artifact or a driver-created
    relation sits under it), not just whether one exists."""
    out: list[str] = []

    def walk(node):
        name = node.nodeName()
        if name in ("SortMergeJoin", "ShuffledHashJoin"):
            out.append(node.toString())
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out
