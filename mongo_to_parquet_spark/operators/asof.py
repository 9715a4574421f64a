"""As-of join — an operator Spark lacks natively (SURVEY §4 gap table).

Implemented as a composition of built-in DataFrame ops (union + window
``last(ignoreNulls)``), NOT a Catalyst rule and NOT a UDF:

  1. tag the right side's ordering column into a nullable "carry" column,
  2. union left and right on the shared (key, time) axis,
  3. per key, ordered by time (right rows first on ties so ``t_right ==
     t_left`` matches, mirroring DuckDB ASOF's ``>=``), take
     ``last(carry, ignoreNulls)`` over an unbounded-preceding frame,
  4. keep only left rows.

Scale: one shuffle on the key (same as any windowed op), no join explosion,
skew behaves like a window — AQE-safe. This beats a range-join + argmax at
100 TB because the window is a single pass over co-partitioned, sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    carry: list[str],
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_time] <= left[left_time]`` within the same ``on`` key.

    ``carry``: right-side columns to bring across (suffixed). Left rows with
    no prior right row get nulls — ASOF LEFT semantics.

    ``tolerance_us``: when set, a match older than this many µs before the
    left time is treated as NO match (every carried column nulls out) —
    the bounded-staleness variant every market-data/attribution as-of
    needs. Implemented as a post-fill guard, so the plan (one union + one
    running window, no join) is unchanged.
    """
    is_left = "__is_left"
    t = "__t"
    lhs = left.withColumn(is_left, F.lit(1)).withColumn(t, F.col(left_time))
    rhs = right.withColumn(is_left, F.lit(0)).withColumn(t, F.col(right_time))
    rhs_cols = [on, t, is_left] + [F.col(c).alias(f"{c}{suffix}") for c in carry]
    lhs_cols = [F.col(c) for c in left.columns] + [F.col(is_left), F.col(t)]
    unioned = lhs.select(*lhs_cols).unionByName(
        rhs.select(*rhs_cols), allowMissingColumns=True
    )
    # right rows sort before left rows at equal time → inclusive (<=) match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(t).asc(), F.col(is_left).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fills = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
        for c in carry
    ]
    if tolerance_us is not None:
        # the matched row's own time, filled alongside the carried columns
        # (all CASE-null the same rows, so the fills stay row-consistent)
        mt = F.when(F.col(is_left) == 0, F.col(t))
        fills.append(F.last(mt, ignorenulls=True).over(w).alias("__f_mt"))
    filled = unioned.select("*", *fills)
    out = filled.filter(F.col(is_left) == 1)
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col(t).cast("timestamp"))
            - F.unix_micros(F.col("__f_mt").cast("timestamp"))
        ) <= tolerance_us
        for c in carry:
            out = out.withColumn(f"__f_{c}", F.when(fresh, F.col(f"__f_{c}")))
        out = out.drop("__f_mt")
    for c in carry:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"__f_{c}", f"{c}{suffix}")
    return out.drop(is_left, t)
