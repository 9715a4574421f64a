"""Incremental aggregate maintenance (materialized-view refresh).

The reference re-copies its whole date window on every run
(reference main.py:288-293); the batch analog for AGGREGATES is worse — a
nightly ``groupBy`` over 100 TB recomputes 100 TB to change the few keys
that got new rows. This module maintains a per-key ALGEBRAIC state —
count / per-measure sum / min / max (avg derives as sum/count) — that is
updated from each new data slice alone:

    state' = merge(state, partial_agg(new_slice))

so a refresh costs O(new data + touched keys), never O(history). The same
decomposition is why Spark's own partial aggregation works; here it is
lifted to a persisted table. Versioned state directories (``v=N``) make
each refresh atomic-by-rename on any filesystem: readers of v=N never see
a half-written v=N+1, and a crashed refresh leaves only an orphan
directory that the next run overwrites.

Limits, stated: only algebraic aggregates decompose this way. Exact
count-distinct / exact percentiles are holistic — the scale path for those
is a mergeable sketch state (the HLL union in q_agg_hll_sketch, the GK
sketch in q_agg_approx_percentile) maintained under this same
merge-partials pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partial_agg_state(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """One slice's algebraic state: n_rows + sum/min/max per measure.

    Sums run in DECIMAL(38,6) so merging partials is exact and
    order-independent — float sums would drift between refresh orders.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        dec = F.col(m).cast("decimal(38,6)")
        aggs += [
            F.sum(dec).alias(f"sum_{m}"),
            F.min(F.col(m)).alias(f"min_{m}"),
            F.max(F.col(m)).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Combine two states key-wise: counts/sums add, mins/maxes fold.

    Outer-union shape (union + re-aggregate) rather than full-outer join:
    one hash shuffle on the key, and it generalizes to merging k states
    in one pass.
    """
    u = a.unionByName(b)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"sum_{m}").alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def state_snapshot(state: DataFrame, measures: list[str]) -> DataFrame:
    """Readable view of a state: derived avg per measure alongside the
    algebraic columns (what a SELECT against the materialized view sees)."""
    out = state
    for m in measures:
        out = out.withColumn(
            f"avg_{m}",
            (F.col(f"sum_{m}") / F.col("n_rows")).cast("double"),
        )
    return out


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def read_agg_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest committed state version, or None before the first refresh."""
    vs = _versions(state_dir)
    if not vs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def refresh_agg_state(
    spark: SparkSession,
    state_dir: str,
    new_slice: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """Fold one new data slice into the persisted state; returns the new
    state. Cost is O(slice + state), independent of how much history the
    state summarizes — the whole point."""
    delta = partial_agg_state(new_slice, keys, measures)
    prev = read_agg_state(spark, state_dir)
    merged = delta if prev is None else merge_agg_states(prev, delta, keys, measures)
    next_v = (_versions(state_dir)[-1] + 1) if _versions(state_dir) else 1
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, f"v={next_v}"))
    return spark.read.parquet(os.path.join(state_dir, f"v={next_v}"))


def stream_refresh_agg_state(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: list[str],
    available_now: bool = True,
):
    """Streaming materialized view: every micro-batch folds into the
    persisted aggregate state via ``refresh_agg_state`` — the streaming
    twin of the batch refresh, composing foreachBatch with the same
    merge-of-partials. Because the merge is algebraic and
    order-independent (decimal sums), the state converges to the batch
    answer regardless of how the stream slices the data — pinned in
    tests/test_incremental.py. The checkpoint dedupes micro-batch replay
    at the source level; a replayed batch would double-count, so this
    sink relies on the checkpoint's exactly-once file-source semantics
    (unlike stream_merge_upsert, whose seq guard is idempotent on its
    own — idempotence is the price of an additive state).
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        refresh_agg_state(batch_df.sparkSession, state_dir, batch_df, keys, measures)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
