"""Compute-parallelism repair for expression-heavy operators.

Spark sizes a scan's parallelism by INPUT BYTES (``maxPartitionBytes``
splits, row-group granularity) — the right call when cost is I/O. The
dedup/text operators invert that assumption: a 2 MB documents file fans
out to thousands of shingle hashes per row, so a byte-sized scan plan
(often ONE task for one small file / one row group) serializes minutes of
CPU on one core while 31 idle.

``fan_out`` re-partitions only when the current plan parallelism is below
the target, so it is

  - a no-op on a real cluster where a 100 TB input already scans with
    more tasks than cores (the common case — no extra shuffle), and
  - a cheap (id, text) round-robin shuffle on under-split inputs, paid
    once, before the expensive per-row expressions run.

Call it on the narrowest projection that feeds heavy compute — shuffle
the raw columns, not the exploded intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than
    ``min_partitions`` (default: ``sparkContext.defaultParallelism``)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
