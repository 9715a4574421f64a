"""Snapshot diff — table-level reconciliation between two exports.

The reference re-exports a date window with no way to answer "what
changed since the last run" (re-runs blindly append, reference
main.py:287-309). This operator diffs two snapshots of a keyed table
into added / removed / changed / unchanged row classes — the
reconciliation primitive behind incremental-load validation, CDC
backfill checks, and export audits (pairs with merge_upsert, which
APPLIES changes; this one EXPLAINS them).

Physical shape: one full-outer sort-merge join on the key; the change
test compares an md5 over the normalized compare columns computed
map-side on EACH side before the join, so the shuffle carries
(key, 32-hex) per side instead of full payloads when callers project —
at 100 TB the diff moves keys and fingerprints, not rows. Engine-
portable: md5 of the same canonical string is identical everywhere, so
the classification itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[str]) -> F.Column:
    """md5 over a canonical null-safe rendering of ``cols`` (the portable
    row hash: '|'-joined string casts with a '<NULL>' sentinel)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")) for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Row-level diff: (keys..., change_type) with change_type in
    {'added','removed','changed','unchanged'}."""
    o = old.select(*keys, row_fingerprint(compare_cols).alias("__old_fp"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("__new_fp"))
    j = o.join(n, keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("__old_fp").isNull(), "added")
        .when(F.col("__new_fp").isNull(), "removed")
        .when(F.col("__old_fp") != F.col("__new_fp"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change_type, n) rollup of a row-level diff."""
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
