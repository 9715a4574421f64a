"""Upsert / merge for incremental exports (reference heritage: the tool's
date-windowed re-export, main.py:288-293, implies downstream merge of each
day's slice into the cumulative dataset — the reference leaves that to the
reader; here it is an operator).

SCD-1 semantics, the batch building block behind MERGE INTO on
table formats (Delta/Iceberg): updates win on key collision, unmatched
update rows are inserts, unmatched base rows survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """rows(base ∖ keys(updates)) ∪ rows(updates), schemas matched by name.

    Physical shape: one anti-join of base against the DISTINCT KEY SET of
    updates (keys only — never the update payload), then a shuffle-free
    unionByName. The daily-increment case — updates ≪ base — makes the
    key set broadcast-sized even when base is 100 TB, so the whole merge
    reads base once with zero shuffle of base rows; AQE picks the
    broadcast automatically from the key set's post-agg size. For
    comparable-sized sides it degrades to one sort-merge anti-join on the
    key, which is the floor for any hash-based merge.
    """
    key_set = updates.select(keys).distinct()
    return base.join(key_set, keys, "left_anti").unionByName(updates)
