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


def apply_cdc(
    log: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Change-data-capture log → final table state.

    A CDC feed is (key, op ∈ {I,U,D}, seq, payload) rows; the materialized
    table is, per key, the payload of the LATEST op — unless that latest op
    is a delete, in which case the key is absent. ``seq_cols`` totally
    order ops within a key (pass a tiebreaker: at-least-once CDC streams
    duplicate sequence numbers).

    Physical shape: ONE hash aggregation — ``max_by(struct(all columns),
    struct(seq_cols))`` collapses each key to its latest op with map-side
    partial combine (the shuffle carries one candidate row per key per
    partition, not the log), then a filter drops deleted keys. No window,
    no sort of the log, no join: at 100 TB this is the cheapest possible
    shape — compare the row_number()-over-window formulation, which
    shuffles AND sorts every log row.
    """
    import pyspark.sql.functions as F

    payload = [c for c in log.columns if c not in keys]
    latest = log.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.struct(*seq_cols)).alias("__last")
    )
    return (
        latest.filter(F.col(f"__last.{op_col}") != delete_op)
        .select(*keys, *[F.col(f"__last.{c}").alias(c) for c in payload])
        .drop(op_col)
    )


def merge_scd2(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of attribute changes to an SCD-2 dimension.

    ``dim`` holds validity intervals (``valid_to`` NULL = current row);
    ``updates`` holds (key, tracked attrs, effective timestamp). Semantics
    of one merge batch (one update per key — pre-collapse multi-updates
    with :func:`apply_cdc`):

      - key present & tracked attrs CHANGED → close the current row at the
        effective timestamp and append the new version (open interval)
      - key present & attrs identical → current row unchanged
      - new key → append an open row effective at the update's timestamp
      - historical (closed) rows pass through untouched

    Physical shape: one left join of the CURRENT slice against the updates
    (broadcast when the batch is small — the usual case), null-safe
    change detection on the tracked columns, then a unionByName of
    {history, kept/closed current rows, new versions}. The dimension is
    read once; nothing quadratic, no window.
    """
    import pyspark.sql.functions as F

    cur = dim.filter(F.col(valid_to).isNull())
    hist = dim.filter(F.col(valid_to).isNotNull())
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.col(effective_col).alias("__eff"),
    )
    j = cur.join(u, keys, "left")
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    matched_change = F.col("__eff").isNotNull() & changed
    dtypes = dict(dim.dtypes)

    def _version_cols(src_tracked: str) -> list:
        """dim-shaped projection for a NEW version row: tracked attrs from
        the update, valid_from = effective ts, open valid_to, other
        columns NULL (the update doesn't carry them)."""
        out = []
        for c in dim.columns:
            if c in keys:
                out.append(F.col(c).alias(c))
            elif c in tracked:
                out.append(F.col(f"{src_tracked}{c}").alias(c))
            elif c == valid_from:
                out.append(F.col("__eff").alias(c))
            else:
                out.append(F.lit(None).cast(dtypes[c]).alias(c))
        return out

    # current rows: close the interval at the effective ts when a differing
    # update matched; pass through unchanged otherwise
    kept = j.select(
        *[
            (
                F.when(matched_change, F.col("__eff")).otherwise(F.col(valid_to)).alias(c)
                if c == valid_to
                else F.col(c).alias(c)
            )
            for c in dim.columns
        ]
    )
    new_rows = j.filter(matched_change).select(*_version_cols("__u_"))
    brand_new = u.join(cur.select(*keys).distinct(), keys, "left_anti").select(
        *_version_cols("__u_")
    )
    return hist.unionByName(kept).unionByName(new_rows).unionByName(brand_new)
