"""Partitioned-parquet export — the reference's entire data path, Spark-first.

The reference's hot loop (main.py:102-158, 203-234): cursor → pop ``_id`` →
derive year/month/day → route rows to per-year buffered ParquetWriters →
flush 400k-row groups → roll files at 4M rows. On Spark that whole machine is
one declarative statement:

    read (pushdown) → drop("_id") → withColumn(year/month/day) →
    write.partitionBy("year")

Semantics preserved exactly (unit-tested in tests/test_reference_semantics.py):
  - date-range filter inclusive on BOTH ends (main.py:291,293)
  - year/month/day added as data columns only when the date field is a
    valid timestamp (main.py:92-100)
  - rows with missing/invalid date land in ``year=unknown`` (main.py:110)
  - hive-style ``year=`` directory layout (main.py:112-117)
  - zstd compression, ≤4M rows per file (main.py:23,225) — session confs

Deliberately NOT preserved (reference bugs/hazards, SURVEY §2.1):
  - first-batch schema freezing that silently drops late fields
    (main.py:212-218) → Spark uses the full analyzed schema for every row
  - per-partition divergent schemas (main.py:120-127) → one schema per table
  - no spill (reference buffers all years in memory) → Spark external sort

Scale note (100 TB): the write shuffles nothing by itself; dynamic partition
insert fans out per task. For few distinct years × many tasks this produces
task-count × year-count files; callers that need file-count control pass
``coalesce_partitions`` (or rely on AQE when a repartition precedes).
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UNKNOWN_BUCKET = "unknown"  # reference main.py:110


def with_date_parts(df: DataFrame, date_field: str) -> DataFrame:
    """Add year/month/day int columns + a string ``year`` partition column.

    ``year``/``month``/``day`` are regular data columns (reference
    main.py:96-99); rows whose date is null get nulls there and route to the
    ``year=unknown`` partition (main.py:110). The partition column is kept
    as a separate string column ``year`` so 'unknown' can coexist with
    numeric years, exactly like the reference's directory layout.

    DELIBERATE DIVERGENCE (reference main.py:110): a source document that
    already contains a ``year``/``month``/``day`` field silently controls
    its own partition placement in the reference — a poisoned or stale
    ``year`` value routes the row to the wrong directory with no error.
    Here those columns are ALWAYS overwritten from ``date_field`` (SURVEY
    §1.1 flags the reference behavior as a hazard); pinned in
    tests/test_reference_semantics.py::test_preexisting_year_is_overwritten.
    """
    c = F.col(date_field)
    return (
        df.withColumn("month", F.month(c))
        .withColumn("day", F.dayofmonth(c))
        .withColumn(
            "year",
            F.coalesce(F.year(c).cast("string"), F.lit(UNKNOWN_BUCKET)),
        )
    )


def filter_date_range(
    df: DataFrame,
    date_field: str,
    start: datetime | str | None,
    end: datetime | str | None,
) -> DataFrame:
    """Inclusive-both-ends date range (reference $gte/$lte, main.py:288-293).

    No filter at all when both bounds are None — reference ships an empty
    query document in that case. Catalyst pushes the predicate into the
    parquet scan (min/max + dictionary row-group skipping).
    """
    c = F.col(date_field)
    if start is not None:
        df = df.filter(c >= F.lit(start))
    if end is not None:
        df = df.filter(c <= F.lit(end))
    return df


def export_partitioned(
    df: DataFrame,
    out_dir: str,
    date_field: str | None,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    drop_columns: tuple[str, ...] = ("_id",),
    mode: str = "overwrite",
    coalesce_partitions: int | None = None,
    max_rows_per_file: int | None = None,
) -> None:
    """The reference's whole export job for one collection (main.py:287-309).

    A falsy ``date_field`` reproduces the reference's no-date-field
    collections (main.py:93-94 skips enrichment, main.py:289 skips the
    range query): the collection is exported WHOLE — no date filter, no
    year/month/day columns, flat unpartitioned layout. Pinned in
    tests/test_reference_semantics.py::test_no_date_field_exports_whole.

    ``export_partitioned_observed`` is this plus in-plan Observation
    metrics; both share :func:`_prepare_export`/:func:`_write_export`
    so the semantics cannot drift apart.
    """
    df = _prepare_export(df, date_field, start, end, drop_columns, coalesce_partitions)
    _write_export(df, out_dir, date_field, mode, max_rows_per_file)


def _prepare_export(df, date_field, start, end, drop_columns, coalesce_partitions):
    """Shared export pipeline head: drop → range filter → date parts →
    optional coalesce (the single definition both export variants use)."""
    df = df.drop(*[c for c in drop_columns if c in df.columns])
    if date_field:
        df = filter_date_range(df, date_field, start, end)
        df = with_date_parts(df, date_field)
    if coalesce_partitions:
        df = df.coalesce(coalesce_partitions)
    return df


def _write_export(df, out_dir, date_field, mode, max_rows_per_file=None):
    """Shared export sink: year-partitioned iff a date field exists.

    ``max_rows_per_file`` rides as a PER-WRITE option, never a session
    conf — mutating ``spark.sql.files.maxRecordsPerFile`` on the shared
    session races concurrent jobs (one job's roll point would silently
    govern another's writes; the same shared-session hazard as named
    Observations)."""
    w = df.write.mode(mode)
    if max_rows_per_file:
        w = w.option("maxRecordsPerFile", str(max_rows_per_file))
    if date_field:
        w = w.partitionBy("year")
    w.parquet(out_dir)


def export_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted layout for shuffle-free co-located joins (SCALE.md).

    A recurring pipeline that repeatedly joins two big fact tables on the
    same key (orders ⋈ lineitem) pays the shuffle once at write time: when
    both sides are bucketed by the join key into the same bucket count,
    the join is a SortMergeJoin with NO Exchange on either side (asserted
    in tests/test_reference_semantics.py). At 100 TB that turns the dominant recurring
    shuffle into a one-time layout decision. Bucketing requires the table
    catalog (``saveAsTable``) — pass ``path`` for an external location.
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_key)
        .sortBy(bucket_key)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def compact_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 4_000_000,
    partition_col: str | None = "year",
) -> dict[str, int]:
    """Rewrite a many-small-files dataset into ~target-sized files.

    The small-file problem is the long-tail killer of 100 TB scans: every
    file costs a task, a footer read, and an open — a partition written by
    1000 reducers daily becomes 365k files/year. Compaction = read +
    repartition to ceil(rows/target) + rewrite. Hive partition columns are
    re-written as directories (partition_col), so downstream pruning is
    unchanged. Returns before/after file counts for the caller's audit log.

    The 4M-row default mirrors the reference's file-roll threshold
    (main.py:225-228, row_group_size x 10).
    """
    df = spark.read.parquet(in_path)
    rows = df.count()
    n_out = max(1, -(-rows // target_rows_per_file))
    before = len(
        [p for p in _list_files(in_path) if p.endswith(".parquet")]
    )
    w = df.repartition(n_out).write.mode("overwrite")
    if partition_col and partition_col in df.columns:
        w = w.partitionBy(partition_col)
    w.parquet(out_path)
    after = len([p for p in _list_files(out_path) if p.endswith(".parquet")])
    return {"rows": rows, "files_before": before, "files_after": after}


def _list_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return out


def export_zordered(
    df: DataFrame,
    out_path: str,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered layout: interleave two dimension keys, range-sort.

    ``export_sorted`` clusters one column; predicates on a second column
    still touch every file. Interleaving the bit representations of two
    clamped dimension keys (functions/layout.zorder_value) gives one sort
    key whose contiguous ranges are small rectangles in BOTH dimensions,
    so footer min/max stats prune files for predicates on either column.
    At 100 TB this is the layout for the two-filter access pattern
    (customer x date, label x time) that single-column clustering can't
    serve. The z key is dropped before write — layout-only, no schema
    change (tests/test_catalog.py asserts two-dimensional footer
    narrowness vs the unsorted baseline).
    """
    from mongo_to_parquet_spark.functions.layout import zorder_value

    mask = (1 << bits) - 1
    z = zorder_value(
        F.col(col_a).cast("long").bitwiseAND(F.lit(mask)),
        F.col(col_b).cast("long").bitwiseAND(F.lit(mask)),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(out_path)
    )


def export_sorted(
    df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: repartitionByRange + sortWithinPartitions.

    Every output file holds a DISJOINT range of ``sort_cols``, so parquet
    footer min/max statistics prune whole files for range predicates — the
    poor man's clustered index. At 100 TB, sorting the export by its
    dominant filter column (ship date, event time) turns full scans into
    touched-range scans with zero read-path changes
    (tests/test_catalog.py asserts footer-range disjointness).
    repartitionByRange samples the data to pick balanced boundaries —
    skewed sort keys still yield even files.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(out_path)
    )


def export_incremental(
    df: DataFrame,
    out_dir: str,
    date_field: str,
    manifest_path: str | None = None,
) -> int:
    """High-water-mark incremental export: ship only rows NEWER than the
    last run's max ``date_field``, append them, advance the mark.

    The reference re-copies the full configured date range every run
    (main.py:288-293 rebuilds the same ``$gte``/``$lte`` query each time);
    a nightly pipeline at 100 TB cannot. The HWM pattern makes each run
    O(new data): the strictly-greater-than filter pushes into the parquet
    scan (min/max row-group + partition pruning on the year= layout skip
    everything already shipped), the append touches only new ``year=``
    directories, and the manifest is a tiny JSON the driver reads before
    planning — no data-side state.

    Late-arriving rows ≤ HWM are deliberately dropped (exactly the
    reference's inclusive-range semantics applied forward); pipelines that
    need late data replay a window behind the mark or use the streaming
    export (streaming/export.py), which tracks source offsets instead.

    Returns the number of rows exported this run.
    """
    import json
    import os

    manifest_path = manifest_path or os.path.join(out_dir, "_hwm.json")
    hwm: str | None = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            hwm = json.load(fh)["high_water_mark"]

    inc = df.filter(F.col(date_field) > F.lit(hwm)) if hwm is not None else df
    new_max, n_rows = inc.agg(
        F.max(date_field).cast("string"), F.count(F.lit(1))
    ).first()
    if n_rows == 0:
        return 0

    with_date_parts(inc, date_field).write.mode("append").partitionBy(
        "year"
    ).parquet(out_dir)

    os.makedirs(os.path.dirname(manifest_path) or ".", exist_ok=True)
    with open(manifest_path, "w") as fh:
        json.dump({"high_water_mark": new_max, "rows_last_run": n_rows}, fh)
    return n_rows


def export_partitioned_observed(
    df: DataFrame,
    out_dir: str,
    date_field: str | None,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    drop_columns: tuple[str, ...] = ("_id",),
    mode: str = "overwrite",
    coalesce_partitions: int | None = None,
    max_rows_per_file: int | None = None,
) -> dict:
    """``export_partitioned`` with in-plan observability: returns the
    metrics the reference logged per collection (row total, main.py:309)
    plus what it couldn't see — how many rows fell into the
    ``year=unknown`` bucket (silent data-quality loss in the reference's
    layout, main.py:110).

    ``Observation`` attaches accumulator-backed aggregates to the write
    plan itself — metrics cost no second scan and can't drift from what
    was actually written (a post-hoc count could race a concurrent
    writer). This is the Spark-idiomatic form of the reference's
    R12/R14 logging (running counter + log line). ``ExportJob`` takes
    its per-collection END totals from here — a ``read.parquet(out).
    count()`` after the write would re-scan everything just written,
    a full second pass at 100 TB.

    Same signature/semantics as :func:`export_partitioned` (falsy
    ``date_field`` → whole-collection flat export; year-bucket metrics
    are then structurally zero).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = _prepare_export(df, date_field, start, end, drop_columns, coalesce_partitions)
    # UNNAMED Observation → unique generated name per call: observations
    # are fulfilled by listener NAME match against any finishing query on
    # the session, so a fixed name would let concurrent exports
    # (ExportJob max_concurrent>1) satisfy each other's observations and
    # report the wrong per-collection totals
    obs = Observation()
    if date_field:
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_written"),
            F.count(F.when(F.col("year") == "unknown", 1)).alias("rows_unknown_year"),
            # observed metrics forbid DISTINCT aggregates; the HLL sketch is
            # exact at partition-count cardinalities
            F.approx_count_distinct("year").alias("n_partitions"),
        )
    else:
        df = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
    _write_export(df, out_dir, date_field, mode, max_rows_per_file)
    metrics = dict(obs.get)
    if not date_field:
        metrics.setdefault("rows_unknown_year", 0)
        metrics.setdefault("n_partitions", 1 if metrics["rows_written"] else 0)
    return metrics
