"""Time-banded range self-join (SURVEY §2.3 `q_join_theta_range`; SCALE.md).

Finds all ordered pairs within the same key whose time delta lies in
``(0, band_us]``. The naive shape — equi-join on the key with the range
predicate as a residual — evaluates every pair within a key, so one hot
key's full history is quadratic. Banding bounds that: a qualifying pair
always lands in the same or adjacent ``band_us``-wide bucket, so the
later side is exploded to (bucket, bucket−1) and the join is equi on
(key, bucket) with the exact residual inside. Every pair is met exactly
once — via the earlier row's own bucket — and per-key fan is bounded by
events per 2·band window, i.e. linear in stream density.

Equivalence to the naive join is property-tested over random timestamps
(tests/test_properties.py) and against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_pairs(
    df: DataFrame,
    band_us: int,
    id_col: str = "event_id",
    key_col: str = "user_id",
    time_col: str = "us",
) -> DataFrame:
    """All (id1, id2) with same key, ``0 < t2 − t1 <= band_us``.

    ``time_col`` must be integral microseconds. Output columns:
    id1, id2, delta_us.
    """
    e = df.select(id_col, key_col, time_col)
    a = e.withColumn("bkt", (F.col(time_col) / band_us).cast("long")).alias("a")
    b = (
        e.withColumn("__b0", (F.col(time_col) / band_us).cast("long"))
        .withColumn("bkt", F.explode(F.array(F.col("__b0"), F.col("__b0") - 1)))
        .drop("__b0")
        .alias("b")
    )
    ta, tb = F.col(f"a.{time_col}"), F.col(f"b.{time_col}")
    return (
        a.join(
            b,
            (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (tb > ta)
            & (tb - ta <= band_us),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            (tb - ta).alias("delta_us"),
        )
    )


def interval_overlap_pairs(
    df: DataFrame,
    cell_us: int,
    id_col: str = "iv_id",
    key_col: str = "k",
    start_col: str = "s_us",
    end_col: str = "e_us",
) -> DataFrame:
    """All same-key interval pairs (id1 < id2) whose CLOSED intervals
    ``[s, e]`` overlap, each pair emitted exactly once. Output:
    key, id1, id2, overlap_us (``min(e)−max(s)`` ≥ 0).

    The naive shape — equi-join on the key with ``s1 ≤ e2 AND s2 ≤ e1``
    as a residual — evaluates every pair within a key. Grid-cell
    blocking bounds it: each interval is exploded to the ``cell_us``-wide
    cells it covers and the join is equi on (key, cell); any overlapping
    pair shares the cell containing ``max(s1, s2)`` (that instant lies in
    both intervals), so the guard ``cell = ⌊max(s1,s2)/cell_us⌋`` both
    DEDUPES (one emitting cell per pair) and completes (that cell is
    always shared). Per-(key, cell) fan-out is bounded by how many
    intervals cross one cell — interval DENSITY, not history length.

    Pick ``cell_us`` near the median interval span: cells per interval
    ≈ span/cell + 1 (explosion factor ~2), while a cell much wider than
    the spans degrades toward the naive join within each cell.
    """
    iv = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("iv_id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    ).filter(F.col("e") >= F.col("s"))
    cells = iv.select(
        "k", "iv_id", "s", "e",
        F.explode(
            F.sequence(
                (F.col("s") / cell_us).cast("long"), (F.col("e") / cell_us).cast("long")
            )
        ).alias("cell"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    first_shared = (
        F.greatest(F.col("a.s"), F.col("b.s")) / cell_us
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.iv_id") < F.col("b.iv_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            & (F.col("a.cell") == first_shared),
        )
        .select(
            F.col("a.k").alias("k"),
            F.col("a.iv_id").alias("id1"),
            F.col("b.iv_id").alias("id2"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_us"),
        )
    )


def max_concurrency(
    df: DataFrame,
    key_col: str = "k",
    start_col: str = "s_us",
    end_col: str = "e_us",
) -> DataFrame:
    """Per-key maximum number of simultaneously-open CLOSED intervals —
    the +1/−1 sweep: every start contributes +1 at ``s``, every end −1
    at ``e + 1`` (closed semantics: an interval is still open AT its
    end), and the answer is the max running sum per key. Output:
    key, max_concurrent.

    NO join and no pair materialization — capacity questions ("peak
    concurrent spans per supplier") that look like interval self-joins
    are linear sweeps. One shuffle on the key; the window orders by
    (ts, delta) so ends at an instant close before unrelated same-µs
    starts open; rows tying on BOTH are identical (+1/+1), so any
    tie order yields the same running-sum multiset and the same max —
    deterministic across engines.
    """
    from pyspark.sql import Window

    iv = df.select(
        F.col(key_col).alias("k"), F.col(start_col).alias("s"), F.col(end_col).alias("e")
    ).filter(F.col("e") >= F.col("s"))
    ev = iv.select("k", F.col("s").alias("ts"), F.lit(1).alias("delta")).unionAll(
        iv.select("k", (F.col("e") + 1).alias("ts"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("cur", F.sum("delta").over(w))
        .groupBy("k")
        .agg(F.max("cur").cast("bigint").alias("max_concurrent"))
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str = "k",
    start_col: str = "s_us",
    end_col: str = "e_us",
) -> DataFrame:
    """Merge overlapping-or-touching CLOSED intervals per key into
    maximal islands. Output: key, island_start, island_end (one row per
    island). The classic gaps-and-islands sweep: order intervals by
    (start, end), track the running max of end over all PRIOR rows, and
    open a new island whenever a start exceeds it (touching at one µs —
    ``s == prev_max`` — merges, matching closed semantics).

    NO self-join: coalescing looks like an interval-overlap join
    (transitive closure of q_join_interval_overlap pairs) but is a
    linear sweep — one shuffle on the key, one ordered window, then a
    per-island aggregate. Deterministic across engines: rows tying on
    (start, end) are identical, so any tie order yields the same
    running-max sequence and the same island boundaries.

    100 TB: per-key cost is O(n log n) in that key's interval count with
    nothing materialized beyond the input rows; contrast the pair-join
    route, quadratic per hot key before the union-find. A key's history
    must fit one task's sort spill budget — same envelope as every
    per-key window in the repo.
    """
    from pyspark.sql import Window

    iv = df.select(
        F.col(key_col).alias("k"), F.col(start_col).alias("s"), F.col(end_col).alias("e")
    ).filter(F.col("e") >= F.col("s"))
    w_ord = Window.partitionBy("k").orderBy("s", "e")
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_new",
        (prev_max.isNull() | (F.col("s") > prev_max)).cast("int"),
    )
    island = F.sum("is_new").over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("island", island)
        .groupBy("k", "island")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
        )
        .drop("island")
    )
