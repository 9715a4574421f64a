"""Streaming sketch maintenance — mergeable KMV distinct-count state.

The KMV twin queries (queries/relational.py, functions/sketch.py) argue
that k-minimum-values sketches are MERGEABLE: union the retained hashes,
re-truncate to the k smallest, re-estimate. This module is that argument
made operational: a ``foreachBatch`` fold maintains the k-smallest
distinct-hash state across micro-batches, and because set-union +
truncate is associative, commutative AND idempotent, the folded state is
bit-identical to the batch sketch over the same data — for ANY batch
partitioning, and even under batch REPLAY (re-folding a batch changes
nothing, so exactly-once comes from the algebra, not from bookkeeping;
contrast operators/incremental.py, whose additive folds need the
recorded-batch-id guard).

State layout: ``state_dir/current`` holds ≤k (h BIGINT) rows as parquet.
Each batch writes the merged-truncated set to a tmp dir (materializing
it BEFORE the old state is touched), then swaps via two renames. A
crash can land between the renames (no ``current``), so every reader
first runs :func:`_recover`, which restores the newest COMMITTED state:
``_tmp`` when its parquet _SUCCESS marker proves the merge completed,
else ``_old`` — a crash therefore never loses folded batches and never
exposes a partial write.

Scale: per batch the stream side contributes its distinct hashes
(partial-aggregated map-side); the state side is k rows. The fold's
shuffle is bounded by the batch's distinct count, the state by k —
a distinct-count rollup over an unbounded stream in O(k) storage.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_to_parquet_spark.functions import sketch as _sk


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "current")


def _recover(state_dir: str) -> None:
    """Roll the state forward/back after a crash mid-swap.

    The swap is rename(current→_old) then rename(_tmp→current); a crash
    between the two leaves NO ``current``. Recovery prefers ``_tmp``
    when its parquet commit marker (_SUCCESS) proves the merge was fully
    written — it already contains the old state — and falls back to
    ``_old`` otherwise. Either way a committed state is restored before
    the next fold reads it (without this, a crash in the window would
    silently restart the sketch empty while the checkpoint skips the
    already-folded batches).
    """
    cur = _state_path(state_dir)
    if os.path.exists(cur):
        return
    tmp = os.path.join(state_dir, "_tmp")
    old = os.path.join(state_dir, "_old")
    if os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        os.rename(old, cur)


def stream_kmv_distinct(
    stream_df: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = _sk.DEFAULT_K,
    salt: str = "kmv:",
):
    """Maintain a KMV distinct-count sketch of ``col`` over a stream.

    Returns the started StreamingQuery (availableNow trigger — callers
    drain with ``awaitTermination``). Estimate afterwards with
    :func:`read_kmv_estimate`.
    """
    spark = stream_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    h = _sk.kmv_hash(F.col(col), salt=salt)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover(state_dir)
        bh = batch_df.select(h.alias("h")).filter(F.col("h").isNotNull()).distinct()
        cur = _state_path(state_dir)
        if os.path.exists(cur):
            bh = bh.unionByName(spark.read.parquet(cur))
        merged = bh.distinct().orderBy("h").limit(k)
        tmp = os.path.join(state_dir, "_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        # the tmp write MATERIALIZES the merge while the old state is
        # still readable; only then swap directories (rename = commit)
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_dir, "_old")
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(cur):
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_estimate(
    spark: SparkSession, state_dir: str, k: int = _sk.DEFAULT_K
) -> DataFrame:
    """1-row (approx_users DOUBLE) estimate from the committed state —
    the same expression as the batch q_agg_approx_distinct twin, so the
    streamed fold must hash-match it exactly over identical data."""
    _recover(state_dir)
    s = (
        spark.read.parquet(_state_path(state_dir))
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"), F.max("h").alias("theta"))
    )
    return s.select(
        _sk.kmv_estimate(F.col("m"), F.col("theta"), k).alias("approx_users")
    )


# ------------------------------------------------------ multi-sketch fold ---

# geometry + bucket hash SHARED with the batch query (q_sketch_cms)
# through functions/sketch.py — one definition, retunes stay twinned
from mongo_to_parquet_spark.functions.sketch import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_bucket as _cms_bucket,
)


def multi_sketch_batch(
    df: DataFrame,
    distinct_col: str,
    freq_col: str,
    hist_col: str,
    hist_step: float,
    k: int = _sk.DEFAULT_K,
) -> dict[str, DataFrame]:
    """The three sketch tables over a (batch) DataFrame — the single
    source of truth for both the batch baseline and the per-batch
    contribution inside :func:`stream_multi_sketch`:

    - ``kmv``:  k smallest distinct md5 hashes of ``distinct_col``
    - ``cms``:  d×w count-min cells over ``freq_col`` (additive)
    - ``hist``: fixed-step bin counts over ``hist_col`` (additive)
    """
    h = _sk.kmv_hash(F.col(distinct_col))
    kmv = (
        df.select(h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    ii = F.array(*[F.lit(i) for i in range(CMS_D)])
    toks = df.select(F.col(freq_col).cast("string").alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    cms = (
        toks.select("tok", F.explode(ii).alias("i"))
        .groupBy("i", _cms_bucket(F.col("tok"), F.col("i")).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hist = (
        df.filter(F.col(hist_col).isNotNull())
        .groupBy(
            F.floor(F.col(hist_col) / F.lit(hist_step)).cast("bigint").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return {"kmv": kmv, "cms": cms, "hist": hist}


def stream_multi_sketch(
    stream_df: DataFrame,
    distinct_col: str,
    freq_col: str,
    hist_col: str,
    state_dir: str,
    checkpoint_dir: str,
    hist_step: float = 10.0,
    k: int = _sk.DEFAULT_K,
):
    """Maintain THREE sketches over one stream pass with ONE atomic
    commit per batch: a KMV distinct sketch (idempotent fold), a
    count-min frequency sketch and a fixed-bin histogram (both ADDITIVE
    folds — re-adding a replayed batch would double-count).

    The exactly-once story differs per sketch and the state layout
    resolves it: all three tables PLUS a ``batches`` ledger of folded
    batch ids live under one ``current/`` directory that is swapped by
    a single rename, so a batch is either folded into every sketch and
    recorded, or into none. The additive folds check the ledger before
    touching anything (operators/incremental.py's replay guard), and
    because ledger and sketches commit in the same rename there is no
    window where one sketch saw the batch and another didn't — the
    multi-sketch atomicity is what upgrades the per-sketch guards into
    a joint exactly-once.

    Scale: per batch the shuffle carries the batch's distinct hashes
    (≤ batch distinct count) + d·w CMS cells + histogram bins — state
    and traffic are O(k + d·w + bins) regardless of stream length.
    """
    spark = stream_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover(state_dir)
        cur = _state_path(state_dir)
        have_state = os.path.exists(cur)
        if have_state:
            seen = (
                spark.read.parquet(os.path.join(cur, "batches"))
                .filter(F.col("batch_id") == batch_id)
                .count()
            )
            if seen:
                return  # replayed batch: every sketch already has it
        contrib = multi_sketch_batch(
            batch_df, distinct_col, freq_col, hist_col, hist_step, k=k
        )
        kmv, cms, hist = contrib["kmv"], contrib["cms"], contrib["hist"]
        ledger = spark.createDataFrame([(int(batch_id),)], "batch_id bigint")
        if have_state:
            kmv = (
                kmv.unionByName(spark.read.parquet(os.path.join(cur, "kmv")))
                .distinct()
                .orderBy("h")
                .limit(k)
            )
            cms = (
                cms.unionByName(spark.read.parquet(os.path.join(cur, "cms")))
                .groupBy("i", "b")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            hist = (
                hist.unionByName(spark.read.parquet(os.path.join(cur, "hist")))
                .groupBy("bin")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            ledger = ledger.unionByName(
                spark.read.parquet(os.path.join(cur, "batches"))
            )
        tmp = os.path.join(state_dir, "_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        # materialize EVERY table before the swap; the top-level marker
        # is written last, so _recover only ever adopts a complete set
        kmv.write.parquet(os.path.join(tmp, "kmv"))
        cms.write.parquet(os.path.join(tmp, "cms"))
        hist.write.parquet(os.path.join(tmp, "hist"))
        ledger.write.parquet(os.path.join(tmp, "batches"))
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        old = os.path.join(state_dir, "_old")
        shutil.rmtree(old, ignore_errors=True)
        if have_state:
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# -------------------------------------------------- heavy-hitters fold -----


def stream_heavy_hitters(
    stream_df: DataFrame,
    col: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 32,
):
    """Maintain a k-counter Misra-Gries heavy-hitters summary over a
    stream — the streaming half of ``operators/freq.frequent_items``
    (same algebra, same module-docstring guarantees; the batch operator's
    exact-recount stage has no streaming analogue, so the state here is
    the CANDIDATE summary plus lower bounds, and the containment
    guarantee is what the reader exposes).

    Fold per batch: exact per-item batch counts (map-combined groupBy)
    merge additively into the state, then ONE compaction — subtract the
    (k+1)-th largest merged count from everything, drop the non-positive
    — restores ``|state| <= k`` ("Mergeable Summaries" thm 1: merged
    error stays <= n/(k+1), identical to sequential MG). Hence any item
    with true count > n_total/(k+1) is guaranteed present, and each
    retained ``c`` is a LOWER bound with ``true - c <= n/(k+1)``.

    The additive merge makes replay double-count, so the batch-id ledger
    commits in the SAME rename as the summary (the stream_multi_sketch
    exactly-once pattern); total row count ``n`` rides in a meta table
    for threshold math at read time. Per-batch shuffle: the batch's
    distinct items (map-combined) + k state rows; state O(k).
    """
    spark = stream_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover(state_dir)
        cur = _state_path(state_dir)
        have_state = os.path.exists(cur)
        if have_state:
            seen = (
                spark.read.parquet(os.path.join(cur, "batches"))
                .filter(F.col("batch_id") == batch_id)
                .count()
            )
            if seen:
                return
        src = batch_df.select(F.col(col).cast("string").alias("item")).filter(
            F.col("item").isNotNull()
        )
        merged = src.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        n_new = src.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        ledger = spark.createDataFrame([(int(batch_id),)], "batch_id bigint")
        if have_state:
            merged = (
                merged.unionByName(spark.read.parquet(os.path.join(cur, "mg")))
                .groupBy("item")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            n_new = (
                n_new.unionByName(spark.read.parquet(os.path.join(cur, "meta")))
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
            ledger = ledger.unionByName(
                spark.read.parquet(os.path.join(cur, "batches"))
            )
        # compaction: cut = (k+1)-th largest count if more than k items
        # survive the merge (0 otherwise) — only the top-(k+1) slice is
        # ever materialized, never a global sort of the merged relation
        top = merged.orderBy(F.desc("c"), "item").limit(k + 1).collect()
        cut = int(top[-1]["c"]) if len(top) == k + 1 else 0
        summary = merged.filter(F.col("c") > cut).select(
            "item", (F.col("c") - cut).alias("c")
        )
        tmp = os.path.join(state_dir, "_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        summary.write.parquet(os.path.join(tmp, "mg"))
        n_new.write.parquet(os.path.join(tmp, "meta"))
        ledger.write.parquet(os.path.join(tmp, "batches"))
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        old = os.path.join(state_dir, "_old")
        shutil.rmtree(old, ignore_errors=True)
        if have_state:
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_heavy_hitters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Committed MG summary joined with the folded total: (item, lb, n).
    Containment contract for callers: every item with true count
    > n/(k+1) is present, and lb <= true count <= lb + n/(k+1)."""
    _recover(state_dir)
    cur = _state_path(state_dir)
    mg = spark.read.parquet(os.path.join(cur, "mg"))
    n = spark.read.parquet(os.path.join(cur, "meta"))
    return mg.crossJoin(F.broadcast(n)).select(
        "item", F.col("c").alias("lb"), "n"
    )


def read_multi_sketch(spark: SparkSession, state_dir: str) -> dict[str, DataFrame]:
    """The committed sketch tables (after crash recovery) — compare
    directly against :func:`multi_sketch_batch` over the same data."""
    _recover(state_dir)
    cur = _state_path(state_dir)
    return {
        name: spark.read.parquet(os.path.join(cur, name))
        for name in ("kmv", "cms", "hist", "batches")
    }


# ------------------------------------------------------- fixity digests ----
_FIXITY_PRIME = 2305843009213693951  # 2^61 - 1


def fixity_batch(df: DataFrame, part_col, payload_col) -> DataFrame:
    """Per-partition (n_rows, raw digest sum) of ``df`` — the batch half
    of the q_export_fixity audit (queries/sinks.py), factored so a
    stream can fold the SAME algebra: every row contributes a 48-bit
    md5-prefix integer of its payload; counts and sums are additive and
    order-insensitive, so digests merge across micro-batches, partitions
    and replicas by plain addition. Sums stay UNREDUCED (DECIMAL(38,0));
    the mod-prime checksum is applied at read time so merging remains
    linear."""
    v = F.conv(F.substring(F.md5(payload_col), 1, 12), 16, 10).cast("bigint")
    return df.groupBy(part_col.alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(v.cast("decimal(38,0)")).cast("decimal(38,0)").alias("vsum"),
    )


def stream_fixity(
    stream_df: DataFrame,
    part_col,
    payload_col,
    state_dir: str,
    checkpoint_dir: str,
):
    """Maintain per-partition fixity digests over a stream — continuous
    export verification: as batches ship, the folded state always equals
    :func:`fixity_batch` over everything shipped so far, so an auditor
    can compare the destination copy's digest against the stream's at
    any moment without re-scanning history.

    The digest sum is ADDITIVE (not idempotent like the KMV union), so
    replay would double-count: the batch-id ledger commits in the SAME
    rename as the digests (the stream_heavy_hitters exactly-once
    pattern). Per-batch shuffle: the batch's partition census; state:
    one row per partition ever seen.
    """
    spark = stream_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover(state_dir)
        cur = _state_path(state_dir)
        have_state = os.path.exists(cur)
        if have_state:
            seen = (
                spark.read.parquet(os.path.join(cur, "batches"))
                .filter(F.col("batch_id") == batch_id)
                .count()
            )
            if seen:
                return
        merged = fixity_batch(batch_df, part_col, payload_col)
        ledger = spark.createDataFrame([(int(batch_id),)], "batch_id bigint")
        if have_state:
            merged = (
                merged.unionByName(spark.read.parquet(os.path.join(cur, "digests")))
                .groupBy("part")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    F.sum("vsum").cast("decimal(38,0)").alias("vsum"),
                )
            )
            ledger = ledger.unionByName(
                spark.read.parquet(os.path.join(cur, "batches"))
            )
        tmp = os.path.join(state_dir, "_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.parquet(os.path.join(tmp, "digests"))
        ledger.write.parquet(os.path.join(tmp, "batches"))
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        old = os.path.join(state_dir, "_old")
        shutil.rmtree(old, ignore_errors=True)
        if have_state:
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_fixity(spark: SparkSession, state_dir: str) -> DataFrame:
    """Committed digests, reduced to the wire format: (part, n_rows,
    checksum = vsum mod 2^61-1) — directly comparable to
    ``fixity_batch(...).select(part, n_rows, vsum % prime)`` over the
    same rows, and to q_export_fixity's per-year checksum column."""
    _recover(state_dir)
    cur = _state_path(state_dir)
    return spark.read.parquet(os.path.join(cur, "digests")).select(
        "part",
        "n_rows",
        (F.col("vsum") % _FIXITY_PRIME).cast("bigint").alias("checksum"),
    )
